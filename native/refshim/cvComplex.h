// cvComplex.h — reconstruction of the missing cvComplex library the
// reference links against (/root/reference/makefile:23 -lcvComplex,
// /root/reference/fpmMain.cpp:15 #include "cvComplex.h").
//
// The library ships with neither the reference nor this rig, so this header
// re-declares exactly the surface fpmMain.cpp uses (SURVEY.md §1-L0):
// 2-channel-double complex arithmetic over cv::UMat, fft helpers, UMat
// merge/split, and the SHOW_* display entry points. Semantics are fixed by
// the call sites themselves — e.g. complexAbs MUST return a single-channel
// mat because its result is fed to cv::minMaxLoc (fpmMain.cpp:415,467),
// which asserts single-channel input; complexMultiply/Divide must therefore
// accept mixed 1-channel×2-channel operands (fpmMain.cpp:408,392).
//
// The display functions are implemented as raw-matrix dumpers (environment
// variable FPM_REF_DUMP names the output directory) so the final object and
// pupil (fpmMain.cpp:495-497) can be extracted for numeric parity testing
// against the TPU reimplementation; with FPM_REF_DUMP unset they are no-ops
// (there is no display on this rig).
//
// Also provides the OpenCV 2.4-era constants fpmMain.cpp uses, mapped to
// their OpenCV 4 values: CV_LOAD_IMAGE_ANYDEPTH=2 and CV_LOAD_IMAGE_COLOR=1
// match the 2.4 numeric values exactly, so the reference's
// -1*CV_LOAD_IMAGE_ANYDEPTH == -2 imread flag (fpmMain.cpp:119) is preserved
// bit-for-bit (probed: flags=-2 loads 16-bit TIFF as CV_16UC1).
#ifndef CVCOMPLEX_H
#define CVCOMPLEX_H

#include <opencv2/core.hpp>
#include <opencv2/imgproc.hpp>
#include <opencv2/imgcodecs.hpp>
#include <string>

#ifndef CV_LOAD_IMAGE_ANYDEPTH
#define CV_LOAD_IMAGE_ANYDEPTH cv::IMREAD_ANYDEPTH
#endif
#ifndef CV_LOAD_IMAGE_COLOR
#define CV_LOAD_IMAGE_COLOR cv::IMREAD_COLOR
#endif
#ifndef CV_RGB2GRAY
#define CV_RGB2GRAY cv::COLOR_RGB2GRAY
#endif

// Display modes (fpmMain.cpp:368-497). Values are arbitrary — only the
// symbolic names appear in the reference source.
enum {
    SHOW_COMPLEX_MAG = 0,
    SHOW_COMPLEX_COMPONENTS = 1,
    SHOW_COMPLEX_REAL = 2,
    SHOW_COMPLEX_IMAGINARY = 3,
    SHOW_AMP_PHASE = 4,
};

// Circular-shift the zero-frequency component to the center: rows and cols
// each roll by floor(n/2) (np.fft.fftshift convention; an involution for the
// even sizes every bundled dataset uses). Handles src==dst and ROI views.
void fftShift(cv::InputArray src, cv::OutputArray dst);

// Forward/inverse 2-D DFT of a 2-channel (complex) double mat.
// fft2 is unscaled; ifft2 applies DFT_SCALE (matches the reference's own
// direct cv::dft(.., DFT_INVERSE | DFT_SCALE) at fpmMain.cpp:481).
void fft2(cv::InputArray src, cv::OutputArray dst);
void ifft2(cv::InputArray src, cv::OutputArray dst);

// Elementwise complex arithmetic. Each operand may be 1-channel (a real
// field) or 2-channel (complex); the result is 1-channel only when both
// operands are.
void complexMultiply(cv::InputArray a, cv::InputArray b, cv::OutputArray dst);
void complexDivide(cv::InputArray a, cv::InputArray b, cv::OutputArray dst);
// Magnitude — single-channel result (required by cv::minMaxLoc call sites).
void complexAbs(cv::InputArray src, cv::OutputArray dst);
// Conjugate — negates the second channel.
void complexConj(cv::InputArray src, cv::OutputArray dst);

// UMat-array analogues of cv::merge / cv::split (fpmMain.cpp:113,312).
void mergeUMat(const cv::UMat* planes, int count, cv::UMat& dst);
void splitUMat(const cv::UMat& src, int count, cv::UMat* planes);

// Display entry points — dump the raw matrix to $FPM_REF_DUMP/<seq>_<title>.bin
// (no-ops when FPM_REF_DUMP is unset). Binary layout: int32 magic 0x46504D31,
// int32 rows, cols, channels, mode, then row-major float64 data.
void showComplexImg(cv::InputArray img, int mode, std::string windowTitle);
void showImg(cv::InputArray img, std::string windowTitle);

#endif  // CVCOMPLEX_H
