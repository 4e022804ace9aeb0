// cvComplex.cpp — implementation of the reconstructed cvComplex surface
// (see cvComplex.h for provenance). Written for unambiguous, deterministic
// math rather than speed: every complex op is a hand-rolled double loop so
// the semantics under parity test are exactly the ones documented, with no
// dependence on OpenCV dispatch details. OpenCL is disabled on first use so
// UMat ops take the deterministic CPU path.
#include "cvComplex.h"

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cctype>
#include <vector>
#include <stdexcept>

#include <opencv2/core/ocl.hpp>

namespace {

struct OclDisabler {
    OclDisabler() { cv::ocl::setUseOpenCL(false); }
};
OclDisabler g_ocl_disabler;

// Materialize an InputArray (Mat/UMat/ROI view) as a continuous CV_64F mat.
cv::Mat asDouble(cv::InputArray src) {
    cv::Mat m = src.getMat();
    cv::Mat d;
    if (m.depth() == CV_64F && m.isContinuous())
        d = m;
    else
        m.convertTo(d, CV_64F);
    return d;
}

void writeBack(const cv::Mat& result, cv::OutputArray dst) {
    // OutputArray::assign handles both Mat and UMat destinations, including
    // the in-place (dst aliases a source) calls fpmMain makes.
    if (dst.kind() == cv::_InputArray::UMAT) {
        result.copyTo(dst);
    } else {
        dst.create(result.size(), result.type());
        result.copyTo(dst);
    }
}

}  // namespace

void fftShift(cv::InputArray src, cv::OutputArray dst) {
    cv::Mat in = asDouble(src).clone();  // clone: src may alias dst or be a view
    const int r = in.rows, c = in.cols;
    const int dr = r / 2, dc = c / 2;
    cv::Mat out(r, c, in.type());
    const size_t esz = in.elemSize();
    for (int i = 0; i < r; i++) {
        const uint8_t* si = in.ptr(i);
        uint8_t* oi = out.ptr((i + dr) % r);
        // roll columns by dc: out[(i+dr)%r, (j+dc)%c] = in[i, j]
        std::memcpy(oi + (size_t)dc * esz, si, (size_t)(c - dc) * esz);
        std::memcpy(oi, si + (size_t)(c - dc) * esz, (size_t)dc * esz);
    }
    writeBack(out, dst);
}

void fft2(cv::InputArray src, cv::OutputArray dst) {
    cv::Mat in = asDouble(src);
    cv::Mat out;
    cv::dft(in, out, 0);
    writeBack(out, dst);
}

void ifft2(cv::InputArray src, cv::OutputArray dst) {
    cv::Mat in = asDouble(src);
    cv::Mat out;
    cv::dft(in, out, cv::DFT_INVERSE | cv::DFT_SCALE);
    writeBack(out, dst);
}

void complexMultiply(cv::InputArray a, cv::InputArray b, cv::OutputArray dst) {
    cv::Mat A = asDouble(a), B = asDouble(b);
    CV_Assert(A.rows == B.rows && A.cols == B.cols);
    const int ca = A.channels(), cb = B.channels();
    const int n = A.rows * A.cols;
    if (ca == 1 && cb == 1) {
        cv::Mat out(A.rows, A.cols, CV_64FC1);
        const double* pa = A.ptr<double>();
        const double* pb = B.ptr<double>();
        double* po = out.ptr<double>();
        for (int i = 0; i < n; i++) po[i] = pa[i] * pb[i];
        writeBack(out, dst);
        return;
    }
    cv::Mat out(A.rows, A.cols, CV_64FC2);
    double* po = out.ptr<double>();
    const double* pa = A.ptr<double>();
    const double* pb = B.ptr<double>();
    for (int i = 0; i < n; i++) {
        const double ar = ca == 2 ? pa[2 * i] : pa[i];
        const double ai = ca == 2 ? pa[2 * i + 1] : 0.0;
        const double br = cb == 2 ? pb[2 * i] : pb[i];
        const double bi = cb == 2 ? pb[2 * i + 1] : 0.0;
        po[2 * i] = ar * br - ai * bi;
        po[2 * i + 1] = ar * bi + ai * br;
    }
    writeBack(out, dst);
}

void complexDivide(cv::InputArray a, cv::InputArray b, cv::OutputArray dst) {
    cv::Mat A = asDouble(a), B = asDouble(b);
    CV_Assert(A.rows == B.rows && A.cols == B.cols);
    const int ca = A.channels(), cb = B.channels();
    const int n = A.rows * A.cols;
    cv::Mat out(A.rows, A.cols, CV_64FC2);
    double* po = out.ptr<double>();
    const double* pa = A.ptr<double>();
    const double* pb = B.ptr<double>();
    for (int i = 0; i < n; i++) {
        const double ar = ca == 2 ? pa[2 * i] : pa[i];
        const double ai = ca == 2 ? pa[2 * i + 1] : 0.0;
        if (cb == 1) {
            po[2 * i] = ar / pb[i];
            po[2 * i + 1] = ai / pb[i];
        } else {
            const double br = pb[2 * i], bi = pb[2 * i + 1];
            const double den = br * br + bi * bi;
            po[2 * i] = (ar * br + ai * bi) / den;
            po[2 * i + 1] = (ai * br - ar * bi) / den;
        }
    }
    writeBack(out, dst);
}

void complexAbs(cv::InputArray src, cv::OutputArray dst) {
    cv::Mat A = asDouble(src);
    const int n = A.rows * A.cols;
    cv::Mat out(A.rows, A.cols, CV_64FC1);
    double* po = out.ptr<double>();
    const double* pa = A.ptr<double>();
    if (A.channels() == 1) {
        for (int i = 0; i < n; i++) po[i] = std::abs(pa[i]);
    } else {
        for (int i = 0; i < n; i++) po[i] = std::hypot(pa[2 * i], pa[2 * i + 1]);
    }
    writeBack(out, dst);
}

void complexConj(cv::InputArray src, cv::OutputArray dst) {
    cv::Mat A = asDouble(src);
    CV_Assert(A.channels() == 2);
    cv::Mat out(A.rows, A.cols, CV_64FC2);
    const int n = A.rows * A.cols;
    const double* pa = A.ptr<double>();
    double* po = out.ptr<double>();
    for (int i = 0; i < n; i++) {
        po[2 * i] = pa[2 * i];
        po[2 * i + 1] = -pa[2 * i + 1];
    }
    writeBack(out, dst);
}

void mergeUMat(const cv::UMat* planes, int count, cv::UMat& dst) {
    std::vector<cv::Mat> mats;
    for (int i = 0; i < count; i++) mats.push_back(planes[i].getMat(cv::ACCESS_READ));
    cv::Mat merged;
    cv::merge(mats, merged);
    merged.copyTo(dst);
}

void splitUMat(const cv::UMat& src, int count, cv::UMat* planes) {
    std::vector<cv::Mat> mats;
    cv::split(src.getMat(cv::ACCESS_READ), mats);
    CV_Assert((int)mats.size() >= count);
    for (int i = 0; i < count; i++) mats[i].copyTo(planes[i]);
}

namespace {

int g_dump_seq = 0;

void dumpMat(cv::InputArray img, int mode, const std::string& title) {
    const char* dir = std::getenv("FPM_REF_DUMP");
    if (!dir || !*dir) return;
    std::string name;
    for (char ch : title)
        name.push_back(std::isalnum((unsigned char)ch) ? ch : '_');
    char path[1024];
    std::snprintf(path, sizeof(path), "%s/%03d_%s.bin", dir, g_dump_seq++, name.c_str());
    cv::Mat m = asDouble(img);
    if (!m.isContinuous()) m = m.clone();
    FILE* f = std::fopen(path, "wb");
    if (!f) throw std::runtime_error(std::string("cannot open dump file ") + path);
    const int32_t header[5] = {0x46504D31, m.rows, m.cols, m.channels(), mode};
    std::fwrite(header, sizeof(int32_t), 5, f);
    std::fwrite(m.ptr<double>(), sizeof(double), (size_t)m.rows * m.cols * m.channels(), f);
    std::fclose(f);
}

}  // namespace

void showComplexImg(cv::InputArray img, int mode, std::string windowTitle) {
    dumpMat(img, mode, windowTitle);
}

void showImg(cv::InputArray img, std::string windowTitle) {
    dumpMat(img, -1, windowTitle);
}
