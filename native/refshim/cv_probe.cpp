// Empirical probe of OpenCV semantics the reference binary depends on.
// Settles, on THIS rig's OpenCV build, the behaviors fpmMain.cpp relies on
// that are ambiguous from source reading alone:
//   1. cv::add(Mat_2ch, double)  — which channels receive the scalar?
//   2. cv::imread flags=-2       — what -1*CV_LOAD_IMAGE_ANYDEPTH loads
//      (fpmMain.cpp:119) for a 16-bit grayscale TIFF.
//   3. cv::circle filled rasterization masks for a range of radii
//      (fpmMain.cpp:304-307) vs the analytic disk.
//   4. cv::divide(Mat_16U, double) rounding (fpmMain.cpp:129).
//   5. cv::subtract(Mat_16U, Scalar) saturation (fpmMain.cpp:143).
// Prints one JSON object to stdout.
#include <opencv2/core.hpp>
#include <opencv2/imgproc.hpp>
#include <opencv2/imgcodecs.hpp>
#include <cstdio>
#include <string>

int main(int argc, char** argv) {
    printf("{");

    // 1. scalar add to 2-channel double mat
    {
        cv::Mat m = cv::Mat::zeros(1, 1, CV_64FC2);
        cv::Mat out;
        cv::add(m, 0.25, out);
        cv::Vec2d v = out.at<cv::Vec2d>(0, 0);
        printf("\"add_scalar_2ch\": [%.17g, %.17g],", v[0], v[1]);
        // same question for UMat path (fpmMain uses UMats)
        cv::UMat um = cv::UMat::zeros(1, 1, CV_64FC2), uout;
        cv::add(um, 0.25, uout);
        cv::Vec2d uv = uout.getMat(cv::ACCESS_READ).at<cv::Vec2d>(0, 0);
        printf("\"add_scalar_2ch_umat\": [%.17g, %.17g],", uv[0], uv[1]);
        // multiply by scalar
        cv::Mat m2(1, 1, CV_64FC2, cv::Scalar(3.0, 5.0)), mout;
        cv::multiply(m2, 2.0, mout);
        cv::Vec2d mv = mout.at<cv::Vec2d>(0, 0);
        printf("\"mul_scalar_2ch\": [%.17g, %.17g],", mv[0], mv[1]);
    }

    // 2. imread with flags=-2 of a 16-bit TIFF written by the harness
    if (argc > 1) {
        cv::Mat img = cv::imread(argv[1], -2);
        printf("\"imread_neg2\": {\"ok\": %s, \"type\": %d, \"depth\": %d, "
               "\"channels\": %d, \"rows\": %d, \"px00\": %d},",
               img.empty() ? "false" : "true", img.empty() ? -1 : img.type(),
               img.empty() ? -1 : img.depth(), img.empty() ? -1 : img.channels(),
               img.empty() ? -1 : img.rows,
               img.empty() ? -1 : (img.depth() == CV_16U ? (int)img.at<uint16_t>(0, 0)
                                                         : (int)img.at<uint8_t>(0, 0)));
    }

    // 3. filled-circle masks: n=33 canvas, center (16,16), radii 1..15 —
    //    report each mask as a hex row bitmap for offline comparison.
    {
        printf("\"circle_masks\": {");
        for (int r = 1; r <= 15; r++) {
            cv::Mat c = cv::Mat::zeros(33, 33, CV_64F);
            cv::circle(c, cv::Point(16, 16), r, cv::Scalar(1.0), -1, 8, 0);
            printf("%s\"%d\": [", r == 1 ? "" : ",", r);
            for (int i = 0; i < 33; i++) {
                unsigned long long bits = 0;
                for (int j = 0; j < 33; j++)
                    if (c.at<double>(i, j) != 0.0) bits |= (1ULL << j);
                printf("%s%llu", i == 0 ? "" : ",", bits);
            }
            printf("]");
        }
        printf("},");
    }

    // 3b. filled-circle vs analytic disk dist²≤r², r=1..45 (covers every
    //     pupil radius the bundled configs produce, 26..37): report the
    //     number of differing pixels per radius.
    {
        printf("\"circle_vs_disk_diffs\": [");
        for (int r = 1; r <= 45; r++) {
            const int n = 2 * 45 + 9, c0 = n / 2;
            cv::Mat c = cv::Mat::zeros(n, n, CV_64F);
            cv::circle(c, cv::Point(c0, c0), r, cv::Scalar(1.0), -1, 8, 0);
            int diffs = 0;
            for (int i = 0; i < n; i++)
                for (int j = 0; j < n; j++) {
                    bool in_disk = (i - c0) * (i - c0) + (j - c0) * (j - c0) <= r * r;
                    if (in_disk != (c.at<double>(i, j) != 0.0)) diffs++;
                }
            printf("%s%d", r == 1 ? "" : ",", diffs);
        }
        printf("],");
    }

    // 4. uint16 scalar divide rounding: 3/2, 5/2, 7/2, 1/2 (half cases)
    {
        uint16_t vals[4] = {1, 3, 5, 7};
        cv::Mat m(1, 4, CV_16U, vals), out;
        cv::divide(m, 2.0, out);
        printf("\"div_u16_half\": [%d,%d,%d,%d],", out.at<uint16_t>(0, 0),
               out.at<uint16_t>(0, 1), out.at<uint16_t>(0, 2), out.at<uint16_t>(0, 3));
    }

    // 5. uint16 subtract saturation below zero
    {
        uint16_t vals[2] = {5, 100};
        cv::Mat m(1, 2, CV_16U, vals), out;
        cv::subtract(m, cv::Scalar(50, 0, 0), out);
        printf("\"sub_u16_sat\": [%d,%d]", out.at<uint16_t>(0, 0), out.at<uint16_t>(0, 1));
    }

    printf("}\n");
    return 0;
}
