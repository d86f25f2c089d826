// Minimal OpenCV-compatible dense-matrix shim for building the reference
// PLADE binary without the vendored OpenCV build (only cv::Mat with
// CV_32F/CV_64F storage, cv::solve(DECOMP_SVD), Mat::inv, and the small
// fixed-size helper types are used — see tools/refbaseline/README.md).
// Original code backed by Eigen; not derived from OpenCV sources.
#ifndef MINICV_CORE_HPP
#define MINICV_CORE_HPP

#include <Eigen/Dense>
#include <cassert>
#include <cstring>
#include <vector>

#define CV_32F 5
#define CV_64F 6
#define CV_DIST_L2 2

#include <cmath>
#define cvIsInf(x) (std::isinf(x) ? 1 : 0)
#define cvIsNaN(x) (std::isnan(x) ? 1 : 0)
#ifndef MAX
#define MAX(a, b) ((a) > (b) ? (a) : (b))
#endif
#ifndef MIN
#define MIN(a, b) ((a) < (b) ? (a) : (b))
#endif

namespace cv {

struct Scalar {
    double v;
    explicit Scalar(double v_ = 0) : v(v_) {}
};

struct Point3f {
    float x, y, z;
    Point3f() : x(0), y(0), z(0) {}
    Point3f(float x_, float y_, float z_) : x(x_), y(y_), z(z_) {}
};

template <typename T, int N>
struct Vec {
    T val[N] = {};
    T &operator[](int i) { return val[i]; }
    const T &operator[](int i) const { return val[i]; }
};
using Vec6f = Vec<float, 6>;

class Mat {
public:
    int rows = 0, cols = 0, type_ = CV_32F;
    std::vector<unsigned char> data;

    Mat() = default;
    Mat(int r, int c, int type, Scalar s = Scalar(0))
        : rows(r), cols(c), type_(type), data(r * c * elemSize(type)) {
        if (s.v != 0) {
            for (int i = 0; i < r * c; ++i) setd(i, s.v);
        }
    }

    static std::size_t elemSize(int type) {
        return type == CV_64F ? sizeof(double) : sizeof(float);
    }

    template <typename T>
    T &at(int i) {
        return reinterpret_cast<T *>(data.data())[i];
    }
    template <typename T>
    const T &at(int i) const {
        return reinterpret_cast<const T *>(data.data())[i];
    }
    template <typename T>
    T &at(int r, int c) {
        return reinterpret_cast<T *>(data.data())[r * cols + c];
    }
    template <typename T>
    T *ptr(int r) {
        return reinterpret_cast<T *>(data.data()) + r * cols;
    }

    double getd(int i) const {
        return type_ == CV_64F ? at<double>(i)
                               : static_cast<double>(at<float>(i));
    }
    void setd(int i, double v) {
        if (type_ == CV_64F)
            at<double>(i) = v;
        else
            at<float>(i) = static_cast<float>(v);
    }

    Eigen::MatrixXd toEigen() const {
        Eigen::MatrixXd m(rows, cols);
        for (int r = 0; r < rows; ++r)
            for (int c = 0; c < cols; ++c) m(r, c) = getd(r * cols + c);
        return m;
    }
    static Mat fromEigen(const Eigen::MatrixXd &m, int type) {
        Mat out(static_cast<int>(m.rows()), static_cast<int>(m.cols()), type);
        for (int r = 0; r < out.rows; ++r)
            for (int c = 0; c < out.cols; ++c)
                out.setd(r * out.cols + c, m(r, c));
        return out;
    }

    Mat inv() const { return fromEigen(toEigen().inverse(), type_); }

    Mat operator*(const Mat &other) const {
        return fromEigen(toEigen() * other.toEigen(), type_);
    }
};

enum { DECOMP_SVD = 1 };

// least-squares solve of A X = B (the only mode the reference uses is
// DECOMP_SVD; backed by Eigen's JacobiSVD minimum-norm solution, which is
// what OpenCV documents for cv::solve with DECOMP_SVD)
inline bool solve(const Mat &A, const Mat &B, Mat &X, int /*flags*/) {
    Eigen::MatrixXd a = A.toEigen();
    Eigen::MatrixXd b = B.toEigen();
    Eigen::JacobiSVD<Eigen::MatrixXd> svd(
        a, Eigen::ComputeThinU | Eigen::ComputeThinV);
    Eigen::MatrixXd x = svd.solve(b);
    X = Mat::fromEigen(x, A.type_);
    return true;
}

}  // namespace cv

#endif
