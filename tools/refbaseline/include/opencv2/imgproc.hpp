// Minimal OpenCV-compatible cv::fitLine for 3-D points (CV_DIST_L2 only:
// total-least-squares line = centroid + principal direction, matching the
// documented OpenCV behavior for the L2 distance type).  Original code
// backed by Eigen; not derived from OpenCV sources.  Only referenced by
// the reference's dead boundary-line path (SURVEY 2.1.4j) but must link.
#ifndef MINICV_IMGPROC_HPP
#define MINICV_IMGPROC_HPP

#include <vector>

#include "core/core.hpp"

namespace cv {

inline void fitLine(const std::vector<Point3f> &points, Vec6f &line,
                    int /*distType*/, double /*param*/, double /*reps*/,
                    double /*aeps*/) {
    const std::size_t n = points.size();
    if (n == 0) {
        line = Vec6f();
        return;
    }
    Eigen::Vector3d c = Eigen::Vector3d::Zero();
    for (const Point3f &p : points) c += Eigen::Vector3d(p.x, p.y, p.z);
    c /= static_cast<double>(n);
    Eigen::Matrix3d cov = Eigen::Matrix3d::Zero();
    for (const Point3f &p : points) {
        const Eigen::Vector3d d = Eigen::Vector3d(p.x, p.y, p.z) - c;
        cov += d * d.transpose();
    }
    Eigen::SelfAdjointEigenSolver<Eigen::Matrix3d> es(cov);
    const Eigen::Vector3d dir = es.eigenvectors().col(2);  // largest eigval
    line[0] = static_cast<float>(dir[0]);
    line[1] = static_cast<float>(dir[1]);
    line[2] = static_cast<float>(dir[2]);
    line[3] = static_cast<float>(c[0]);
    line[4] = static_cast<float>(c[1]);
    line[5] = static_cast<float>(c[2]);
}

}  // namespace cv

#endif
