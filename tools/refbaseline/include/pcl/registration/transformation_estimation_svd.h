// Minimal PCL-compatible rigid-transform estimation via SVD (Kabsch /
// Umeyama without scaling — the documented behavior of PCL 1.8's
// TransformationEstimationSVD).  Original shim, not derived from PCL
// sources; see point_types.h header comment.
#ifndef MINIPCL_REGISTRATION_TESVD_H
#define MINIPCL_REGISTRATION_TESVD_H

#include <Eigen/Dense>

#include "../point_cloud.h"

namespace pcl {
namespace registration {

template <typename PointSource, typename PointTarget>
class TransformationEstimationSVD {
public:
    using Matrix4 = Eigen::Matrix4f;

    void estimateRigidTransformation(const PointCloud<PointSource> &src,
                                     const PointCloud<PointTarget> &tgt,
                                     Matrix4 &transform) const {
        transform.setIdentity();
        const std::size_t n = std::min(src.size(), tgt.size());
        if (n == 0) return;
        Eigen::Vector3f cs = Eigen::Vector3f::Zero();
        Eigen::Vector3f ct = Eigen::Vector3f::Zero();
        for (std::size_t i = 0; i < n; ++i) {
            cs += Eigen::Vector3f(src[i].x, src[i].y, src[i].z);
            ct += Eigen::Vector3f(tgt[i].x, tgt[i].y, tgt[i].z);
        }
        cs /= static_cast<float>(n);
        ct /= static_cast<float>(n);
        Eigen::Matrix3f h = Eigen::Matrix3f::Zero();
        for (std::size_t i = 0; i < n; ++i) {
            const Eigen::Vector3f a =
                Eigen::Vector3f(src[i].x, src[i].y, src[i].z) - cs;
            const Eigen::Vector3f b =
                Eigen::Vector3f(tgt[i].x, tgt[i].y, tgt[i].z) - ct;
            h += a * b.transpose();
        }
        Eigen::JacobiSVD<Eigen::Matrix3f> svd(
            h, Eigen::ComputeFullU | Eigen::ComputeFullV);
        Eigen::Matrix3f r = svd.matrixV() * svd.matrixU().transpose();
        if (r.determinant() < 0) {
            Eigen::Matrix3f v = svd.matrixV();
            v.col(2) *= -1.0f;
            r = v * svd.matrixU().transpose();
        }
        transform.block<3, 3>(0, 0) = r;
        transform.block<3, 1>(0, 3) = ct - r * cs;
    }
};

}  // namespace registration
}  // namespace pcl

#endif
