// Minimal PCL-compatible common algorithms (see point_types.h header
// comment; original shim, not derived from PCL sources).  Semantics match
// the documented PCL 1.8 API: transformPointCloud applies a 4x4 affine,
// getMinMax3D returns per-axis extrema, compute3DCentroid the mean as a
// homogeneous Vector4f, computeCovarianceMatrixNormalized the covariance
// divided by the point count, and getEulerAngles the (roll, pitch, yaw)
// extraction with roll = atan2(r21, r22), pitch = asin(-r20),
// yaw = atan2(r10, r00).
#ifndef MINIPCL_COMMON_COMMON_H
#define MINIPCL_COMMON_COMMON_H

#include <Eigen/Dense>
#include <limits>

#include "../point_cloud.h"
#include "../point_types.h"

namespace pcl {

inline void assignTransform(Eigen::Matrix4f &m, const Eigen::Matrix4f &tf) {
    m = tf;
}

inline void assignTransform(Eigen::Matrix4f &m, const Eigen::Affine3f &tf) {
    m = tf.matrix();
}

template <typename PointT, typename Transform>
inline void transformPointCloud(const PointCloud<PointT> &in,
                                PointCloud<PointT> &out,
                                const Transform &tf) {
    Eigen::Matrix4f m;
    assignTransform(m, tf);
    out.points.resize(in.size());
    for (std::size_t i = 0; i < in.size(); ++i) {
        const PointT &p = in[i];
        PointT q = p;
        q.x = m(0, 0) * p.x + m(0, 1) * p.y + m(0, 2) * p.z + m(0, 3);
        q.y = m(1, 0) * p.x + m(1, 1) * p.y + m(1, 2) * p.z + m(1, 3);
        q.z = m(2, 0) * p.x + m(2, 1) * p.y + m(2, 2) * p.z + m(2, 3);
        out.points[i] = q;
    }
}

template <typename PointT>
inline void getMinMax3D(const PointCloud<PointT> &cloud, PointT &min_pt,
                        PointT &max_pt) {
    const float inf = std::numeric_limits<float>::infinity();
    min_pt.x = min_pt.y = min_pt.z = inf;
    max_pt.x = max_pt.y = max_pt.z = -inf;
    for (const PointT &p : cloud.points) {
        min_pt.x = std::min(min_pt.x, p.x);
        min_pt.y = std::min(min_pt.y, p.y);
        min_pt.z = std::min(min_pt.z, p.z);
        max_pt.x = std::max(max_pt.x, p.x);
        max_pt.y = std::max(max_pt.y, p.y);
        max_pt.z = std::max(max_pt.z, p.z);
    }
}

template <typename PointT>
inline unsigned int compute3DCentroid(const PointCloud<PointT> &cloud,
                                      Eigen::Vector4f &centroid) {
    centroid.setZero();
    if (cloud.empty()) return 0;
    for (const PointT &p : cloud.points) {
        centroid[0] += p.x;
        centroid[1] += p.y;
        centroid[2] += p.z;
    }
    centroid /= static_cast<float>(cloud.size());
    centroid[3] = 1.0f;
    return static_cast<unsigned int>(cloud.size());
}

template <typename PointT>
inline unsigned int computeCovarianceMatrixNormalized(
    const PointCloud<PointT> &cloud, const Eigen::Vector4f &centroid,
    Eigen::Matrix3f &covariance) {
    covariance.setZero();
    if (cloud.empty()) return 0;
    for (const PointT &p : cloud.points) {
        const float dx = p.x - centroid[0];
        const float dy = p.y - centroid[1];
        const float dz = p.z - centroid[2];
        covariance(0, 0) += dx * dx;
        covariance(0, 1) += dx * dy;
        covariance(0, 2) += dx * dz;
        covariance(1, 1) += dy * dy;
        covariance(1, 2) += dy * dz;
        covariance(2, 2) += dz * dz;
    }
    covariance(1, 0) = covariance(0, 1);
    covariance(2, 0) = covariance(0, 2);
    covariance(2, 1) = covariance(1, 2);
    covariance /= static_cast<float>(cloud.size());
    return static_cast<unsigned int>(cloud.size());
}

template <typename Scalar>
inline void getEulerAngles(
    const Eigen::Transform<Scalar, 3, Eigen::Affine> &t, Scalar &roll,
    Scalar &pitch, Scalar &yaw) {
    roll = std::atan2(t(2, 1), t(2, 2));
    pitch = std::asin(-t(2, 0));
    yaw = std::atan2(t(1, 0), t(0, 0));
}

}  // namespace pcl

#endif
