// Minimal PCL-compatible point types for building the reference PLADE
// binary without Boost (the real PCL 1.8.1 vendored in the reference tree
// requires a large Boost header subset that is unavailable offline).
//
// This is an original compatibility shim implementing only the API surface
// the reference first-party code touches (see tools/refbaseline/README.md);
// it is NOT derived from PCL sources.
#ifndef MINIPCL_POINT_TYPES_H
#define MINIPCL_POINT_TYPES_H

#include <Eigen/Dense>

namespace pcl {

struct PointXYZ {
    float x, y, z;
    PointXYZ() : x(0), y(0), z(0) {}
    PointXYZ(float x_, float y_, float z_) : x(x_), y(y_), z(z_) {}
    Eigen::Map<Eigen::Vector3f> getVector3fMap() {
        return Eigen::Map<Eigen::Vector3f>(&x);
    }
    Eigen::Map<const Eigen::Vector3f> getVector3fMap() const {
        return Eigen::Map<const Eigen::Vector3f>(&x);
    }
};

struct PointNormal {
    float x, y, z;
    union {
        float normal[3];
        struct {
            float normal_x, normal_y, normal_z;
        };
    };
    float curvature;
    PointNormal()
        : x(0), y(0), z(0), normal_x(0), normal_y(0), normal_z(0),
          curvature(0) {}
    PointNormal(float x_, float y_, float z_, float nx, float ny, float nz,
                float c = 0)
        : x(x_), y(y_), z(z_), normal_x(nx), normal_y(ny), normal_z(nz),
          curvature(c) {}
    Eigen::Map<Eigen::Vector3f> getVector3fMap() {
        return Eigen::Map<Eigen::Vector3f>(&x);
    }
    Eigen::Map<const Eigen::Vector3f> getVector3fMap() const {
        return Eigen::Map<const Eigen::Vector3f>(&x);
    }
};

struct PointXYZINormal {
    float x, y, z;
    float intensity;
    float normal_x, normal_y, normal_z;
    float curvature;
    PointXYZINormal()
        : x(0), y(0), z(0), intensity(0), normal_x(0), normal_y(0),
          normal_z(0), curvature(0) {}
};

}  // namespace pcl

#endif
