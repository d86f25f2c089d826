// Minimal PCL-compatible PointCloud container (see point_types.h header
// comment; original shim, not derived from PCL sources).
#ifndef MINIPCL_POINT_CLOUD_H
#define MINIPCL_POINT_CLOUD_H

#include <cstddef>
#include <iostream>  // the real PCL headers pull this in transitively;
                     // reference sources rely on it
#include <memory>
#include <vector>

#include "point_types.h"

namespace pcl {

template <typename PointT>
class PointCloud {
public:
    using Ptr = std::shared_ptr<PointCloud<PointT>>;
    using ConstPtr = std::shared_ptr<const PointCloud<PointT>>;
    using iterator = typename std::vector<PointT>::iterator;
    using const_iterator = typename std::vector<PointT>::const_iterator;

    std::vector<PointT> points;

    std::size_t size() const { return points.size(); }
    bool empty() const { return points.empty(); }
    void clear() { points.clear(); }
    void resize(std::size_t n) { points.resize(n); }
    void reserve(std::size_t n) { points.reserve(n); }
    void push_back(const PointT &p) { points.push_back(p); }
    PointT &operator[](std::size_t i) { return points[i]; }
    const PointT &operator[](std::size_t i) const { return points[i]; }
    PointT &at(std::size_t i) { return points.at(i); }
    const PointT &at(std::size_t i) const { return points.at(i); }
    iterator begin() { return points.begin(); }
    iterator end() { return points.end(); }
    const_iterator begin() const { return points.begin(); }
    const_iterator end() const { return points.end(); }

    Ptr makeShared() const { return Ptr(new PointCloud<PointT>(*this)); }
};

struct PointIndices {
    std::vector<int> indices;
};

using IndicesClusters = std::vector<PointIndices>;

}  // namespace pcl

#endif
