// Minimal PCL-compatible VoxelGrid downsampling filter (see point_types.h
// header comment; original shim, not derived from PCL sources).  Matches
// PCL 1.8 semantics: points are binned into an axis-aligned grid anchored
// at the cloud minimum and each occupied voxel emits the centroid of its
// points, ordered by voxel index.
#ifndef MINIPCL_FILTERS_VOXEL_GRID_H
#define MINIPCL_FILTERS_VOXEL_GRID_H

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <unordered_map>
#include <vector>

#include "../common/common.h"
#include "../point_cloud.h"

namespace pcl {

template <typename PointT>
class VoxelGrid {
public:
    void setLeafSize(float lx, float ly, float lz) {
        lx_ = lx;
        ly_ = ly;
        lz_ = lz;
    }
    void setInputCloud(const typename PointCloud<PointT>::Ptr &cloud) {
        cloud_ = cloud;
    }

    void filter(PointCloud<PointT> &out) {
        out.clear();
        if (!cloud_ || cloud_->empty()) return;
        PointT mn, mx;
        getMinMax3D(*cloud_, mn, mx);
        const std::int64_t nx =
            static_cast<std::int64_t>((mx.x - mn.x) / lx_) + 1;
        const std::int64_t ny =
            static_cast<std::int64_t>((mx.y - mn.y) / ly_) + 1;
        struct Acc {
            double x = 0, y = 0, z = 0;
            std::size_t n = 0;
        };
        std::unordered_map<std::int64_t, Acc> cells;
        cells.reserve(cloud_->size());
        for (const PointT &p : cloud_->points) {
            const std::int64_t ix =
                static_cast<std::int64_t>(std::floor((p.x - mn.x) / lx_));
            const std::int64_t iy =
                static_cast<std::int64_t>(std::floor((p.y - mn.y) / ly_));
            const std::int64_t iz =
                static_cast<std::int64_t>(std::floor((p.z - mn.z) / lz_));
            Acc &a = cells[(iz * ny + iy) * nx + ix];
            a.x += p.x;
            a.y += p.y;
            a.z += p.z;
            ++a.n;
        }
        std::vector<std::pair<std::int64_t, Acc>> sorted(cells.begin(),
                                                         cells.end());
        std::sort(sorted.begin(), sorted.end(),
                  [](const auto &a, const auto &b) { return a.first < b.first; });
        out.reserve(sorted.size());
        for (const auto &kv : sorted) {
            PointT p{};
            p.x = static_cast<float>(kv.second.x / kv.second.n);
            p.y = static_cast<float>(kv.second.y / kv.second.n);
            p.z = static_cast<float>(kv.second.z / kv.second.n);
            out.push_back(p);
        }
    }

private:
    typename PointCloud<PointT>::Ptr cloud_;
    float lx_ = 1.0f, ly_ = 1.0f, lz_ = 1.0f;
};

}  // namespace pcl

#endif
