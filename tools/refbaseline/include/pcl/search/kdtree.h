// Minimal PCL-compatible 3-D kd-tree search backed by the reference's own
// vendored ANN library (see point_types.h header comment; original shim,
// not derived from PCL sources).  Matches the PCL 1.8 API semantics:
// nearestKSearch / radiusSearch return squared distances sorted ascending;
// radiusSearch takes an unsquared radius and max_nn = 0 means unlimited.
#ifndef MINIPCL_SEARCH_KDTREE_H
#define MINIPCL_SEARCH_KDTREE_H

#include <ANN/ANN.h>

#include <algorithm>
#include <memory>
#include <vector>

#include "../point_cloud.h"

namespace pcl {
namespace search {

template <typename PointT>
class KdTree {
public:
    using Ptr = std::shared_ptr<KdTree<PointT>>;

    KdTree() = default;
    ~KdTree() {
        delete tree_;
        if (pts_) annDeallocPts(pts_);
    }
    KdTree(const KdTree &) = delete;
    KdTree &operator=(const KdTree &) = delete;

    typename PointCloud<PointT>::Ptr getInputCloud() const { return cloud_; }

    void setInputCloud(const typename PointCloud<PointT>::Ptr &cloud) {
        cloud_ = cloud;
        delete tree_;
        tree_ = nullptr;
        if (pts_) annDeallocPts(pts_);
        pts_ = nullptr;
        const int n = static_cast<int>(cloud->size());
        if (n == 0) return;
        pts_ = annAllocPts(n, 3);
        for (int i = 0; i < n; ++i) {
            pts_[i][0] = (*cloud)[i].x;
            pts_[i][1] = (*cloud)[i].y;
            pts_[i][2] = (*cloud)[i].z;
        }
        tree_ = new ANNkd_tree(pts_, n, 3);
    }

    int nearestKSearch(const PointT &point, int k, std::vector<int> &indices,
                       std::vector<float> &sqr_distances) const {
        if (!tree_) return 0;
        k = std::min<int>(k, static_cast<int>(cloud_->size()));
        ANNcoord q[3] = {point.x, point.y, point.z};
        std::vector<ANNidx> idx(k);
        std::vector<ANNdist> dd(k);
        tree_->annkSearch(q, k, idx.data(), dd.data(), 0.0);
        indices.assign(idx.begin(), idx.end());
        sqr_distances.resize(k);
        for (int i = 0; i < k; ++i)
            sqr_distances[i] = static_cast<float>(dd[i]);
        return k;
    }

    int radiusSearch(const PointT &point, double radius,
                     std::vector<int> &indices,
                     std::vector<float> &sqr_distances,
                     unsigned int max_nn = 0) const {
        indices.clear();
        sqr_distances.clear();
        if (!tree_) return 0;
        ANNcoord q[3] = {point.x, point.y, point.z};
        const ANNdist r2 = static_cast<ANNdist>(radius) * radius;
        int total = tree_->annkFRSearch(q, r2, 0, nullptr, nullptr, 0.0);
        if (total == 0) return 0;
        int k = total;
        if (max_nn > 0) k = std::min<int>(k, static_cast<int>(max_nn));
        std::vector<ANNidx> idx(k);
        std::vector<ANNdist> dd(k);
        tree_->annkFRSearch(q, r2, k, idx.data(), dd.data(), 0.0);
        indices.assign(idx.begin(), idx.end());
        sqr_distances.resize(k);
        for (int i = 0; i < k; ++i)
            sqr_distances[i] = static_cast<float>(dd[i]);
        return k;
    }

private:
    typename PointCloud<PointT>::Ptr cloud_;
    ANNkd_tree *tree_ = nullptr;
    ANNpointArray pts_ = nullptr;
};

}  // namespace search
}  // namespace pcl

#endif
