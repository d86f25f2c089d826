// Minimal PCL-compatible conditional Euclidean clustering (region growing
// over radius neighborhoods gated by a user condition — the documented
// behavior of PCL 1.8's ConditionalEuclideanClustering).  Original shim,
// not derived from PCL sources; see point_types.h header comment.
#ifndef MINIPCL_SEGMENTATION_CEC_HPP
#define MINIPCL_SEGMENTATION_CEC_HPP

#include <vector>

#include "../../point_cloud.h"
#include "../../search/kdtree.h"

namespace pcl {

template <typename PointT>
class ConditionalEuclideanClustering {
public:
    using ConditionFunction = bool (*)(const PointT &, const PointT &, float);

    explicit ConditionalEuclideanClustering(bool /*extract_removed*/ = false) {}

    void setInputCloud(const typename PointCloud<PointT>::Ptr &cloud) {
        cloud_ = cloud;
    }
    void setConditionFunction(ConditionFunction fn) { condition_ = fn; }
    void setClusterTolerance(double tol) { tolerance_ = tol; }
    void setMinClusterSize(int n) { min_size_ = n; }
    void setMaxClusterSize(int n) { max_size_ = n; }

    void segment(IndicesClusters &clusters) const {
        clusters.clear();
        if (!cloud_ || cloud_->empty() || !condition_) return;
        const int n = static_cast<int>(cloud_->size());
        search::KdTree<PointT> tree;
        tree.setInputCloud(cloud_);
        std::vector<char> processed(n, 0);
        std::vector<int> nn;
        std::vector<float> dd;
        for (int i = 0; i < n; ++i) {
            if (processed[i]) continue;
            // grow one cluster from seed i (breadth-first)
            std::vector<int> cluster{i};
            processed[i] = 1;
            for (std::size_t q = 0; q < cluster.size(); ++q) {
                const PointT &cur = (*cloud_)[cluster[q]];
                tree.radiusSearch(cur, tolerance_, nn, dd);
                for (std::size_t j = 0; j < nn.size(); ++j) {
                    if (processed[nn[j]]) continue;
                    if (!condition_(cur, (*cloud_)[nn[j]], dd[j])) continue;
                    processed[nn[j]] = 1;
                    cluster.push_back(nn[j]);
                }
            }
            const int sz = static_cast<int>(cluster.size());
            if (sz >= min_size_ && sz <= max_size_) {
                clusters.emplace_back();
                clusters.back().indices = std::move(cluster);
            }
        }
    }

private:
    typename PointCloud<PointT>::Ptr cloud_;
    ConditionFunction condition_ = nullptr;
    double tolerance_ = 0.0;
    int min_size_ = 1;
    int max_size_ = 1 << 30;
};

}  // namespace pcl

#endif
