// Forwarding header: the reference includes <pcl/kdtree/kdtree.h> but only
// instantiates pcl::search::KdTree (original shim, see point_types.h).
#ifndef MINIPCL_KDTREE_KDTREE_H
#define MINIPCL_KDTREE_KDTREE_H
#include "../search/kdtree.h"
#endif
