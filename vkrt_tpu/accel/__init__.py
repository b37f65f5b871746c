from vkrt_tpu.accel.lbvh import BVH2, build_lbvh, morton30
from vkrt_tpu.accel.clusters import ClusterTree, build_clusters
from vkrt_tpu.accel.refit import refit_clusters

__all__ = ["BVH2", "build_lbvh", "morton30", "ClusterTree",
           "build_clusters", "refit_clusters"]
