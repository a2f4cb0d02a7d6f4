"""Point-cloud ops: the hot kernels of the compute path.

FPS runs as a Pallas TPU kernel with an XLA fallback (ops/pallas_fps.py,
ops/sampling.py); neighbor queries are tiled MXU distance matmuls with
hardware approximate top-k (ops/neighbors.py); the Kabsch solve and the
Gauss-Newton information matrix are fixed-shape jit functions.
"""

from deeppointmap_tpu.ops.infomat import information_matrix
from deeppointmap_tpu.ops.kabsch import weighted_kabsch
from deeppointmap_tpu.ops.neighbors import (ball_query, group_points,
                                            hybrid_query, knn,
                                            pairwise_dist2)
from deeppointmap_tpu.ops.sampling import batched_fps, farthest_point_sampling

__all__ = ["information_matrix", "weighted_kabsch", "ball_query",
           "group_points", "hybrid_query", "knn", "pairwise_dist2",
           "batched_fps", "farthest_point_sampling"]
