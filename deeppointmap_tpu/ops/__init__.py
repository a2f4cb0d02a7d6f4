from deeppointmap_tpu.ops.neighbors import (  # noqa: F401
    pairwise_dist2,
    knn,
    hybrid_query,
)
from deeppointmap_tpu.ops.sampling import farthest_point_sampling  # noqa: F401
from deeppointmap_tpu.ops.kabsch import weighted_kabsch  # noqa: F401
from deeppointmap_tpu.ops.infomat import information_matrix  # noqa: F401
