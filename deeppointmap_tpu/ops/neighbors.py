"""Neighborhood queries over padded point sets (JAX, TPU-first).

The reference's kNN / ball / hybrid queries come from pytorch3d CUDA ops
(reference: network/encoder/utils.py:18-123). Here they are expressed as
tiled distance matmuls (MXU) + `lax.top_k`, with padded points masked to
+inf distance. All shapes are static; queries are chunked over centers so
the (S, N) distance tile stays bounded regardless of point-set size.

Semantics parity notes:
  * `hybrid_query` matches the reference's 'hybrid-t3d' querier
    (reference: network/encoder/utils.py:113-123): take K nearest, then
    replace any neighbor farther than `radius` with the nearest neighbor
    (the first kNN column).
  * padded (invalid) points never appear as neighbors of valid centers:
    their distance is pushed to +inf before top-k (the reference pushes
    them to 3x the coordinate max -- same effect, reference: network/
    encoder/utils.py:49).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# NumPy scalar, not jnp: a module-level jnp constant would initialize the
# device backend at import time (fatal when the TPU link is down and a
# CPU-only caller merely imports this module).
_BIG = np.float32(1e9)

#: When True and running on TPU, neighbor top-k uses the hardware
#: PartialReduce op (jax.lax.approx_max_k, recall ~0.95) instead of a full
#: sort -- ~10x cheaper at production sizes. Max-pooled set abstraction is
#: robust to occasional missed neighbors (the reference's pytorch3d path
#: returns UNSORTED neighbors already, network/encoder/utils.py:95).
#: Exact top_k is always used on CPU so oracle tests stay bit-exact.
APPROX_TOPK_ON_TPU = True


#: PartialReduce recall per non-exact grade: 'fast' (encoder grouping)
#: keeps the round-1-validated 0.95; 'filter' (distance statistics:
#: outlier mean, normal PCA, coherence, 1-NN correspondences) tolerates
#: 0.9 -- measured 1.31% filter-survivor flips vs 1.21% at 0.95, for
#: another ~1.1 ms off the preprocessing chain.
_GRADE_RECALL = {"fast": 0.95, "filter": 0.9}

#: A/B switch: fast/filter-grade knn at fused-kernel-supported shapes
#: (ops/pallas_knn.supported) runs the single-pass Pallas kernel -- the
#: (centers, points) distance tile stays in VMEM instead of being
#: materialized between the distance matmul and top-k. Default OFF:
#: measured on-chip 2026-08-19 (scripts/ab_pallas_knn.py), the win is
#: marginal -- preprocess 6.35->5.88 ms, extract 13.69->13.58, fused
#: odometry 15.15->14.98 (~1%) -- because XLA already fuses the
#: distance tile into approx_max_k well enough that there is little
#: HBM round-trip to save; the shared floor is the K=3 matmul itself.
#: Recall/rounding are at parity with the XLA fast path
#: (tests/test_pallas_knn.py + scripts/check_pallas_knn_tpu.py); flip
#: on where the ~1% matters more than the extra approximation class.
USE_PALLAS_KNN = False


def _fast(grade: str) -> bool:
    """Non-exact grades are TPU-only: CPU (the oracle-test backend) always
    takes the exact path, so grade only changes behavior where the perf
    matters and the deviation is measured (PARITY.md)."""
    return grade in _GRADE_RECALL and jax.default_backend() == "tpu"


def _neighbor_topk(d2: jnp.ndarray, k: int, grade: str = "exact"):
    """Smallest-k along the last axis -> (idx int32, dist2 float32)."""
    if k == 1:
        idx = jnp.argmin(d2, axis=-1).astype(jnp.int32)[:, None]
        return idx, jnp.take_along_axis(d2, idx, axis=-1).astype(jnp.float32)
    if _fast(grade):
        neg, idx = jax.lax.approx_max_k(-d2, k,
                                        recall_target=_GRADE_RECALL[grade])
    elif APPROX_TOPK_ON_TPU and jax.default_backend() == "tpu":
        neg, idx = jax.lax.top_k(-d2, k) if d2.shape[-1] <= 2 * k else \
            jax.lax.approx_max_k(-d2, k, recall_target=0.95)
    else:
        neg, idx = jax.lax.top_k(-d2, k)
    return idx.astype(jnp.int32), (-neg).astype(jnp.float32)


def pairwise_dist2(src: jnp.ndarray, dst: jnp.ndarray,
                   grade: str = "exact") -> jnp.ndarray:
    """Squared euclidean distances (S, N) = |s|^2 - 2 s.d + |d|^2.

    Mirrors the reference's `coordinate_distance` (reference: network/
    encoder/utils.py:288-295). grade='exact' accumulates the cross term
    at HIGHEST (6-pass bf16 = full f32); grade='fast' (TPU only) uses
    HIGH (3-pass bf16, ~1e-5 relative rounding) -- rank-safe, only
    near-tie neighbor RANKINGS can flip, and gathered values stay f32."""
    if _fast(grade):
        # 3-pass bf16 (HIGH) rather than single-pass: raw coordinates span
        # +-60 m, and single-pass bf16 input rounding (2^-8 relative =
        # ~0.2 m) scrambles sub-meter neighbor ranking outright (measured
        # 9% filter-survivor flips); HIGH keeps ~1 mm effective rounding
        # at half the cost of the 6-pass HIGHEST
        cross = jnp.dot(src, dst.T, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGH)
    else:
        cross = jnp.dot(src, dst.T, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
    s2 = jnp.sum(src.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
    d2 = jnp.sum(dst.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
    return s2 - 2.0 * cross + d2.T


def _masked_dist2(centers, points, points_valid, grade: str = "exact"):
    d2 = pairwise_dist2(centers, points, grade)
    d2 = jnp.where(points_valid[None, :], d2, _BIG)
    # bf16 ranking halves the PartialReduce's HBM traffic; distances are
    # returned to callers as float32 (of bf16-rounded values) either way
    return d2.astype(jnp.bfloat16) if _fast(grade) else d2


def knn(
    points: jnp.ndarray,        # (N, 3)
    centers: jnp.ndarray,       # (S, 3)
    k: int,
    points_valid: jnp.ndarray,  # (N,) bool
    center_chunk: int = 2048,
    grade: str = "exact",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """K nearest valid points for each center.

    Returns (idx (S, k) int32 ascending-by-distance, dist2 (S, k) float32).
    Chunked over centers to bound the live distance tile at
    (center_chunk, N) floats. grade='fast' (TPU only): HIGH-precision
    distances + bf16 top-k ranking (recall 0.95), ~2x cheaper at
    production sizes
    -- for distance-statistics consumers (filters, correspondence search),
    not for anything needing exact neighbor sets.

    Caveat: if fewer than k valid points exist, the trailing neighbors are
    invalid indices carrying the +inf sentinel distance; callers must either
    guarantee k <= n_valid or filter on dist2 (hybrid_query's radius clamp
    already does).
    """
    s = centers.shape[0]
    if _fast(grade) and USE_PALLAS_KNN:
        from deeppointmap_tpu.ops import pallas_knn
        if pallas_knn.supported(points.shape[0], s) and k <= 512:
            idx, dist2 = pallas_knn.fused_knn_moments(
                points, points_valid, centers, k)
            return idx, dist2

    if s <= center_chunk:
        return _neighbor_topk(
            _masked_dist2(centers, points, points_valid, grade), k, grade)

    assert s % center_chunk == 0, (s, center_chunk)
    chunks = centers.reshape(s // center_chunk, center_chunk, 3)
    idx, dist2 = jax.lax.map(
        lambda c: _neighbor_topk(
            _masked_dist2(c, points, points_valid, grade), k, grade),
        chunks)
    return idx.reshape(s, k), dist2.reshape(s, k)


def ball_query(
    points: jnp.ndarray,        # (N, 3)
    centers: jnp.ndarray,       # (S, 3)
    k: int,
    radius: float,
    points_valid: jnp.ndarray,  # (N,) bool
    center_chunk: int = 2048,
) -> jnp.ndarray:
    """First-k-within-radius semantics (reference python fallback:
    network/encoder/utils.py:57-73): neighbors are the k lowest-INDEX
    valid points inside the ball; out-of-ball slots repeat the first
    in-ball neighbor. Returns idx (S, k) int32.

    Implemented as top-k over (in_ball, -index) lexicographic scores so
    shapes stay static."""
    n = points.shape[0]
    d2 = _masked_dist2(centers, points, points_valid)
    in_ball = d2 <= (radius * radius)
    # score: in-ball points rank above all others, ties by ascending index
    idx_f = jnp.arange(n, dtype=jnp.float32)
    score = jnp.where(in_ball, -idx_f, -jnp.float32(2 * n) - idx_f)
    _, idx = jax.lax.top_k(score, k)                       # (S, k)
    first = idx[:, :1]
    picked_in = jnp.take_along_axis(in_ball, idx, axis=1)
    return jnp.where(picked_in, idx, first).astype(jnp.int32)


def hybrid_query(
    points: jnp.ndarray,        # (N, 3)
    centers: jnp.ndarray,       # (S, 3)
    k: int,
    radius: float,
    points_valid: jnp.ndarray,  # (N,) bool
    center_chunk: int = 2048,
    grade: str = "exact",
) -> jnp.ndarray:
    """kNN then clamp-to-radius: neighbors beyond `radius` are replaced by
    the nearest neighbor. Returns idx (S, k) int32."""
    idx, dist2 = knn(points, centers, k, points_valid, center_chunk, grade)
    nearest = idx[:, :1]
    out_of_ball = dist2 > (radius * radius)
    return jnp.where(out_of_ball, nearest, idx)


@functools.partial(jax.jit, static_argnames=("k", "center_chunk", "grade"))
def batched_knn(points, centers, k, points_valid, center_chunk=2048,
                grade="exact"):
    """(B, N, 3) x (B, S, 3) -> (B, S, k) idx + dist2, vmapped."""
    return jax.vmap(lambda p, c, v: knn(p, c, k, v, center_chunk, grade))(
        points, centers, points_valid)


def group_points(values: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather neighbor values: values (N, C), idx (S, K) -> (S, K, C).

    Replaces the reference's `index_points` (reference: network/encoder/
    utils.py:346-355).
    """
    return jnp.take(values, idx, axis=0)
