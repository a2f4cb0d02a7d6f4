"""6x6 information matrix for pose-graph edges (JAX, on-device).

Re-implements `calculate_information_matrix_from_pcd` (reference:
system/modules/utils.py:60-113): transform the source cloud by the
estimated SE3, find 1-NN correspondences in the target within 1 m, and
accumulate the Gauss-Newton normal matrix G^T G over the matched *target*
points. The accumulation is expressed as one (6, K) @ (K, 6) matmul on the
MXU instead of the reference's per-point outer-product loop.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from deeppointmap_tpu.ops.neighbors import knn


def _gtg(t: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """G^T G over matched target points t (K, 3), mask (K,) bool.

    Per point the three Jacobian rows are
        [0, z, -y, 1, 0, 0], [-z, 0, x, 0, 1, 0], [y, -x, 0, 0, 0, 1]
    (reference: system/modules/utils.py:88-103).
    """
    k = t.shape[0]
    x, y, z = t[:, 0], t[:, 1], t[:, 2]
    zeros = jnp.zeros((k,), dtype=t.dtype)
    ones = jnp.ones((k,), dtype=t.dtype)
    g1 = jnp.stack([zeros, z, -y, ones, zeros, zeros], axis=1)
    g2 = jnp.stack([-z, zeros, x, zeros, ones, zeros], axis=1)
    g3 = jnp.stack([y, -x, zeros, zeros, zeros, ones], axis=1)
    G = jnp.concatenate([g1, g2, g3], axis=0)            # (3K, 6)
    m = jnp.tile(mask.astype(t.dtype), 3)[:, None]       # (3K, 1)
    Gm = G * m
    return jnp.dot(Gm.T, Gm, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)


@functools.partial(jax.jit,
                   static_argnames=("center_chunk", "grade", "stride"))
def information_matrix(
    src: jnp.ndarray,        # (N, 3) source points
    src_valid: jnp.ndarray,  # (N,) bool
    dst: jnp.ndarray,        # (M, 3) target points
    dst_valid: jnp.ndarray,  # (M,) bool
    R: jnp.ndarray,          # (3, 3)
    t: jnp.ndarray,          # (3,) or (3, 1)
    radius: float = 1.0,
    center_chunk: int = 2048,
    grade: str = "exact",
    stride: int = 1,
) -> jnp.ndarray:
    """Returns the 6x6 information matrix (float32).

    stride > 1 estimates G^T G from every stride-th SOURCE point and
    rescales by `stride` (an unbiased estimate of the full sum): the
    1-NN correspondence sweep is the second-largest N^2 cost of the
    fused odometry call, and the matrix is a 6x6 statistic whose
    relative eigenstructure is stable to ~1/sqrt(N/stride) sampling
    noise (~1-2% at production sizes; tests/test_ops.py pins it).
    stride=1 keeps the reference-exact full accumulation
    (reference: system/modules/utils.py:60-113)."""
    if stride > 1:
        src = src[::stride]
        src_valid = src_valid[::stride]
    moved = src @ R.T + t.reshape(1, 3)
    # fast grade: the 1-NN correspondence search feeds a statistical
    # accumulation (G^T G) gated at 1 m; a near-tie correspondence flip
    # changes nothing measurable, and the full-sweep argmin is the
    # second-largest N^2 cost of the fused odometry call
    n = moved.shape[0]
    # keep knn's even-chunk invariant for any stride (power-of-2 strides
    # divide cleanly; odd leftovers fall back to one (n, M) tile)
    chunk = center_chunk if n % center_chunk == 0 else n
    idx, dist2 = knn(dst, moved, 1, dst_valid, center_chunk=chunk,
                     grade=grade)
    idx, dist2 = idx[:, 0], dist2[:, 0]
    mask = (dist2 <= radius * radius) & src_valid
    corres = jnp.take(dst, idx, axis=0)                  # (N, 3)
    out = _gtg(corres.astype(jnp.float32), mask)
    return out * jnp.float32(stride) if stride > 1 else out
