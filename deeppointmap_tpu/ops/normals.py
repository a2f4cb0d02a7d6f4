"""Surface normal estimation on device (batched analytic 3x3 eigensolver).

The reference estimates normals with Open3D's C++ KD-tree + PCA
(reference: dataloader/transforms.py:271). Here: kNN neighborhoods via the
tiled distance kernel, covariance per point, and the smallest eigenvector
from the closed-form trigonometric eigenvalue solution for symmetric 3x3
matrices (Eberly / Smith) -- fully vectorized, no lax.while, no LAPACK.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from deeppointmap_tpu.ops.neighbors import knn


def smallest_eigvec_3x3(C: jnp.ndarray) -> jnp.ndarray:
    """Unit eigenvector of the smallest eigenvalue for symmetric (..., 3, 3)
    matrices. Closed-form eigenvalues + cross-product eigenvector
    extraction; degenerate (isotropic) neighborhoods fall back to +z."""
    C = C.astype(jnp.float32)
    tr = jnp.trace(C, axis1=-2, axis2=-1)
    q = tr / 3.0
    A = C - q[..., None, None] * jnp.eye(3, dtype=C.dtype)
    p2 = jnp.sum(A * A, axis=(-2, -1)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, 1e-20))
    B = A / p[..., None, None]
    detB = jnp.linalg.det(B)
    phi = jnp.arccos(jnp.clip(detB / 2.0, -1.0, 1.0)) / 3.0
    # eigenvalues: eig1 >= eig2 >= eig3
    eig3 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)

    # eigenvector of eig3: cross product of two rows of (C - eig3 I)
    M = C - eig3[..., None, None] * jnp.eye(3, dtype=C.dtype)
    r0, r1, r2 = M[..., 0, :], M[..., 1, :], M[..., 2, :]
    c01 = jnp.cross(r0, r1)
    c02 = jnp.cross(r0, r2)
    c12 = jnp.cross(r1, r2)
    n01 = jnp.sum(c01 * c01, axis=-1)
    n02 = jnp.sum(c02 * c02, axis=-1)
    n12 = jnp.sum(c12 * c12, axis=-1)
    # pick the most numerically stable cross product
    best = jnp.argmax(jnp.stack([n01, n02, n12], axis=-1), axis=-1)
    v = jnp.where((best == 0)[..., None], c01,
                  jnp.where((best == 1)[..., None], c02, c12))
    norm = jnp.sqrt(jnp.maximum(jnp.sum(v * v, axis=-1, keepdims=True),
                                1e-20))
    v = v / norm
    # isotropic fallback (p ~ 0): any direction is an eigenvector
    iso = (p2 < 1e-12)[..., None]
    up = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], C.dtype), v.shape)
    return jnp.where(iso, up, v)


def estimate_normals(xyz: jnp.ndarray, valid: jnp.ndarray,
                     radius: float, max_nn: int = 30,
                     neighbors=None, neighbor_xyz=None) -> jnp.ndarray:
    """Unit normals (N, 3) via PCA over radius-capped kNN neighborhoods.
    Invalid points get the +z fallback (they are masked downstream).
    `neighbors` = precomputed (idx, dist2) with >= max_nn columns lets
    callers share one kNN pass across stages; `neighbor_xyz` additionally
    skips the (N, K, 3) coordinate gather when the caller already has it
    (gathers are a measurable share of the preprocessing budget)."""
    if neighbors is None:
        idx, dist2 = knn(xyz, xyz, max_nn, valid)
    else:
        idx, dist2 = neighbors
        idx, dist2 = idx[:, :max_nn], dist2[:, :max_nn]
    w = (dist2 <= radius * radius)                      # (N, K)
    w = w.at[:, 0].set(True)
    nbr = jnp.take(xyz, idx, axis=0) if neighbor_xyz is None \
        else neighbor_xyz[:, :max_nn]                   # (N, K, 3)
    wf = w.astype(jnp.float32)[..., None]
    cnt = jnp.maximum(jnp.sum(wf, axis=1), 1.0)
    mean = jnp.sum(nbr * wf, axis=1, keepdims=True) / cnt[:, None]
    cen = (nbr - mean) * wf
    cov = jnp.einsum("nki,nkj->nij", cen, cen,
                     preferred_element_type=jnp.float32)
    return smallest_eigvec_3x3(cov)
