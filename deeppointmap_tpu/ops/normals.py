"""Surface normal estimation on device (batched analytic 3x3 eigensolver).

The reference estimates normals with Open3D's C++ KD-tree + radius-PCA
(KDTreeSearchParamRadius, no neighbor cap -- reference: dataloader/
transforms.py:271). Here `radius_normals` reproduces those semantics as
masked MXU moment accumulations over chunked distance tiles (no top-k, no
gathers), and the smallest eigenvector comes from the closed-form
trigonometric eigenvalue solution for symmetric 3x3 matrices
(Eberly / Smith) -- fully vectorized, no lax.while, no LAPACK.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from deeppointmap_tpu.ops.neighbors import (_fast, _neighbor_topk,
                                            pairwise_dist2)

#: A/B switch for the fused Pallas radius-moments kernel (TPU fast
#: grades only). Default OFF: the kernel is 40-70x more accurate vs f64
#: truth than the XLA sweep (scripts/check_pallas_moments_tpu.py) but
#: costs +2.2 ms in the fused odometry step, because the combined
#: XLA sweep shares ONE distance pass between top-k and moments while
#: the kernel must recompute distances (measured 2026-08-17, fused step
#: 16.8 ms -> 19.0 ms). Flip on for accuracy-critical offline use.
USE_PALLAS_MOMENTS = False

#: A/B switch for the merged fast-grade moment accumulation (ONE
#: bf16-mask matmul over hi/lo-split features vs cnt-sum + two 3-pass
#: HIGH matmuls). Default ON; the off position exists for profiling.
USE_MERGED_MOMENTS = True

#: A/B switch for the FULLY fused sweep (ops/pallas_sweep.py): distance
#: pass + top-k candidates + radius moments in one Pallas kernel, no
#: (C, N) HBM tile between them, and the moments at the Pallas kernel's
#: HIGHEST accuracy. OFF until TPU-validated (flip after a real-chip
#: oracle + profile run; the XLA merged sweep below stays the fallback).
USE_PALLAS_SWEEP = False


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


def _p6(pts: jnp.ndarray) -> jnp.ndarray:
    """Second-moment features [xx xy xz yy yz zz] (N, 6)."""
    return jnp.stack([pts[:, 0] * pts[:, 0], pts[:, 0] * pts[:, 1],
                      pts[:, 0] * pts[:, 2], pts[:, 1] * pts[:, 1],
                      pts[:, 1] * pts[:, 2], pts[:, 2] * pts[:, 2]],
                     axis=1)


def accumulate_radius_moments(w: jnp.ndarray, pts: jnp.ndarray,
                              p6: jnp.ndarray):
    """Masked first/second moment accumulators from a radius-membership
    tile w (C, N): cnt (C,), s = w @ p (C, 3), S6 = w @ p6 (C, 6). The
    matmuls run 3-pass-bf16 (HIGH) with f32 inputs -- single-pass bf16
    would round the +-60 m coordinates to ~0.2 m and destroy the
    covariance signal."""
    cnt = jnp.maximum(jnp.sum(w, axis=1), 1.0)
    s = jnp.dot(w, pts, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGH)
    S6 = jnp.dot(w, p6, preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGH)
    return cnt, s, S6


def normals_from_moments(c: jnp.ndarray, cnt: jnp.ndarray, s: jnp.ndarray,
                         S6: jnp.ndarray) -> jnp.ndarray:
    """Smallest-eigenvector normals from radius moments, with the
    covariance recovered CENTERED AT EACH CENTER c,

        sum_w (p - c)(p - c)^T = S6 - s c^T - c s^T + cnt * c c^T,

    so the big E[pp^T] ~ |p|^2 terms cancel analytically instead of
    numerically (a naive E[pp^T] - mu mu^T at f32 loses the sub-meter
    covariance signal at +-60 m coordinates)."""
    c = c.astype(jnp.float32)
    ii, jj = jnp.triu_indices(3)
    Sm = jnp.zeros((c.shape[0], 3, 3), jnp.float32)
    Sm = Sm.at[:, ii, jj].set(S6).at[:, jj, ii].set(S6)
    cen = Sm - s[:, :, None] * c[:, None, :] \
        - c[:, :, None] * s[:, None, :] \
        + cnt[:, None, None] * (c[:, :, None] * c[:, None, :])
    mu_c = s / cnt[:, None] - c
    cov = cen / cnt[:, None, None] - mu_c[:, :, None] * mu_c[:, None, :]
    return smallest_eigvec_3x3(cov)


def filter_sweep(pts, valid, k: int, radius: float, grade: str,
                 center_chunk: int = 2048):
    """ONE chunked P x P distance sweep serving the preprocessing filter
    stages: the top-k neighbor graph (outlier means + coherence indices)
    and the radius-PCA moment accumulators for normals (cnt, s, S6).
    Computing these in the same pass halves the N^2 distance work vs
    separate kNN + radius sweeps. Radius membership is decided on the
    f32 distances BEFORE any bf16 ranking cast, so normal neighborhoods
    are grade-stable. k = 0 skips the top-k (moments only -> (cnt, s,
    S6)); radius <= 0 skips the moments (-> (idx, dist2))."""
    assert k > 0 or radius > 0, "filter_sweep with nothing to compute"
    n = pts.shape[0]
    pts = pts.astype(jnp.float32)

    if k > 0 and _fast(grade):
        # fused single-pass kernel (ops/pallas_knn.py): distance tile
        # stays in VMEM across BOTH consumers (top-k and moments)
        from deeppointmap_tpu.ops import neighbors, pallas_knn
        if (neighbors.USE_PALLAS_KNN and pallas_knn.supported(n, n)
                and k <= 512):
            return pallas_knn.fused_knn_moments(
                pts, valid, pts, k, radius if radius > 0 else 0.0)

    if k > 0 and _fast(grade) and USE_PALLAS_SWEEP:
        from deeppointmap_tpu.ops import pallas_sweep

        if pallas_sweep.supported(n) and k <= 128:
            return pallas_sweep.fused_sweep_pallas(
                pts, valid, k, radius if radius > 0 else 0.0)

    if radius > 0 and _fast(grade) and USE_PALLAS_MOMENTS:
        # fused Pallas moments: the (C, N) membership mask never touches
        # HBM (ops/pallas_moments.py). _fast() gates to TPU; the
        # fallback below remains the CPU/oracle semantics.
        from deeppointmap_tpu.ops.pallas_moments import (
            radius_moments_pallas, supported)
        if supported(n):
            moments = radius_moments_pallas(pts, valid, radius)
            if k == 0:
                return moments
            return filter_sweep(pts, valid, k, 0.0, grade,
                                center_chunk) + moments

    p6 = _p6(pts) if radius > 0 else None
    merged = _fast(grade) and USE_MERGED_MOMENTS
    if radius > 0 and merged:
        # merged-moments operands (see the fast branch in one()): the ten
        # features [1 | p | p6] split hi/lo so both matmul passes run
        # single-pass bf16 with EXACT products (8+8 mantissa bits < f32's
        # 24; the 0/1 mask side is exact in bf16 by construction)
        feats = jnp.concatenate(
            [jnp.ones((n, 1), jnp.float32), pts, p6], axis=1)   # (N, 10)
        f_hi = feats.astype(jnp.bfloat16)
        f_lo = (feats - f_hi.astype(jnp.float32)).astype(jnp.bfloat16)

    def one(c_block):
        d2 = pairwise_dist2(c_block, pts, grade)
        d2m = jnp.where(valid[None, :], d2, jnp.float32(1e9))
        out = ()
        if k > 0:
            rank = d2m.astype(jnp.bfloat16) if _fast(grade) else d2m
            out = _neighbor_topk(rank, k, grade)
        if radius > 0:
            if merged:
                # ONE fused accumulation instead of cnt-sum + two 3-pass
                # HIGH matmuls: the f32 mask tile was the sweep's largest
                # HBM consumer (read 5+ times per chunk); here it lives
                # once as bf16 and the result is numerically TIGHTER than
                # HIGH (products exact, only f32 accumulation rounding)
                w16 = (d2m <= radius * radius).astype(jnp.bfloat16)
                m = (jnp.dot(w16, f_hi, preferred_element_type=jnp.float32)
                     + jnp.dot(w16, f_lo,
                               preferred_element_type=jnp.float32))
                out = out + (jnp.maximum(m[:, 0], 1.0), m[:, 1:4],
                             m[:, 4:10])
            else:
                w = (d2m <= radius * radius).astype(jnp.float32)
                out = out + accumulate_radius_moments(w, pts, p6)
        return out

    if n <= center_chunk:
        return one(pts)
    assert n % center_chunk == 0, (n, center_chunk)
    chunks = pts.reshape(n // center_chunk, center_chunk, 3)
    outs = jax.lax.map(one, chunks)
    return tuple(o.reshape(n, *o.shape[2:]) for o in outs)


def radius_normals(xyz: jnp.ndarray, valid: jnp.ndarray, radius: float,
                   center_chunk: int = 2048,
                   grade: str = "exact") -> jnp.ndarray:
    """Unit normals (N, 3) via PCA over ALL valid points within `radius`
    -- the reference's exact semantics (Open3D KDTreeSearchParamRadius,
    no neighbor cap; reference: dataloader/transforms.py:271).

    TPU-first formulation: no top-k and no gathers. Per center chunk the
    masked distance tile directly drives five MXU accumulations
    (count = w @ 1, s = w @ p, S6 = w @ [xx xy xz yy yz zz]), and the
    covariance is recovered CENTERED AT EACH CENTER c,

        sum_w (p - c)(p - c)^T = S6 - s c^T - c s^T + cnt * c c^T,

    so the big E[pp^T] ~ |p|^2 terms cancel analytically instead of
    numerically (raw scan coords reach +-60 m; a naive E[pp^T] - mu mu^T
    at f32 loses the sub-meter covariance signal). grade='fast'/'filter'
    uses 3-pass-bf16 (HIGH) matmuls for the distance tile; the
    accumulation matmuls always run HIGH with f32 inputs.

    Invalid points get the +z fallback (masked downstream)."""
    assert radius > 0, radius
    moments = filter_sweep(xyz, valid, 0, radius, grade, center_chunk)
    return normals_from_moments(xyz.astype(jnp.float32), *moments)
