"""Fused distance + top-k (+ radius moments) Pallas TPU kernel.

The hot neighbor queries (encoder SA/level self-kNN, preprocessing
filter sweep -- reference hot loop: network/encoder/utils.py:91-123)
are bandwidth-bound in the XLA path: the (centers, points) distance
tile is materialized to HBM between the distance matmul and its two
consumers (top-k ranking and the radius-moment matmul) -- ~2 GB of
round trips per 16384-point scan (artifacts/mfu_report.json: extract
runs at 65.7% HBM util, 0.39% MFU). This kernel keeps every
(center_block, point_tile) distance tile in VMEM and emits only
reduced results.

Lessons from the first fused attempt (ops/pallas_sweep.py, measured
+4.4 ms on-chip in round 4) baked into this design:

  * **Packed keys, not value/index register pairs.** Distances are
    non-negative f32, so their IEEE bits sort like integers. Each
    candidate is packed as `(dist_bits & ~0x3FFF) | point_index`
    (14 index bits; distances keep 1+8+9 bits = strictly tighter than
    the bf16 ranking the XLA fast grade already uses, PARITY.md).
    Selection then is plain integer `min` -- no 6-way select insertion
    per stride class.
  * **Halving folds.** A (CB, PT) key tile folds to (CB, 512) with two
    pairwise mins (0.75 VPU ops/element) instead of an unrolled
    16-step per-class insertion. Classes are `index mod 512`: a true
    neighbor is lost only when two of the k nearest share a class
    (expected recall ~0.97 at k=33, ~0.99 at k=17 -- at or above the
    XLA fast grade's approx_max_k recall_target=0.95; LiDAR scan-order
    adjacency maps neighbors to distinct classes, so real scans beat
    the random bound).
  * **3-pass hi/lo bf16 matmuls** (== the XLA fast grade's
    Precision.HIGH), not Mosaic's 6-pass HIGHEST: the center operand
    is pre-scaled by -2 outside the kernel, so the in-kernel distance
    is one matmul sum plus two broadcast adds.
  * **Validity folded into |p|^2.** Invalid points carry
    |p|^2 + 1e9, so they sort after every valid point AND fail the
    radius-membership test with zero per-element masking ops (the
    sentinel matches ops/neighbors._BIG).
  * **Per-point features precomputed once in XLA** ((N, 10) hi/lo
    bf16), not rebuilt per grid program.

Moments contract matches ops/normals.filter_sweep: membership decided
on the f32 (HIGH-precision) distances, accumulated as exact bf16
products of hi/lo-split features (numerically tighter than HIGH).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: centers per grid program / points per inner tile
_CENTER_BLOCK = 256
_POINT_TILE = 2048
#: candidate classes (point index mod _N_CLASSES keeps one winner)
_N_CLASSES = 512
#: low bits reserved for the point index (16384 = 2**14 max points)
_IDX_BITS = 14
_IDX_MASK = (1 << _IDX_BITS) - 1
#: invalid-point distance sentinel (== ops.neighbors._BIG)
_FAR = 1e9


def _hi_lo(x: jnp.ndarray):
    """Split f32 into bf16 hi + bf16 lo with x ~= hi + lo.

    The hi part MUST go through lax.reduce_precision: a plain
    `x.astype(bf16).astype(f32)` round-trip is legally cancelled by
    XLA's excess-precision pass under jit (measured: the lo terms
    collapse to zero and the kernel's distances go off by +-20),
    whereas reduce_precision is a real rounding HLO that survives."""
    hi = jax.lax.reduce_precision(x, exponent_bits=8, mantissa_bits=7)
    return hi.astype(jnp.bfloat16), (x - hi).astype(jnp.bfloat16)


def _packed_far() -> int:
    import numpy as np

    bits = int(np.float32(_FAR).view(np.int32))
    return (bits & ~_IDX_MASK) | _IDX_MASK


def _knn_kernel(chi_ref, clo_ref, c2_ref, phi_ref, plo_ref, p2_ref,
                fh_ref, fl_ref, best_ref, mom_ref, *,
                r2: float, n_tiles: int, do_moments: bool):
    """One (CB,) center block vs all points, tiled over the point axis.

    chi/clo: (CB, 3) bf16 hi/lo split of -2 * centers
    c2:      (CB, 1) f32 |c|^2
    phi/plo: (N, 3) bf16 hi/lo split of points
    p2:      (1, N) f32 |p|^2 + (valid ? 0 : 1e9)
    fh/fl:   (N, 10) bf16 hi/lo split of [1 | p | p6] moment features
    best:    (CB, _N_CLASSES) packed int32 -- per-class min key
    mom:     (CB, 10) f32 accumulated [cnt | s | S6]
    """
    chi = chi_ref[:]
    clo = clo_ref[:]
    c2 = c2_ref[:]                                      # (CB, 1)
    cb = chi.shape[0]
    pt = _POINT_TILE
    col = jax.lax.broadcasted_iota(jnp.int32, (cb, pt), 1)

    def body(t, carry):
        best, acc = carry
        ph = phi_ref[pl.ds(t * pt, pt), :]              # (PT, 3) bf16
        plo = plo_ref[pl.ds(t * pt, pt), :]
        p2 = p2_ref[:, pl.ds(t * pt, pt)]               # (1, PT) f32
        # 3-pass hi/lo == Precision.HIGH; -2 pre-folded into chi/clo
        cross = (
            jnp.dot(chi, ph.T, preferred_element_type=jnp.float32)
            + jnp.dot(chi, plo.T, preferred_element_type=jnp.float32)
            + jnp.dot(clo, ph.T, preferred_element_type=jnp.float32))
        # clamp to >= 0: the 3-pass rounding can push near-zero true
        # distances negative, and negative floats sort REVERSED under
        # the signed-int key compare (bits of -1e-6 < bits of -0.05 as
        # int32), which broke ascending decode among coincident points
        # (measured inversions up to 0.074 m^2 on real scans)
        d2 = jnp.maximum(cross + c2 + p2, 0.0)          # (CB, PT) f32
        if do_moments:
            w16 = (d2 <= r2).astype(jnp.bfloat16)
            fh = fh_ref[pl.ds(t * pt, pt), :]           # (PT, 10) bf16
            fl = fl_ref[pl.ds(t * pt, pt), :]
            acc = (acc
                   + jnp.dot(w16, fh, preferred_element_type=jnp.float32)
                   + jnp.dot(w16, fl, preferred_element_type=jnp.float32))
        key = ((pltpu.bitcast(d2, jnp.int32)
                & jnp.int32(~_IDX_MASK)) | (col + t * pt))
        k1 = jnp.minimum(key[:, :pt // 2], key[:, pt // 2:])
        k2 = jnp.minimum(k1[:, :pt // 4], k1[:, pt // 4:])
        best = jnp.minimum(best, k2)                    # (CB, 512)
        return best, acc

    best0 = jnp.full((cb, _N_CLASSES), _packed_far(), jnp.int32)
    acc0 = jnp.zeros((cb, 10), jnp.float32)
    best, acc = jax.lax.fori_loop(0, n_tiles, body, (best0, acc0))
    best_ref[:] = best
    mom_ref[:] = acc


def supported(n_points: int, n_centers: int) -> bool:
    """Static-shape condition: pad-free tiling + index fits 14 bits."""
    return (n_points % _POINT_TILE == 0
            and n_points <= (1 << _IDX_BITS)
            and n_centers % _CENTER_BLOCK == 0)


@functools.partial(jax.jit,
                   static_argnames=("k", "radius", "interpret"))
def fused_knn_moments(points: jnp.ndarray, valid: jnp.ndarray,
                      centers: jnp.ndarray, k: int, radius: float = 0.0,
                      interpret: bool = False):
    """Approximate k-nearest valid points for each center, fused with
    optional radius moments over the same distance pass.

    points (N, 3), valid (N,) bool, centers (S, 3) ->
      idx (S, k) i32 ascending, dist2 (S, k) f32
      [, cnt (S,), s (S, 3), S6 (S, 6)  when radius > 0 -- requires
       centers IS points semantically (moments are per-center)].

    dist2 carries the packed rounding (9 mantissa bits, rounded down,
    ~0.2% -- tighter than the fast grade's bf16 ranking) and the _FAR
    sentinel for missing neighbors, matching ops.neighbors.knn's
    fast-grade contract.
    """
    n = points.shape[0]
    s = centers.shape[0]
    assert supported(n, s), (n, s)
    assert 0 < k <= _N_CLASSES, k
    pf = points.astype(jnp.float32)
    cf = centers.astype(jnp.float32)

    p_hi, p_lo = _hi_lo(pf)
    p2v = (jnp.sum(pf * pf, axis=1)
           + jnp.where(valid, 0.0, jnp.float32(_FAR)))[None, :]  # (1, N)
    c_hi, c_lo = _hi_lo(-2.0 * cf)
    c2 = jnp.sum(cf * cf, axis=1, keepdims=True)                 # (S, 1)
    x, y, z = pf[:, 0:1], pf[:, 1:2], pf[:, 2:3]
    feats = jnp.concatenate(
        [jnp.ones_like(x), pf, x * x, x * y, x * z, y * y, y * z, z * z],
        axis=1)                                                  # (N, 10)
    f_hi, f_lo = _hi_lo(feats)

    kernel = functools.partial(
        _knn_kernel, r2=float(radius) ** 2 if radius > 0 else -1.0,
        n_tiles=n // _POINT_TILE, do_moments=radius > 0)
    resident = lambda i: (0, 0)                                  # noqa: E731
    blocked = lambda i: (i, 0)                                   # noqa: E731
    best, mom = pl.pallas_call(
        kernel,
        grid=(s // _CENTER_BLOCK,),
        in_specs=[
            pl.BlockSpec((_CENTER_BLOCK, 3), blocked,
                         memory_space=pltpu.VMEM),               # c_hi
            pl.BlockSpec((_CENTER_BLOCK, 3), blocked,
                         memory_space=pltpu.VMEM),               # c_lo
            pl.BlockSpec((_CENTER_BLOCK, 1), blocked,
                         memory_space=pltpu.VMEM),               # c2
            pl.BlockSpec((n, 3), resident,
                         memory_space=pltpu.VMEM),               # p_hi
            pl.BlockSpec((n, 3), resident,
                         memory_space=pltpu.VMEM),               # p_lo
            pl.BlockSpec((1, n), resident,
                         memory_space=pltpu.VMEM),               # p2v
            pl.BlockSpec((n, 10), resident,
                         memory_space=pltpu.VMEM),               # f_hi
            pl.BlockSpec((n, 10), resident,
                         memory_space=pltpu.VMEM),               # f_lo
        ],
        out_specs=[
            pl.BlockSpec((_CENTER_BLOCK, _N_CLASSES), blocked,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_CENTER_BLOCK, 10), blocked,
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((s, _N_CLASSES), jnp.int32),
            jax.ShapeDtypeStruct((s, 10), jnp.float32),
        ],
        interpret=interpret,
    )(c_hi, c_lo, c2, p_hi, p_lo, p2v, f_hi, f_lo)

    # exact top-k over the 512 per-class winners (XLA, 1/32 the input);
    # packed keys are non-negative (< 2^31) so negation is overflow-safe
    negtop, _ = jax.lax.top_k(-best, k)
    keys = -negtop                                      # ascending keys
    idx = keys & _IDX_MASK
    dist2 = jax.lax.bitcast_convert_type(
        keys & jnp.int32(~_IDX_MASK), jnp.float32)
    out = (idx, dist2)
    if radius > 0:
        out = out + (jnp.maximum(mom[:, 0], 1.0), mom[:, 1:4],
                     mom[:, 4:10])
    return out
