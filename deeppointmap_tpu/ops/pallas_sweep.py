"""Fully fused preprocessing sweep as one Pallas TPU kernel:
distances + approximate top-k candidates + radius-PCA moments.

The XLA `filter_sweep` (ops/normals.py) already shares ONE distance pass
between the top-k neighbor graph and the radius moments, but the
(center_chunk, N) distance tile feeds two consumers (approx_max_k and
the moments matmul), so XLA materializes it in HBM — ~1 GB of round
trips per 16384-point scan, the dominant cost of the preprocessing
chain. This kernel keeps every (center_block, point_tile) distance tile
in VMEM and emits only the reduced results:

  * moments (N, 10) f32 — identical contract to
    ops/pallas_moments.radius_moments_pallas (HIGHEST cross terms, f32
    membership BEFORE any ranking cast), i.e. the ACCURATE moments that
    were previously a +2.2 ms option are now free;
  * top-k candidates (N, 256) f32 distances + (N, 256) i32 indices —
    the running best-TWO per stride class (point index mod 128), merged
    across all point tiles in registers.

Stride-class reduction is this kernel's analogue of the XLA fast
grade's `jax.lax.approx_max_k` (recall_target 0.95): with two slots per
index-mod-128 class a true neighbor is lost only when THREE of the k
nearest share a class (measured recall 0.97+ at k=17/33 on random
clouds; scan-order adjacency maps to DISTINCT classes, so the common
LiDAR case is better than the random bound). The final exact
`lax.top_k` over the 256 candidates runs in XLA on an (N, 256) array —
1/64th of the original reduction input.

Replaces the fast-grade sweep in data/preprocess.py (reference
semantics: statistical outlier removal + normal-coherence low-pass +
Open3D radius-PCA normals, reference: dataloader/transforms.py:230-297);
the `exact` grade keeps the XLA path for oracles.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: centers per grid program / points per inner tile — matches
#: ops/pallas_moments.py; every live tile stays ~2 MB so Mosaic
#: double-buffers inside the 16 MB VMEM budget.
_CENTER_BLOCK = 256
_POINT_TILE = 2048
#: one candidate per point-index-mod-128 stride class (= lane width)
_N_CLASSES = 128

#: ranking sentinel for invalid points (plain float: a jnp scalar would
#: be captured as a pallas_call constant, which Mosaic rejects)
_FAR = 1e9


def _sweep_kernel(pts_ref, vf_ref, c_ref, mom_ref, val_ref, idx_ref, *,
                  r2: float, n_tiles: int, do_moments: bool):
    """pts (N, 3) + validity (N, 1) resident; c_ref = this program's
    (CB, 3) center block. Outputs: mom (CB, 10) = [cnt | s | S6],
    val/idx (CB, 128) = per-stride-class min distance + its index."""
    c = c_ref[:]                                        # (CB, 3)
    c2 = jnp.sum(c * c, axis=1, keepdims=True)          # (CB, 1)
    pt = pts_ref.shape[0] // n_tiles
    n_strides = pt // _N_CLASSES
    cb = c.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (cb, _N_CLASSES), 1)

    def body(t, carry):
        acc, bval = carry
        p = pts_ref[pl.ds(t * pt, pt), :]               # (PT, 3)
        vf = vf_ref[pl.ds(t * pt, pt), :]               # (PT, 1)
        # Mosaic lowers only DEFAULT/HIGHEST dot precisions; HIGHEST is
        # strictly tighter than the XLA path's HIGH and K=3 keeps the
        # extra passes free
        cross = jnp.dot(c, p.T, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
        p2 = jnp.sum(p * p, axis=1, keepdims=True)      # (PT, 1)
        d2 = c2 - 2.0 * cross + p2.T                    # (CB, PT) f32
        vrow = vf.T                                     # (1, PT)
        if do_moments:
            # membership decided on the f32 distances (grade-stable
            # normals), accumulation exact on the 0/1 mask side
            w = jnp.where(d2 <= r2, vrow, 0.0)
            x, y, z = p[:, 0:1], p[:, 1:2], p[:, 2:3]
            feats = jnp.concatenate(
                [jnp.ones_like(x), p, x * x, x * y, x * z, y * y, y * z,
                 z * z], axis=1)                        # (PT, 10)
            acc = acc + jnp.dot(w, feats,
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST)
        # ranking: invalid points pushed to FAR, then a running
        # best-two per stride class (two-register insertion; static
        # unroll keeps the slices lane-aligned). Two slots per class
        # push the collision loss to 3-of-k-in-one-class (recall ~0.99
        # at k=33 vs ~0.88 with a single slot).
        d2m = jnp.where(vrow > 0.0, d2, _FAR)
        b1v, b1i, b2v, b2i = bval
        base = t * pt + lane
        for i in range(n_strides):
            sl = d2m[:, i * _N_CLASSES:(i + 1) * _N_CLASSES]
            si = base + i * _N_CLASSES
            lt1 = sl < b1v
            lt2 = sl < b2v
            # slot 2 takes either the displaced slot-1 value or sl
            b2v = jnp.where(lt1, b1v, jnp.where(lt2, sl, b2v))
            b2i = jnp.where(lt1, b1i, jnp.where(lt2, si, b2i))
            b1v = jnp.where(lt1, sl, b1v)
            b1i = jnp.where(lt1, si, b1i)
        return acc, (b1v, b1i, b2v, b2i)

    acc0 = jnp.zeros((cb, 10), jnp.float32)
    val0 = jnp.full((cb, _N_CLASSES), _FAR, jnp.float32)
    idx0 = jnp.zeros((cb, _N_CLASSES), jnp.int32)
    acc, (b1v, b1i, b2v, b2i) = jax.lax.fori_loop(
        0, n_tiles, body, (acc0, (val0, idx0, val0, idx0)))
    mom_ref[:] = acc
    val_ref[:] = jnp.concatenate([b1v, b2v], axis=1)
    idx_ref[:] = jnp.concatenate([b1i, b2i], axis=1)


def supported(n: int) -> bool:
    """Static-shape condition for the fused kernel (pad-free tiling)."""
    return n % _POINT_TILE == 0 and n % _CENTER_BLOCK == 0


@functools.partial(jax.jit,
                   static_argnames=("k", "radius", "interpret"))
def fused_sweep_pallas(pts: jnp.ndarray, valid: jnp.ndarray, k: int,
                       radius: float, interpret: bool = False):
    """(N, 3) f32 + (N,) bool -> (idx (N, k) i32, dist2 (N, k) f32
    [, cnt (N,), s (N, 3), S6 (N, 6) when radius > 0]).

    Same result contract as ops.normals.filter_sweep with a fast grade:
    approximate k-nearest neighbors over valid points (self included as
    the zero-distance hit) plus, when radius > 0, the radius moments
    over ALL valid points (cnt clamped to >= 1)."""
    n = pts.shape[0]
    assert supported(n), (n, _POINT_TILE, _CENTER_BLOCK)
    assert 0 < k <= _N_CLASSES, k
    pts = pts.astype(jnp.float32)
    vf = valid.astype(jnp.float32)[:, None]             # (N, 1)

    kernel = functools.partial(
        _sweep_kernel, r2=float(radius) ** 2 if radius > 0 else -1.0,
        n_tiles=n // _POINT_TILE, do_moments=radius > 0)
    mom, vals, idxs = pl.pallas_call(
        kernel,
        grid=(n // _CENTER_BLOCK,),
        in_specs=[
            pl.BlockSpec((n, 3), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),      # pts, resident
            pl.BlockSpec((n, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),      # validity
            pl.BlockSpec((_CENTER_BLOCK, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),      # center block
        ],
        out_specs=[
            pl.BlockSpec((_CENTER_BLOCK, 10), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_CENTER_BLOCK, 2 * _N_CLASSES),
                         lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_CENTER_BLOCK, 2 * _N_CLASSES),
                         lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, 10), jnp.float32),
            jax.ShapeDtypeStruct((n, 2 * _N_CLASSES), jnp.float32),
            jax.ShapeDtypeStruct((n, 2 * _N_CLASSES), jnp.int32),
        ],
        interpret=interpret,
    )(pts, vf, pts)

    # exact top-k over the 128 candidates (XLA, tiny input)
    neg, sel = jax.lax.top_k(-vals, k)
    idx = jnp.take_along_axis(idxs, sel, axis=1)
    out = (idx, -neg)
    if radius > 0:
        out = out + (jnp.maximum(mom[:, 0], 1.0), mom[:, 1:4],
                     mom[:, 4:10])
    return out
