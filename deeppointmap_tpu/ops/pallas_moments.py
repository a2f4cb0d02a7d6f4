"""Radius-PCA moment accumulation as a fused Pallas TPU kernel.

The XLA formulation (ops/normals.py `filter_sweep`) materializes the
(centers, N) radius-membership mask in HBM between the distance fusion
and the two moment matmuls -- at the production 16384-point scan that is
~3 GB of HBM round-trips per sweep, which dominates the preprocessing
chain. This kernel keeps every (center_block, point_tile) distance tile
and its membership mask in VMEM: per tile one MXU cross-term matmul
produces distances, the mask is formed in registers, and ONE MXU matmul
accumulates all ten moment features [1 | p | p6] at once. HBM traffic is
just the points (resident, 196 KB) and the (N, 10) output.

Numerical semantics are identical to the XLA path (ops/normals.py):
cross terms on the MXU at full f32 (HIGHEST -- Mosaic does not lower
HIGH; this is strictly tighter than the XLA path's 3-pass HIGH) with f32
norms added outside the MXU, membership decided on those f32 distances,
accumulation at HIGHEST with f32 accumulators (exact for the 0/1 mask
side). Oracle-tested against
`filter_sweep` in tests/test_pallas_moments.py.

Replaces the moments half of the preprocessing sweep (reference
semantics: Open3D KDTreeSearchParamRadius radius-PCA normals, reference:
dataloader/transforms.py:271); the top-k half stays on XLA's
hardware-accelerated PartialReduce (`jax.lax.approx_max_k`), which a
hand-written merge cannot beat.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: centers per grid program / points per inner tile. 256 x 2048 keeps
#: every live tile (cross, d2, w at f32) ~2 MB so Mosaic double-buffers
#: comfortably inside the 16 MB VMEM budget.
_CENTER_BLOCK = 256
_POINT_TILE = 2048


def _moments_kernel(pts_ref, vf_ref, c_ref, out_ref, *, r2: float,
                    n_tiles: int):
    """pts (N, 3) + validity (N, 1) resident; c_ref = this program's
    (CB, 3) center block; out (CB, 10) = [cnt | s(3) | S6(6)]."""
    c = c_ref[:]                                        # (CB, 3)
    c2 = jnp.sum(c * c, axis=1, keepdims=True)          # (CB, 1)
    pt = pts_ref.shape[0] // n_tiles

    def body(t, acc):
        p = pts_ref[pl.ds(t * pt, pt), :]               # (PT, 3)
        vf = vf_ref[pl.ds(t * pt, pt), :]               # (PT, 1)
        # Mosaic lowers only DEFAULT/HIGHEST dot precisions; HIGHEST
        # here is strictly more precise than the XLA path's HIGH and
        # the tiles are tiny, so the extra passes are free
        cross = jnp.dot(c, p.T, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
        p2 = jnp.sum(p * p, axis=1, keepdims=True)      # (PT, 1)
        d2 = c2 - 2.0 * cross + p2.T                    # (CB, PT) f32
        w = jnp.where(d2 <= r2, vf.T, 0.0)              # invalid -> 0
        x, y, z = p[:, 0:1], p[:, 1:2], p[:, 2:3]
        feats = jnp.concatenate(
            [jnp.ones_like(x), p, x * x, x * y, x * z, y * y, y * z,
             z * z], axis=1)                            # (PT, 10)
        return acc + jnp.dot(w, feats,
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)

    out_ref[:] = jax.lax.fori_loop(
        0, n_tiles, body, jnp.zeros(out_ref.shape, jnp.float32))


def supported(n: int) -> bool:
    """Static-shape condition for the fused kernel (pad-free tiling)."""
    return n % _POINT_TILE == 0 and n % _CENTER_BLOCK == 0


@functools.partial(jax.jit, static_argnames=("radius", "interpret"))
def radius_moments_pallas(pts: jnp.ndarray, valid: jnp.ndarray,
                          radius: float, interpret: bool = False):
    """(N, 3) f32 + (N,) bool validity -> (cnt (N,), s (N, 3), S6 (N, 6))
    radius moments over ALL valid points within `radius` of each point
    (self included). Same contract as the moments tail of
    ops.normals.filter_sweep; cnt is clamped to >= 1."""
    n = pts.shape[0]
    assert supported(n), (n, _POINT_TILE, _CENTER_BLOCK)
    pts = pts.astype(jnp.float32)
    vf = valid.astype(jnp.float32)[:, None]             # (N, 1)

    kernel = functools.partial(_moments_kernel, r2=float(radius) ** 2,
                               n_tiles=n // _POINT_TILE)
    out = pl.pallas_call(
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
        out_specs=pl.BlockSpec((_CENTER_BLOCK, 10), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 10), jnp.float32),
        interpret=interpret,
    )(pts, vf, pts)

    cnt = jnp.maximum(out[:, 0], 1.0)
    return cnt, out[:, 1:4], out[:, 4:10]
