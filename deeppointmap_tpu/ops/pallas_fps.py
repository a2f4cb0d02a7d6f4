"""Farthest-point sampling as a Pallas TPU kernel.

The XLA `lax.fori_loop` formulation (ops/sampling.py) is correct but the
K-iteration while loop is slow to compile at production shapes on this
toolchain; the Pallas version runs the whole selection loop inside ONE
kernel with the coordinates and the min-distance accumulator resident in
VMEM, so Mosaic compiles a single tight loop and each iteration is a VPU
distance update + argmax with no HBM round-trips.

Layout (v2): all per-point state is fully-packed 2D (8, N/8) -- an
earlier (1, N) row layout left 7 of 8 sublanes of every (8, 128) vreg
idle and measured 1.64x slower at the production stage-1 shape
(16384 -> 4096: 5.8 -> 3.6 ms). The output row is likewise carried as
(8, K/8). Selection semantics match ops/sampling.py and the reference
fallback (reference: network/encoder/utils.py:209-270): masked points are
never selected while a valid candidate remains; ties break on the lowest
flat index, identical to argmax-first-occurrence.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INF = 3.4e38
_NEG = -1.0


def _fps_kernel(start_ref, x_ref, y_ref, z_ref, mind0_ref, out_ref,
                mind_ref):
    """start_ref (B,) prefetched int32; per-program blocks: x/y/z and
    mind0 (1, 8, L) VMEM; out (1, 8, K/8) VMEM int32; scratch mind
    (8, L). L = N/8; element (s, lane) holds flat point s * L + lane."""
    l = x_ref.shape[2]
    ko = out_ref.shape[2]
    first = start_ref[pl.program_id(0)]

    x = x_ref[0]
    y = y_ref[0]
    z = z_ref[0]
    sub = jax.lax.broadcasted_iota(jnp.int32, (8, l), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, l), 1)
    idx_map = sub * l + lane
    osub = jax.lax.broadcasted_iota(jnp.int32, (8, ko), 0)
    olane = jax.lax.broadcasted_iota(jnp.int32, (8, ko), 1)
    out_map = osub * ko + olane

    mind_ref[:] = jnp.where(idx_map == first, jnp.float32(_NEG),
                            mind0_ref[0])
    # Mosaic has no scalar VMEM stores: carry the output through the loop
    # as a packed vector and masked-merge one slot per iteration
    out0 = jnp.where(out_map == 0, first, jnp.int32(0))

    def body(i, carry):
        last, out_vec = carry
        # dynamic scalar gathers don't lower on TPU Pallas: read the
        # selected point's coords via a masked reduction instead
        sel = (idx_map == last).astype(jnp.float32)
        px = jnp.sum(x * sel)
        py = jnp.sum(y * sel)
        pz = jnp.sum(z * sel)
        d = (x - px) ** 2 + (y - py) ** 2 + (z - pz) ** 2
        mind = jnp.minimum(mind_ref[:], d)
        mind = jnp.where(idx_map == last, jnp.float32(_NEG), mind)
        mind_ref[:] = mind
        # argmax with first-occurrence ties: max, then min flat index
        m = jnp.max(mind)
        nxt = jnp.min(jnp.where(mind == m, idx_map, jnp.int32(2 ** 30)))
        out_vec = jnp.where(out_map == i, nxt, out_vec)
        return nxt, out_vec

    _, out_vec = jax.lax.fori_loop(1, ko * 8, body, (first, out0))
    out_ref[0] = out_vec


def _round_up(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def fps_pallas_batched(xyz: jnp.ndarray, valid: jnp.ndarray, k: int,
                       interpret: bool = False):
    """Batched: xyz (B, N, 3), valid (B, N) -> (idx (B, k) int32,
    sel_valid (B, k) bool). One grid program per batch element."""
    b, n, _ = xyz.shape
    k8 = _round_up(k, 8)         # kernel emits packed (8, k8/8) rows
    n_pad = _round_up(n, 8 * 128)
    l = n_pad // 8

    def to2d(col):
        flat = jnp.zeros((b, n_pad), jnp.float32).at[:, :n].set(col)
        return flat.reshape(b, 8, l)

    xs = to2d(xyz[..., 0].astype(jnp.float32))
    ys = to2d(xyz[..., 1].astype(jnp.float32))
    zs = to2d(xyz[..., 2].astype(jnp.float32))

    vflat = jnp.zeros((b, n_pad), bool).at[:, :n].set(valid)
    mind0 = jnp.where(vflat, jnp.float32(_INF),
                      jnp.float32(_NEG)).reshape(b, 8, l)
    first = jnp.argmax(vflat, axis=1).astype(jnp.int32)

    def spec(d2, d3):
        return pl.BlockSpec((1, d2, d3), lambda i, s: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        _fps_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b,),
            in_specs=[spec(8, l), spec(8, l), spec(8, l), spec(8, l)],
            out_specs=spec(8, k8 // 8),
            scratch_shapes=[pltpu.VMEM((8, l), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((b, 8, k8 // 8), jnp.int32),
        interpret=interpret,
    )(first, xs, ys, zs, mind0)

    idx = out.reshape(b, k8)[:, :k]
    n_valid = jnp.sum(valid.astype(jnp.int32), axis=1)
    sel_valid = jnp.arange(k)[None, :] < n_valid[:, None]
    return idx, sel_valid


def fps_pallas(xyz: jnp.ndarray, valid: jnp.ndarray, k: int,
               interpret: bool = False):
    """Single point set: xyz (N, 3), valid (N,) -> (idx (k,), sel_valid
    (k,)). Same contract as ops.sampling.farthest_point_sampling."""
    idx, sv = fps_pallas_batched(xyz[None], valid[None], k,
                                 interpret=interpret)
    return idx[0], sv[0]
