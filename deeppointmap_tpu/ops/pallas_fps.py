"""Farthest-point sampling as a Pallas TPU kernel.

The XLA `lax.fori_loop` formulation (ops/sampling.py) is correct but the
K-iteration while loop is slow to compile at production shapes on this
toolchain; the Pallas version runs the whole selection loop inside ONE
kernel with the coordinates and the min-distance accumulator resident in
VMEM (N <= 16k floats -> ~0.5 MB), so Mosaic compiles a single tight loop
and each iteration is a VPU distance update + argmax with no HBM
round-trips.

Layout: coordinates are passed transposed-and-padded as (8, N) float32
(x, y, z rows + zero rows) so the lane dimension is N -- the natural VPU
shape. The min-distance row is initialized outside the kernel:
+INF for valid points, -1 for padding, -1 at the start index (the kernel
never selects masked entries while a valid candidate remains, matching
ops/sampling.py and the reference fallback semantics, reference:
network/encoder/utils.py:209-270).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INF = 3.4e38
_NEG = -1.0


def _fps_kernel(start_ref, xyz_ref, mind0_ref, out_ref, mind_ref):
    """start_ref (B,) prefetched int32; per-program blocks: xyz_ref
    (1, 8, N) VMEM; mind0_ref (1, 1, N) VMEM; out_ref (1, 1, K) VMEM
    int32; mind_ref (1, N) VMEM scratch."""
    n = xyz_ref.shape[2]
    k = out_ref.shape[2]
    first = start_ref[pl.program_id(0)]

    x = xyz_ref[0, 0:1, :]
    y = xyz_ref[0, 1:2, :]
    z = xyz_ref[0, 2:3, :]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    out_col = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)

    mind_ref[:] = jnp.where(lane == first, jnp.float32(_NEG),
                            mind0_ref[0, :, :])
    # Mosaic has no scalar VMEM stores: carry the output row through the
    # loop as a vector and masked-merge one slot per iteration
    out0 = jnp.where(out_col == 0, first, jnp.int32(0))

    def body(i, carry):
        last, out_vec = carry
        # dynamic scalar gathers don't lower on TPU Pallas: read the
        # selected point's coords via a masked reduction instead
        sel = (lane == last).astype(jnp.float32)
        px = jnp.sum(x * sel)
        py = jnp.sum(y * sel)
        pz = jnp.sum(z * sel)
        d = (x - px) ** 2 + (y - py) ** 2 + (z - pz) ** 2
        mind = jnp.minimum(mind_ref[:], d)
        mind = jnp.where(lane == last, jnp.float32(_NEG), mind)
        mind_ref[:] = mind
        nxt = jnp.argmax(mind[0, :]).astype(jnp.int32)
        out_vec = jnp.where(out_col == i, nxt, out_vec)
        return nxt, out_vec

    _, out_vec = jax.lax.fori_loop(1, k, body, (first, out0))
    out_ref[0, :, :] = out_vec


def _round_up(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def fps_pallas_batched(xyz: jnp.ndarray, valid: jnp.ndarray, k: int,
                       interpret: bool = False):
    """Batched: xyz (B, N, 3), valid (B, N) -> (idx (B, k) int32,
    sel_valid (B, k) bool). One grid program per batch element."""
    b, n, _ = xyz.shape
    n_pad = _round_up(n, 128)
    xyz_t = jnp.zeros((b, 8, n_pad), jnp.float32)
    xyz_t = xyz_t.at[:, :3, :n].set(
        jnp.swapaxes(xyz.astype(jnp.float32), 1, 2))

    lane_valid = jnp.zeros((b, 1, n_pad), bool).at[:, 0, :n].set(valid)
    mind0 = jnp.where(lane_valid, jnp.float32(_INF), jnp.float32(_NEG))
    first = jnp.argmax(lane_valid[:, 0, :], axis=1).astype(jnp.int32)

    out = pl.pallas_call(
        _fps_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b,),
            in_specs=[
                pl.BlockSpec((1, 8, n_pad), lambda i, s: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, n_pad), lambda i, s: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, k), lambda i, s: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((1, n_pad), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((b, 1, k), jnp.int32),
        interpret=interpret,
    )(first, xyz_t, mind0)

    idx = out[:, 0, :]
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
