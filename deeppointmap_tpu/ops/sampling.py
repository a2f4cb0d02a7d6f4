"""Farthest-point sampling on TPU.

The reference relies on pytorch3d's CUDA `sample_farthest_points`
(reference: network/encoder/utils.py:272-285; python fallback :209-270).
FPS is inherently sequential (each pick depends on the running min-distance
field), so the TPU version keeps the whole distance accumulator live across
a `lax.fori_loop` -- XLA keeps it on-chip for the point-set sizes used here
(N <= 16384 floats). A Pallas variant lives in ops/pallas_fps.py.

Semantics parity:
  * deterministic start at index 0 (the reference passes
    random_start_point=False at inference).
  * if fewer than K valid points exist, trailing picks are marked padded
    (reference returns idx -1 there).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

# NumPy scalars, not jnp: module-level jnp constants initialize the device
# backend at import time, which is fatal when the TPU link is down.
_NEG = np.float32(-1.0)
_INF = np.float32(3.4e38)


def farthest_point_sampling(
    xyz: jnp.ndarray,    # (N, 3) float
    valid: jnp.ndarray,  # (N,) bool
    k: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Select k farthest points. Returns (idx (k,) int32, sel_valid (k,) bool).

    Invalid input points are never selected while valid candidates remain;
    once all valid points are exhausted the remaining slots repeat already-
    selected indices and are masked out in sel_valid.
    """
    n = xyz.shape[0]
    xyz = jnp.asarray(xyz, jnp.float32)
    valid = jnp.asarray(valid)
    n_valid = jnp.sum(valid.astype(jnp.int32))

    # first valid point (index 0 if point 0 is valid -- the common case)
    first = jnp.argmax(valid)

    # min-distance-to-selected-set field; invalid points sit below any
    # possible distance so argmax never picks them while a valid one remains
    mindist0 = jnp.where(valid, _INF, _NEG)
    mindist0 = mindist0.at[first].set(_NEG)

    def body(i, carry):
        mindist, last, idx_out = carry
        p = xyz[last]                                     # (3,)
        d = jnp.sum((xyz - p[None, :]) ** 2, axis=-1)     # (N,)
        mindist = jnp.minimum(mindist, d)
        # already-selected & invalid entries stay negative
        mindist = mindist.at[last].set(_NEG)
        nxt = jnp.argmax(mindist).astype(jnp.int32)
        idx_out = idx_out.at[i].set(nxt)
        return mindist, nxt, idx_out

    idx0 = jnp.zeros((k,), dtype=jnp.int32).at[0].set(first.astype(jnp.int32))
    _, _, idx = jax.lax.fori_loop(
        1, k, body, (mindist0, first.astype(jnp.int32), idx0))

    sel_valid = jnp.arange(k) < n_valid
    return idx, sel_valid


@functools.partial(jax.jit, static_argnames=("k",))
def batched_fps(xyz, valid, k):
    """(B, N, 3), (B, N) -> (B, k) idx, (B, k) sel_valid.

    Platform dispatcher: the Pallas kernel on TPU (single-kernel loop,
    fast to compile and VMEM-resident -- see ops/pallas_fps.py), the XLA
    fori_loop version elsewhere. Both match the NumPy oracle exactly."""
    if jax.default_backend() == "tpu":
        from deeppointmap_tpu.ops.pallas_fps import fps_pallas_batched
        return fps_pallas_batched(xyz, valid, k)
    return jax.vmap(lambda x, v: farthest_point_sampling(x, v, k))(xyz, valid)


def voxel_sample(
    xyz: jnp.ndarray,    # (N, 3) float (normalized coords)
    valid: jnp.ndarray,  # (N,) bool
    k: int,
    voxel_size: float = 0.3,
    sample_range: float = 1.0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Voxel-grid sampling: one representative per occupied voxel (the
    point nearest its voxel center), voxels ranked by point count, top-k
    kept (reference: network/encoder/utils.py:149-207 -- the parallel
    alternative to FPS; `sample: {type: voxel, size, range}` in the yaml).

    Fully parallel (sort + segment scan), so unlike FPS it needs no
    sequential kernel. Returns (idx (k,) int32 into xyz, sel_valid (k,)).
    """
    n = xyz.shape[0]
    xyz = jnp.asarray(xyz, jnp.float32)
    big = jnp.float32(2.0 * sample_range)
    p = jnp.where(valid[:, None], xyz, big)       # pads pushed out of range
    in_range = (jnp.sum(p * p, axis=-1) <= sample_range * sample_range) \
        & valid
    # Clamp the coords used for GRID construction to a static bound: any
    # clamped point is already outside sample_range (-> sentinel id), and
    # the bound makes the id space statically <= (4r/vox+1)^3, so the
    # int32 voxel ids below provably cannot wrap for any input data.
    bound = jnp.float32(2.0 * sample_range)
    dims_max = math.floor(4.0 * sample_range / voxel_size) + 2
    assert float(dims_max) ** 3 < 2 ** 31, (
        f"voxel grid id space {dims_max}^3 overflows int32; increase "
        f"voxel_size (= {voxel_size}) or decrease sample_range "
        f"(= {sample_range})")
    p = jnp.clip(p, -bound, bound)
    pmin = jnp.min(p, axis=0)
    dims = jnp.floor((jnp.max(p, axis=0) - pmin) / voxel_size) + 1.0
    rel = p - pmin
    vxyz = jnp.floor(rel / voxel_size)
    # voxel id in int32 (f32 encoding aliases distinct voxels once the
    # grid exceeds 2^24 ids -- fine grids or ranges inflated by the
    # out-of-range placeholder); int32 is exact to 2^31
    vi = vxyz.astype(jnp.int32)
    di = dims.astype(jnp.int32)
    sentinel = jnp.iinfo(jnp.int32).max
    vid = vi[:, 0] + vi[:, 1] * di[0] + vi[:, 2] * di[0] * di[1]
    vid = jnp.where(in_range, vid, sentinel)
    # distance of each point to its voxel center: the per-voxel
    # representative is the argmin (reference sorts by it globally)
    dis = jnp.sum((rel - vxyz * voxel_size - voxel_size / 2.0) ** 2, axis=-1)

    order = jnp.lexsort((dis, vid))               # by voxel id, then dis
    vs = vid[order]
    pos = jnp.arange(n, dtype=jnp.int32)
    first = jnp.concatenate([jnp.ones((1,), bool), vs[1:] != vs[:-1]])
    firstpos = jnp.where(first, pos, n)
    # next first-position AFTER i (reverse cummin, shifted by one)
    nxt = jax.lax.cummin(firstpos[::-1])[::-1]
    nxt = jnp.concatenate([nxt[1:], jnp.full((1,), n, jnp.int32)])
    count = nxt - pos                              # run length at each first
    score = jnp.where(first & (vs < sentinel), count, -1)
    top_cnt, top_pos = jax.lax.top_k(score, k)     # voxels by point count
    sel_valid = top_cnt > 0
    idx = jnp.where(sel_valid, order[top_pos], 0).astype(jnp.int32)
    return idx, sel_valid


@functools.partial(jax.jit, static_argnames=("k", "voxel_size",
                                              "sample_range"))
def batched_voxel_sample(xyz, valid, k, voxel_size=0.3, sample_range=1.0):
    """(B, N, 3), (B, N) -> (B, k) idx, (B, k) sel_valid."""
    return jax.vmap(
        lambda x, v: voxel_sample(x, v, k, voxel_size, sample_range)
    )(xyz, valid)
