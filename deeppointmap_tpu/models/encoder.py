"""PointNeXt-with-FPN descriptor encoder (TPU-native, Flax).

Functional parity with the reference encoder (reference: network/encoder/
encoder.py:7-69, pointnext.py:8-218): a stem 1x1 projection, five
downsampling Stages (SetAbstraction + InvResMLP blocks), and two
FeaturePropagation upsampling layers, emitting 256 descriptor points with
128-d features.

TPU-first differences from the reference:
  * channel-last (B, N, C) layout everywhere; Conv1d(k=1) -> Dense.
  * validity masks (True = real point) instead of padding masks; all
    neighbor queries/grouping run over statically-padded point sets
    (reference reaches the same fixed-shape behavior dynamically).
  * FPS / hybrid-query are our own JAX/Pallas ops (ops/sampling.py,
    ops/neighbors.py) instead of pytorch3d CUDA kernels.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from deeppointmap_tpu.models.common import MLP
from deeppointmap_tpu.ops.neighbors import (ball_query, group_points,
                                            hybrid_query, knn)
from deeppointmap_tpu.ops.sampling import batched_fps, batched_voxel_sample

#: grouping methods of the reference Querier (network/encoder/utils.py:
#: 18-43); '-t3d' suffixes name its CUDA twins and normalize away here.
QUERIERS = ("knn", "ball", "hybrid")

#: per-stage sampler spec: (type, voxel_size, sample_range); size/range
#: are ignored for fps (reference: pointnext.py:21,30-35)
DEFAULT_SAMPLE = ("fps", 0.0, 0.0)

#: ONE self-kNN per pyramid level instead of one query per consumer
#: (hybrid querier only). Every InvResMLP block at a level and the NEXT
#: stage's SetAbstraction all query the same point set under the same
#: validity, and hybrid = kNN + per-radius clamp where the kNN part is
#: radius-independent -- so a single (N_i, k_max) graph serves them all
#: (next-SA centers are a subset: row-gather). BITWISE-equal to the
#: per-consumer queries: each row's distance vector is identical and
#: both lax.top_k and approx_max_k are row-deterministic (equivalence
#: pinned in tests/test_sweep_reuse.py). Removes ~4/5 of the encoder's
#: query distance-work at production shapes. Off = the reference-shaped
#: one-query-per-consumer path (profiling/debug).
LEVEL_GRAPH_REUSE = True


def _sample_batch(coor, valid, k, sample=DEFAULT_SAMPLE):
    """Batched sampling: (B,N,3),(B,N) -> idx (B,k), valid (B,k).
    FPS dispatches to the Pallas kernel on TPU (ops/sampling.py); voxel
    sampling is the reference's parallel alternative
    (network/encoder/utils.py:149-207)."""
    kind = sample[0]
    if kind == "voxel":
        return batched_voxel_sample(coor, valid, k, voxel_size=sample[1],
                                    sample_range=sample[2])
    return batched_fps(coor, valid, k)


def _query_batch(points, centers, k, radius, points_valid,
                 grade="exact", querier="hybrid"):
    """Batched neighbor grouping, dispatching the reference Querier's
    three methods (network/encoder/utils.py:18-43): knn ignores the
    radius; ball keeps only in-radius points (self-fill outside); hybrid
    = knn then clamp-to-radius."""
    if querier == "knn":
        # knn leaks invalid indices (1e9-sentinel dist2) when fewer than
        # k valid points exist; self-fill those slots with the nearest
        # neighbor so padded points are never grouped (the reference
        # Querier never sees padded inputs)
        def fn(p, c, v):
            idx, d2 = knn(p, c, k, v, grade=grade)
            # threshold well below the 1e9 sentinel but far above any
            # real squared distance (the fast grade's bf16 ranking can
            # round the sentinel slightly)
            return jnp.where(d2 >= jnp.float32(1e8), idx[:, :1], idx)
    elif querier == "ball":
        fn = lambda p, c, v: ball_query(p, c, k, radius, v)
    elif querier == "hybrid":
        fn = lambda p, c, v: hybrid_query(p, c, k, radius, v, grade=grade)
    else:
        raise ValueError(f"unknown querier {querier!r}: use one of "
                         f"{QUERIERS}")
    return jax.vmap(fn)(points, centers, points_valid)


def _level_graph(coor, valid, k, grade):
    """The level's shared candidate graph: self-kNN (B, N, k) idx + dist2
    (invalid points carry the 1e9 sentinel distance, exactly like a
    direct query's masking)."""
    from deeppointmap_tpu.ops.neighbors import batched_knn

    return batched_knn(coor, coor, k, valid, grade=grade)


def _hybrid_from_graph(graph, k, radius, center_idx=None):
    """Hybrid grouping read out of a level graph: optional row-gather for
    subset centers, slice the first k (rows are ascending by distance),
    clamp out-of-radius/sentinel entries to the nearest neighbor --
    identical math to hybrid_query on the same rows
    (reference semantics: network/encoder/utils.py:113-123)."""
    gidx, gd2 = graph
    if center_idx is not None:
        gidx = jnp.take_along_axis(gidx, center_idx[..., None], axis=1)
        gd2 = jnp.take_along_axis(gd2, center_idx[..., None], axis=1)
    gi, gd = gidx[..., :k], gd2[..., :k]
    return jnp.where(gd > jnp.float32(radius * radius), gi[..., :1], gi)


def _group_from_sweep(center_idx, valid, sweep, k, radius):
    """Stage-1 hybrid grouping served from the preprocess sweep's candidate
    lists (data/preprocess.py sweep_k) instead of a fresh (S, N) distance
    pass: gather each sampled center's pre-computed top-Ks candidates,
    re-mask by the FINAL validity (filters ran after the sweep), pick the
    k nearest survivors, then apply the hybrid radius clamp
    (reference semantics: network/encoder/utils.py:113-123).

    Exact-equal to hybrid_query whenever fewer than Ks - k of a center's
    top-Ks candidates were dropped by the filter stages (measured drop
    rates are a few percent, Ks - k margin is 8+); beyond that the tail
    neighbors clamp to the nearest survivor, which max-pooled set
    abstraction tolerates by design.

    center_idx (B, S) int32, valid (B, N) bool,
    sweep = (idx (B, N, Ks) int32, dist2 (B, N, Ks) f32, normalized units,
    1e9 sentinel for pre-filter-invalid candidates).
    Returns group idx (B, S, k) int32.
    """
    cand_idx, cand_d2 = sweep
    cidx = jnp.take_along_axis(
        cand_idx, center_idx[..., None], axis=1)          # (B, S, Ks)
    cd2 = jnp.take_along_axis(cand_d2, center_idx[..., None], axis=1)
    ok = jax.vmap(lambda v, i: v[i])(valid, cidx)         # (B, S, Ks)
    d2m = jnp.where(ok & (cd2 < jnp.float32(1e8)), cd2, jnp.float32(1e9))
    neg, sel = jax.lax.top_k(-d2m, k)                     # (B, S, k)
    gidx = jnp.take_along_axis(cidx, sel, axis=-1)
    gd2 = -neg
    # hybrid clamp; the first column is each center's nearest surviving
    # candidate (itself, at dist 0, whenever the sweep kept it)
    return jnp.where(gd2 > jnp.float32(radius * radius),
                     gidx[..., :1], gidx).astype(jnp.int32)


class SetAbstraction(nn.Module):
    """Sample -> group -> MLP -> max-pool (reference: pointnext.py:8-64)."""

    npoint: int
    radius: float
    nsample: int
    in_channel: int
    bias: bool = True
    sample: Tuple[str, float, float] = DEFAULT_SAMPLE
    neighbor_grade: str = "exact"
    querier: str = "hybrid"
    act_dtype: str = "float32"

    @nn.compact
    def __call__(self, coor, fea, valid, sweep=None, graph=None):
        # coor (B,N,3) fea (B,N,C) valid (B,N); graph = the PREVIOUS
        # level's shared kNN over `coor` (serves this SA's query since
        # the sampled centers are a subset of its rows)
        idx, new_valid = _sample_batch(coor, valid, self.npoint,
                                       self.sample)                  # (B,S)
        new_coor = jnp.take_along_axis(coor, idx[..., None], axis=1)  # (B,S,3)

        if sweep is not None and self.querier == "hybrid":
            group_idx = _group_from_sweep(idx, valid, sweep,
                                          self.nsample, self.radius)
        elif graph is not None and self.querier == "hybrid":
            group_idx = _hybrid_from_graph(graph, self.nsample,
                                           self.radius, center_idx=idx)
        else:
            group_idx = _query_batch(coor, new_coor, self.nsample,
                                     self.radius, valid,
                                     self.neighbor_grade,
                                     self.querier)                    # (B,S,K)
        dt = jnp.dtype(self.act_dtype)
        g_coor = jax.vmap(group_points)(coor, group_idx)              # (B,S,K,3)
        # relative O(1) offsets: safe in the activation dtype
        g_coor = ((g_coor - new_coor[:, :, None, :]) / self.radius).astype(dt)
        g_fea = jax.vmap(group_points)(fea.astype(dt), group_idx)     # (B,S,K,C)
        g = jnp.concatenate([g_fea, g_coor], axis=-1)                 # (B,S,K,C+3)
        g = MLP([self.in_channel * 2], bias=self.bias,
                act_dtype=self.act_dtype, name="mlp")(g)
        new_fea = jnp.max(g, axis=2)                                  # (B,S,2C)
        return new_coor, new_fea, new_valid


class LocalAggregation(nn.Module):
    """Group around every point, MLP, max-pool (reference: pointnext.py:67-109)."""

    radius: float
    nsample: int
    in_channel: int
    bias: bool = True
    neighbor_grade: str = "exact"
    querier: str = "hybrid"
    act_dtype: str = "float32"

    @nn.compact
    def __call__(self, coor, fea, valid, graph=None):
        if graph is not None and self.querier == "hybrid":
            # centers == points: the graph rows ARE this query
            group_idx = _hybrid_from_graph(graph, self.nsample, self.radius)
        else:
            group_idx = _query_batch(coor, coor, self.nsample, self.radius,
                                     valid, self.neighbor_grade,
                                     self.querier)
        dt = jnp.dtype(self.act_dtype)
        g_coor = jax.vmap(group_points)(coor, group_idx)
        g_coor = ((g_coor - coor[:, :, None, :]) / self.radius).astype(dt)
        g_fea = jax.vmap(group_points)(fea.astype(dt), group_idx)
        g = jnp.concatenate([g_fea, g_coor], axis=-1)
        g = MLP([self.in_channel], bias=self.bias,
                act_dtype=self.act_dtype, name="mlp")(g)
        return jnp.max(g, axis=2)


class InvResMLP(nn.Module):
    """Inverted-residual block (reference: pointnext.py:112-138)."""

    radius: float
    nsample: int
    in_channel: int
    expansion: int = 4
    bias: bool = True
    neighbor_grade: str = "exact"
    querier: str = "hybrid"
    act_dtype: str = "float32"

    @nn.compact
    def __call__(self, coor, fea, valid, graph=None):
        identity = fea
        fea = LocalAggregation(self.radius, self.nsample, self.in_channel,
                               self.bias, self.neighbor_grade, self.querier,
                               self.act_dtype, name="la")(coor, fea, valid,
                                                          graph=graph)
        fea = MLP([self.in_channel * self.expansion, self.in_channel],
                  bias=self.bias, drop_last_act=True,
                  act_dtype=self.act_dtype, name="pw_conv")(fea)
        return jax.nn.relu(fea + identity.astype(fea.dtype))


class Stage(nn.Module):
    """SetAbstraction + (len(radius_list)-1) InvResMLP blocks
    (reference: pointnext.py:141-173)."""

    npoint: int
    radius_list: Sequence[float]
    nsample_list: Sequence[int]
    in_channel: int
    expansion: int = 4
    bias: bool = True
    sample: Tuple[str, float, float] = DEFAULT_SAMPLE
    neighbor_grade: str = "exact"
    querier: str = "hybrid"
    act_dtype: str = "float32"

    @nn.compact
    def __call__(self, coor, fea, valid, sweep=None, in_graph=None,
                 graph_k: int = 0):
        """in_graph: the previous level's shared kNN over the INPUT
        points (serves the SA query); graph_k > 0 requests this level's
        own shared graph over the SAMPLED points (serving the InvResMLP
        blocks here and the next stage's SA) -- returned as 4th output."""
        coor, fea, valid = SetAbstraction(
            self.npoint, self.radius_list[0], self.nsample_list[0],
            self.in_channel, self.bias, self.sample, self.neighbor_grade,
            self.querier, self.act_dtype, name="sa")(coor, fea, valid,
                                                     sweep=sweep,
                                                     graph=in_graph)
        graph = None
        if graph_k > 0 and self.querier == "hybrid":
            graph = _level_graph(coor, valid, graph_k, self.neighbor_grade)
        for i in range(1, len(self.radius_list)):
            fea = InvResMLP(self.radius_list[i], self.nsample_list[i],
                            self.in_channel * 2, self.expansion, self.bias,
                            self.neighbor_grade, self.querier,
                            self.act_dtype, name=f"irm{i - 1}")(coor, fea,
                                                                valid,
                                                                graph=graph)
        return coor, fea, valid, graph


class FeaturePropagation(nn.Module):
    """Inverse-distance-weighted 3-NN upsampling + MLP
    (reference: pointnext.py:176-218)."""

    mlp: Sequence[int]
    bias: bool = True
    act_dtype: str = "float32"

    @nn.compact
    def __call__(self, coor1, coor2, fea1, fea2, valid2):
        # interpolate fea2 (B,S,D2) at coor1 (B,N,3); padded deep points are
        # pushed to +inf distance via the valid mask (reference pushes them
        # to 3x the coordinate max -- pointnext.py:203)
        from deeppointmap_tpu.ops.neighbors import pairwise_dist2
        def interp(c1, c2, f2, v2):
            d2 = pairwise_dist2(c1, c2)                   # (N, S)
            d2 = jnp.where(v2[None, :], d2, jnp.float32(1e9))
            neg, idx = jax.lax.top_k(-d2, 3)              # (N, 3)
            dist = jnp.maximum(-neg, 1e-8)
            w = 1.0 / dist
            w = w / jnp.sum(w, axis=-1, keepdims=True)
            return jnp.sum(jnp.take(f2, idx, axis=0) * w[..., None], axis=1)

        dt = jnp.dtype(self.act_dtype)
        inter = jax.vmap(interp)(coor1, coor2, fea2, valid2)  # (B,N,D2)
        x = jnp.concatenate([fea1.astype(dt), inter.astype(dt)], axis=-1)
        return MLP(self.mlp, bias=self.bias, act_dtype=self.act_dtype,
                   name="mlp")(x)


class Encoder(nn.Module):
    """Full backbone. __call__(points (B,N,3+), valid (B,N)) ->
    (coor (B,S,3), fea (B,S,out_channel), valid (B,S)).

    Config fields mirror the reference yaml `encoder:` tree
    (reference: configs/infer/DeepPointMap_B_Main_SemanticKITTI.yaml:32-50).
    """

    npoint: Sequence[int] = (4096, 1024, 256, 64, 16)
    radius_list: Sequence[Sequence[float]] = (
        (0.05, 0.1), (0.1, 0.2), (0.2, 0.4, 0.4), (0.4, 0.8), (0.8, 1.6))
    nsample_list: Sequence[Sequence[int]] = (
        (32, 32), (32, 32), (32, 32, 32), (32, 32), (16, 16))
    in_channel: int = 3
    out_channel: int = 128
    width: int = 16
    expansion: int = 4
    upsample_layers: int = 2
    bias: bool = True
    #: per-stage sampler: (type, voxel_size, sample_range)
    sample: Sequence[Tuple[str, float, float]] = (DEFAULT_SAMPLE,) * 5
    #: neighbor-query grade: 'exact' (f32 HIGHEST distances, f32 top-k)
    #: or 'fast' (f32 HIGH distances, bf16 top-k ranking -- TPU only;
    #: rank-safe perturbation, measured in PARITY.md)
    neighbor_grade: str = "exact"
    #: grouping method: 'hybrid' (reference default, pointnext.py:36,82),
    #: 'knn', or 'ball' -- yaml key `encoder.querier`
    querier: str = "hybrid"
    #: feature-activation dtype ("float32" | "bfloat16"): bf16 halves
    #: the HBM traffic of every feature gather/MLP. GEOMETRY (coor,
    #: queries, FPS) always stays f32; only features and the O(1)
    #: relative offsets are cast. TPU-only at trace time -- CPU (oracle
    #: tests, virtual meshes) always runs f32, mirroring the
    #: neighbor_grade gating. yaml key `tpu.encoder_bf16`; the AMP
    #: analog of the reference's autocast (reference: pipeline/modules/
    #: trainer.py:45-48).
    act_dtype: str = "float32"

    @classmethod
    def from_config(cls, args) -> "Encoder":
        e = args.encoder
        norm = str(e.get("norm", "LN")).lower()
        assert norm == "ln", f"only LayerNorm is supported (got {norm!r})"
        sample = []
        for s in e.sample:
            kind = str(s["type"])
            if kind.startswith("fps"):       # fps / fps-t3d are one op here
                sample.append(DEFAULT_SAMPLE)
            elif kind == "voxel":
                sample.append(("voxel", float(s["size"]),
                               float(s["range"])))
            else:
                raise ValueError(f"unsupported sampler {kind!r}: "
                                 "use 'fps', 'fps-t3d', or 'voxel'")
        if len(sample) == 1:
            sample = sample * len(e.npoint)
        assert len(sample) == len(e.npoint), (sample, e.npoint)
        # reference Querier method incl. its '-t3d' CUDA-twin spellings
        querier = str(e.get("querier", "hybrid")).lower()
        if querier.endswith("-t3d"):
            querier = querier[:-4]
        if querier not in QUERIERS:
            raise ValueError(f"unknown encoder.querier {querier!r}: "
                             f"use one of {QUERIERS}")
        return cls(npoint=tuple(e.npoint),
                   radius_list=tuple(tuple(r) for r in e.radius_list),
                   nsample_list=tuple(tuple(n) for n in e.nsample_list),
                   in_channel=e.in_channel, out_channel=e.out_channel,
                   width=e.width, expansion=e["expansion"],
                   upsample_layers=e.upsample_layers,
                   bias=e.get("bias", True), sample=tuple(sample),
                   # fall back to 'exact' when no tpu section is present:
                   # TPU_DEFAULTS (config.py) is the single opt-in point
                   # for the approximate 'fast' grade, so a hand-built
                   # config without it never silently gets recall<1
                   # grouping during training
                   neighbor_grade=str((args.get("tpu") or {}).get(
                       "neighbor_grade", "exact")),
                   querier=querier,
                   # default OFF like neighbor_grade='exact': TPU_DEFAULTS
                   # is the single opt-in point for reduced precision
                   act_dtype="bfloat16" if (args.get("tpu") or {}).get(
                       "encoder_bf16", False) else "float32")

    @nn.compact
    def __call__(self, points: jnp.ndarray, valid: jnp.ndarray,
                 sweep=None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """sweep: optional (idx (B, N, Ks), dist2 (B, N, Ks)) candidate
        graph from the device preprocess chain (sweep_k > 0); serves the
        FIRST stage's hybrid grouping without a fresh (npoint0, N)
        distance pass (only valid when querier == 'hybrid' and the
        dist2 units match `points`)."""
        coor = points[..., :3]
        fea = points[..., :self.in_channel]
        # reduced-precision activations only on TPU (trace-time gate,
        # same policy as the neighbor grades): CPU oracles stay f32
        act = self.act_dtype if jax.default_backend() == "tpu" \
            else "float32"
        fea = nn.Dense(self.width, use_bias=True, dtype=jnp.dtype(act),
                       name="point_mlp0")(fea)

        levels = [(coor, fea, valid)]
        width = self.width
        sample = tuple(self.sample)[:len(self.npoint)]
        if len(sample) < len(self.npoint):
            sample = sample + (DEFAULT_SAMPLE,) * (len(self.npoint)
                                                   - len(sample))
        graph = None
        for i in range(len(self.npoint)):
            # shared-graph width for this level: the widest consumer
            # among its own InvResMLP blocks and the next stage's SA
            graph_k = 0
            if LEVEL_GRAPH_REUSE and self.querier == "hybrid":
                own = max(self.nsample_list[i][1:], default=0)
                nxt = self.nsample_list[i + 1][0] \
                    if i + 1 < len(self.npoint) else 0
                graph_k = max(int(own), int(nxt))
            c, f, v, graph = Stage(self.npoint[i], self.radius_list[i],
                                   self.nsample_list[i], width,
                                   self.expansion,
                                   self.bias, sample[i],
                                   self.neighbor_grade,
                                   self.querier, act, name=f"down{i}")(
                *levels[-1], sweep=sweep if i == 0 else None,
                in_graph=graph, graph_k=graph_k)
            levels.append((c, f, v))
            width *= 2

        c, f, v = levels[-1]
        for i in range(self.upsample_layers):
            c1, f1, v1 = levels[len(self.npoint) - i - 1]
            up_out = max(self.out_channel, width // 2)
            f = FeaturePropagation(mlp=(up_out, up_out), bias=self.bias,
                                   act_dtype=act,
                                   name=f"up{i}")(c1, c, f1, f, v)
            c, v = c1, v1
            width //= 2
        return c, f.astype(jnp.float32), v
