"""Fused on-device preprocessing for the inference hot path.

Device-side twin of the host transform chain (data/transforms.py): the
reference pipeline VoxelSample -> DistanceSample -> OutlierFilter ->
LowPassFilter -> CoordinatesNormalization (reference: configs/infer/
DeepPointMap_B_Main_SemanticKITTI.yaml:21-29) with everything after the
voxel stage expressed as VALIDITY-MASK updates over a fixed-size padded
array -- points are never physically removed, so the whole chain jit-fuses
and can run inside the same device call as the encoder.

Only the voxel downsample stays on the host (its output size is
data-dependent and it is a cheap sort/unique over the raw scan).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from deeppointmap_tpu.ops.normals import (filter_sweep,
                                          normals_from_moments)


class PreprocessConfig(NamedTuple):
    """Stages not present in the yaml chain are disabled (enable flags)."""

    use_distance: bool = True
    min_dis: float = 1.0
    max_dis: float = 60.0
    use_outlier: bool = True
    outlier_neighbors: int = 10
    outlier_std: float = 3.0
    use_lowpass: bool = True
    normals_radius: float = 0.5
    normals_num: int = 16
    lowpass_std: float = 2.0
    lowpass_flux: int = 4
    norm_ratio: float = 60.0
    #: neighbor-query grade for the filter kNN ('filter' = HIGH-precision
    #: distances + bf16 ranking at recall 0.9, TPU only; ~2x cheaper,
    #: ops/neighbors.py)
    neighbor_grade: str = "filter"
    #: when > 0, widen the shared sweep's top-k to this many candidates
    #: and RETURN them ((P, sweep_k) idx + normalized dist2) so the
    #: encoder's stage-1 hybrid grouping can be served from the sweep
    #: instead of a fresh (npoint0, P) distance pass (models/encoder.py:
    #: _group_from_sweep). The candidate graph is computed over the
    #: post-distance-crop validity; later filter drops are re-masked at
    #: selection time.
    sweep_k: int = 0

    @classmethod
    def from_transforms(cls, transforms: dict,
                        neighbor_grade: str = "filter",
                        sweep_k: int = 0) -> "PreprocessConfig":
        """Build from the yaml transforms tree (same keys the host chain
        uses)."""
        t = dict(transforms)
        kw = {"use_distance": "DistanceSample" in t,
              "use_outlier": "OutlierFilter" in t,
              "use_lowpass": "LowPassFilter" in t}
        if kw["use_distance"]:
            kw["min_dis"] = t["DistanceSample"]["min_dis"]
            kw["max_dis"] = t["DistanceSample"]["max_dis"]
        if kw["use_outlier"]:
            kw["outlier_neighbors"] = t["OutlierFilter"]["nb_neighbors"]
            kw["outlier_std"] = t["OutlierFilter"]["std_ratio"]
        if kw["use_lowpass"]:
            lp = t["LowPassFilter"]
            if float(lp["normals_radius"]) <= 0:
                raise ValueError("LowPassFilter.normals_radius must be "
                                 f"> 0 (got {lp['normals_radius']})")
            kw["normals_radius"] = lp["normals_radius"]
            kw["normals_num"] = lp["normals_num"]
            kw["lowpass_std"] = lp["filter_std"]
            kw["lowpass_flux"] = lp["flux"]
        if "CoordinatesNormalization" in t:
            kw["norm_ratio"] = t["CoordinatesNormalization"]["ratio"]
        else:
            kw["norm_ratio"] = 1.0
        kw["neighbor_grade"] = neighbor_grade
        kw["sweep_k"] = sweep_k
        return cls(**kw)


def _masked_mean_std(x, mask):
    m = mask.astype(jnp.float32)
    n = jnp.maximum(jnp.sum(m), 1.0)
    mean = jnp.sum(x * m) / n
    var = jnp.sum(((x - mean) ** 2) * m) / n
    return mean, jnp.sqrt(var)


def preprocess(points: jnp.ndarray, valid: jnp.ndarray,
               cfg: PreprocessConfig):
    """(P, 3) raw-meter points + validity -> (normalized points, validity).

    Mask-update equivalents of (reference file:line):
      distance crop      transforms.py:387-397
      statistical outlier removal   transforms.py:230-253
      normal-coherence low-pass     transforms.py:256-297
      coordinate normalization      transforms.py:400-407
    """
    pts = points.astype(jnp.float32)

    if cfg.use_distance:
        dist = jnp.linalg.norm(pts, axis=1)
        valid = valid & (dist >= cfg.min_dis) & (dist <= cfg.max_dis)

    # ONE chunked P x P sweep (k = max(outlier_k+1, coherence_k+1),
    # typically 17) feeds the outlier filter, the coherence
    # neighborhoods, AND the radius-PCA moments for normals -- normals
    # need no kNN at all (exact radius accumulation, the reference's
    # uncapped Open3D radius-search semantics, transforms.py:271). Two
    # documented approximations vs the reference's sequential recompute:
    # dropped neighbors are masked out of the shared coherence graph
    # instead of re-queried, and normals are estimated on the
    # PRE-outlier cloud (statistical outliers are isolated by
    # definition; measured survivor impact 0.067%). Survivor-set parity
    # vs the host chain is asserted in tests/test_preprocess.py.
    nb = None
    moments = None
    if cfg.use_outlier or cfg.use_lowpass or cfg.sweep_k > 0:
        k_shared = max((cfg.normals_num + 1) if cfg.use_lowpass else 0,
                       (cfg.outlier_neighbors + 1) if cfg.use_outlier else 0,
                       cfg.sweep_k)
        assert not cfg.use_lowpass or cfg.normals_radius > 0, cfg
        out = filter_sweep(pts, valid, k_shared,
                           cfg.normals_radius if cfg.use_lowpass else 0.0,
                           cfg.neighbor_grade)
        nb = out[:2]
        moments = out[2:] if cfg.use_lowpass else None

    if cfg.use_outlier:
        # statistical outlier: mean distance to k nearest survivors
        k_out = cfg.outlier_neighbors + 1
        d2 = nb[1][:, :k_out]
        mean_d = jnp.mean(jnp.sqrt(jnp.maximum(d2[:, 1:], 0.0)), axis=1)
        mu, sd = _masked_mean_std(mean_d, valid)
        valid = valid & (mean_d <= mu + cfg.outlier_std * sd)

    if cfg.use_lowpass:
        normals = normals_from_moments(pts, *moments)
        idx = nb[0][:, :cfg.normals_num + 1]
        # one packed gather [normal | validity] feeds both the coherence
        # values and their mask
        packed = jnp.concatenate(
            [normals, valid.astype(jnp.float32)[:, None]], axis=1)
        g = jnp.take(packed, idx, axis=0)                # (P, K+1, 4)
        nbr_n = g[:, 1:, :3]
        nbr_valid = g[:, 1:, 3] > 0.5
        sim = jnp.abs(jnp.einsum("pkc,pc->pk", nbr_n, normals,
                                 preferred_element_type=jnp.float32))
        sim = jnp.where(nbr_valid, sim, 0.0)
        top, _ = jax.lax.top_k(sim, cfg.lowpass_flux)
        s = jnp.sum(top, axis=1)
        mu_s, sd_s = _masked_mean_std(s, valid)
        valid = valid & (s > mu_s - cfg.lowpass_std * sd_s)

    if cfg.sweep_k > 0:
        # hand the widened candidate graph to the encoder in NORMALIZED
        # units (the sweep ranked raw-meter distances; a uniform scale
        # preserves ranking, so dist2 just rescales by ratio^-2)
        inv2 = jnp.float32(1.0 / (cfg.norm_ratio * cfg.norm_ratio))
        d2 = nb[1][:, :cfg.sweep_k]
        # re-pin the invalid-point sentinel (1e9 raw) so it stays >= 1e8
        # after rescaling (normalized real dist2 tops out around 4.0)
        d2 = jnp.where(d2 >= jnp.float32(1e8), jnp.float32(1e9), d2 * inv2)
        sweep = (nb[0][:, :cfg.sweep_k], d2)
        return pts / cfg.norm_ratio, valid, sweep

    return pts / cfg.norm_ratio, valid


@functools.partial(jax.jit, static_argnames=("cfg",))
def preprocess_jit(points, valid, cfg: PreprocessConfig):
    return preprocess(points, valid, cfg)
