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

from deeppointmap_tpu.ops.neighbors import knn
from deeppointmap_tpu.ops.normals import estimate_normals


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

    @classmethod
    def from_transforms(cls, transforms: dict,
                        neighbor_grade: str = "filter") -> "PreprocessConfig":
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
            kw["normals_radius"] = lp["normals_radius"]
            kw["normals_num"] = lp["normals_num"]
            kw["lowpass_std"] = lp["filter_std"]
            kw["lowpass_flux"] = lp["flux"]
        if "CoordinatesNormalization" in t:
            kw["norm_ratio"] = t["CoordinatesNormalization"]["ratio"]
        else:
            kw["norm_ratio"] = 1.0
        kw["neighbor_grade"] = neighbor_grade
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

    # ONE kNN pass feeds the outlier filter, normal estimation, and the
    # coherence neighborhoods: the full P x P distance+top-k sweep is the
    # dominant preprocessing cost (two sweeps measured ~16 ms of the
    # ~29 ms/frame device budget at P=16384). The reference recomputes
    # neighbors after outlier removal; here dropped points are re-masked
    # out of the shared graph and each row re-ranked by masked distance --
    # identical unless a survivor's true k-th neighbor lies beyond the
    # shared top-30, which the radius caps make negligible (survivor-set
    # parity is asserted in tests/test_preprocess.py).
    nb = None
    if cfg.use_outlier or cfg.use_lowpass:
        k_shared = max(30 if cfg.use_lowpass else 0,
                       (cfg.normals_num + 1) if cfg.use_lowpass else 0,
                       (cfg.outlier_neighbors + 1) if cfg.use_outlier else 0)
        # 'fast' grade (HIGH distances + bf16 ranking, TPU only): these
        # neighborhoods feed distance STATISTICS (outlier mean, normal
        # PCA, coherence top-flux), all insensitive to near-tie ranking
        # flips; measured 9.1 -> 8.0 ms for the whole chain
        nb = knn(pts, pts, k_shared, valid, grade=cfg.neighbor_grade)

    if cfg.use_outlier:
        # statistical outlier: mean distance to k nearest survivors
        k_out = cfg.outlier_neighbors + 1
        d2 = nb[1][:, :k_out]
        mean_d = jnp.mean(jnp.sqrt(jnp.maximum(d2[:, 1:], 0.0)), axis=1)
        mu, sd = _masked_mean_std(mean_d, valid)
        valid = valid & (mean_d <= mu + cfg.outlier_std * sd)

    if cfg.use_lowpass:
        # low-pass: top-flux neighbor-normal coherence over the shared
        # graph. Outlier-dropped neighbors are MASKED (distance 1e9 for
        # the normals' radius cap; similarity 0 for the coherence
        # top-flux) rather than re-ranked -- a (P, 30) argsort costs ~7 ms
        # of VPU time at P=16384, while masking is fused for free, and
        # both only approximate the reference's full neighbor recompute.
        # ONE packed gather [xyz | validity] feeds both the outlier
        # re-mask and the normals' PCA neighborhoods (separate gathers
        # measured ~1.5 ms each at P=16384)
        idx0, d20 = nb
        packed = jnp.concatenate(
            [pts, valid.astype(jnp.float32)[:, None]], axis=1)  # (P, 4)
        g = jnp.take(packed, idx0, axis=0)                   # (P, 30, 4)
        nbr_xyz = g[..., :3]
        nbr_valid = None
        if cfg.use_outlier:
            nbr_valid = g[..., 3] > 0.5                      # (P, 30)
            nb = (idx0, jnp.where(nbr_valid, d20, jnp.float32(1e9)))
        normals = estimate_normals(pts, valid, cfg.normals_radius,
                                   neighbors=nb, neighbor_xyz=nbr_xyz)
        idx = nb[0][:, :cfg.normals_num + 1]
        nbr_n = jnp.take(normals, idx[:, 1:], axis=0)        # (P, K, 3)
        sim = jnp.abs(jnp.einsum("pkc,pc->pk", nbr_n, normals,
                                 preferred_element_type=jnp.float32))
        if nbr_valid is not None:
            sim = jnp.where(nbr_valid[:, 1:cfg.normals_num + 1], sim, 0.0)
        top, _ = jax.lax.top_k(sim, cfg.lowpass_flux)
        s = jnp.sum(top, axis=1)
        mu_s, sd_s = _masked_mean_std(s, valid)
        valid = valid & (s > mu_s - cfg.lowpass_std * sd_s)

    return pts / cfg.norm_ratio, valid


@functools.partial(jax.jit, static_argnames=("cfg",))
def preprocess_jit(points, valid, cfg: PreprocessConfig):
    return preprocess(points, valid, cfg)
