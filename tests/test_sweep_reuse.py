"""Stage-1 grouping served from the preprocess sweep (tpu.sweep_reuse).

The device filter chain already pays one P x P distance sweep; widening
its top-k and reusing the rows for the encoder's first SetAbstraction
removes the hot path's largest remaining distance tile (reference twin
of what it replaces: the Querier call in network/encoder/pointnext.py:
45-61). These oracles pin the reuse path's semantics on CPU (exact
grade): candidate selection must reproduce hybrid_query wherever the
candidate margin covers the filter drops, and the full encoder must be
bit-identical when nothing was dropped.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeppointmap_tpu.data.preprocess import PreprocessConfig, preprocess
from deeppointmap_tpu.models.encoder import Encoder, _group_from_sweep
from deeppointmap_tpu.ops.neighbors import hybrid_query, knn


def _cloud(n, seed=0, scale=10.0):
    rng = np.random.RandomState(seed)
    return rng.uniform(-scale, scale, size=(n, 3)).astype(np.float32)


def test_group_from_sweep_matches_hybrid_query():
    n, ks, k, radius = 256, 24, 16, 4.0
    pts = jnp.asarray(_cloud(n))
    valid_pre = jnp.ones((n,), bool)

    # candidate graph over the pre-filter cloud (what the sweep computes)
    cand_idx, cand_d2 = knn(pts, pts, ks, valid_pre)

    # drop 5% of points "after" the sweep (filter-stage drops)
    rng = np.random.RandomState(1)
    keep = np.ones((n,), bool)
    keep[rng.choice(n, size=n // 20, replace=False)] = False
    valid_final = jnp.asarray(keep)

    # centers: a subset of the surviving points
    center_idx = jnp.asarray(np.where(keep)[0][::3][:64][None])   # (1, S)

    got = _group_from_sweep(center_idx, valid_final[None],
                            (cand_idx[None], cand_d2[None]), k, radius)[0]

    centers = pts[center_idx[0]]
    want = hybrid_query(pts, centers, k, radius, valid_final)

    # rows whose top-ks candidates lost fewer than ks - k members must be
    # exact; with a 5% drop rate that is essentially every row
    dropped = (~valid_final)[cand_idx[center_idx[0]]].sum(axis=1)
    exact_rows = np.asarray(dropped) <= (ks - k)
    assert exact_rows.mean() > 0.9, "margin should cover most rows"
    np.testing.assert_array_equal(np.asarray(got)[exact_rows],
                                  np.asarray(want)[exact_rows])

    # every group member (all rows) must be a surviving point
    assert bool(valid_final[got.reshape(-1)].all())


def test_group_from_sweep_never_groups_prefilter_invalid():
    """Pre-filter-invalid candidates carry the 1e9 sentinel and must be
    re-masked even when the final mask would admit them."""
    n, ks, k, radius = 128, 12, 8, 5.0
    pts = jnp.asarray(_cloud(n, seed=2))
    valid_pre = jnp.asarray(np.arange(n) < n - 16)   # last 16 never valid
    cand_idx, cand_d2 = knn(pts, pts, ks, valid_pre)
    valid_final = jnp.ones((n,), bool)               # (wrongly) admits all
    center_idx = jnp.arange(0, 64, dtype=jnp.int32)[None]
    got = _group_from_sweep(center_idx, valid_final[None],
                            (cand_idx[None], cand_d2[None]), k, radius)[0]
    assert not np.isin(np.asarray(got), np.arange(n - 16, n)).any()


def test_preprocess_returns_normalized_sweep():
    n = 256
    pts = _cloud(n, seed=3, scale=30.0)
    valid = np.ones((n,), bool)
    cfg = PreprocessConfig(use_distance=True, min_dis=1.0, max_dis=60.0,
                           use_outlier=True, outlier_neighbors=10,
                           use_lowpass=False, norm_ratio=60.0,
                           neighbor_grade="exact", sweep_k=20)
    out = preprocess(jnp.asarray(pts), jnp.asarray(valid), cfg)
    assert len(out) == 3
    pts_n, valid_out, (sidx, sd2) = out
    assert sidx.shape == (n, 20) and sd2.shape == (n, 20)

    # dist2 must be in NORMALIZED units: recompute from normalized points
    # for a few in-crop centers (sweep ranked pre-crop-masked distances)
    crop = np.linalg.norm(pts, axis=1)
    pre_valid = (crop >= 1.0) & (crop <= 60.0)
    pn = np.asarray(pts_n)
    for i in np.where(pre_valid)[0][:8]:
        js = np.asarray(sidx[i])
        d2 = np.asarray(sd2[i])
        real = d2 < 1e8
        ref = ((pn[js[real]] - pn[i]) ** 2).sum(axis=1)
        np.testing.assert_allclose(d2[real], ref, rtol=1e-4, atol=1e-7)
        # sentinel rows (if any) must only index pre-crop-invalid points
        assert pre_valid[js[real]].all()


def test_level_graph_reuse_bitwise_equal():
    """LEVEL_GRAPH_REUSE serves every IRM block and the next SA from one
    self-kNN per level; rankings are row-deterministic, so the whole
    encoder must be BITWISE identical to the one-query-per-consumer
    path (on CPU both run the exact grade)."""
    import deeppointmap_tpu.models.encoder as enc_mod

    n = 512
    pts = _cloud(n, seed=7, scale=5.0)[None]
    valid = np.ones((1, n), bool)
    # 3 levels, one with TWO IRM blocks, mixed nsample widths
    enc = Encoder(npoint=(128, 32, 8),
                  radius_list=((0.5, 1.0), (1.0, 2.0, 2.0), (2.0, 4.0)),
                  nsample_list=((8, 8), (8, 16, 8), (4, 8)), in_channel=3,
                  out_channel=16, width=8, upsample_layers=2,
                  neighbor_grade="exact", querier="hybrid")
    x, v = jnp.asarray(pts), jnp.asarray(valid)
    params = enc.init(jax.random.PRNGKey(1), x, v)

    assert enc_mod.LEVEL_GRAPH_REUSE is True   # production default
    reused = enc.apply(params, x, v)
    enc_mod.LEVEL_GRAPH_REUSE = False
    try:
        direct = enc.apply(params, x, v)
    finally:
        enc_mod.LEVEL_GRAPH_REUSE = True

    for a, b in zip(direct, reused):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_engine_extract_sweep_reuse_real_frame():
    """Full production wiring on a real KITTI frame (CPU, exact grade):
    an engine with tpu.sweep_reuse=True must produce the same descriptors
    as the direct-query engine when the active filter chain drops nothing
    after the sweep (the sample chain has no outlier/lowpass stages)."""
    import os

    sample = "/root/reference/data/sample/seq06/velodyne/000000.bin"
    if not os.path.exists(sample):
        pytest.skip("sample data not available")
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
    from test_slam_e2e import small_args

    from deeppointmap_tpu.data.readers import read_auto
    from deeppointmap_tpu.pipeline.common import init_params
    from deeppointmap_tpu.pipeline.infer import (device_preprocess_config,
                                                 make_infer_transform)
    from deeppointmap_tpu.slam.engine import InferenceEngine

    args = small_args("/tmp/unused")
    args.tpu["upload_quant"] = "none"
    enc, dec, ep, dp = init_params(args, seed=0)
    pts, _, _, valid, _ = make_infer_transform(args)(read_auto(sample))

    outs = {}
    for flag in (False, True):
        args.tpu["sweep_reuse"] = flag
        cfg = device_preprocess_config(args)
        assert (cfg.sweep_k > 0) == flag, cfg
        engine = InferenceEngine(args, ep, dp, encoder=enc, decoder=dec,
                                 preprocess_cfg=cfg)
        outs[flag] = engine.extract(pts, valid)

    for a, b in zip(outs[False], outs[True]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("drops", [False, True])
def test_encoder_sweep_equivalence(drops):
    """Full encoder with the sweep path vs the direct query path: exactly
    equal when no filter drops occurred; (documented) bounded deviation
    otherwise -- every grouped point must still be valid."""
    n = 256
    pts = _cloud(n, seed=4, scale=5.0)
    valid = np.ones((n,), bool)
    enc = Encoder(npoint=(64, 16), radius_list=((0.5, 1.0), (1.0, 2.0)),
                  nsample_list=((8, 8), (8, 8)), in_channel=3,
                  out_channel=16, width=8, upsample_layers=2,
                  neighbor_grade="exact", querier="hybrid")
    ks = 8 + 9
    cfg = PreprocessConfig(use_distance=False, use_outlier=drops,
                           outlier_neighbors=10, outlier_std=1.0,
                           use_lowpass=False, norm_ratio=1.0,
                           neighbor_grade="exact", sweep_k=ks)
    pts_n, valid_out, sweep = preprocess(jnp.asarray(pts),
                                         jnp.asarray(valid), cfg)
    x = pts_n[None]
    v = valid_out[None]
    sweep = (sweep[0][None], sweep[1][None])

    params = enc.init(jax.random.PRNGKey(0), x, v)
    direct = enc.apply(params, x, v)
    reused = enc.apply(params, x, v, sweep=sweep)

    if not drops:
        assert bool(np.asarray(valid_out).all())
        for a, b in zip(direct, reused):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    else:
        # descriptor coords (FPS over the same validity) stay identical;
        # features may differ only on the tail-candidate rows
        np.testing.assert_array_equal(np.asarray(direct[0]),
                                      np.asarray(reused[0]))
        np.testing.assert_array_equal(np.asarray(direct[2]),
                                      np.asarray(reused[2]))
        close = np.isclose(np.asarray(direct[1]), np.asarray(reused[1]),
                           rtol=1e-5, atol=1e-6).mean()
        assert close > 0.95, close
