"""InferenceEngine: bucket padding, chunked extraction, oversized-tile
crop, fused-call consistency (CPU backend, tiny model)."""

import numpy as np
import pytest

from tests.test_slam_e2e import small_args


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    args = small_args(tmp_path_factory.mktemp("eng"))
    from deeppointmap_tpu.pipeline.common import init_params
    from deeppointmap_tpu.slam.engine import InferenceEngine

    enc, dec, enc_params, dec_params = init_params(args, seed=0)
    return InferenceEngine(args, enc_params, dec_params,
                           encoder=enc, decoder=dec)


def _cloud(rng, n, pad):
    # std 0.15 normalized = 9 m in meters: inside the <=60 m crop the
    # production transforms guarantee (and the int16 upload's +-65.5 m
    # representable range)
    pts = np.zeros((pad, 3), np.float32)
    v = np.zeros((pad,), bool)
    pts[:n] = np.clip(rng.normal(0, 0.15, size=(n, 3)), -0.95, 0.95)
    v[:n] = True
    return pts, v


def test_extract_chunking_matches_single(engine):
    rng = np.random.default_rng(0)
    pad = 4096
    clouds = [_cloud(rng, 1000 + 100 * i, pad) for i in range(5)]
    pts = np.stack([c[0] for c in clouds])
    val = np.stack([c[1] for c in clouds])

    d_all, ov_all, pv_all = engine.extract(pts, val)     # chunked (5 -> 4+1)
    for i in range(5):
        d1, ov1, pv1 = engine.extract(pts[i:i + 1], val[i:i + 1])
        np.testing.assert_allclose(d_all[i], d1[0], atol=1e-5)
        np.testing.assert_array_equal(ov_all[i], ov1[0])
        np.testing.assert_array_equal(pv_all[i], pv1[0])


def test_register_bucket_invariance(engine):
    """Padding a descriptor set to a larger bucket must not change the
    result (num_pairs_actual preserves the true top-k semantics)."""
    rng = np.random.default_rng(1)
    pad = 4096
    pts, val = _cloud(rng, 1500, pad)
    d, ov, pv = engine.extract(pts[None], val[None])
    src, sv = d[0], ov[0]

    SE3_a, conf_a, rmse_a = engine.register(src, sv, src.copy(), sv.copy())

    # same tokens embedded in a bigger tile (padded invalid)
    big = np.zeros((src.shape[0] * 2, src.shape[1]), np.float32)
    bigv = np.zeros((src.shape[0] * 2,), bool)
    big[:src.shape[0]] = src
    bigv[:src.shape[0]] = sv
    SE3_b, conf_b, rmse_b = engine.register(big, bigv, src, sv)

    np.testing.assert_allclose(SE3_a, SE3_b, atol=1e-4)
    assert conf_a == pytest.approx(conf_b, abs=1e-5)
    assert rmse_a == pytest.approx(rmse_b, abs=1e-4)


def test_oversized_tile_cropped(engine):
    rng = np.random.default_rng(2)
    max_bucket = engine.reg_buckets[-1]
    n = max_bucket + 57
    desc = rng.normal(size=(n, 35)).astype(np.float32)
    valid = np.ones(n, bool)
    out, ov, b = engine._pad_tokens(desc, valid)
    assert out.shape[0] == max_bucket
    # nearest-to-center tokens kept
    d = np.linalg.norm(desc[:, -3:], axis=1)
    kept_max = np.linalg.norm(out[:, -3:], axis=1).max()
    dropped_min = np.sort(d)[max_bucket:].min()
    assert kept_max <= dropped_min + 1e-6


def test_odometry_step_matches_unfused(engine):
    rng = np.random.default_rng(3)
    pad = 4096
    p1, v1 = _cloud(rng, 1200, pad)
    p2, v2 = _cloud(rng, 1300, pad)
    d1, ov1, pv1 = engine.extract(p1[None], v1[None])

    # full_pcd contract is METERS (ScanPack stores meters; the fused step
    # derives the new scan's meters internally via coor_scale)
    scale = engine.coor_scale
    desc, dv, pv, SE3_f, conf_f, rmse_f, info_f = engine.odometry_step(
        p2[None], v2[None], d1[0], ov1[0], p1 * scale, pv1[0],
        num_sample=0.5)

    d2, ov2, pv2 = engine.extract(p2[None], v2[None])
    np.testing.assert_allclose(desc[0], d2[0], atol=1e-5)
    SE3_u, conf_u, rmse_u, info_u = engine.register_with_info(
        d1[0], ov1[0], d2[0], ov2[0], p1 * scale, pv1[0], p2 * scale,
        pv2[0], num_sample=0.5)
    np.testing.assert_allclose(SE3_f, SE3_u, atol=1e-4)
    assert conf_f == pytest.approx(conf_u, abs=1e-5)
    # fused new_pcd is derived from the (int16-quantized) upload while the
    # unfused path gets the raw fp32 host array: 2 mm coordinate deltas
    # flow linearly into the G^T G entries
    np.testing.assert_allclose(info_f, info_u, rtol=1e-2, atol=5e-2)


def test_async_dispatch_overlap(engine):
    """Two odometry steps dispatched before either is resolved give the
    same results as sequential sync calls (the MT odometer's depth-1
    software pipeline)."""
    rng = np.random.default_rng(4)
    pad = 4096
    p1, v1 = _cloud(rng, 1100, pad)
    p2, v2 = _cloud(rng, 1250, pad)
    p3, v3 = _cloud(rng, 1400, pad)
    d1, ov1, pv1 = engine.extract(p1[None], v1[None])

    r_a = engine.odometry_step_async(p2[None], v2[None], d1[0], ov1[0],
                                     p1, pv1[0], num_sample=0.5)
    r_b = engine.odometry_step_async(p3[None], v3[None], d1[0], ov1[0],
                                     p1, pv1[0], num_sample=0.5)
    out_a, out_b = r_a(), r_b()

    ref_a = engine.odometry_step(p2[None], v2[None], d1[0], ov1[0],
                                 p1, pv1[0], num_sample=0.5)
    ref_b = engine.odometry_step(p3[None], v3[None], d1[0], ov1[0],
                                 p1, pv1[0], num_sample=0.5)
    for got, ref in [(out_a, ref_a), (out_b, ref_b)]:
        np.testing.assert_allclose(got[3], ref[3], atol=1e-6)   # SE3
        assert got[4] == pytest.approx(ref[4], abs=1e-7)        # conf
        np.testing.assert_allclose(got[6], ref[6], rtol=1e-6)   # info


def test_device_cache_thread_stress(engine):
    """4 threads hammer register_with_info_async with OVERLAPPING tokens:
    the shared LRU device cache (get/move/insert/evict under one lock)
    must stay consistent and every resolver must return a valid result
    (multi-agent mode shares one engine across agent threads + cloud)."""
    import threading

    rng = np.random.default_rng(7)
    pad = 4096
    n_scans = 6
    clouds = [_cloud(rng, 1200 + 50 * i, pad) for i in range(n_scans)]
    descs = []
    for pts, val in clouds:
        d, ov, pv = engine.extract(pts[None], val[None])
        descs.append((d[0], ov[0], pts, pv[0]))

    # tiny byte budget (~4 point-cloud entries) so eviction churns
    # constantly under contention
    old_cap = engine._dcache_budget
    engine._dcache_budget = 200_000
    engine.invalidate_device_cache()
    errors = []
    results = [[] for _ in range(4)]

    def worker(w):
        try:
            r = np.random.default_rng(w)
            for it in range(12):
                i = int(r.integers(0, n_scans))
                j = int(r.integers(0, n_scans))
                di, ovi, pi, pvi = descs[i]
                dj, ovj, pj, pvj = descs[j]
                SE3, conf, rmse, info = engine.register_with_info(
                    di, ovi, dj, ovj, pi, pvi, pj, pvj,
                    src_token=100 + i, dst_token=100 + j)
                assert np.all(np.isfinite(SE3)) and np.isfinite(rmse)
                assert np.all(np.isfinite(info))
                results[w].append((i, j, SE3))
                if it % 5 == 4:
                    engine.invalidate_device_cache(100 + i)
        except Exception as e:       # noqa: BLE001
            errors.append((w, repr(e)))

    threads = [threading.Thread(target=worker, args=(w,)) for w in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    engine._dcache_budget = old_cap
    assert not errors, errors
    assert (engine._dcache_bytes <= 200_000
            or len(engine._dcache) == 1), (engine._dcache_bytes,
                                           len(engine._dcache))

    # cached-path results identical to a cold single-thread rerun
    engine.invalidate_device_cache()
    for w in range(4):
        for (i, j, SE3) in results[w][:3]:
            di, ovi, pi, pvi = descs[i]
            dj, ovj, pj, pvj = descs[j]
            SE3_cold, _, _, _ = engine.register_with_info(
                di, ovi, dj, ovj, pi, pvi, pj, pvj)
            np.testing.assert_allclose(SE3, SE3_cold, atol=1e-5)


def test_upload_quantization_roundtrip(tmp_path_factory):
    """int16 upload quantization: sentinel-coded validity decodes exactly;
    coordinates within LSB/2; extraction output stays within a small
    tolerance of the unquantized engine."""
    import jax.numpy as jnp

    from tests.test_slam_e2e import small_args
    from deeppointmap_tpu.pipeline.common import init_params
    from deeppointmap_tpu.slam.engine import InferenceEngine

    rng = np.random.default_rng(3)
    pad = 4096
    pts, val = _cloud(rng, 2000, pad)

    args_q = small_args(tmp_path_factory.mktemp("quant"))
    args_q.tpu["upload_quant"] = "int16"
    enc, dec, ep, dp = init_params(args_q, seed=0)
    eng_q = InferenceEngine(args_q, ep, dp, encoder=enc, decoder=dec)

    # encode/decode roundtrip: LSB/2 inside the representable range,
    # clipping beyond it (production-safe: host-mode coords are <=1 after
    # the 60 m crop + /60 normalize; raw mode clips to +-65.5 m, outside
    # the crop)
    q = eng_q.encode_points(pts, val)
    assert q.dtype == np.int16
    np.testing.assert_array_equal(q[~val, 0], np.int16(-32768))
    dec_pts = q.astype(np.float32) * eng_q.quant_scale
    lim = 32767 * eng_q.quant_scale
    in_range = val & (np.abs(pts) <= lim - eng_q.quant_scale).all(axis=1)
    err = np.abs(dec_pts[in_range] - pts[in_range]).max()
    assert err <= eng_q.quant_scale * 0.5 * 1.05, err  # LSB/2 + fp32 eps
    assert np.abs(dec_pts[val]).max() <= lim + 1e-9  # clip, never wrap

    args_n = small_args(tmp_path_factory.mktemp("noquant"))
    args_n.tpu["upload_quant"] = "none"
    eng_n = InferenceEngine(args_n, ep, dp, encoder=enc, decoder=dec)

    d_q, ov_q, pv_q = eng_q.extract(pts[None], val[None])
    d_n, ov_n, pv_n = eng_n.extract(pts[None], val[None])
    # filter decisions are stable under LSB/2 coordinate perturbation
    np.testing.assert_array_equal(pv_q, pv_n)
    np.testing.assert_array_equal(ov_q, ov_n)
    assert d_q.shape == d_n.shape and np.isfinite(d_q).all()
    # NOTE: individual FPS picks may legitimately differ (argmax near-ties
    # cascade); the trajectory-level accuracy cost of quantization is
    # measured on real scans by scripts/parity_trajectory.py (PARITY.md)


def _fake_scanset(engine, rng, n_scans, pad=4096):
    """Extract descriptors for n_scans clouds; returns member tuples +
    host arrays for the oracle path."""
    out = []
    for i in range(n_scans):
        pts, val = _cloud(rng, 1000 + 37 * i, pad)
        d, ov, pv = engine.extract(pts[None], val[None])
        theta = 0.15 * i
        R = np.array([[np.cos(theta), -np.sin(theta), 0],
                      [np.sin(theta), np.cos(theta), 0], [0, 0, 1.0]])
        SE3 = np.eye(4)
        SE3[:3, :3] = R
        SE3[:3, 3] = [3.0 * i, 0.5 * i, 0.0]
        out.append(dict(token=500 + i, desc=d[0], kv=ov[0],
                        pts=pts * engine.coor_scale, pv=pv[0], SE3=SE3))
    return out


def _host_tile(scans, centering):
    """Oracle: the host-built map tile (valid tokens, centered)."""
    R, t = centering[:3, :3], centering[:3, 3]
    rows = []
    for s in scans:
        kp = s["desc"][s["kv"]].copy()
        w = kp[:, -3:] @ s["SE3"][:3, :3].T + s["SE3"][:3, 3]
        kp[:, -3:] = (w - t) @ R
        rows.append(kp)
    tile = np.concatenate(rows, 0).astype(np.float32)
    return tile, np.ones(tile.shape[0], bool)


def test_device_tile_matches_host_tile(engine):
    """register_scan_to_map (tile assembled ON DEVICE from cached member
    descriptors) must match the host-built-tile register_with_info."""
    rng = np.random.default_rng(9)
    scans = _fake_scanset(engine, rng, 4)
    members = scans[:3]
    target = scans[3]
    centering = members[0]["SE3"]

    engine.invalidate_device_cache()
    mt = [(s["token"], s["desc"], s["kv"], s["SE3"]) for s in members]
    SE3_d, conf_d, rmse_d, info_d = \
        engine.register_scan_to_map_with_info_async(
            mt, centering, target["desc"], target["kv"],
            members[0]["pts"], members[0]["pv"],
            target["pts"], target["pv"], num_sample=0.5,
            src_token=members[0]["token"], dst_token=target["token"])()

    tile, tvalid = _host_tile(members, centering)
    SE3_h, conf_h, rmse_h, info_h = engine.register_with_info(
        tile, tvalid, target["desc"], target["kv"],
        members[0]["pts"], members[0]["pv"], target["pts"], target["pv"],
        num_sample=0.5)

    np.testing.assert_allclose(SE3_d, SE3_h, atol=1e-4)
    assert conf_d == pytest.approx(conf_h, abs=1e-4)
    assert rmse_d == pytest.approx(rmse_h, abs=1e-4)
    np.testing.assert_allclose(info_d, info_h, rtol=1e-3, atol=1e-2)

    # second call: all members now device-cached (no uploads) -> identical
    SE3_d2, conf_d2, _, _ = engine.register_scan_to_map_with_info_async(
        mt, centering, target["desc"], target["kv"],
        members[0]["pts"], members[0]["pv"],
        target["pts"], target["pv"], num_sample=0.5,
        src_token=members[0]["token"], dst_token=target["token"])()
    np.testing.assert_allclose(SE3_d2, SE3_d, atol=1e-6)


def test_device_tile_map_to_map(engine):
    """Map-vs-map device tiles: matches host tiles registered directly."""
    rng = np.random.default_rng(10)
    scans = _fake_scanset(engine, rng, 6)
    src_m, dst_m = scans[:3], scans[3:]
    c_s, c_d = src_m[0]["SE3"], dst_m[0]["SE3"]

    engine.invalidate_device_cache()
    SE3_d, conf_d, rmse_d, info_d = \
        engine.register_map_to_map_with_info_async(
            [(s["token"], s["desc"], s["kv"], s["SE3"]) for s in src_m],
            c_s,
            [(s["token"], s["desc"], s["kv"], s["SE3"]) for s in dst_m],
            c_d,
            src_m[0]["pts"], src_m[0]["pv"],
            dst_m[0]["pts"], dst_m[0]["pv"], num_sample=0.5)()

    s_tile, s_valid = _host_tile(src_m, c_s)
    d_tile, d_valid = _host_tile(dst_m, c_d)
    SE3_h, conf_h, rmse_h, info_h = engine.register_with_info(
        s_tile, s_valid, d_tile, d_valid,
        src_m[0]["pts"], src_m[0]["pv"], dst_m[0]["pts"], dst_m[0]["pv"],
        num_sample=0.5)
    np.testing.assert_allclose(SE3_d, SE3_h, atol=1e-4)
    assert conf_d == pytest.approx(conf_h, abs=1e-4)


def test_loop_scores_by_token_matches_host(engine):
    """Token-cached loop scoring == host-stacked loop_scores."""
    rng = np.random.default_rng(12)
    scans = _fake_scanset(engine, rng, 5)
    cands, new = scans[:4], scans[4]

    engine.invalidate_device_cache()
    probs_dev = engine.loop_scores_by_token(
        [(s["token"], s["desc"], s["kv"]) for s in cands],
        new["desc"], new["kv"], new_token=new["token"])

    src = np.stack([s["desc"] for s in cands])
    sv = np.stack([s["kv"] for s in cands])
    dst = np.repeat(new["desc"][None], 4, 0)
    dv = np.repeat(new["kv"][None], 4, 0)
    probs_host = engine.loop_scores(src, dst, sv, dv)
    np.testing.assert_allclose(probs_dev, probs_host, atol=1e-5)

    # cached second call identical
    probs2 = engine.loop_scores_by_token(
        [(s["token"], s["desc"], s["kv"]) for s in cands],
        new["desc"], new["kv"], new_token=new["token"])
    np.testing.assert_allclose(probs2, probs_dev, atol=1e-7)


def test_loop_scores_by_token_chunked_bounded_compiles(engine):
    """Loop scoring chunks candidate batches at the largest batch
    bucket: probabilities must be independent of how the batch splits,
    and the jit must NOT grow a new signature per candidate count
    (regression for the long-stream recompile-per-event defect)."""
    rng = np.random.default_rng(3)
    pad = 4096
    pts, val = _cloud(rng, 1200, pad)
    d0, _, _ = engine.extract(pts[None], val[None])
    kt, ch = d0.shape[1:]
    assert kt == engine.n_tokens
    c = rng.normal(0, 0.5, (kt, ch)).astype(np.float32)

    def member(tok):
        d = (c + rng.normal(0, 0.05, c.shape)).astype(np.float32)
        kv = np.ones((kt,), bool)
        return (tok, d, kv)

    new_d, new_kv = member(0)[1], np.ones((kt,), bool)
    step = engine.batch_buckets[-1]
    n = step + 7                       # forces a 2-chunk split
    members = [member(100 + i) for i in range(n)]

    probs = engine.loop_scores_by_token(members, new_d, new_kv,
                                        new_token=999)
    assert probs.shape == (n,)
    # equality with per-chunk direct calls (same split points)
    p1 = engine.loop_scores_by_token(members[:step], new_d, new_kv,
                                     new_token=999)
    p2 = engine.loop_scores_by_token(members[step:], new_d, new_kv,
                                     new_token=999)
    np.testing.assert_allclose(probs, np.concatenate([p1, p2]),
                               rtol=1e-6, atol=1e-6)

    for extra in (1, 3, 5, 9, 13, 20, 27):    # many counts, few buckets
        engine.loop_scores_by_token(members[:step + extra], new_d, new_kv,
                                    new_token=999)
    # signatures bounded by the BUCKET SET, not the candidate counts
    # (pre-fix: one fresh executable per distinct count)
    assert (engine._loop_members_fn._cache_size()
            <= len(engine.batch_buckets))


def test_register_multi_matches_single(engine):
    """Batched multi-candidate registration (one vmapped bucketed program,
    engine.register_with_info_multi_async) must reproduce the
    per-candidate register_with_info results, including through the
    device cache and across bucket padding (3 real candidates pad to the
    4-bucket)."""
    rng = np.random.default_rng(11)
    pad = 4096
    scale = engine.coor_scale

    def scanlike(seed):
        p, v = _cloud(np.random.default_rng(seed), 1100 + 37 * seed, pad)
        d, ov, pv = engine.extract(p[None], v[None])
        return d[0], ov[0], p * scale, pv[0]

    cands = [scanlike(s) for s in (1, 2, 3)]
    dstd, dstv, dpcd, dpv = scanlike(4)

    singles = [engine.register_with_info(
        d, ov, dstd, dstv, pc, pv, dpcd, dpv, num_sample=0.5)
        for d, ov, pc, pv in cands]

    for rep in range(2):     # 2nd pass exercises the token-cache branch
        resolvers = engine.register_with_info_multi_async(
            [(d, ov, pc, pv, 9000 + i) for i, (d, ov, pc, pv)
             in enumerate(cands)],
            dstd, dstv, dpcd, dpv, num_sample=0.5, dst_token=9100)
        assert len(resolvers) == 3
        for (SE3_s, conf_s, rmse_s, info_s), res in zip(singles, resolvers):
            SE3_m, conf_m, rmse_m, info_m = res()
            np.testing.assert_allclose(SE3_m, SE3_s, atol=1e-4)
            assert conf_m == pytest.approx(conf_s, abs=1e-5)
            assert rmse_m == pytest.approx(rmse_s, abs=1e-4)
            np.testing.assert_allclose(info_m, info_s, rtol=1e-3,
                                       atol=1e-3)
