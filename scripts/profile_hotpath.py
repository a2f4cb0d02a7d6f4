"""Per-component device timings of the odometry hot path at production
shapes, on the real TPU. Prints a table of steady-state milliseconds so
perf work targets the actual dominant cost (reference hot path:
system/core.py:360-409).

Device-only numbers are measured by dispatching `trials` calls
back-to-back and blocking once at the end: per-call host->device dispatch
overhead (~sub-ms) amortizes away and what remains is device compute.

Usage: python scripts/profile_hotpath.py [--trials 30]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, trials: int, warmup: int = 3) -> float:
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn())
    t0 = time.perf_counter()
    out = None
    for _ in range(trials):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / trials * 1e3


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=30)
    ap.add_argument("--encoder_stages", action="store_true",
                    help="additionally time per-stage query/gather ops")
    cli = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import yaml

    from deeppointmap_tpu.config import Config, TPU_DEFAULTS
    from deeppointmap_tpu.data.readers import read_auto
    from deeppointmap_tpu.ops.pallas_fps import fps_pallas_batched
    from deeppointmap_tpu.pipeline.common import init_params
    from deeppointmap_tpu.pipeline.infer import (device_preprocess_config,
                                                 make_infer_transform)
    from deeppointmap_tpu.slam.engine import InferenceEngine

    print("devices:", jax.devices())
    args = Config(yaml.safe_load(open("configs/infer/sample.yaml")))
    tpu = Config(TPU_DEFAULTS)
    for k, v in (args.get("tpu") or {}).items():
        tpu[k] = v
    args.tpu = tpu

    run_tf = make_infer_transform(args)
    sample = "/root/reference/data/sample/seq06/velodyne"
    frames = [run_tf(read_auto(f"{sample}/{i:06d}.bin")) for i in range(2)]
    scans = [(f[0][0], f[3][0]) for f in frames]

    enc, dec, ep, dp = init_params(args, seed=0)
    engine = InferenceEngine(args, ep, dp, encoder=enc, decoder=dec,
                             preprocess_cfg=device_preprocess_config(args))

    pts0, v0 = scans[0]
    pts1, v1 = scans[1]
    d0, dv0, pv0 = engine.extract(pts0[None], v0[None])

    # device-resident inputs (fp32 path so pieces compose)
    pd = engine._put(pts1[None].astype(np.float32))
    vd = engine._put(v1[None])
    cd = engine._put(d0)          # (1, K, C)
    cv = engine._put(dv0)
    cand_pcd = engine._put(pts0.astype(np.float32))
    cand_pv = engine._put(pv0[0])

    trials = cli.trials
    rows = []

    # dispatch-overhead control: a trivial jit call through the tunnel
    noop = jax.jit(lambda x: x + 1.0)
    z = engine._put(jnp.zeros((8, 128), jnp.float32))
    rows.append(("dispatch overhead (noop jit)", timeit(lambda: noop(z),
                                                        trials)))

    from deeppointmap_tpu.models.decoder import num_pairs_for

    k_tokens = engine.n_tokens
    npairs = num_pairs_for(k_tokens, k_tokens, 0.5)

    def odo():
        return engine._odometry_fn(pd, vd, cd[0], cv[0], cand_pcd, cand_pv,
                                   num_pairs=npairs,
                                   num_pairs_actual=jnp.int32(npairs))

    rows.append(("fused odometry (extract+reg+info)", timeit(odo, trials)))

    def ext():
        return engine._extract_fn(pd, vd)

    rows.append(("extract (preprocess+encoder)", timeit(ext, trials)))

    # preprocess chain alone
    pre = jax.jit(lambda p, v: engine._maybe_preprocess(p, v))

    def prep():
        return pre(pd, vd)

    rows.append(("device preprocess chain", timeit(prep, trials)))

    # preprocess A/B: measure the non-default moments paths too (split
    # vs merged XLA accumulation vs fused Pallas kernel, ops/normals.py).
    # The FUSED-step deltas below are the decision numbers; these
    # standalone rows carry the dispatch overhead.
    from deeppointmap_tpu.ops import normals as _normals

    for flag, name in (("USE_PALLAS_MOMENTS", "pallas"),
                       ("USE_MERGED_MOMENTS", "split-HIGH"),
                       ("USE_PALLAS_SWEEP", "pallas-sweep")):
        default = getattr(_normals, flag)
        setattr(_normals, flag, not default)
        alt = name if flag != "USE_MERGED_MOMENTS" or default else "merged"
        pre_alt = jax.jit(lambda p, v: engine._maybe_preprocess(p, v))
        rows.append((f"device preprocess ({alt} moments)",
                     timeit(lambda: pre_alt(pd, vd), trials)))
        fused_alt = jax.jit(lambda *a, **k: engine._odometry_impl(*a, **k),
                            static_argnames=("num_pairs",))
        rows.append((f"fused odometry ({alt} moments)",
                     timeit(lambda: fused_alt(
                         pd, vd, cd[0], cv[0], cand_pcd, cand_pv,
                         num_pairs=npairs,
                         num_pairs_actual=jnp.int32(npairs)), trials)))
        setattr(_normals, flag, default)

    # infomat-stride A/B (tpu.infomat_stride): strided G^T G estimate
    orig_stride = engine.infomat_stride
    engine.infomat_stride = 4
    fused_s4 = jax.jit(lambda *a, **k: engine._odometry_impl(*a, **k),
                       static_argnames=("num_pairs",))
    rows.append(("fused odometry (infomat_stride 4)",
                 timeit(lambda: fused_s4(
                     pd, vd, cd[0], cv[0], cand_pcd, cand_pv,
                     num_pairs=npairs,
                     num_pairs_actual=jnp.int32(npairs)), trials)))
    engine.infomat_stride = orig_stride

    # sweep-reuse A/B (tpu.sweep_reuse): stage-1 grouping served from the
    # widened filter sweep vs a fresh (npoint0, P) distance pass. A second
    # engine is built so both variants keep their own compiled programs.
    args_sr = Config(args)
    args_sr.tpu = Config(args.tpu)
    args_sr.tpu.sweep_reuse = True
    engine_sr = InferenceEngine(args_sr, ep, dp, encoder=enc, decoder=dec,
                                preprocess_cfg=device_preprocess_config(
                                    args_sr))
    rows.append(("fused odometry (sweep_reuse)",
                 timeit(lambda: engine_sr._odometry_fn(
                     pd, vd, cd[0], cv[0], cand_pcd, cand_pv,
                     num_pairs=npairs,
                     num_pairs_actual=jnp.int32(npairs)), trials)))
    rows.append(("extract (sweep_reuse)",
                 timeit(lambda: engine_sr._extract_fn(pd, vd), trials)))

    # encoder alone on preprocessed points
    pn, pvn, _ = pre(pd, vd)
    enc_fn = jax.jit(lambda p, v: engine.encoder.apply(
        engine.enc_params, p, v))

    def enc_only():
        return enc_fn(pn, pvn)

    rows.append(("encoder only", timeit(enc_only, trials)))

    # FPS stages at production shapes
    n_in = int(args.tpu.encoder_points)
    rng = np.random.default_rng(0)
    for k in [int(x) for x in args.encoder.npoint]:
        xyz = jnp.asarray(rng.normal(0, 0.4, (1, n_in, 3)), jnp.float32)
        vv = jnp.ones((1, n_in), bool)

        def f(xyz=xyz, vv=vv, k=k):
            return fps_pallas_batched(xyz, vv, k)

        rows.append((f"  fps {n_in}->{k}", timeit(f, trials)))
        n_in = k

    if cli.encoder_stages:
        # per-stage building-block costs at the exact stage shapes:
        # neighbor query (distances + top-k), feature gather + MLP.
        # Together with the fps rows above this decomposes "encoder only"
        # so perf work targets the dominant op, not a guess.
        from deeppointmap_tpu.ops.neighbors import hybrid_query, group_points

        grade = str(args.tpu.neighbor_grade)
        n_in = int(args.tpu.encoder_points)
        width = int(args.encoder.width)
        for si, k in enumerate(int(x) for x in args.encoder.npoint):
            r = float(args.encoder.radius_list[si][0])
            ns = int(args.encoder.nsample_list[si][0])
            xyz = jnp.asarray(rng.normal(0, 0.4, (n_in, 3)), jnp.float32)
            ctr = xyz[:k]
            vv = jnp.ones((n_in,), bool)
            q_fn = jax.jit(lambda p, c, v, ns=ns, r=r: hybrid_query(
                p, c, ns, r, v, grade=grade))
            rows.append((f"  query s{si} ({k}x{n_in}, k={ns})",
                         timeit(lambda: q_fn(xyz, ctr, vv), trials)))
            fea = jnp.asarray(rng.normal(0, 1, (n_in, width)), jnp.float32)
            gidx = q_fn(xyz, ctr, vv)
            g_fn = jax.jit(lambda f, i: group_points(f, i))
            rows.append((f"  gather s{si} ({k}x{ns}x{width})",
                         timeit(lambda: g_fn(fea, gidx), trials)))
            n_in = k
            width *= 2

    def reg():
        return engine._register_fn(cd[0], cd[0], cv[0], cv[0], num_pairs=npairs,
                                   num_pairs_actual=jnp.int32(npairs))

    rows.append(("register 256v256", timeit(reg, trials)))

    from deeppointmap_tpu.ops.infomat import information_matrix

    info_fn = jax.jit(lambda a, av, b, bv: information_matrix(
        a, av, b, bv, jnp.eye(3), jnp.zeros(3)))

    def info():
        return info_fn(cand_pcd, cand_pv, pn[0] * engine.coor_scale, pvn[0])

    rows.append(("information matrix", timeit(info, trials)))

    print()
    for name, ms in rows:
        print(f"{name:45s} {ms:8.2f} ms")


if __name__ == "__main__":
    main()
