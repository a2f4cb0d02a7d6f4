"""Benchmark: end-to-end odometry throughput on the real TPU chip.

Prints ONE JSON line:
  {"metric": "scans_per_sec_odometry", "value": N, "unit": "scans/s",
   "vs_baseline": N / REF_CPU_SCANS_PER_SEC,
   "trials": [...],                    # median-of-5 (tunnel load varies)
   "accuracy": {"ate_m": ..., "ate_no_loop_m": ..., "loop_edges": ...}}

The accuracy block runs full SLAM with the committed trained synthetic
weights (artifacts/synthetic_demo/weights_final.msgpack, produced by
scripts/train_synthetic_demo.py) around a closed synthetic loop, with and
without loop closure, so accuracy regressions are machine-visible round
over round. `value` stays throughput (the driver's primary metric).
A bounded `scale` block (300-frame multi-lap stream, scripts/scale_run.py)
adds a multi-loop-edge regression signal plus RSS-growth tracking.

A <=120 s tunnel-health probe gates everything: when the device link is
down the bench prints {"...", "error": "tunnel_down: ..."} within ~2
minutes instead of burning the driver budget (round-3 post-mortem).

Measures the production pipelined inference mode (SlamSystem MT_*,
--multi_thread) streaming the bundled 11-frame KITTI sample; per frame
this covers the reference's hot path (reference: system/core.py:360-409):
on-device preprocessing, descriptor extraction (full DeepPointMap-B
encoder, 16384-point padded scan), registration against the odometry
candidate (256 vs 256 descriptors), the 6x6 information matrix, and all
SLAM bookkeeping (mapping gates, keyframing, loop-closure scheduling).
Falls back to an engine-level double-buffered loop of the same fused
per-frame device call if the pipelined run fails.

Baseline: the reference implementation measured on this machine's CPU
(torch 8 threads, pure-python pytorch3d fallbacks, same preprocessed
input): 3.03 s encoder + 0.07 s registration = 0.322 scans/s.

The TPU tunnel on this machine is single-client and occasionally refuses
a claim right after another process releases it, so the measurement runs
in a child process that is retried on tunnel-init failure.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

REF_CPU_SCANS_PER_SEC = 0.322

# Hard wall-clock budget for the whole bench (driver kills us eventually;
# better to stop measuring and print a parseable line ourselves first).
BENCH_BUDGET_SEC = int(os.environ.get("BENCH_BUDGET_SEC", "4500"))


def _probe(q):
    """Tunnel-health probe: init the backend and do one tiny transfer."""
    try:
        import jax
        import numpy as np

        devs = jax.devices()
        x = jax.device_put(np.ones((8,), np.float32), devs[0])
        assert float(x.sum()) == 8.0
        q.put({"ok": str(devs[0])})
    except Exception as e:   # noqa: BLE001 — any init failure = tunnel down
        q.put({"error": f"{type(e).__name__}: {e}"})


def _measure(q, mode="mt"):
    import numpy as np
    import jax
    import jax.numpy as jnp

    try:
        jax.devices()
    except RuntimeError as e:
        q.put({"error": f"tunnel: {e}"})
        return

    import yaml

    from deeppointmap_tpu.config import Config, TPU_DEFAULTS
    from deeppointmap_tpu.data.readers import read_auto
    from deeppointmap_tpu.pipeline.common import init_params
    from deeppointmap_tpu.slam.engine import InferenceEngine

    args = Config(yaml.safe_load(open("configs/infer/sample.yaml")))
    tpu = Config(TPU_DEFAULTS)
    for k, v in (args.get("tpu") or {}).items():
        tpu[k] = v
    args.tpu = tpu

    # host side: voxel downsample + pad only (the filter chain runs fused
    # on-device inside the extract/odometry call)
    from deeppointmap_tpu.pipeline.infer import (device_preprocess_config,
                                                 make_infer_transform)

    run_tf = make_infer_transform(args)
    sample_dir = "/root/reference/data/sample/seq06/velodyne"
    frames = []
    for i in range(11 if mode == "mt" else 2):
        scan = read_auto(f"{sample_dir}/{i:06d}.bin")
        frames.append(run_tf(scan))
    scans = [(f[0][0], f[3][0]) for f in frames]

    enc, dec, enc_params, dec_params = init_params(args, seed=0)
    engine = InferenceEngine(args, enc_params, dec_params,
                             encoder=enc, decoder=dec,
                             preprocess_cfg=device_preprocess_config(args))

    # warm up / compile: extraction once, then the fused odometry step
    # (the per-frame production path: preprocess + extract + register +
    # info matrix in ONE device call)
    d0, dv0, pv0 = engine.extract(scans[0][0][None], scans[0][1][None])
    cand_desc, cand_valid = d0[0], dv0[0]
    cand_pcd, cand_pvalid = scans[0][0], pv0[0]
    engine.odometry_step(scans[1][0][None], scans[1][1][None],
                         cand_desc, cand_valid, cand_pcd, cand_pvalid,
                         num_sample=0.5)

    if mode == "mt":
        # the production inference path: full SlamSystem in pipelined
        # (--multi_thread) mode, streaming the 11 sample frames repeatedly
        import os

        from deeppointmap_tpu.slam.system import SlamSystem

        os.makedirs("/tmp/dpm_bench", exist_ok=True)
        warm = SlamSystem(args, engine, system_id=1,
                          logger_dir="/tmp/dpm_bench")
        warm.warmup(frames[0])
        for f in frames[:3]:
            warm.step(f)

        trials = []
        for trial in range(5):   # median-of-5: tunnel load varies 15-30%
            system = SlamSystem(args, engine, system_id=2 + trial,
                                logger_dir="/tmp/dpm_bench")
            system.MT_Init()
            n_loops = 8
            t0 = time.perf_counter()
            for _ in range(n_loops):
                for f in frames:
                    system.MT_Step(f)
            system.MT_Done()
            system.MT_Wait()
            dt = (time.perf_counter() - t0) / (n_loops * len(frames))
            trials.append(1.0 / dt)
        q.put({"scans_per_sec": sorted(trials)[len(trials) // 2],
               "trials": [round(t, 2) for t in trials]})
        return

    # fallback mode: engine-level steady state, double-buffered like the
    # MT odometer stage (dispatch frame i+1 before fetching frame i)
    n_iter = 30
    t0 = time.perf_counter()
    prev = None
    for i in range(n_iter):
        buf, v = scans[i % 2]
        cur = engine.odometry_step_async(buf[None], v[None], cand_desc,
                                         cand_valid, cand_pcd, cand_pvalid,
                                         num_sample=0.5)
        if prev is not None:
            prev()
        prev = cur
    prev()
    dt = (time.perf_counter() - t0) / n_iter
    q.put({"scans_per_sec": 1.0 / dt})


def _accuracy(q):
    """Closed-loop SLAM accuracy with TRAINED weights on a deterministic
    two-lap synthetic world, with and without loop closure.

    Runs the FULL-SIZE DeepPointMap-B model on the full-density eval
    world; falls back to the small demo model (artifacts/synthetic_demo/)
    if no full-size artifact is present. The primary artifact is the
    round-5 OCCLUDED model (artifacts/full_size_occ_v2/: extent-120
    z-buffer-rendered worlds + warm start + robust register -- the first
    full-size artifact whose loop head fires: ATE 4.52 m with 1 verified
    loop edge vs 6.06 m loops-off, BASELINE.md round 5), with the
    round-3 un-occluded model (artifacts/full_size/) as fallback."""
    import os
    import sys

    import numpy as np

    repo = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, repo)
    try:
        import jax
        jax.devices()
    except RuntimeError as e:
        q.put({"error": f"tunnel: {e}"})
        return

    from deeppointmap_tpu.pipeline.common import load_weights
    from deeppointmap_tpu.pipeline.infer import (device_preprocess_config,
                                                 run_sequence)
    from deeppointmap_tpu.slam.engine import InferenceEngine
    from deeppointmap_tpu.utils.evaluation import ate_rmse

    full_w = next((p for p in (
        os.path.join(repo, "artifacts/full_size_occ_v2/weights_final.msgpack"),
        os.path.join(repo, "artifacts/full_size/weights_final.msgpack"),
    ) if os.path.exists(p)), "")
    demo_w = os.path.join(repo, "artifacts/synthetic_demo/"
                                "weights_final.msgpack")

    def run_block(make_args, wpath, root):
        """Two-lap SLAM, loops on and off: the second lap revisits the
        first beyond the trust zone, so loop closure must detect, verify
        and optimize; the loops-on vs loops-off ATE delta is the
        round-over-round accuracy signal."""
        blk = {}
        for name, loops in (("ate_m", True), ("ate_no_loop_m", False)):
            args = make_args()
            args.infer_src = [os.path.join(root, "scene0", "0")]
            args.slam_system.enable_loop_closure = loops
            args.slam_system.enable_global_optimization = loops
            enc, dec, ep, dp = load_weights(args, wpath)
            engine = InferenceEngine(
                args, ep, dp, encoder=enc, decoder=dec,
                preprocess_cfg=device_preprocess_config(args))
            system = run_sequence(args, engine, args.infer_src[0],
                                  "/tmp/dpm_bench_acc", system_id=1)
            pg = system.posegraph_map
            scans = sorted(pg.get_all_scans(), key=lambda s: s.timestep)
            pred = np.stack([s.SE3_pred for s in scans])
            gt = np.stack([s.SE3_gt for s in scans])
            blk[name] = round(float(ate_rmse(pred, gt, align=True)), 4)
            if loops:
                blk["loop_edges"] = int(pg.loop_edge_num)
        return blk

    out = None
    if full_w:
        # PRIMARY: the full-size DeepPointMap-B model trained at
        # production shapes (scripts/train_full_size.py) on its
        # full-density eval world
        from scripts.train_full_size import (apply_artifact_render,
                                             build_eval_world,
                                             full_eval_args)

        root = "/tmp/dpm_full_world2"
        apply_artifact_render(full_w)   # occluded artifact -> occluded world
        build_eval_world(root)
        out = run_block(lambda: full_eval_args(root, "/tmp/dpm_bench_acc"),
                        full_w, root)
        out["model"] = "full_size_B"
    if os.path.exists(demo_w):
        # demo-scale block: the original loop-closure regression signal
        # (sparse scans, compact world). Kept as a second, cheaper canary
        # now that the full-size occluded block also fires loops.
        from deeppointmap_tpu.data.synthetic import (circle_trajectory,
                                                     make_world,
                                                     write_npz_sequence)
        from scripts.train_synthetic_demo import demo_args

        droot = "/tmp/dpm_bench_world2"
        rng = np.random.default_rng(0)
        lap = circle_trajectory(48, radius=25.0)
        if not os.path.isdir(os.path.join(droot, "scene0")):
            write_npz_sequence(droot, make_world(rng), lap + lap, rng=rng,
                               max_points=2000)

        def demo_make():
            a = demo_args(droot, "/tmp/dpm_bench_acc")
            a.slam_system.loop_detection_trust_range = 15
            return a

        demo_blk = run_block(demo_make, demo_w, droot)
        if out is None:
            out = demo_blk
            out["model"] = "demo_small"
        else:
            out["demo"] = demo_blk
    if out is None:
        q.put({"error": f"no weights artifact under {repo}/artifacts"})
        return
    q.put({"accuracy": out})


def _scale(q):
    """Bounded multi-lap scale block: ~3 drifting laps (300 frames)
    through the FULL MT SLAM system with loop closure on, demo weights.
    Several loop edges fire (vs exactly 1 in the two-lap accuracy world),
    so loop-closure regressions are driver-visible round over round."""
    import os
    import sys

    repo = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, repo)
    sys.stdout = sys.stderr   # the parent owns the single JSON line
    try:
        import jax
        jax.devices()
    except RuntimeError as e:
        q.put({"error": f"tunnel: {e}"})
        return

    from scripts.scale_run import run_scale

    s = run_scale(frames=300, block=100, root="/tmp/dpm_scale_world300",
                  out="/tmp/dpm_bench_scale")
    q.put({"scale": {
        "frames": s["frames"], "ate_m": s["ate_m"],
        "loop_edges": s["loop_edges"],
        "loop_floor_ok": s["loop_floor_ok"], "keyframes": s["keyframes"],
        "scans_per_sec_first_block": s["scans_per_sec_first_block"],
        "scans_per_sec_last_block": s["scans_per_sec_last_block"],
        "rss_growth_mb": round(s["rss_last_block_mb"]
                               - s["rss_first_block_mb"], 1)}})


def _run_child(ctx, target, args, timeout):
    """Run target(q, *args) in a child; return its result dict or an
    error dict. Never blocks past `timeout` seconds."""
    q = ctx.Queue()
    p = ctx.Process(target=target, args=(q, *args))
    p.start()
    p.join(timeout=max(1, timeout))
    if p.is_alive():
        p.terminate()
        p.join(10)
        if p.is_alive():
            p.kill()
            p.join()
        return {"error": "timeout"}
    try:
        return q.get(timeout=5)
    except Exception:
        return {"error": "no result (child died)"}


def _emit_error(err):
    """ALWAYS leave one parseable JSON line, even with the tunnel down."""
    print(json.dumps({"metric": "scans_per_sec_odometry", "value": 0.0,
                      "unit": "scans/s", "vs_baseline": 0.0,
                      "error": err}))


def main():
    deadline = time.monotonic() + BENCH_BUDGET_SEC
    remaining = lambda: deadline - time.monotonic()   # noqa: E731
    ctx = mp.get_context("spawn")

    # --- tunnel health gate: a dead link must cost minutes, not hours ---
    probe = _run_child(ctx, _probe, (), timeout=min(120, remaining()))
    if "ok" not in probe:
        _emit_error(f"tunnel_down: {probe.get('error', 'unknown')}")
        return
    print(f"# tunnel ok: {probe['ok']}", file=sys.stderr)

    result = None
    # two attempts at the full pipelined system, then the simpler
    # engine-level loop as a fallback (both measure the same per-frame
    # hot path; the pipelined mode additionally overlaps SLAM bookkeeping)
    modes = ["mt", "mt", "engine", "engine"]
    for attempt, mode in enumerate(modes):
        if remaining() < 300:
            result = result or {"error": "budget exhausted"}
            break
        result = _run_child(ctx, _measure, (mode,),
                            timeout=min(1800, remaining() - 120))
        if "error" not in result:
            break
        print(f"# attempt {attempt}: {result['error']}", file=sys.stderr)
        time.sleep(20)

    if result is None or "error" in result:
        _emit_error((result or {}).get("error", "unknown"))
        return

    # accuracy pass (separate child: the tunnel is single-client and a
    # fresh process avoids any wedged-claim state)
    accuracy = None
    for _ in range(2):
        if remaining() < 300:
            break
        acc_res = _run_child(ctx, _accuracy, (),
                             timeout=min(2400, remaining() - 60))
        if "accuracy" in acc_res:
            accuracy = acc_res["accuracy"]
            break
        print(f"# accuracy pass: {acc_res.get('error')}", file=sys.stderr)
        time.sleep(20)

    # scale block (multi-lap loop-closure regression signal)
    scale = None
    if remaining() > 240:
        scale_res = _run_child(ctx, _scale, (),
                               timeout=min(900, remaining() - 60))
        if "scale" in scale_res:
            scale = scale_res["scale"]
        else:
            print(f"# scale pass: {scale_res.get('error')}",
                  file=sys.stderr)

    v = result["scans_per_sec"]
    line = {"metric": "scans_per_sec_odometry",
            "value": round(v, 3), "unit": "scans/s",
            "vs_baseline": round(v / REF_CPU_SCANS_PER_SEC, 2),
            "trials": result.get("trials")}
    if accuracy is not None:
        line["accuracy"] = accuracy
    if scale is not None:
        line["scale"] = scale
    print(json.dumps(line))


if __name__ == "__main__":
    main()
