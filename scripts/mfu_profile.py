"""Auditable device-utilization (MFU) report for the inference hot path.

Answers "is it actually fast, or just faster than a slow baseline?" with
numbers a reviewer can check without the device link:

  * XLA's own cost model (compiled.cost_analysis(): flops / bytes
    accessed) for each hot program -- the same numbers the compiler
    schedules by, independent of our arithmetic;
  * steady-state wall time measured as a CHAIN of dependent calls inside
    the measurement loop (single-call timings through the tunnel are
    unreliable -- see BASELINE.md);
  * achieved FLOP/s and HBM bandwidth vs the chip's theoretical peaks,
    i.e. the roofline position of each program.

The encoder is neighbor-query bound (top-k + gathers), not matmul bound,
so LOW MFU is the *expected* shape here -- the report also prints the
bandwidth side, which is the binding roof for this workload. Reference
hot path being measured: system/core.py:360-409 (odometry) feeding
network/encoder/pointnext.py:45-61 (grouping).

Optionally (--trace DIR) also writes a jax.profiler trace for op-level
inspection.

Usage (real chip): python scripts/mfu_profile.py [--trials 30]
CPU smoke:         PYTHONPATH= JAX_PLATFORMS=cpu python scripts/mfu_profile.py --trials 2
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: theoretical peaks per chip generation. v5e (the bench target):
#: 197 TFLOP/s bf16, ~98.5 TFLOP/s f32-via-3-pass (HIGH), 819 GB/s HBM.
PEAKS = {
    "tpu_v5e": dict(bf16_tflops=197.0, f32_tflops=98.5, hbm_gbps=819.0),
    "cpu": dict(bf16_tflops=1.0, f32_tflops=1.0, hbm_gbps=50.0),
}


def chip_peaks():
    import jax

    if jax.default_backend() == "tpu":
        return "tpu_v5e", PEAKS["tpu_v5e"]
    return "cpu", PEAKS["cpu"]


def cost_of(compiled):
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))


def steady_ms(fn, trials: int, warmup: int = 3) -> float:
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn())
    t0 = time.perf_counter()
    out = None
    for _ in range(trials):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / trials * 1e3


def train_step_program(trials: int):
    """Row for the PRODUCTION stage-1 train step at full DeepPointMap-B
    shapes (16384-pt pad, S=2 frames, AdamW), built by the production
    Trainer on a single synthetic scene. Returns (name, ms, flops,
    bytes) — the jitted step is lowered once so cost_analysis reflects
    exactly what runs."""
    import jax

    from scripts.train_full_size import (build_eval_world, full_train_args,
                                         _build_trainer)

    # dedicated root: bench.py/evaluate() build /tmp/dpm_full_world2 with
    # the ARTIFACT's render settings; sharing it would ping-pong
    # regenerate the world on every alternating run (advisor finding)
    root = "/tmp/dpm_mfu_world"
    build_eval_world(root)
    args = full_train_args(root, "/tmp/dpm_mfu_train")
    # one-scene dataset is enough for a timing row
    args.dataset[0]["scenes"] = ["scene0"]
    trainer, _ = _build_trainer(args)
    trainer._setup_stage()
    it = trainer._iter_batches()
    batch = next(it)
    step = trainer.train_step
    compiled = None
    try:
        compiled = step.lower(trainer.state, batch).compile()
    except AttributeError:
        pass

    state = trainer.state
    # run the AOT-compiled object when available: one compilation serves
    # both cost_analysis and the timing loop (the bare jitted `step`
    # would compile the full-shape program a second time)
    run = compiled if compiled is not None else step

    def one():
        nonlocal state
        state, m = run(state, batch)
        return m["loss"]

    ms = steady_ms(one, trials)
    if compiled is not None:
        flops, byts = cost_of(compiled)
    else:
        flops = byts = 0.0
    return "stage-1 train step (full shapes, S=2, b=1)", ms, flops, byts


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=30)
    ap.add_argument("--train_step", action="store_true",
                    help="also measure the production stage-1 train "
                         "step at full shapes (builds a trainer; adds "
                         "a few minutes of compile)")
    ap.add_argument("--trace", default="",
                    help="also write a jax.profiler trace to this dir")
    ap.add_argument("--json_out", default="",
                    help="write the report rows as JSON here")
    cli = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import yaml

    from deeppointmap_tpu.config import Config, TPU_DEFAULTS
    from deeppointmap_tpu.data.readers import read_auto
    from deeppointmap_tpu.models.decoder import num_pairs_for
    from deeppointmap_tpu.pipeline.common import init_params
    from deeppointmap_tpu.pipeline.infer import (device_preprocess_config,
                                                 make_infer_transform)
    from deeppointmap_tpu.slam.engine import InferenceEngine

    name, peaks = chip_peaks()
    print(f"backend: {jax.default_backend()} ({name}), devices:",
          jax.devices())

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

    pd = engine._put(pts1[None].astype(np.float32))
    vd = engine._put(v1[None])
    cd = engine._put(d0)
    cv = engine._put(dv0)
    cand_pcd = engine._put(pts0.astype(np.float32))
    cand_pv = engine._put(pv0[0])

    k_tokens = engine.n_tokens
    npairs = num_pairs_for(k_tokens, k_tokens, 0.5)
    np_actual = jnp.int32(npairs)

    # the three hot programs, as (name, jitted fn, example args)
    programs = [
        ("extract (preprocess+encoder)",
         jax.jit(engine._extract_impl), (pd, vd)),
        ("fused odometry (extract+reg+info)",
         jax.jit(engine._odometry_impl, static_argnames=("num_pairs",)),
         (pd, vd, cd[0], cv[0], cand_pcd, cand_pv),
         dict(num_pairs=npairs, num_pairs_actual=np_actual)),
        ("register 256v256",
         jax.jit(engine._register_impl, static_argnames=("num_pairs",)),
         (cd[0], cd[0], cv[0], cv[0]),
         dict(num_pairs=npairs, num_pairs_actual=np_actual)),
    ]

    rows = []
    for entry in programs:
        pname, fn, fargs = entry[0], entry[1], entry[2]
        fkw = entry[3] if len(entry) > 3 else {}
        compiled = fn.lower(*fargs, **fkw).compile()
        flops, byts = cost_of(compiled)
        ms = steady_ms(lambda: fn(*fargs, **fkw), cli.trials)
        tflops = flops / (ms * 1e-3) / 1e12
        gbps = byts / (ms * 1e-3) / 1e9
        rows.append(dict(
            program=pname, ms=round(ms, 3),
            xla_gflops=round(flops / 1e9, 2),
            xla_gbytes=round(byts / 1e9, 3),
            achieved_tflops=round(tflops, 3),
            mfu_vs_f32_peak_pct=round(100 * tflops
                                      / peaks["f32_tflops"], 2),
            achieved_hbm_gbps=round(gbps, 1),
            hbm_util_pct=round(100 * gbps / peaks["hbm_gbps"], 1),
        ))

    if cli.train_step:
        tname, tms, tflops_raw, tbytes = train_step_program(
            max(5, cli.trials // 3))
        tf = tflops_raw / (tms * 1e-3) / 1e12
        gb = tbytes / (tms * 1e-3) / 1e9
        rows.append(dict(
            program=tname, ms=round(tms, 3),
            xla_gflops=round(tflops_raw / 1e9, 2),
            xla_gbytes=round(tbytes / 1e9, 3),
            achieved_tflops=round(tf, 3),
            mfu_vs_f32_peak_pct=round(100 * tf / peaks["f32_tflops"], 2),
            achieved_hbm_gbps=round(gb, 1),
            hbm_util_pct=round(100 * gb / peaks["hbm_gbps"], 1),
        ))

    if cli.trace:
        os.makedirs(cli.trace, exist_ok=True)
        with jax.profiler.trace(cli.trace):
            for _ in range(5):
                out = programs[1][1](*programs[1][2], **programs[1][3])
            jax.block_until_ready(out)
        print(f"profiler trace written to {cli.trace}", file=sys.stderr)

    hdr = (f"{'program':42s} {'ms':>8s} {'GFLOP':>9s} {'GB':>8s} "
           f"{'TF/s':>7s} {'MFU%':>6s} {'GB/s':>8s} {'HBM%':>6s}")
    print()
    print(hdr)
    for r in rows:
        print(f"{r['program']:42s} {r['ms']:8.2f} {r['xla_gflops']:9.2f} "
              f"{r['xla_gbytes']:8.3f} {r['achieved_tflops']:7.2f} "
              f"{r['mfu_vs_f32_peak_pct']:6.2f} "
              f"{r['achieved_hbm_gbps']:8.1f} {r['hbm_util_pct']:6.1f}")
    print(f"\npeaks assumed ({name}): {peaks}")

    if cli.json_out:
        with open(cli.json_out, "w") as f:
            json.dump(dict(backend=name, peaks=peaks, trials=cli.trials,
                           rows=rows), f, indent=1)
        print(f"json report -> {cli.json_out}", file=sys.stderr)


if __name__ == "__main__":
    main()
