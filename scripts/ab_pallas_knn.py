"""On-chip A/B for the fused Pallas kNN kernel (ops/pallas_knn.py).

Times the two production programs the kernel sits inside -- extract
(preprocess + encoder) and the fused odometry step -- with
neighbors.USE_PALLAS_KNN off (XLA fast path: HIGH distance matmul ->
HBM tile -> approx_max_k) vs on (single-pass VMEM kernel). The fused
kernel's perf thesis: the (C, N) distance tile never round-trips HBM
(extract measured at 65.7% HBM util / 0.39% MFU,
artifacts/mfu_report.json).

Decision rule (VERDICT round-4 item 3): ship ON only with a clear
fused-step win AND downstream neutrality (filter-survivor flips +
two-lap ATE A/B, recorded in BASELINE.md).

Usage: python scripts/ab_pallas_knn.py [--trials 30]
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
    cli = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import yaml

    from deeppointmap_tpu.config import Config, TPU_DEFAULTS
    from deeppointmap_tpu.data.readers import read_auto
    from deeppointmap_tpu.models.decoder import num_pairs_for
    from deeppointmap_tpu.ops import neighbors
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

    rows = []
    for flag in (False, True):
        neighbors.USE_PALLAS_KNN = flag
        engine = InferenceEngine(args, ep, dp, encoder=enc, decoder=dec,
                                 preprocess_cfg=device_preprocess_config(
                                     args))
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

        tag = "pallas-knn" if flag else "xla-fast"
        pre = jax.jit(lambda p, v, e=engine: e._maybe_preprocess(p, v))
        rows.append((f"preprocess [{tag}]",
                     timeit(lambda: pre(pd, vd), cli.trials)))
        rows.append((f"extract [{tag}]",
                     timeit(lambda: engine._extract_fn(pd, vd), cli.trials)))
        rows.append((f"fused odometry [{tag}]", timeit(
            lambda: engine._odometry_fn(
                pd, vd, cd[0], cv[0], cand_pcd, cand_pv,
                num_pairs=npairs, num_pairs_actual=jnp.int32(npairs)),
            cli.trials)))

    print()
    for name, ms in rows:
        print(f"{name:42s} {ms:8.2f} ms")


if __name__ == "__main__":
    main()
