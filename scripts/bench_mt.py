"""Pipelined-mode throughput benchmark on the bundled KITTI sample.

Measures the MT_* stage pipeline (slam/system.py) in steady state: the
11 sample frames are host-preprocessed once, then streamed N_LOOPS times
through a fresh SlamSystem. Compare with bench.py, which measures the
fused odometry step double-buffered in a single thread.

Run from the repo root: python scripts/bench_mt.py
"""

import os
import sys
import time

import numpy as np
import yaml

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deeppointmap_tpu.config import TPU_DEFAULTS, Config  # noqa: E402

N_LOOPS = 8
SAMPLE = "/root/reference/data/sample/seq06/velodyne"


def main():
    args = Config(yaml.safe_load(open("configs/infer/sample.yaml")))
    tpu = Config(TPU_DEFAULTS)
    for k, v in (args.get("tpu") or {}).items():
        tpu[k] = v
    args.tpu = tpu
    args.multi_thread = True

    from deeppointmap_tpu.data.dataset import BasicAgent
    from deeppointmap_tpu.pipeline.common import init_params
    from deeppointmap_tpu.pipeline.infer import (device_preprocess_config,
                                                 make_infer_transform)
    from deeppointmap_tpu.slam.engine import InferenceEngine
    from deeppointmap_tpu.slam.system import SlamSystem

    enc, dec, enc_params, dec_params = init_params(args, seed=0)
    engine = InferenceEngine(args, enc_params, dec_params, encoder=enc,
                             decoder=dec,
                             preprocess_cfg=device_preprocess_config(args))
    agent = BasicAgent(root=SAMPLE, reader="auto")
    agent.set_independent(make_infer_transform(args))
    frames = [agent[i] for i in range(len(agent))]
    print(f"{len(frames)} frames preprocessed (host voxel only)", flush=True)

    out = "/tmp/dpm_bench_mt"
    os.makedirs(out, exist_ok=True)
    warm = SlamSystem(args, engine, system_id=1, logger_dir=out)
    warm.warmup(frames[0])
    for f in frames[:3]:
        warm.step(f)
    print("warmup done", flush=True)

    system = SlamSystem(args, engine, system_id=2, logger_dir=out)
    system.MT_Init()
    t0 = time.perf_counter()
    for _ in range(N_LOOPS):
        for f in frames:
            system.MT_Step(f)
    system.MT_Done()
    system.MT_Wait()
    dt = time.perf_counter() - t0
    n = N_LOOPS * len(frames)
    print(f"MT pipelined: {n} frames in {dt:.1f}s = {n / dt:.2f} scans/s")
    times = system.result_logger.log_time()
    print("stage mean ms (calls):",
          {k: (round(v[0] * 1000),
               len(system.result_logger.get_time_list(k)))
           for k, v in times.items()})


if __name__ == "__main__":
    main()
