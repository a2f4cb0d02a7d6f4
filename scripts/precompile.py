"""Warm the persistent compile cache for every production shape.

First compiles take minutes each on this toolchain; this front-loads
them once (extract B=1/chunk, fused odometry, register+info at every
map-tile bucket, loop scoring at every batch bucket) so inference runs
at steady state from frame one.

Usage: python scripts/precompile.py [--yaml_file configs/infer/sample.yaml]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from deeppointmap_tpu.config import load_config
    from deeppointmap_tpu.pipeline.common import init_params
    from deeppointmap_tpu.pipeline.infer import device_preprocess_config
    from deeppointmap_tpu.slam.engine import InferenceEngine

    argv = sys.argv[1:] or ["--yaml_file", "configs/infer/sample.yaml"]
    args = load_config(argv)
    enc, dec, enc_params, dec_params = init_params(args, seed=0)
    engine = InferenceEngine(args, enc_params, dec_params, encoder=enc,
                             decoder=dec,
                             preprocess_cfg=device_preprocess_config(args))

    pad = int(args.tpu.encoder_points)
    rng = np.random.default_rng(0)
    pts = rng.normal(0, 10, size=(1, pad, 3)).astype(np.float32)
    valid = np.ones((1, pad), bool)

    t0 = time.time()
    print("extract B=1 ...", flush=True)
    desc, dv, pv = engine.extract(pts, valid)
    print(f"  {time.time() - t0:.0f}s", flush=True)

    t0 = time.time()
    print(f"extract B={engine.extract_chunk} ...", flush=True)
    engine.extract(np.repeat(pts, engine.extract_chunk, 0),
                   np.repeat(valid, engine.extract_chunk, 0))
    print(f"  {time.time() - t0:.0f}s", flush=True)

    t0 = time.time()
    print("fused odometry step ...", flush=True)
    engine.odometry_step(pts, valid, desc[0], dv[0], pts[0], pv[0])
    print(f"  {time.time() - t0:.0f}s", flush=True)

    c = desc.shape[-1]
    for bucket in engine.reg_buckets:
        t0 = time.time()
        print(f"register+info tile bucket {bucket} ...", flush=True)
        tile = rng.normal(size=(bucket, c)).astype(np.float32)
        tv = np.ones(bucket, bool)
        engine.register_with_info(tile, tv, desc[0], dv[0],
                                  pts[0], pv[0], pts[0], pv[0])
        print(f"  {time.time() - t0:.0f}s", flush=True)

    for bb in engine.batch_buckets:
        t0 = time.time()
        print(f"loop scoring batch {bb} ...", flush=True)
        n_tok = engine.n_tokens
        sb = rng.normal(size=(bb, n_tok, c)).astype(np.float32)
        vb = np.ones((bb, n_tok), bool)
        engine.loop_scores(sb, sb, vb, vb)
        print(f"  {time.time() - t0:.0f}s", flush=True)
    print("precompile complete")


if __name__ == "__main__":
    main()
