"""Validate the FULLY fused Pallas sweep (ops/pallas_sweep.py) on the
REAL TPU with real KITTI sample scans, against the criteria that gate
flipping USE_PALLAS_SWEEP on:

  1. top-k candidate recall vs the exact kNN at the filter width (17)
     and at the sweep_reuse width (41) -- must beat the XLA fast path's
     recall target (0.9 at grade 'filter');
  2. radius-moment accuracy vs f64 ground truth on sampled centers --
     must be at least as accurate as the XLA merged sweep it replaces
     (the kernel accumulates at HIGHEST; the XLA path's exact-bf16-split
     trick is tight but not tighter);
  3. self-hit: every valid point's own index must appear in its top-k
     (the encoder's sweep_reuse clamp depends on it).

Timing belongs to scripts/profile_hotpath.py's fused-step A/B rows, not
here (standalone rows carry tunnel dispatch noise).

Usage: python scripts/check_pallas_sweep_tpu.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp
    import yaml

    from deeppointmap_tpu.config import Config, TPU_DEFAULTS
    from deeppointmap_tpu.data.preprocess import PreprocessConfig
    from deeppointmap_tpu.data.readers import read_auto
    from deeppointmap_tpu.ops.neighbors import knn
    from deeppointmap_tpu.ops.pallas_sweep import (fused_sweep_pallas,
                                                   supported)
    from deeppointmap_tpu.pipeline.infer import make_infer_transform

    print("devices:", jax.devices())
    interpret = jax.default_backend() != "tpu"
    if interpret:
        print("WARNING: no TPU backend -- running the kernel in "
              "interpret mode (slow, correctness only)")

    args = Config(yaml.safe_load(open("configs/infer/sample.yaml")))
    tpu = Config(TPU_DEFAULTS)
    for k, v in (args.get("tpu") or {}).items():
        tpu[k] = v
    args.tpu = tpu
    run_tf = make_infer_transform(args)
    cfg = PreprocessConfig.from_transforms(dict(args.transforms))
    radius = float(cfg.normals_radius)

    sample = "/root/reference/data/sample/seq06/velodyne"
    ii, jj = np.triu_indices(3)
    for i in range(2):
        pc, _, _, valid, _ = run_tf(read_auto(f"{sample}/{i:06d}.bin"))
        pts = np.asarray(pc[0], np.float32)   # device mode: raw meters
        v = np.asarray(valid[0])
        n = pts.shape[0]
        assert supported(n), n
        ptsd, vd = jnp.asarray(pts), jnp.asarray(v)

        for k in (17, 41):
            out = fused_sweep_pallas(ptsd, vd, k, radius,
                                     interpret=interpret)
            idx_p, d2_p, cnt_p, s_p, S6_p = map(np.asarray, out)

            idx_e, _ = map(np.asarray, knn(ptsd, ptsd, k, vd))
            sel = np.where(v)[0][::64]
            hits = sum(len(np.intersect1d(idx_p[c], idx_e[c]))
                       for c in sel)
            recall = hits / (len(sel) * k)
            selfhit = float(np.mean([(c in idx_p[c]) for c in sel]))
            print(f"frame {i} k={k}: recall {recall:.4f}, "
                  f"self-hit {selfhit:.4f}")
            assert recall >= 0.93, recall
            assert selfhit == 1.0, selfhit

        # moments vs f64 truth on sampled centers (criterion 2)
        from deeppointmap_tpu.ops.normals import filter_sweep
        mx = jax.jit(lambda p_, v_: filter_sweep(p_, v_, 0, radius,
                                                 "exact"))(ptsd, vd)
        cnt_x, s_x, S6_x = map(np.asarray, mx)
        P = pts.astype(np.float64)
        sel = np.arange(0, n, 64)
        err_p = err_x = cntbad = 0.0
        for c in sel:
            d2 = ((P - P[c]) ** 2).sum(1)
            w = ((d2 <= radius * radius) & v).astype(np.float64)
            S6_t = (w[:, None, None]
                    * (P[:, :, None] * P[:, None, :])).sum(0)[ii, jj]
            cntbad += float(max(w.sum(), 1.0) != cnt_p[c])
            err_p = max(err_p, np.abs(S6_p[c] - S6_t).max())
            err_x = max(err_x, np.abs(S6_x[c] - S6_t).max())
        print(f"frame {i}: S6 err vs f64 -- pallas {err_p:.2e}, "
              f"xla-exact {err_x:.2e}; cnt mismatches "
              f"{int(cntbad)}/{len(sel)}")
        assert cntbad == 0
        assert err_p <= max(err_x * 1.05, 1e-3), (err_p, err_x)

    print("OK: fused Pallas sweep meets the flip-on criteria "
          "(now check the fused-step timing rows in profile_hotpath.py)")


if __name__ == "__main__":
    main()
