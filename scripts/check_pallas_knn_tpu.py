"""Validate the fused distance+top-k(+moments) Pallas kernel
(ops/pallas_knn.py) on the REAL TPU with real KITTI sample scans.

The gate is PARITY WITH THE XLA FAST PATH IT REPLACES, not an absolute
f64 standard: at raw-meter scale every expansion-form distance
(|c|^2 - 2 c.p + |p|^2, the only MXU-shaped form) carries ~5e-3 m^2
cross-term rounding -- the production XLA path (pairwise_dist2 at
Precision.HIGH = 3-pass bf16) included. Near-duplicate scan points sit
at true d2 ~ 1e-4 m^2, so decode relerr against an f64 subtraction-form
oracle is dominated by that shared floor for BOTH paths. (The first
version of this script gated on absolute thresholds calibrated on
sigma=20 gaussian fixtures; real 000005.bin read decode p99 59 and
moment-cnt 0.92 -- numbers the XLA path reproduces, see BASELINE.md
round 5.)

Per metric, per scan, both paths run against the same f64 oracle:

  1. top-k recall at the encoder widths (k=17 self+moments, k=33 self,
     k=33 for the stage-1 4096x16384 query);
  2. decoded dist2 vs the true distance at the returned index;
  3. self-hit for the filter/self-graph case;
  4. ascending order (max inversion magnitude);
  5. radius-moment membership + accumulation vs f64 (filter shape).

PASS = kernel no worse than XLA beyond the stated slack, AND recall
>= 0.95 absolute (the approx_max_k contract). Timing belongs to
scripts/ab_pallas_knn.py.

Usage: python scripts/check_pallas_knn_tpu.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _metrics(idx, d2, D, valid, sub_rng, k):
    """Shared metric set for one (idx, dist2) result vs the f64 oracle."""
    n = D.shape[1]
    s = idx.shape[0]
    sub = sub_rng.choice(s, min(512, s), replace=False)
    oidx = np.argsort(D[sub], axis=1)[:, :k]
    hits = sum(len(set(idx[t]) & set(o)) for t, o in zip(sub, oidx))
    recall = hits / (len(sub) * k)

    true = np.take_along_axis(D[:s], idx, 1)
    near = true < 1e8
    rel = np.abs(d2 - true)[near] / np.maximum(true[near], 1e-4)
    p50, p99 = np.percentile(rel, (50, 99))

    selfhit = np.nan
    if s == n:
        vr = valid
        selfhit = (idx[vr] == np.arange(n)[vr, None]).any(1).mean()

    inv = float(np.maximum(-np.diff(d2, axis=1), 0.0).max())
    return dict(recall=recall, p50=p50, p99=p99, selfhit=selfhit, inv=inv)


def _moment_metrics(cnt, s_m, S6, D, P, valid, sub, radius, ii6, jj6):
    w = (D[sub] <= radius * radius).astype(np.float64)
    cnt_o = np.maximum(w.sum(1), 1.0)
    s_o = w @ P
    S6_o = w @ (P[:, ii6] * P[:, jj6])
    same = cnt[sub] == cnt_o
    serr = np.abs(s_m[sub][same] - s_o[same]).max() if same.any() else 0.0
    Serr = np.abs(S6[sub][same] - S6_o[same]).max() if same.any() else 0.0
    return dict(cnt=same.mean(), serr=serr, Serr=Serr)


def main() -> None:
    import jax
    import jax.numpy as jnp
    import yaml

    from deeppointmap_tpu.config import Config, TPU_DEFAULTS
    from deeppointmap_tpu.data.preprocess import PreprocessConfig
    from deeppointmap_tpu.data.readers import read_auto
    from deeppointmap_tpu.ops import neighbors
    from deeppointmap_tpu.ops.normals import filter_sweep
    from deeppointmap_tpu.ops.pallas_knn import fused_knn_moments, supported
    from deeppointmap_tpu.pipeline.infer import make_infer_transform

    print("devices:", jax.devices())
    interpret = jax.default_backend() != "tpu"
    if interpret:
        print("ERROR: parity A/B needs the TPU fast grade; no TPU backend")
        sys.exit(2)

    args = Config(yaml.safe_load(open("configs/infer/sample.yaml")))
    tpu = Config(TPU_DEFAULTS)
    for k, v in (args.get("tpu") or {}).items():
        tpu[k] = v
    args.tpu = tpu
    run_tf = make_infer_transform(args)
    cfg = PreprocessConfig.from_transforms(dict(args.transforms))
    radius = float(cfg.normals_radius)

    sample = "/root/reference/data/sample/seq06/velodyne"
    ii6, jj6 = np.triu_indices(3)
    failures = []

    def check(name, ok, detail):
        tag = "ok " if ok else "FAIL"
        print(f"  [{tag}] {name}: {detail}")
        if not ok:
            failures.append(name)

    for fname in ("000000.bin", "000005.bin"):
        raw = read_auto(os.path.join(sample, fname))
        pc, _, _, vmask, _ = run_tf(raw)   # device mode: raw meters
        pts = np.asarray(pc[0], np.float32)
        valid = np.asarray(vmask[0], bool)
        n = pts.shape[0]
        print(f"{fname}: {n} slots, {valid.sum()} valid, "
              f"radius {radius:.3f} m")

        # f64 oracle distances (valid-masked)
        P = pts.astype(np.float64)
        D = ((P[:, None, :] - P[None, :, :]) ** 2).sum(-1)
        D = D + np.where(valid, 0.0, 1e9)[None, :]

        # --- self-graph cases: filter (k=17 + moments) and level (k=33)
        for k, with_moments in ((17, True), (33, False)):
            assert supported(n, n)
            grade = "filter" if with_moments else "fast"
            r = radius if with_moments else 0.0

            neighbors.USE_PALLAS_KNN = False
            ref = filter_sweep(jnp.asarray(pts), jnp.asarray(valid), k,
                               r, grade)
            mx = _metrics(np.asarray(ref[0]), np.asarray(ref[1]), D,
                          valid, np.random.default_rng(0), k)

            out = fused_knn_moments(
                jnp.asarray(pts), jnp.asarray(valid), jnp.asarray(pts),
                k=k, radius=r)
            mp = _metrics(np.asarray(out[0]), np.asarray(out[1]), D,
                          valid, np.random.default_rng(0), k)

            check(f"recall k={k}",
                  mp["recall"] > 0.95 and mp["recall"] > mx["recall"] - 0.01,
                  f"pallas {mp['recall']:.4f} vs xla {mx['recall']:.4f}")
            check(f"decode k={k}",
                  mp["p50"] < 2 * mx["p50"] + 1e-3
                  and mp["p99"] < 2 * mx["p99"] + 1e-2,
                  f"p50 {mp['p50']:.2e}/{mx['p50']:.2e} "
                  f"p99 {mp['p99']:.2e}/{mx['p99']:.2e} (pallas/xla)")
            check(f"self-hit k={k}", mp["selfhit"] > 0.999,
                  f"{mp['selfhit']:.4f}")
            check(f"ascending k={k}", mp["inv"] < 2 * mx["inv"] + 1e-3,
                  f"max inversion pallas {mp['inv']:.2e} "
                  f"vs xla {mx['inv']:.2e}")

            if with_moments:
                sub = np.random.default_rng(0).choice(n, 512, replace=False)
                ox = _moment_metrics(np.asarray(ref[2]), np.asarray(ref[3]),
                                     np.asarray(ref[4]), D, P, valid, sub,
                                     radius, ii6, jj6)
                op = _moment_metrics(np.asarray(out[2]), np.asarray(out[3]),
                                     np.asarray(out[4]), D, P, valid, sub,
                                     radius, ii6, jj6)
                check("moment cnt", op["cnt"] > ox["cnt"] - 0.01,
                      f"match pallas {op['cnt']:.4f} vs xla {ox['cnt']:.4f}")
                check("moment s/S6",
                      op["serr"] < 2 * ox["serr"] + 5e-3
                      and op["Serr"] < 2 * ox["Serr"] + 1e-1,
                      f"pallas |ds| {op['serr']:.2e} |dS6| {op['Serr']:.2e}"
                      f" vs xla {ox['serr']:.2e} / {ox['Serr']:.2e}")

        # --- stage-1 shape: 4096 centers (first SA level) vs all points
        ctr = pts[:4096]
        neighbors.USE_PALLAS_KNN = False
        ref = neighbors.knn(jnp.asarray(pts), jnp.asarray(ctr), 33,
                            jnp.asarray(valid), grade="fast")
        mx = _metrics(np.asarray(ref[0]), np.asarray(ref[1]), D, valid,
                      np.random.default_rng(1), 33)
        out = fused_knn_moments(jnp.asarray(pts), jnp.asarray(valid),
                                jnp.asarray(ctr), k=33)
        mp = _metrics(np.asarray(out[0]), np.asarray(out[1]), D, valid,
                      np.random.default_rng(1), 33)
        check("recall 4096x16384 k=33",
              mp["recall"] > 0.95 and mp["recall"] > mx["recall"] - 0.01,
              f"pallas {mp['recall']:.4f} vs xla {mx['recall']:.4f}")

    neighbors.USE_PALLAS_KNN = True
    if failures:
        print("RESULT: FAIL --", ", ".join(sorted(set(failures))))
        sys.exit(1)
    print("RESULT: ALL OK (parity with the XLA fast path)")


if __name__ == "__main__":
    main()
