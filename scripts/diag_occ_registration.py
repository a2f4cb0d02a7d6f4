"""Diagnose eval-time registration of an occluded-world artifact.

The round-5 occ_v2 run hit stage-1 top-1 0.918 in TRAINING yet two-lap
SLAM on the matching eval world collapsed (ATE 42.9 m, 30 keyframes over
a 628 m GT path). This script isolates per-pair registration from the
SLAM machinery: for frame pairs at controlled separations it runs the
exact deployment path (extract -> engine.register) and scores the SE(3)
against the world's ego-pose GT.

Reads: which separation bucket breaks (consecutive ~3.3 m apart, or only
longer gaps), and whether confidence/rmse actually flag the failures
(if they don't, the mapping module's gates can't protect the graph).

Usage: python scripts/diag_occ_registration.py \
    [--weights artifacts/full_size_occ_v2/weights_final.msgpack] \
    [--root /tmp/dpm_full_world2_occl] [--step 6]
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def se3_err(pred: np.ndarray, gt: np.ndarray):
    """-> (rotation deg, translation m) of pred vs gt."""
    dR = pred[:3, :3].T @ gt[:3, :3]
    ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    return float(ang), float(np.linalg.norm(pred[:3, 3] - gt[:3, 3]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights",
                    default=os.path.join(
                        REPO, "artifacts/full_size_occ_v2/"
                              "weights_final.msgpack"))
    ap.add_argument("--root", default="/tmp/dpm_full_world2_occl")
    ap.add_argument("--step", type=int, default=6,
                    help="stride over source frames")
    ap.add_argument("--seps", default="1,2,4,8,16")
    ap.add_argument("--robust", action="store_true",
                    help="enable tpu.robust_register (RANSAC solve)")
    ns = ap.parse_args()

    from scripts.train_full_size import (apply_artifact_render,
                                         build_eval_world, full_eval_args)
    from deeppointmap_tpu.data.dataset import BasicAgent
    from deeppointmap_tpu.pipeline.common import load_weights
    from deeppointmap_tpu.pipeline.infer import (device_preprocess_config,
                                                 make_infer_transform)
    from deeppointmap_tpu.slam.engine import InferenceEngine
    from deeppointmap_tpu.utils import se3 as se3m

    apply_artifact_render(ns.weights)
    build_eval_world(ns.root)
    args = full_eval_args(ns.root, "/tmp/diag_occ")
    if ns.robust:
        args.tpu["robust_register"] = True
    enc, dec, ep, dp = load_weights(args, ns.weights)
    engine = InferenceEngine(args, ep, dp, encoder=enc, decoder=dec,
                             preprocess_cfg=device_preprocess_config(args))
    agent = BasicAgent(root=os.path.join(ns.root, "scene0", "0"),
                       reader="auto")
    agent.set_independent(make_infer_transform(args))

    n = len(agent)
    gt_pose, raw, descs = [], {}, {}
    npts = []
    for i in range(n):
        pc, R, T, v, orig = agent[i]
        G = np.eye(4)
        G[:3, :3] = np.asarray(R).reshape(3, 3)
        G[:3, 3] = np.asarray(T).reshape(3)
        gt_pose.append(G)
        raw[i] = (pc, v)
        npts.append(int(np.asarray(v).sum()))
    print(f"{n} frames; valid points/scan: min {min(npts)} "
          f"median {int(np.median(npts))} max {max(npts)}", flush=True)

    def desc_of(i):
        if i not in descs:
            pc, v = raw[i]
            d, dv, pv = engine.extract(pc, v)
            descs[i] = (np.asarray(d[0]), np.asarray(dv[0]))
        return descs[i]

    seps = [int(s) for s in ns.seps.split(",")]
    ss = args.slam_system
    for sep in seps:
        rows = []
        for i in range(0, n - sep, ns.step):
            j = i + sep
            sd, sv = desc_of(j)       # src = new scan j
            dd, dv = desc_of(i)       # dst = candidate/keyframe i
            # register: dst = SE3 @ src, i.e. scan-j coords -> scan-i frame
            SE3, conf, rmse = engine.register(
                sd, sv, dd, dv, num_sample=ss.registration_sample_odometer)
            gt_rel = se3m.inv(gt_pose[i]) @ gt_pose[j]
            r_e, t_e = se3_err(SE3, gt_rel)
            rows.append((r_e, t_e, conf, rmse,
                         float(np.linalg.norm(gt_rel[:3, 3]))))
        rows = np.array(rows)
        bad = rows[:, 1] > 1.0
        flagged = bad & ((rows[:, 2] < 0.2) | (rows[:, 3] > 1.0))
        print(f"sep {sep:2d} (gt |t| ~{np.median(rows[:, 4]):.2f} m, "
              f"{len(rows)} pairs): rot_err deg p50/p90/max "
              f"{np.percentile(rows[:, 0], 50):.2f}/"
              f"{np.percentile(rows[:, 0], 90):.2f}/{rows[:, 0].max():.2f} | "
              f"t_err m p50/p90/max {np.percentile(rows[:, 1], 50):.3f}/"
              f"{np.percentile(rows[:, 1], 90):.3f}/{rows[:, 1].max():.3f} | "
              f"conf p50 {np.percentile(rows[:, 2], 50):.3f} "
              f"rmse p50 {np.percentile(rows[:, 3], 50):.3f} | "
              f"bad(t>1m) {int(bad.sum())}, of which conf/rmse-flagged "
              f"{int(flagged.sum())}", flush=True)


if __name__ == "__main__":
    main()
