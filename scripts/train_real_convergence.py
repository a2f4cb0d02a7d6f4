"""Real-data convergence: train DeepPointMap-B on the bundled REAL KITTI
frames to convergence, then report the trained model's SLAM trajectory
ATE against the ICP pseudo-ground-truth chain.

This extends scripts/train_real_smoke.py (5 loss-goes-down steps) to the
full label-free bootstrap story the reference supports with its training
datasets (reference: pipeline/modules/model_pipeline.py:199-272 consumes
ICP-refined pairwise SE3s; no GT poses or datasets ship with the mirror):

  1. ICP-chain the 11 real sample scans into pseudo-GT poses and write
     the npz training scene + refined_SE3.pkl (train_real_smoke.build_scene
     + scripts/make_refined_se3.py);
  2. train stage-1 registration at FULL DeepPointMap-B shapes through the
     production Trainer (same recipe family as scripts/train_full_size.py)
     to convergence;
  3. run the trained model as a complete SLAM system over the same 11
     frames and report ATE vs the ICP chain, alongside the no-motion
     (identity trajectory) baseline that any useful odometry must beat.

The 11 frames are both train and eval data -- this demonstrates the
real-data training path end to end, not generalization (there is no
held-out real sequence in the mirror). The result is recorded in
PARITY.md's real-data section.

Usage: python scripts/train_real_convergence.py [--epochs 50]
       [--skip_train --weights <msgpack>]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from scripts.train_real_smoke import build_scene, full_size_train_args  # noqa: E402


def train_args(root: str, out: str, epochs: int):
    """The smoke's full-size config, upgraded from a 5-step probe to a
    convergence recipe: cosine LR over `epochs` epochs, K curriculum up
    to 3 frames per group (11-frame scene keeps groups small anyway)."""
    args = full_size_train_args(root, out)
    args.train.registration.num_epochs = epochs
    args.train.registration.optimizer = dict(type="adamw",
                                             kwargs=dict(lr=5e-4))
    args.train.registration.scheduler = dict(type="cosine",
                                             kwargs=dict(eta_min=1e-5))
    args.train.registration.K_mult = 2
    args.train.registration.K_max = 3
    args.train.registration.mult_epoch = max(1, epochs // 2)
    args.train.registration.map_size_max = 3
    args.train.save_cycle = max(1, epochs // 2)
    args.train.log_cycle = 10
    return args


def eval_slam(weights: str, root: str, out: str) -> dict:
    """Sequential SLAM over the 11 real frames with the trained weights;
    ATE vs the ICP pseudo-GT stored in the npz scene."""
    from deeppointmap_tpu.pipeline.common import load_weights
    from deeppointmap_tpu.pipeline.infer import (device_preprocess_config,
                                                 run_sequence)
    from deeppointmap_tpu.slam.engine import InferenceEngine
    from deeppointmap_tpu.utils.evaluation import ate_rmse

    args = full_size_train_args(root, out)
    args.infer_src = [os.path.join(root, "scene0", "0")]
    args.multi_thread = False   # sequential step: ATE, not throughput
    # SLAM gates for a short, slow-motion real sequence: accept every
    # registration (the ICP chain shows ~0.07 m/frame), keyframe densely
    args.slam_system.edge_confidence_drop = 0.0
    args.slam_system.edge_rmse_drop = 5.0
    args.slam_system.key_frame_distance_0 = 0.05
    args.slam_system.enable_loop_closure = False
    args.slam_system.enable_global_optimization = False

    enc, dec, ep, dp = load_weights(args, weights)
    engine = InferenceEngine(args, ep, dp, encoder=enc, decoder=dec,
                             preprocess_cfg=device_preprocess_config(args))
    system = run_sequence(args, engine, args.infer_src[0], out, system_id=1)
    pg = system.posegraph_map
    scans = sorted(pg.get_all_scans(), key=lambda s: s.timestep)
    pred = np.stack([s.SE3_pred for s in scans])
    gt = np.stack([s.SE3_gt for s in scans])
    identity = np.broadcast_to(np.eye(4), gt.shape)
    return dict(
        frames=len(scans),
        ate_m=round(float(ate_rmse(pred, gt, align=True)), 4),
        ate_identity_baseline_m=round(
            float(ate_rmse(identity, gt, align=True)), 4),
        dropped=int(pg.all_frame_num - len(scans)),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=50)
    ap.add_argument("--root", default="/tmp/dpm_real_conv")
    ap.add_argument("--out", default="./log_train/real_conv")
    ap.add_argument("--skip_train", action="store_true")
    ap.add_argument("--weights", default="",
                    help="with --skip_train: weights to evaluate")
    ns = ap.parse_args()

    if not os.path.isdir(os.path.join(ns.root, "scene0")):
        print("building ICP-bootstrapped scene from the real sample ...")
        build_scene(ns.root)
    scene = os.path.join(ns.root, "scene0")
    if not os.path.exists(os.path.join(scene, "refined_SE3.pkl")):
        from scripts.make_refined_se3 import main as refine_main
        refine_main(["--scene", scene, "--max_distance", "10",
                     "--voxel", "0.4"])

    weights = ns.weights
    if not ns.skip_train:
        from deeppointmap_tpu.data.dataset import SlamDatasets
        from deeppointmap_tpu.data.transforms import PointCloudTransforms
        from deeppointmap_tpu.pipeline.common import init_params
        from deeppointmap_tpu.pipeline.trainer import Trainer

        args = train_args(ns.root, ns.out, ns.epochs)
        rng = np.random.default_rng(0)
        tfs = PointCloudTransforms(args, mode="train", rng=rng)
        tfs.transforms.transforms = tfs.transforms.transforms[:-1]
        ds = SlamDatasets(args, data_transforms=tfs, rng=rng)
        print(f"real dataset: {len(ds)} groups, {ns.epochs} epochs")
        enc, dec, ep, dp = init_params(args, seed=0)
        trainer = Trainer(args, ds, enc, dec, ep, dp, rng=rng)
        t0 = time.time()
        trainer.run()
        print(f"training done in {(time.time() - t0) / 60:.1f} min")
        weights = os.path.join(trainer.log_dir, "weights_final.msgpack")

    assert weights and os.path.exists(weights), weights
    res = eval_slam(weights, ns.root, ns.out)
    res["weights"] = weights
    print("REAL_DATA_RESULT " + json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
