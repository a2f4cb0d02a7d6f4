"""Real-data training smoke: the full production-shape training stack on
the bundled REAL KITTI frames, with ICP-bootstrapped ground truth.

No GT poses or training datasets ship with the reference mirror, so this
script demonstrates the label-free bootstrap path on actual LiDAR:

  1. ICP-chain the 11 sample scans into pseudo-GT poses (identity init;
     the sample car moves ~0.07 m/frame, well inside the ICP basin);
  2. write them as an npz training scene + regenerate refined_SE3.pkl
     (scripts/make_refined_se3.py) -- the exact artifact the reference's
     stage-1 training consumes;
  3. run stage-1 registration training steps at FULL DeepPointMap-B
     shapes (npoint 4096..16, 16384-pt pad, 256 tokens) on the TPU.

Usage: python scripts/train_real_smoke.py [--steps 5]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SAMPLE = "/root/reference/data/sample/seq06/velodyne"


def build_scene(root: str) -> None:
    from deeppointmap_tpu.data.readers import read_auto
    from deeppointmap_tpu.data.voxel import voxel_downsample
    from scripts.make_refined_se3 import icp_point_to_point

    agent_dir = os.path.join(root, "scene0", "0")
    os.makedirs(agent_dir, exist_ok=True)
    scans, downs = [], []
    for i in range(11):
        s = read_auto(os.path.join(SAMPLE, f"{i:06d}.bin"))
        scans.append(s.xyz)
        r = np.linalg.norm(s.xyz[:, :2], axis=1)
        near = s.xyz[(r > 2.5) & (r < 50)]
        downs.append(voxel_downsample(np.asarray(near, np.float64), 0.4))
    pose = np.eye(4)
    poses = [pose]
    for i in range(1, 11):
        T, rmse = icp_point_to_point(downs[i], downs[i - 1], np.eye(4),
                                     iters=40, max_corr=2.0)
        pose = poses[-1] @ T       # T maps frame i -> frame i-1
        poses.append(pose)
        print(f"  icp {i - 1}->{i}: |t|={np.linalg.norm(T[:3, 3]):.3f} m "
              f"rmse={rmse:.3f}")
    for i, (xyz, P) in enumerate(zip(scans, poses)):
        np.savez(os.path.join(agent_dir, f"{i}.npz"), lidar_pcd=xyz,
                 ego_rotation=P[:3, :3].astype(np.float32),
                 ego_translation=P[:3, 3:].astype(np.float32))


def full_size_train_args(root: str, out: str):
    from deeppointmap_tpu.config import Config, TPU_DEFAULTS, config_from_yaml

    base = config_from_yaml(os.path.join(REPO, "configs/infer/sample.yaml"))
    args = Config(
        dataset=[dict(name="kitti_sample", root=root, scenes=["scene0"],
                      reader=dict(type="npz"))],
        transforms={
            # the infer yaml's host chain minus augmentation; training
            # still voxel-samples + crops + normalizes on the host
            "VoxelSample": {"voxel_size": 0.3, "retention": "first"},
            "DistanceSample": {"min_dis": 1.0, "max_dis": 60.0},
            "CoordinatesNormalization": {"ratio": 60.0},
            "ToTensor": {"padding_to": -1},
        },
        encoder=base.encoder, decoder=base.decoder, loss=base.loss,
        slam_system=base.slam_system,
        train=dict(
            auto_cast=False, save_cycle=1000, log_cycle=1,
            registration=dict(num_epochs=1, batch_size=1, K=2, K_0=2,
                              K_mult=1, mult_epoch=1000, K_max=2,
                              fill=True, distance=10.0, map_size_max=2,
                              max_pairs=512,
                              optimizer=dict(type="adamw",
                                             kwargs=dict(lr=1e-4)),
                              scheduler=dict(type="identity")),
            loop_detection=dict(num_epochs=0, batch_size=1, distance=8.0,
                                optimizer=dict(type="adam",
                                               kwargs=dict(lr=1e-4)),
                                scheduler=dict(type="identity"))),
        tpu=dict(TPU_DEFAULTS),
        infer_tgt=out, weight="", checkpoint="",
    )
    return args


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--root", default="/tmp/dpm_real_smoke")
    ap.add_argument("--out", default="/tmp/dpm_real_smoke_out")
    ns = ap.parse_args()

    if not os.path.isdir(os.path.join(ns.root, "scene0")):
        print("building ICP-bootstrapped scene from the real sample ...")
        build_scene(ns.root)
    from scripts.make_refined_se3 import main as refine_main
    scene = os.path.join(ns.root, "scene0")
    if not os.path.exists(os.path.join(scene, "refined_SE3.pkl")):
        refine_main(["--scene", scene, "--max_distance", "10",
                     "--voxel", "0.4"])

    from deeppointmap_tpu.data.dataset import SlamDatasets
    from deeppointmap_tpu.data.transforms import PointCloudTransforms
    from deeppointmap_tpu.pipeline.common import init_params
    from deeppointmap_tpu.pipeline.trainer import Trainer

    args = full_size_train_args(ns.root, ns.out)
    rng = np.random.default_rng(0)
    tfs = PointCloudTransforms(args, mode="train", rng=rng)
    tfs.transforms.transforms = tfs.transforms.transforms[:-1]
    ds = SlamDatasets(args, data_transforms=tfs, rng=rng)
    print(f"real dataset: {len(ds)} frames; refined_SE3 present")

    enc, dec, ep, dp = init_params(args, seed=0)
    trainer = Trainer(args, ds, enc, dec, ep, dp, rng=rng)
    trainer._steps_per_epoch = lambda: ns.steps
    trainer._setup_stage()
    t0 = time.time()
    losses = []
    for i, batch in enumerate(trainer._iter_batches()):
        trainer.state, metrics = trainer.train_step(trainer.state, batch)
        losses.append(float(metrics["loss"]))
        print(f"step {i}: loss {losses[-1]:.4f} "
              f"top1_acc {float(metrics.get('top1_acc', np.nan)):.3f} "
              f"({time.time() - t0:.0f}s)", flush=True)
    assert all(np.isfinite(losses)), losses
    print(f"real-data production-shape training smoke OK: "
          f"{ns.steps} steps in {time.time() - t0:.0f}s, "
          f"loss {losses[0]:.3f} -> {losses[-1]:.3f}")


if __name__ == "__main__":
    main()
