"""End-to-end demonstration: TRAIN a model on a synthetic world, then run
the full SLAM system with the trained weights around a closed loop and
report ATE + loop-closure behavior.

This exercises the complete framework story with no external dataset or
pretrained checkpoint: world gen -> npz scene -> two-stage curriculum
training (registration, then loop head) -> inference -> trajectory
metrics.

Usage: python scripts/train_synthetic_demo.py [--steps 400] [--frames 60]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def demo_args(root, out_dir):
    from deeppointmap_tpu.config import Config, TPU_DEFAULTS

    args = Config(
        dataset=[dict(name="synthetic", root=root, scenes=["scene0"],
                      reader=dict(type="npz"))],
        transforms={
            # synthetic scans are <=35 m (data/synthetic.py sensor_range),
            # so this crop drops nothing -- it exists to satisfy the int16
            # upload guard (engine.py: max_dis must fit the +-65.5 m
            # quantization range) so the bench accuracy block prices the
            # PRODUCTION quantized upload path every round
            "DistanceSample": {"min_dis": 0.0, "max_dis": 60.0},
            "CoordinatesNormalization": {"ratio": 60.0},
            "ToTensor": {"padding_to": -1},
        },
        encoder=dict(npoint=[512, 128, 64, 16],
                     radius_list=[[0.03, 0.06], [0.06, 0.12],
                                  [0.12, 0.25], [0.25, 0.5]],
                     nsample_list=[[16, 16], [16, 16], [16, 16], [8, 8]],
                     in_channel=3, out_channel=64, width=16, expansion=4,
                     upsample_layers=2, sample=[{"type": "fps"}] * 4,
                     norm="LN", bias=True),
        decoder=dict(in_channel=64, model_channel=128, attention_layers=2),
        loss=dict(tau=0.1, offset_value="euclidean", eps_positive=1.0,
                  eps_offset=2.0, lambda_p=1.0, lambda_c=1.0, lambda_o=1.0),
        slam_system=dict(
            coor_scale=60,
            odometer_candidates_num=1, registration_sample_odometer=0.5,
            edge_confidence_drop=0.0, edge_rmse_drop=5.0,
            max_continuous_drop_scan=5,
            continuous_drop_scan_strategy="recover",
            key_frame_distance="auto", key_frame_distance_0=4.0,
            enable_s2m_adjust=True, registration_sample_mapping=0.5,
            enable_loop_closure=True, loop_detection_gap=0,
            loop_detection_transaction_gap=10.0,
            loop_detection_trust_range=3,
            loop_detection_gnss_distance=-1,
            loop_detection_pred_distance=100.0,
            loop_detection_rotation_min=30.0,
            loop_detection_translation_min=10.0,
            loop_detection_prob_acpt_threshold=0.6,
            loop_detection_candidates_num=1,
            registration_sample_loop=0.5,
            loop_detection_confidence_acpt_threshold=0.3,
            enable_global_optimization=True, global_optimization_gap=0),
        train=dict(
            auto_cast=False, save_cycle=1000, log_cycle=50,
            registration=dict(num_epochs=1, batch_size=1, K=3, K_0=3,
                              K_mult=1, mult_epoch=1000, K_max=6, fill=True,
                              distance=9.0, map_size_max=3, max_pairs=256,
                              optimizer=dict(type="adamw",
                                             kwargs=dict(lr=1e-3)),
                              scheduler=dict(type="cosine",
                                             kwargs=dict(eta_min=1e-5))),
            loop_detection=dict(num_epochs=1, batch_size=4, distance=10.0,
                                optimizer=dict(type="adam",
                                               kwargs=dict(lr=5e-4)),
                                scheduler=dict(type="identity"))),
        tpu=dict(encoder_points=2048, reg_buckets=[128, 256, 512, 1024],
                 loop_batch_buckets=[1, 4, 16, 64], extract_chunk=4,
                 bf16=True),
        infer_src=[os.path.join(root, "scene0", "0")],
        infer_tgt=out_dir, weight="", checkpoint="", multi_thread=False,
        num_workers=2, profile=False,
    )
    tpu = Config(TPU_DEFAULTS)
    for k, v in args.tpu.items():
        tpu[k] = v
    args.tpu = tpu
    return args


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--loop_steps", type=int, default=150)
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--root", default="/tmp/dpm_synth_world")
    ap.add_argument("--out", default="./log_infer/synthetic_demo")
    ns = ap.parse_args()

    from deeppointmap_tpu.data.synthetic import (circle_trajectory,
                                                 make_world,
                                                 write_npz_sequence)

    rng = np.random.default_rng(0)
    world = make_world(rng)
    poses = circle_trajectory(ns.frames, radius=25.0)
    if not os.path.isdir(os.path.join(ns.root, "scene0")):
        write_npz_sequence(ns.root, world, poses, rng=rng, max_points=2000)
    print(f"world: {world.shape[0]} pts, {ns.frames} frames", flush=True)

    os.makedirs(ns.out, exist_ok=True)
    args = demo_args(ns.root, ns.out)

    # ---------------------------------------------------------- training
    from deeppointmap_tpu.data.dataset import SlamDatasets
    from deeppointmap_tpu.data.transforms import PointCloudTransforms
    from deeppointmap_tpu.pipeline.common import init_params, save_weights
    from deeppointmap_tpu.pipeline.trainer import Trainer

    trng = np.random.default_rng(1)
    tfs = PointCloudTransforms(args, mode="train", rng=trng)
    tfs.transforms.transforms = tfs.transforms.transforms[:-1]
    ds = SlamDatasets(args, data_transforms=tfs, rng=trng)

    enc, dec, enc_params, dec_params = init_params(args, seed=0)
    trainer = Trainer(args, ds, enc, dec, enc_params, dec_params, rng=trng)
    trainer._steps_per_epoch = lambda: (
        ns.steps if trainer.stage == 1 else ns.loop_steps)
    trainer._setup_stage()
    t0 = time.time()
    trainer.run()
    print(f"training done in {time.time() - t0:.0f}s", flush=True)
    wpath = os.path.join(ns.out, "weights_final.msgpack")
    save_weights(wpath, trainer.state.enc_params, trainer.state.dec_params)

    # --------------------------------------------------------- inference
    from deeppointmap_tpu.pipeline.common import load_weights
    from deeppointmap_tpu.pipeline.infer import (device_preprocess_config,
                                                 run_sequence)
    from deeppointmap_tpu.slam.engine import InferenceEngine
    from deeppointmap_tpu.utils.evaluation import ate_rmse

    enc, dec, enc_params, dec_params = load_weights(args, wpath)
    engine = InferenceEngine(args, enc_params, dec_params, encoder=enc,
                             decoder=dec,
                             preprocess_cfg=device_preprocess_config(args))
    seq_dir = args.infer_src[0]
    t0 = time.time()
    system = run_sequence(args, engine, seq_dir, ns.out, system_id=1)
    dt = time.time() - t0

    pg = system.posegraph_map
    pred = np.stack([s.SE3_pred for s in
                     sorted(pg.get_all_scans(), key=lambda s: s.timestep)])
    gt = np.stack([s.SE3_gt for s in
                   sorted(pg.get_all_scans(), key=lambda s: s.timestep)])
    ate = ate_rmse(pred, gt, align=True)
    print(f"SLAM: {pg.all_frame_num} frames ({pg.key_frame_num} keyframes) "
          f"in {dt:.0f}s; odom edges {pg.odom_edge_num}, "
          f"loop edges {pg.loop_edge_num}", flush=True)
    print(f"ATE RMSE (aligned): {ate:.3f} m over a "
          f"{2 * np.pi * 25:.0f} m loop", flush=True)
    return ate, pg.loop_edge_num


if __name__ == "__main__":
    main()
