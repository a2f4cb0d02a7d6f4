"""Learn -> SLAM end-to-end on a synthetic world (CPU, tiny model):
the trained registration must beat the untrained one on ATE."""

import os

import numpy as np
import pytest


def test_world_and_render():
    from deeppointmap_tpu.data.synthetic import (circle_trajectory,
                                                 make_world, render_scan)

    rng = np.random.default_rng(0)
    world = make_world(rng, n_clusters=15, extent=18.0, pts_per_cluster=100)
    poses = circle_trajectory(8, radius=10.0)
    s0 = render_scan(world, poses[0], sensor_range=30, rng=rng)
    s1 = render_scan(world, poses[1], sensor_range=30, rng=rng)
    assert s0.shape[1] == 3 and s0.shape[0] > 50
    # consecutive scans overlap: world-frame points of both near each other
    w0 = s0 @ poses[0][:3, :3].T + poses[0][:3, 3]
    w1 = s1 @ poses[1][:3, :3].T + poses[1][:3, 3]
    from scipy.spatial import cKDTree
    d, _ = cKDTree(w1).query(w0[:200], k=1)
    assert np.median(d) < 0.5  # same world structure


@pytest.mark.slow
def test_train_improves_registration(tmp_path):
    """300 training steps must reduce pairwise registration error on
    consecutive synthetic frames (direct measure; full-SLAM ATE at this
    tiny scale is too noisy for a reliable assertion)."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    import jax
    import optax
    from train_synthetic_demo import demo_args

    from deeppointmap_tpu.data.synthetic import (circle_trajectory,
                                                 make_world,
                                                 write_npz_sequence)

    rng = np.random.default_rng(0)
    world = make_world(rng, n_clusters=30, extent=20.0, pts_per_cluster=150)
    poses = circle_trajectory(16, radius=12.0)
    root = str(tmp_path / "world")
    write_npz_sequence(root, world, poses, rng=rng, max_points=800,
                       sensor_range=25.0)

    args = demo_args(root, str(tmp_path / "out"))
    args.encoder.npoint = [128, 64, 16]
    args.encoder.radius_list = [[0.03, 0.06], [0.06, 0.12], [0.12, 0.25]]
    args.encoder.nsample_list = [[8, 8], [8, 8], [8, 8]]
    args.encoder.sample = [{"type": "fps"}] * 3
    args.encoder.out_channel = 32
    args.encoder.width = 8
    args.decoder.in_channel = 32
    args.decoder.model_channel = 64
    args.decoder.attention_layers = 1
    args.tpu.encoder_points = 1024
    args.tpu.reg_buckets = [128, 256, 512]
    args.train.registration.max_pairs = 128
    args.train.registration.distance = 8.0
    args.train.registration.K = 2
    args.train.registration.K_max = 2

    from deeppointmap_tpu.data.dataset import SlamDatasets
    from deeppointmap_tpu.data.readers import read_auto
    from deeppointmap_tpu.data.transforms import PointCloudTransforms
    from deeppointmap_tpu.models.loss import LossConfig
    from deeppointmap_tpu.parallel.train_step import (
        TrainState, make_registration_train_step)
    from deeppointmap_tpu.pipeline.batching import build_registration_batch
    from deeppointmap_tpu.pipeline.common import init_params
    from deeppointmap_tpu.pipeline.infer import (device_preprocess_config,
                                                 make_infer_transform)
    from deeppointmap_tpu.slam.engine import InferenceEngine
    from deeppointmap_tpu.utils import se3 as se3m

    def reg_error(ep, dp):
        """Mean translation error of consecutive-pair registration."""
        engine = InferenceEngine(args, ep, dp, encoder=enc, decoder=dec,
                                 preprocess_cfg=device_preprocess_config(args))
        tf = make_infer_transform(args)
        errs = []
        prev = None
        for i in range(0, 8):
            scan = read_auto(os.path.join(root, "scene0", "0", f"{i}.npz"))
            gt_pose = se3m.se3(scan.rotation, scan.translation)
            pts, R, T, valid, _ = tf(scan)
            d, dv, pv = engine.extract(pts, valid)
            cur = (d[0], dv[0], gt_pose)
            if prev is not None:
                SE3, conf, rmse = engine.register(prev[0], prev[1],
                                                  cur[0], cur[1])
                # SE3 maps prev-frame points into cur frame; truth:
                true = se3m.inv(cur[2]) @ prev[2]
                errs.append(np.linalg.norm(SE3[:3, 3] - true[:3, 3]))
            prev = cur
        return float(np.mean(errs))

    enc, dec, ep0, dp0 = init_params(args, seed=0)
    err_before = reg_error(ep0, dp0)

    rng2 = np.random.default_rng(1)
    tfs = PointCloudTransforms(args, mode="train", rng=rng2)
    tfs.transforms.transforms = tfs.transforms.transforms[:-1]
    ds = SlamDatasets(args, data_transforms=tfs, rng=rng2)
    opt = optax.adamw(1e-3)
    state = TrainState(ep0, dp0, opt.init((ep0, dp0)), np.int32(0))
    step = jax.jit(make_registration_train_step(
        enc, dec, LossConfig.from_args(args), opt, 60.0, 128))
    for i in range(300):
        frames, info = ds[int(rng2.integers(0, len(ds)))]
        batch = build_registration_batch(frames, info,
                                         args.train.registration, 1024, rng2)
        state, m = step(state, batch)

    err_after = reg_error(state.enc_params, state.dec_params)
    assert np.isfinite(err_after)
    assert err_after < err_before * 0.8, (err_before, err_after)
