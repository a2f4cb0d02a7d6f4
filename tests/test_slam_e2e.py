"""End-to-end SLAM smoke test: real KITTI sample frames through the full
preprocessing -> encoder -> odometry -> mapping -> loop -> trajectory
pipeline with a small random-weight model on CPU (the reference's test
strategy is exactly this run, SURVEY.md section 4)."""

import os

import numpy as np
import pytest

from deeppointmap_tpu.config import Config

SAMPLE = "/root/reference/data/sample/seq06/velodyne"
pytestmark = pytest.mark.skipif(not os.path.isdir(SAMPLE),
                                reason="sample data not available")


def small_args(tmp_path):
    return Config(
        infer_src=[SAMPLE],
        infer_tgt=str(tmp_path),
        multi_thread=False,
        transforms={
            "VoxelSample": {"voxel_size": 1.0, "retention": "first"},
            "DistanceSample": {"min_dis": 1.0, "max_dis": 60.0},
            "CoordinatesNormalization": {"ratio": 60.0},
            "ToTensor": {"padding_to": -1},
        },
        encoder=dict(
            npoint=[256, 64, 16],
            radius_list=[[0.05, 0.1], [0.1, 0.2], [0.2, 0.4]],
            nsample_list=[[8, 8], [8, 8], [8, 8]],
            in_channel=3, out_channel=32, width=8, expansion=4,
            upsample_layers=2,
            sample=[{"type": "fps"}] * 3, norm="LN", bias=True),
        decoder=dict(in_channel=32, model_channel=64, attention_layers=1),
        loss=dict(tau=0.1, eps_offset=2.0),
        slam_system=dict(
            coor_scale=60,
            odometer_candidates_num=1,
            registration_sample_odometer=0.5,
            edge_confidence_drop=0.0,   # random weights: accept everything
            edge_rmse_drop=1e9,
            max_continuous_drop_scan=5,
            continuous_drop_scan_strategy="recover",
            key_frame_distance="auto",
            key_frame_distance_0=10,
            enable_s2m_adjust=True,
            registration_sample_mapping=0.5,
            enable_loop_closure=True,
            loop_detection_gap=0,
            loop_detection_transaction_gap=10.0,
            loop_detection_trust_range=3,
            loop_detection_gnss_distance=-1,
            loop_detection_pred_distance=100.0,
            loop_detection_rotation_min=30.0,
            loop_detection_translation_min=10.0,
            loop_detection_prob_acpt_threshold=0.7,
            loop_detection_candidates_num=1,
            registration_sample_loop=0.5,
            loop_detection_confidence_acpt_threshold=0.6,
            enable_global_optimization=True,
            global_optimization_gap=0,
        ),
        tpu=dict(encoder_points=4096, reg_buckets=[64, 128, 256, 512, 1024],
                 loop_batch_buckets=[1, 2, 4, 8], bf16=False),
        weight="",
    )


@pytest.fixture(scope="module")
def run_dir(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("slam_e2e")
    args = small_args(tmp_path)

    from deeppointmap_tpu.data.dataset import BasicAgent
    from deeppointmap_tpu.pipeline.common import init_params
    from deeppointmap_tpu.pipeline.infer import (device_preprocess_config,
                                                 make_infer_transform)
    from deeppointmap_tpu.slam.engine import InferenceEngine
    from deeppointmap_tpu.slam.system import SlamSystem

    enc, dec, enc_params, dec_params = init_params(args, seed=0)
    # the transform chain and the engine must agree on who normalizes:
    # make_infer_transform emits RAW METERS whenever device preprocessing
    # is active, so the engine needs the matching PreprocessConfig (the
    # production wiring in pipeline/infer.py:main)
    engine = InferenceEngine(args, enc_params, dec_params,
                             encoder=enc, decoder=dec,
                             preprocess_cfg=device_preprocess_config(args))
    agent = BasicAgent(root=SAMPLE, reader="auto")
    agent.set_independent(make_infer_transform(args))
    system = SlamSystem(args, engine, system_id=1, logger_dir=str(tmp_path))
    for i in range(5):
        system.step(agent[i])
    system.result_logger.save_trajectory("trajectory")
    system.result_logger.save_posegraph("trajectory")
    return tmp_path, system


def test_trajectory_files(run_dir):
    tmp_path, system = run_dir
    for name in ("allframes", "allsteps", "keyframes", "keysteps"):
        path = os.path.join(tmp_path, f"trajectory.{name}.txt")
        assert os.path.exists(path), name
    rows = open(os.path.join(tmp_path, "trajectory.allframes.txt")
                ).read().strip().splitlines()
    assert len(rows) >= 1
    for row in rows:
        vals = [float(v) for v in row.split()]
        assert len(vals) == 12  # KITTI 3x4 format
    # g2o exported
    assert os.path.getsize(os.path.join(tmp_path, "trajectory.pg.g2o")) > 0


def test_posegraph_state(run_dir):
    _, system = run_dir
    pg = system.posegraph_map
    assert pg.all_frame_num >= 1
    assert pg.last_known_anyframe is not None
    # all stored scans carry predicted poses
    for s in pg.get_all_scans():
        assert s.SE3_pred is not None
        assert np.all(np.isfinite(s.SE3_pred))


def test_perf_counters(run_dir):
    _, system = run_dir
    times = system.result_logger.log_time()
    assert "extract" in times
    assert times["extract"][0] > 0
