"""Multi-process multi-agent SLAM over TCP: agents in separate OS
processes upload to the cloud through TransportServer, and the merged
cloud graph matches the in-process run (reference behavior:
pipeline/infer_multiagents.py:98-130; the process split is the TPU
build's multi-host extension)."""

import os
import re
import shutil
import subprocess
import sys

import pytest
import yaml

SAMPLE = "/root/reference/data/sample/seq06/velodyne"
pytestmark = pytest.mark.skipif(not os.path.isdir(SAMPLE),
                                reason="sample data not available")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_cfg(seq_dir, out_dir):
    return {
        "name": "DeepPointMap", "mode": "infer",
        "infer_src": [str(seq_dir)],
        "infer_tgt": str(out_dir),
        "transforms": {
            "VoxelSample": {"voxel_size": 1.0, "retention": "first"},
            "DistanceSample": {"min_dis": 1.0, "max_dis": 60.0},
            "CoordinatesNormalization": {"ratio": 60.0},
            "ToTensor": {"padding_to": -1},
        },
        "encoder": {
            "npoint": [128, 32, 16],
            "radius_list": [[0.05, 0.1], [0.1, 0.2], [0.2, 0.4]],
            "nsample_list": [[8, 8], [8, 8], [8, 8]],
            "in_channel": 3, "out_channel": 16, "width": 8,
            "expansion": 4, "upsample_layers": 2,
            "sample": [{"type": "fps"}] * 3, "norm": "LN", "bias": True},
        "decoder": {"in_channel": 16, "model_channel": 32,
                    "attention_layers": 1},
        "loss": {"tau": 0.1, "eps_offset": 2.0},
        "slam_system": {
            "coor_scale": 60, "odometer_candidates_num": 1,
            "registration_sample_odometer": 0.5,
            "edge_confidence_drop": 0.0, "edge_rmse_drop": 1e9,
            "max_continuous_drop_scan": 5,
            "continuous_drop_scan_strategy": "recover",
            "key_frame_distance": "auto", "key_frame_distance_0": 10,
            "enable_s2m_adjust": False, "registration_sample_mapping": 0.5,
            "enable_loop_closure": False, "loop_detection_gap": 0,
            "loop_detection_transaction_gap": 10.0,
            "loop_detection_trust_range": 3,
            "loop_detection_gnss_distance": -1,
            "loop_detection_pred_distance": 100.0,
            "loop_detection_rotation_min": 30.0,
            "loop_detection_translation_min": 10.0,
            "loop_detection_prob_acpt_threshold": 0.7,
            "loop_detection_candidates_num": 1,
            "registration_sample_loop": 0.5,
            "loop_detection_confidence_acpt_threshold": 0.6,
            "enable_global_optimization": False,
            "global_optimization_gap": 0},
        "tpu": {"encoder_points": 4096, "reg_buckets": [32, 64, 128, 256],
                "loop_batch_buckets": [1, 2, 4], "bf16": False},
    }


def g2o_summary(path):
    """(vertex id set, odometry/loop edge pair set) from a g2o file."""
    verts, edges = set(), set()
    for line in open(path):
        if line.startswith("VERTEX_SE3:QUAT"):
            verts.add(int(line.split()[1]))
        elif line.startswith("EDGE_SE3:QUAT"):
            p = line.split()
            edges.add((int(p[1]), int(p[2])))
    return verts, edges


@pytest.fixture(scope="module")
def seq(tmp_path_factory):
    d = tmp_path_factory.mktemp("seq_tcp")
    for i in range(6):
        shutil.copy(os.path.join(SAMPLE, f"00000{i}.bin"), d / f"{i}.bin")
    return d


def test_tcp_multiagent_matches_inproc(seq, tmp_path_factory):
    out_tcp = tmp_path_factory.mktemp("ma_tcp")
    out_inp = tmp_path_factory.mktemp("ma_inp")

    cfg_tcp = out_tcp / "cfg.yaml"
    with open(cfg_tcp, "w") as f:
        yaml.safe_dump(make_cfg(seq, out_tcp), f, sort_keys=False)
    cfg_inp = out_inp / "cfg.yaml"
    with open(cfg_inp, "w") as f:
        yaml.safe_dump(make_cfg(seq, out_inp), f, sort_keys=False)

    # --- multi-process over TCP: coordinator spawns 3 agent processes
    from deeppointmap_tpu.utils.childenv import cpu_child_env

    env = cpu_child_env(platform="cpu")   # children must not dial the relay
    proc = subprocess.run(
        [sys.executable, "-m", "deeppointmap_tpu.pipeline.infer_multiagents",
         "--yaml_file", str(cfg_tcp), "--transport", "tcp"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-3000:]

    # every agent wrote its own trajectory from its own process
    for i in (1, 2, 3):
        t = out_tcp / f"agent_{i}" / "trajectory.allframes.txt"
        assert t.exists() and t.read_text().strip(), t
    cloud_g2o = out_tcp / "cloud" / "cloud_trajectory.pg.g2o"
    assert cloud_g2o.exists()

    # --- reference-equivalent in-process run (same seed/weights)
    from deeppointmap_tpu.pipeline import infer_multiagents

    infer_multiagents.main(["--yaml_file", str(cfg_inp)])
    cloud_g2o_inp = out_inp / "cloud" / "cloud_trajectory.pg.g2o"
    assert cloud_g2o_inp.exists()

    v_tcp, e_tcp = g2o_summary(cloud_g2o)
    v_inp, e_inp = g2o_summary(cloud_g2o_inp)
    # merged graph holds the same scans (tokens encode agent<<16|step)
    assert v_tcp == v_inp, (v_tcp, v_inp)
    assert {v >> 16 for v in v_tcp} == {1, 2, 3}
    assert e_tcp == e_inp, (e_tcp, e_inp)
