"""Inference CLI end-to-end: config loading (yaml-over-cli), model init,
sequence run, result tree (reference contract: pipeline/infer.py:35-121)."""

import os
import shutil

import pytest
import yaml

SAMPLE = "/root/reference/data/sample/seq06/velodyne"
pytestmark = pytest.mark.skipif(not os.path.isdir(SAMPLE),
                                reason="sample data not available")


def test_infer_main(tmp_path):
    # tiny model + 3-frame sequence for speed
    seq = tmp_path / "seq"
    seq.mkdir()
    for i in range(3):
        shutil.copy(os.path.join(SAMPLE, f"00000{i}.bin"),
                    seq / f"{i}.bin")

    cfg = {
        "name": "DeepPointMap", "mode": "infer",
        "infer_src": [str(seq)],
        "infer_tgt": str(tmp_path / "out"),
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
            "enable_s2m_adjust": True, "registration_sample_mapping": 0.5,
            "enable_loop_closure": True, "loop_detection_gap": 0,
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
            "enable_global_optimization": True,
            "global_optimization_gap": 0},
        "tpu": {"encoder_points": 4096, "reg_buckets": [32, 64, 128, 256],
                "loop_batch_buckets": [1, 2, 4], "bf16": False},
    }
    yaml_path = tmp_path / "cfg.yaml"
    with open(yaml_path, "w") as f:
        # transform order is semantic: keep insertion order
        yaml.safe_dump(cfg, f, sort_keys=False)

    from deeppointmap_tpu.pipeline import infer

    infer.main(["--yaml_file", str(yaml_path)])

    out = tmp_path / "out"
    assert (out / "settings.yaml").exists()
    seq_out = out / "Seq00"
    for name in ("trajectory.allframes.txt", "trajectory.keyframes.txt",
                 "trajectory.allsteps.txt", "trajectory.keysteps.txt",
                 "trajectory.pg.g2o"):
        assert (seq_out / name).exists(), name
    rows = (seq_out / "trajectory.allframes.txt").read_text().strip()
    assert rows, "empty trajectory"


def test_sequence_parallel_matches_sequential(tmp_path):
    """tpu.sequence_parallel: 2 sequences on 2 pinned (virtual CPU)
    devices produce the same trajectories as the sequential run."""
    import numpy as np

    seq_a = tmp_path / "seqA"
    seq_b = tmp_path / "seqB"
    seq_a.mkdir()
    seq_b.mkdir()
    for i in range(3):
        shutil.copy(os.path.join(SAMPLE, f"00000{i}.bin"),
                    seq_a / f"{i}.bin")
        shutil.copy(os.path.join(SAMPLE, f"00000{i + 3}.bin"),
                    seq_b / f"{i}.bin")

    import yaml as _yaml

    def make(out, sp):
        import tests.test_infer_cli  # reuse the base cfg builder pattern
        cfg = None
        # rebuild the same tiny cfg as test_infer_main
        cfg = {
            "name": "DeepPointMap", "mode": "infer",
            "infer_src": [str(seq_a), str(seq_b)],
            "infer_tgt": str(out),
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
                "sample": [{"type": "fps"}] * 3, "norm": "LN",
                "bias": True},
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
                "enable_s2m_adjust": False,
                "registration_sample_mapping": 0.5,
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
            "tpu": {"encoder_points": 4096,
                    "reg_buckets": [32, 64, 128, 256],
                    "loop_batch_buckets": [1, 2, 4], "bf16": False,
                    "sequence_parallel": sp},
        }
        p = out / "cfg.yaml"
        with open(p, "w") as f:
            _yaml.safe_dump(cfg, f, sort_keys=False)
        return p

    from deeppointmap_tpu.pipeline import infer

    out_seq = tmp_path / "out_seq"
    out_par = tmp_path / "out_par"
    out_seq.mkdir()
    out_par.mkdir()
    infer.main(["--yaml_file", str(make(out_seq, 1))])
    infer.main(["--yaml_file", str(make(out_par, 2))])

    for s in ("Seq00", "Seq01"):
        a = np.loadtxt(out_seq / s / "trajectory.allframes.txt")
        b = np.loadtxt(out_par / s / "trajectory.allframes.txt")
        np.testing.assert_allclose(b, a, atol=1e-5)
