"""Trajectory metrics: ATE/RPE/KITTI errors on synthetic trajectories."""

import numpy as np

from deeppointmap_tpu.utils import se3 as se3m
from deeppointmap_tpu.utils.evaluation import (align_se3, ate_rmse,
                                               kitti_odometry_errors,
                                               load_kitti_trajectory, rpe)


def _traj(n=200, noise=0.0, rng=None):
    rng = rng or np.random.default_rng(0)
    out = []
    for i in range(n):
        a = i * 0.01
        R = np.array([[np.cos(a), -np.sin(a), 0],
                      [np.sin(a), np.cos(a), 0], [0, 0, 1.0]])
        t = np.array([i * 1.0, np.sin(i * 0.05) * 5, 0.0])
        T = se3m.se3(R, t)
        if noise:
            T = T @ se3m.se3_exp(rng.normal(size=6) * noise)
        out.append(T)
    return np.stack(out)


def test_ate_zero_for_identical():
    gt = _traj()
    assert ate_rmse(gt, gt) < 1e-9


def test_ate_invariant_to_rigid_offset():
    gt = _traj()
    offset = se3m.se3_exp(np.array([5.0, -3.0, 1.0, 0.2, 0.1, -0.3]))
    pred = np.einsum("ij,njk->nik", offset, gt)
    assert ate_rmse(pred, gt, align=True) < 1e-6
    assert ate_rmse(pred, gt, align=False) > 1.0


def test_rpe_and_kitti_errors():
    gt = _traj()
    pred = _traj(noise=0.01)
    t_err, r_err = rpe(pred, gt)
    assert 0 < t_err < 0.2
    assert 0 < r_err < 2.0
    terr_pct, rerr = kitti_odometry_errors(pred, gt)
    assert np.isfinite(terr_pct) and terr_pct < 10.0


def test_load_kitti_roundtrip(tmp_path):
    gt = _traj(20)
    path = tmp_path / "traj.txt"
    with open(path, "w") as f:
        for T in gt:
            f.write(" ".join(f"{v:.10f}" for v in T[:3, :].flatten()) + "\n")
    loaded = load_kitti_trajectory(str(path))
    np.testing.assert_allclose(loaded, gt, atol=1e-9)


def test_evaluate_cli(tmp_path, capsys):
    """scripts/evaluate.py end-to-end on a synthetic trajectory pair."""
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from scripts.evaluate import main as eval_main

    rng = np.random.default_rng(0)
    n = 50
    poses = []
    T = np.eye(4)
    for i in range(n):
        T = T.copy()
        T[:3, 3] += [1.0, 0.1 * np.sin(i / 5), 0]
        poses.append(T)
    gt = np.stack(poses)
    pred = gt.copy()
    pred[:, :3, 3] += rng.normal(0, 0.05, size=(n, 3))

    def write(path, traj):
        with open(path, "w") as f:
            for P in traj:
                f.write(" ".join(f"{v:.9f}" for v in P[:3].reshape(-1))
                        + "\n")

    pp, gp = str(tmp_path / "pred.txt"), str(tmp_path / "gt.txt")
    write(pp, pred)
    write(gp, gt)
    res = eval_main([pp, gp, "--json"])
    assert res["frames"] == n
    assert 0.03 < res["ate_rmse_m"] < 0.15
    assert res["rpe_trans_m_delta1"] < 0.3
    assert res["kitti_trans_err_pct"] is None or \
        res["kitti_trans_err_pct"] >= 0  # 49 m path: no 100 m sub-sequence
