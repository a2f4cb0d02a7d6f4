"""Pose-graph optimizer: Jacobian correctness, convergence, g2o round-trip."""

import numpy as np
import pytest

from deeppointmap_tpu.slam.optimizer import (
    edge_residual_jacobians, optimize_pose_graph, load_g2o)
from deeppointmap_tpu.utils import se3 as se3m


def _rand_se3(rng, rot_scale=0.5, trans_scale=2.0):
    xi = np.concatenate([rng.normal(size=3) * trans_scale,
                         rng.normal(size=3) * rot_scale])
    return se3m.se3_exp(xi)


def test_edge_jacobians_finite_diff():
    rng = np.random.default_rng(0)
    Ti = _rand_se3(rng)
    Tj = _rand_se3(rng)
    # measurement near the true relative pose so residual is small
    Z = se3m.inv(Ti) @ Tj @ se3m.se3_exp(rng.normal(size=6) * 0.05)
    r0, Ji, Jj = edge_residual_jacobians(Ti, Tj, Z)

    eps = 1e-6
    Ji_fd = np.zeros((6, 6))
    Jj_fd = np.zeros((6, 6))
    for k in range(6):
        d = np.zeros(6)
        d[k] = eps
        r_i, _, _ = edge_residual_jacobians(Ti @ se3m.se3_exp(d), Tj, Z)
        r_j, _, _ = edge_residual_jacobians(Ti, Tj @ se3m.se3_exp(d), Z)
        Ji_fd[:, k] = (r_i - r0) / eps
        Jj_fd[:, k] = (r_j - r0) / eps
    np.testing.assert_allclose(Ji, Ji_fd, atol=1e-4)
    np.testing.assert_allclose(Jj, Jj_fd, atol=1e-4)


def _circle_graph(n=40, radius=30.0, noise=0.02, rng=None):
    """GT poses on a circle; odometry edges with noise; one loop edge."""
    rng = rng or np.random.default_rng(1)
    gt = []
    for k in range(n):
        a = 2 * np.pi * k / n
        R = np.array([[np.cos(a), -np.sin(a), 0],
                      [np.sin(a), np.cos(a), 0], [0, 0, 1.0]])
        t = np.array([radius * np.cos(a), radius * np.sin(a), 0.0])
        gt.append(se3m.se3(R, t))
    omega = np.eye(6)
    edges = []
    for k in range(n - 1):
        Z = se3m.inv(gt[k]) @ gt[k + 1] @ se3m.se3_exp(rng.normal(size=6) * noise)
        edges.append((k, k + 1, Z, omega, 1.0))
    # loop closure, exact
    edges.append((n - 1, 0, se3m.inv(gt[n - 1]) @ gt[0], 10 * omega, 1.0))
    # drifted initialization: integrate the noisy odometry
    init = [gt[0]]
    for k in range(n - 1):
        init.append(init[-1] @ edges[k][2])
    return np.stack(gt, 0), np.stack(init, 0), edges


def test_optimize_closes_loop():
    gt, init, edges = _circle_graph()
    drift0 = np.linalg.norm(init[-1][:3, 3] - gt[-1][:3, 3])
    out = optimize_pose_graph(init, edges, fixed_idx=0)
    drift1 = np.linalg.norm(out[-1][:3, 3] - gt[-1][:3, 3])
    assert drift1 < drift0 * 0.05, (drift0, drift1)
    # optimization improves mean translation error over the drifted init
    err0 = np.linalg.norm(init[:, :3, 3] - gt[:, :3, 3], axis=1).mean()
    err1 = np.linalg.norm(out[:, :3, 3] - gt[:, :3, 3], axis=1).mean()
    assert err1 < err0, (err0, err1)


def test_g2o_roundtrip(tmp_path):
    from deeppointmap_tpu.slam.pose_graph import PoseGraph, ScanPack, PoseGraphEdge

    rng = np.random.default_rng(2)
    g = PoseGraph(agent_id=0)
    poses = [_rand_se3(rng) for _ in range(4)]
    for i, p in enumerate(poses):
        g.add_vertex(ScanPack(timestamp=i, agent_id=0, timestep=i,
                              key_points=None, SE3_pred=p))
    for i in range(3):
        Z = se3m.inv(poses[i]) @ poses[i + 1]
        g.add_edge(PoseGraphEdge(i, i + 1, Z, np.eye(6) * 2.0, "odom"))
    path = tmp_path / "graph.g2o"
    g.to_g2o_file(str(path))
    tokens, loaded, edges = load_g2o(str(path))
    assert tokens == [0, 1, 2, 3]
    np.testing.assert_allclose(loaded, np.stack(poses), atol=1e-6)
    assert len(edges) == 3
    np.testing.assert_allclose(edges[0][3], np.eye(6) * 2.0, atol=1e-9)


@pytest.mark.slow
def test_optimize_at_kitti_scale():
    """KITTI-00-scale graph: ~2000 keyframes, multiple loop closures --
    the LM backend must converge in bounded time (the reference calls
    Open3D's C++ global optimization here)."""
    import time

    rng = np.random.default_rng(7)
    n = 2000
    gt, init, edges = _circle_graph(n=n, radius=300.0, noise=2e-3, rng=rng)
    # extra mid-sequence loop closures (exact measurements)
    for a, b in [(0, n // 2), (n // 4, 3 * n // 4), (100, n - 100)]:
        edges.append((a, b, se3m.inv(gt[a]) @ gt[b], 10 * np.eye(6), 1.0))
    drift0 = np.linalg.norm(init[:, :3, 3] - gt[:, :3, 3], axis=1).mean()
    t0 = time.perf_counter()
    out = optimize_pose_graph(init, edges, fixed_idx=0)
    dt = time.perf_counter() - t0
    drift1 = np.linalg.norm(out[:, :3, 3] - gt[:, :3, 3], axis=1).mean()
    print(f"\n2000-node graph: {dt:.1f}s, mean err {drift0:.2f} -> "
          f"{drift1:.2f} m")
    assert drift1 < 0.3 * drift0, (drift0, drift1)
    assert dt < 120, dt


def test_spanning_tree_init_seats_disconnected_chain():
    """Two agent chains in one graph, linked by a correct cross-agent
    edge; the second chain is initialized at the wrong place (its own
    origin, as a just-merged coordinate system is). Tree init must seat
    it through the linking edge."""
    from deeppointmap_tpu.slam.optimizer import spanning_tree_init

    rng = np.random.default_rng(3)
    gt, init, edges = _circle_graph(rng=rng)
    n = gt.shape[0]
    # second "agent": same circle shifted +100 in x, initialized at its
    # own origin (identity-anchored), exact odometry
    off = np.eye(4)
    off[0, 3] = 100.0
    gt2 = np.stack([off @ T for T in gt])
    init2 = np.stack([gt[0] @ se3m.inv(gt2[0]) @ T for T in gt2])
    edges2 = [(n + k, n + k + 1, se3m.inv(gt2[k]) @ gt2[k + 1],
               np.eye(6), 1.0) for k in range(n - 1)]
    # one exact cross-agent loop edge
    link = [(5, n + 5, se3m.inv(gt[5]) @ gt2[5], np.eye(6), 1.0)]

    poses = np.concatenate([init, init2], 0)
    seeded = spanning_tree_init(poses, edges + edges2 + link, anchor=0)
    # chain 2 now sits near its GT band (odometry noise of chain 1
    # accumulates into the seed, so the tolerance is meters, not mm)
    err = np.linalg.norm(seeded[n:, :3, 3] - gt2[:, :3, 3], axis=1)
    assert err.max() < 8.0  # vs ~100 m unseated
    # and unreachable nodes would have kept their init (all reachable here)
    out = optimize_pose_graph(seeded, edges + edges2 + link, fixed_idx=0)
    assert np.all(np.isfinite(out))


def test_uncertain_merge_recovers_from_wrong_basin():
    """PoseGraph.optim with uncertain=True (the cloud's merged graph)
    must recover a cross-agent merge whose current estimates are in a
    wrong-basin configuration, using isotropic weights + tree re-init;
    the same graph with uncertain=False stays distorted (it trusts the
    estimates and the anisotropic information)."""
    from deeppointmap_tpu.slam.pose_graph import PoseGraph, PoseGraphEdge, ScanPack
    from deeppointmap_tpu.utils import se3 as se3m

    def build(uncertain):
        pg = PoseGraph(agent_id=0)
        pg.uncertain = uncertain
        # agent 1: straight line along x, correct estimates
        toks1, toks2 = [], []
        n = 12
        for k in range(n):
            s = ScanPack(timestamp=k * 0.1, agent_id=1, timestep=k,
                         key_points=np.zeros((4, 19), np.float32),
                         full_pcd=np.zeros((4, 3), np.float32),
                         SE3_pred=se3m.se3(np.eye(3), [k * 2.0, 0, 0]),
                         coor_sys=1)
            pg.add_vertex(s)
            toks1.append(s.token)
            if k:
                Z = np.eye(4)
                Z[0, 3] = 2.0
                pg.add_edge(PoseGraphEdge(toks1[k - 1], toks1[k], Z,
                                          np.eye(6), "odom", 0.9, 0.1))
        # agent 2: the SAME line offset +5 in y, but its estimates are
        # rotated 90 deg around z about its first pose (wrong basin);
        # overconfident anisotropic info on its odometry
        Rz = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1.0]])
        aniso = np.diag([1e6, 1e6, 1e6, 1e5, 1e5, 1e5]).astype(float)
        for k in range(n):
            gt_t = np.array([k * 2.0, 5.0, 0.0])
            est = se3m.se3(Rz, Rz @ gt_t)
            s = ScanPack(timestamp=k * 0.1, agent_id=2, timestep=k,
                         key_points=np.zeros((4, 19), np.float32),
                         full_pcd=np.zeros((4, 3), np.float32),
                         SE3_pred=est, coor_sys=1)
            pg.add_vertex(s)
            toks2.append(s.token)
            if k:
                Z = np.eye(4)
                Z[0, 3] = 2.0
                pg.add_edge(PoseGraphEdge(toks2[k - 1], toks2[k], Z,
                                          aniso, "odom", 0.9, 0.1))
        # correct cross-agent loop edges at both ends
        for k in (0, n - 1):
            Z = np.eye(4)
            Z[1, 3] = 5.0
            pg.add_edge(PoseGraphEdge(toks1[k], toks2[k], Z, np.eye(6),
                                      "loop", 0.8, 0.3))
        return pg, toks2

    pg, toks2 = build(uncertain=True)
    pg.optim()
    got = np.stack([pg.get_scanpack(t).SE3_pred[:3, 3] for t in toks2])
    want = np.stack([[k * 2.0, 5.0, 0.0] for k in range(12)])
    assert np.linalg.norm(got - want, axis=1).max() < 0.5
