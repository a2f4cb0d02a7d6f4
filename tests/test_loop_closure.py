"""Loop-closure control flow: candidate filtering, verification, global
optimization and non-keyframe propagation -- exercised deterministically
with a stubbed engine (random-weight models never exceed the loop
probability threshold, so integration tests can't reach these paths)."""

import math

import numpy as np
import pytest

from deeppointmap_tpu.config import Config
from deeppointmap_tpu.slam.modules import LoopClosureModule
from deeppointmap_tpu.slam.pose_graph import (PoseGraph, PoseGraphEdge,
                                              ScanPack)
from deeppointmap_tpu.utils import se3 as se3m


class StubEngine:
    """Engine double: perfect loop scores + near-GT registrations."""

    def __init__(self, gt_poses):
        self.gt = gt_poses  # token -> 4x4

    def loop_scores(self, src, dst, sv, dv):
        # overlap probability decays with true metric distance (token
        # stamps in descriptor column 0 identify the scans)
        out = np.empty(src.shape[0])
        for i in range(src.shape[0]):
            s_tok = int(src[i, 0, 0])
            d_tok = int(dst[i, 0, 0])
            d = np.linalg.norm(self.gt[s_tok][:3, 3] - self.gt[d_tok][:3, 3])
            out[i] = 0.99 * np.exp(-d / 20.0)
        return out

    def register_with_info(self, src_desc, sv, dst_desc, dv,
                           src_pcd, spv, dst_pcd, dpv, num_sample=0.5,
                           **kwargs):
        # identify the scans by the first descriptor row (token stamp)
        s_tok = int(src_desc[0, 0])
        d_tok = int(dst_desc[0, 0])
        # SE3 maps src-frame points into dst frame:
        # p_dst = T p_src with T = pose_dst^-1 @ pose_src
        T = se3m.inv(self.gt[d_tok]) @ self.gt[s_tok]
        return T, 0.9, 0.05, np.eye(6)


def _circle_graph_slam(n=50, radius=40.0, drift=0.007):
    """Odometry-only pose graph around a circle with accumulated drift;
    GT closes the loop."""
    rng = np.random.default_rng(0)
    gt, est = [], []
    for k in range(n):
        a = 2 * math.pi * k / n
        R = np.array([[math.cos(a), -math.sin(a), 0],
                      [math.sin(a), math.cos(a), 0], [0, 0, 1.0]])
        t = np.array([radius * math.cos(a), radius * math.sin(a), 0.0])
        gt.append(se3m.se3(R, t))
    est.append(gt[0].copy())
    pg = PoseGraph(agent_id=1)
    toks = []
    for k in range(n):
        kp = np.zeros((8, 19), np.float32)
        scan = ScanPack(timestamp=k * 0.1, agent_id=1, timestep=k,
                        key_points=kp, full_pcd=np.zeros((16, 3), np.float32),
                        SE3_pred=None, coor_sys=1)
        kp[:, 0] = scan.token  # token stamp for the stub engine
        toks.append(scan.token)
        if k == 0:
            scan.SE3_pred = est[0]
        else:
            Z = se3m.inv(gt[k - 1]) @ gt[k] @ se3m.se3_exp(
                rng.normal(size=6) * drift)
            est.append(est[-1] @ Z)
            scan.SE3_pred = est[-1]
        pg.add_vertex(scan)
        if k > 0:
            Z = se3m.inv(est[k - 1]) @ est[k]
            pg.add_edge(PoseGraphEdge(toks[k - 1], toks[k], Z, np.eye(6),
                                      "odom", confidence=0.9, rmse=0.05))
    pg.last_known_keyframe = toks[-1]
    pg.last_known_anyframe = toks[-1]
    return pg, {t: g for t, g in zip(toks, gt)}, toks


ARGS = Config(slam_system=dict(
    coor_scale=60,
    enable_loop_closure=True, loop_detection_gap=0,
    loop_detection_transaction_gap=10.0, loop_detection_trust_range=3,
    loop_detection_gnss_distance=-1, loop_detection_pred_distance=100.0,
    loop_detection_rotation_min=30.0, loop_detection_translation_min=10.0,
    loop_detection_prob_acpt_threshold=0.7, loop_detection_candidates_num=1,
    registration_sample_loop=0.5,
    loop_detection_confidence_acpt_threshold=0.6,
    enable_global_optimization=True, global_optimization_gap=0))


def test_loop_closes_and_optimizes():
    pg, gt, toks = _circle_graph_slam()
    engine = StubEngine(gt)
    loop = LoopClosureModule(ARGS, Config(agent_id=1), pg, engine)

    last = pg.get_scanpack(toks[-1])
    drift_before = np.linalg.norm(last.SE3_pred[:3, 3] - gt[toks[-1]][:3, 3])
    assert drift_before > 0.3, drift_before  # drift actually accumulated

    edges = loop.process(last, targets="self")
    assert len(edges) == 1
    assert edges[0].type == "loop"
    assert pg.loop_edge_num == 1
    # the found loop partner is OUTSIDE the trust zone: a genuine revisit
    # (temporally distant, metrically near), not a short-chord neighbor
    assert abs((edges[0].src_scan_token & 0xFFFF)
               - (edges[0].dst_scan_token & 0xFFFF)) > 30

    drift_after = np.linalg.norm(
        pg.get_scanpack(toks[-1]).SE3_pred[:3, 3] - gt[toks[-1]][:3, 3])
    assert drift_after < drift_before * 0.5, (drift_before, drift_after)


def test_trust_zone_excludes_recent():
    pg, gt, toks = _circle_graph_slam()
    engine = StubEngine(gt)
    loop = LoopClosureModule(ARGS, Config(agent_id=1), pg, engine)
    cands = loop.loop_closure_detection(pg.get_scanpack(toks[-1]), "self")
    # candidates exclude the trust zone (graph distance < trust_range)
    for c in cands:
        assert pg.shortest_path_length(c.token, toks[-1]) >= 3


def test_verification_rejects_inconsistent():
    pg, gt, toks = _circle_graph_slam()
    engine = StubEngine(gt)
    loop = LoopClosureModule(ARGS, Config(agent_id=1), pg, engine)
    # an edge wildly inconsistent with the graph-path estimate
    bad_T = se3m.se3_exp(np.array([50.0, 0, 0, 0, 0, 2.0]))
    bad = PoseGraphEdge(toks[0], toks[12], bad_T, np.eye(6), "loop",
                        confidence=0.9, rmse=0.05)
    assert loop.loop_closure_verification([bad]) == []
    # a low-confidence edge is rejected regardless of geometry
    ok_T = se3m.inv(gt[toks[0]]) @ gt[toks[12]]
    weak = PoseGraphEdge(toks[0], toks[12],
                         se3m.inv(ok_T), np.eye(6), "loop",
                         confidence=0.2, rmse=0.05)
    assert loop.loop_closure_verification([weak]) == []


def test_attempt_gap_rate_limits_failed_attempts():
    """`loop_detection_attempt_gap` (beyond-reference knob) suppresses
    loop ATTEMPTS for N keyframes after any attempt -- the reference's
    loop_detection_gap only arms after a VALIDATED loop, so failed
    attempts otherwise run every frame and serialize against the
    odometer on a single chip."""
    pg, gt, toks = _circle_graph_slam()
    engine = StubEngine(gt)

    class CountingLoop(LoopClosureModule):
        calls = 0

        def loop_closure_detection(self, new_scan, targets="all"):
            CountingLoop.calls += 1
            return []      # every attempt fails to find candidates

    args = Config({k: dict(v) if isinstance(v, dict) else v
                   for k, v in ARGS.items()})
    args.slam_system["loop_detection_attempt_gap"] = 3
    loop = CountingLoop(args, Config(agent_id=1), pg, engine)

    last = pg.get_scanpack(toks[-1])
    for _ in range(8):           # same keyframe count: only 1 attempt
        loop.process(last, targets="self")
    assert CountingLoop.calls == 1

    # advancing the keyframe count past the gap re-arms detection
    pg.key_frame_num += 4
    loop.process(last, targets="self")
    assert CountingLoop.calls == 2

    # default 0 keeps reference behavior: an attempt per process() call
    CountingLoop.calls = 0
    loop0 = CountingLoop(ARGS, Config(agent_id=1), pg, engine)
    for _ in range(3):
        loop0.process(last, targets="self")
    assert CountingLoop.calls == 3
