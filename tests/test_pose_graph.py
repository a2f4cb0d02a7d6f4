"""Pose-graph primitives: queries, serialize/deserialize, condense,
repair_coor_sys (reference behaviors: system/modules/pose_graph.py)."""

import numpy as np
import pytest

from deeppointmap_tpu.slam.pose_graph import (PoseGraph, PoseGraphEdge,
                                              ScanPack)
from deeppointmap_tpu.utils import se3 as se3m


def _scan(agent, step, pose_t, coor_sys=0, keyframe=True):
    kp = np.random.default_rng(step).normal(
        size=(8, 19)).astype(np.float32) if keyframe else None
    s = ScanPack(timestamp=step * 0.1, agent_id=agent, timestep=step,
                 key_points=kp,
                 full_pcd=np.zeros((4, 3), np.float32),
                 SE3_pred=se3m.se3(np.eye(3), np.asarray(pose_t)),
                 coor_sys=coor_sys)
    if not keyframe:
        s.type = "non-keyframe"
    return s


def _chain(pg, agent, n, coor_sys=0):
    toks = []
    for k in range(n):
        s = _scan(agent, k, [k * 1.0, 0, 0], coor_sys)
        pg.add_vertex(s)
        toks.append(s.token)
        if k:
            Z = np.eye(4)
            Z[0, 3] = 1.0
            pg.add_edge(PoseGraphEdge(toks[k - 1], toks[k], Z, np.eye(6),
                                      "odom", confidence=0.9, rmse=0.1))
    return toks


def test_graph_search_and_map_queries():
    pg = PoseGraph(agent_id=0)
    toks = _chain(pg, 0, 10)
    found = pg.graph_search(toks[0], neighbor_level=3, coor_sys=0,
                            edge_type=["odom"], max_k=None)
    assert {s.token for s in found} == set(toks[:4])
    assert pg.shortest_path_length(toks[0], toks[9]) == 9

    tile, tk = pg.global_map_query_graph(toks[5], 2, 0, max_dist=100,
                                         centering_SE3=pg.get_scanpack(
                                             toks[5]).SE3_pred)
    assert tile is not None
    assert set(np.unique(tk)) == set(toks[3:8])
    # centered: mean xyz of the query scan's own points near origin
    own = tile[tk == toks[5]][:, -3:]
    assert np.abs(own).max() < 5

    tile2, tk2 = pg.global_map_query_space(
        pg.get_scanpack(toks[5]).SE3_pred, 0, radius=2.5)
    assert set(np.unique(tk2)) <= set(toks[3:8])


def test_serialize_deserialize_merge():
    pg1 = PoseGraph(agent_id=0)
    toks = _chain(pg1, 0, 5)
    scans, edges = pg1.serialize()

    pg2 = PoseGraph(agent_id=1)
    pg2.deserialize((scans, edges), adjust_other_nodes=False)
    assert pg2.all_frame_num == 5
    assert len(pg2.get_all_edges()) == 4

    # updating poses through deserialize
    moved = [s.copy() for s in scans]
    for s in moved:
        s.SE3_pred = s.SE3_pred.copy()
        s.SE3_pred[1, 3] += 2.0
    pg2.deserialize((moved, []), adjust_other_nodes=False)
    for t in toks:
        assert pg2.get_scanpack(t).SE3_pred[1, 3] == pytest.approx(2.0)


def test_repair_coor_sys():
    pg = PoseGraph(agent_id=0)
    toks = _chain(pg, 0, 4, coor_sys=0)
    # second component with a higher coor_sys, connected by a loop edge
    toks2 = _chain(pg, 1, 3, coor_sys=1)
    pg.add_edge(PoseGraphEdge(toks[3], toks2[0], np.eye(4), np.eye(6),
                              "loop", confidence=0.9, rmse=0.1))
    pg.repair_coor_sys()
    assert {s.coor_sys for s in pg.get_all_scans()} == {0}


def test_condense_builds_proxy_edges():
    pg = PoseGraph(agent_id=0)
    toks0 = _chain(pg, 0, 6, coor_sys=0)
    toks1 = _chain(pg, 1, 6, coor_sys=0)
    pg.add_edge(PoseGraphEdge(toks0[5], toks1[0], np.eye(4), np.eye(6),
                              "loop", confidence=0.9, rmse=0.1))
    # keep only the two chain ends from agent 1
    keep = {toks1[4], toks1[5]} | set(toks0)
    out = pg.condense(base_agent=0,
                      filter_func=lambda s: s.token in keep)
    prxy = [e for e in out.get_all_edges() if e.type == "prxy"]
    assert prxy, "condense must add proxy edges for far-agent scans"
    # proxy transform equals the chained relative pose
    e = next(e for e in prxy if e.dst_scan_token == toks1[5])
    src = pg.get_scanpack(e.src_scan_token)
    dst = pg.get_scanpack(toks1[5])
    expect = se3m.inv(src.SE3_pred) @ dst.SE3_pred
    np.testing.assert_allclose(e.SE3, expect, atol=1e-9)


def test_nonkeyframe_propagation_after_optim():
    pg = PoseGraph(agent_id=0)
    toks = _chain(pg, 0, 5)
    nk = _scan(0, 10, [4.5, 0, 0], keyframe=False)
    pg.add_vertex(nk)
    Z = np.eye(4)
    Z[0, 3] = 0.5
    pg.add_edge(PoseGraphEdge(toks[4], nk.token, Z, np.eye(6), "locz",
                              confidence=0.9, rmse=0.1))
    n, m, diff = pg.optim()
    assert n == 5 and m == 4  # locz edges excluded from the solve
    # non-keyframe re-propagated from its locz edge
    np.testing.assert_allclose(
        pg.get_scanpack(nk.token).SE3_pred,
        pg.get_scanpack(toks[4]).SE3_pred @ Z, atol=1e-9)


def test_interp_pose():
    from deeppointmap_tpu.slam.recoder import ResultLogger

    pg = PoseGraph(agent_id=0)
    _chain(pg, 0, 5)
    for i, s in enumerate(sorted(pg.get_all_scans(),
                                 key=lambda s: s.timestep)):
        s.timestamp = float(i)
    rl = ResultLogger(None, None, pg, ".")
    p = rl.interp_pose(3.5)
    # chain moves 1m/step in +x: position at t=3.5 ~ x=3.5
    assert abs(p[0] - 3.5) < 0.2
