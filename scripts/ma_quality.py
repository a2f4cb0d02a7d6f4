"""Merged-map quality of a multi-agent run against the ICP pseudo-GT
chain on the bundled real KITTI frames.

The cloud's pose graph holds every agent's scans in ONE coordinate
system (tokens = agent_id << 16 | timestep). Each agent covered a
deterministic slice of the same sequence (1/N + 5% overlap,
data/dataset.py:63-72, mirroring reference dataloader/body.py:340-348),
so a token maps back to a global frame index; the merged trajectory can
then be scored as ATE against the ICP chain that scripts/
train_real_convergence.py uses as pseudo ground truth (no GT poses ship
with the mirror). Also reports per-agent coverage and cross-agent
consistency: the pose disagreement between two agents' estimates of the
SAME physical frame inside the overlap bands -- the merged map is only
as good as those seams.

Usage:
  python scripts/ma_quality.py --g2o <cloud .pg.g2o> [--agents 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SAMPLE = "/root/reference/data/sample/seq06/velodyne"


def split_start(total: int, n_agents: int, agent_index: int) -> int:
    """First global frame of agent `agent_index` (0-based), mirroring
    data/dataset.py:63-72."""
    ratio = 1.0 / n_agents
    start = max(ratio * agent_index - 0.05, 0.0)
    return int(total * start)


def read_g2o_vertices(path: str):
    """token -> 4x4 SE3 from VERTEX_SE3:QUAT lines."""
    from scipy.spatial.transform import Rotation

    out = {}
    with open(path) as f:
        for line in f:
            p = line.split()
            if not p or p[0] != "VERTEX_SE3:QUAT":
                continue
            tok = int(p[1])
            t = np.array([float(x) for x in p[2:5]])
            q = [float(x) for x in p[5:9]]
            T = np.eye(4)
            T[:3, :3] = Rotation.from_quat(q).as_matrix()
            T[:3, 3] = t
            out[tok] = T
    return out


def icp_chain(n_frames: int) -> np.ndarray:
    from scripts.train_real_smoke import SAMPLE as smoke_sample  # noqa: F401
    from deeppointmap_tpu.data.readers import read_auto
    from deeppointmap_tpu.data.voxel import voxel_downsample
    from scripts.make_refined_se3 import icp_point_to_point

    downs = []
    for i in range(n_frames):
        s = read_auto(os.path.join(SAMPLE, f"{i:06d}.bin"))
        r = np.linalg.norm(s.xyz[:, :2], axis=1)
        near = s.xyz[(r > 2.5) & (r < 50)]
        downs.append(voxel_downsample(np.asarray(near, np.float64), 0.4))
    pose = np.eye(4)
    poses = [pose]
    for i in range(1, n_frames):
        T, _ = icp_point_to_point(downs[i], downs[i - 1], np.eye(4),
                                  iters=40, max_corr=2.0)
        pose = poses[-1] @ T
        poses.append(pose)
    return np.stack(poses)


def npz_gt(root: str) -> np.ndarray:
    """GT chain from a synthetic npz scene dir (ego_rotation/translation
    per frame, data/synthetic.py write_npz_sequence layout)."""
    import glob

    files = sorted(glob.glob(os.path.join(root, "*.npz")),
                   key=lambda f: int(os.path.basename(f).split(".")[0]))
    poses = []
    for f in files:
        z = np.load(f)
        T = np.eye(4)
        T[:3, :3] = z["ego_rotation"]
        T[:3, 3] = z["ego_translation"].reshape(3)
        poses.append(T)
    return np.stack(poses)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--g2o", required=True, help="cloud .pg.g2o file")
    ap.add_argument("--agents", type=int, default=3)
    ap.add_argument("--frames", type=int, default=11,
                    help="total frames in the shared sequence (ICP mode)")
    ap.add_argument("--gt_root", default="",
                    help="npz scene dir with ego poses (synthetic GT); "
                         "default: ICP pseudo-GT over the real sample")
    ns = ap.parse_args()

    from deeppointmap_tpu.utils.evaluation import ate_rmse

    verts = read_g2o_vertices(ns.g2o)
    if ns.gt_root:
        gt = npz_gt(ns.gt_root)
        ns.frames = len(gt)
    else:
        gt = icp_chain(ns.frames)

    # token -> global frame
    rows = []   # (global_frame, agent, SE3)
    for tok, T in verts.items():
        agent = tok >> 16
        ts = tok & 0xFFFF
        if agent < 1 or agent > ns.agents:
            continue
        g = split_start(ns.frames, ns.agents, agent - 1) + ts
        if g < ns.frames:
            rows.append((g, agent, T))

    # merged ATE: one estimate per global frame (first agent wins)
    seen = {}
    for g, a, T in sorted(rows):
        seen.setdefault(g, T)
    frames = sorted(seen)
    pred = np.stack([seen[g] for g in frames])
    gtm = gt[frames]
    res = dict(
        n_vertices=len(verts), n_mapped=len(rows),
        frames_covered=len(frames), frames_total=ns.frames,
        merged_ate_m=round(float(ate_rmse(pred, gtm, align=True)), 4),
    )

    # per-agent aligned ATE: each agent's sub-trajectory scored on its
    # own (healthy odometry shows up here even when the merge fails)
    for a in range(1, ns.agents + 1):
        sub = sorted((g, T) for g, ag, T in rows if ag == a)
        if len(sub) >= 3:
            p = np.stack([T for _, T in sub])
            g_idx = [g for g, _ in sub]
            res[f"agent{a}_ate_m"] = round(
                float(ate_rmse(p, gt[g_idx], align=True)), 4)
            res[f"agent{a}_frames"] = len(sub)

    # cross-agent seam consistency: same global frame seen by 2 agents
    by_frame = {}
    for g, a, T in rows:
        by_frame.setdefault(g, {})[a] = T
    seam_t, seam_r = [], []
    for g, d in by_frame.items():
        agents = sorted(d)
        for i in range(len(agents) - 1):
            A, B = d[agents[i]], d[agents[i + 1]]
            D = np.linalg.inv(A) @ B
            seam_t.append(float(np.linalg.norm(D[:3, 3])))
            cos = (np.trace(D[:3, :3]) - 1.0) / 2.0
            seam_r.append(float(np.degrees(
                np.arccos(np.clip(cos, -1.0, 1.0)))))
    if seam_t:
        res["seam_frames"] = len(seam_t)
        res["seam_trans_max_m"] = round(max(seam_t), 4)
        res["seam_rot_max_deg"] = round(max(seam_r), 3)

    # GT error of every accepted loop edge (synthetic runs dump
    # loop_edges.json next to the g2o): edge SE3 vs the GT relative
    # pose between the two frames -- separates "bad edges won" from
    # "optimizer failed" when a merge reads poorly
    ej = os.path.join(os.path.dirname(ns.g2o), "loop_edges.json")
    if ns.gt_root and os.path.exists(ej):
        with open(ej) as f:
            edges = json.load(f)
        errs = []
        for e in edges:
            gs = split_start(ns.frames, ns.agents,
                             (e["src"] >> 16) - 1) + (e["src"] & 0xFFFF)
            gd = split_start(ns.frames, ns.agents,
                             (e["dst"] >> 16) - 1) + (e["dst"] & 0xFFFF)
            if gs >= ns.frames or gd >= ns.frames:
                continue
            D = np.linalg.inv(np.linalg.inv(gt[gs]) @ gt[gd]) @ \
                np.asarray(e["SE3"])
            t = float(np.linalg.norm(D[:3, 3]))
            cos = (np.trace(D[:3, :3]) - 1.0) / 2.0
            r = float(np.degrees(np.arccos(np.clip(cos, -1.0, 1.0))))
            cross = (e["src"] >> 16) != (e["dst"] >> 16)
            errs.append(dict(conf=round(e["conf"], 3),
                             rmse=round(e["rmse"], 3),
                             t_err=round(t, 3), r_err=round(r, 2),
                             cross=cross))
        if errs:
            t_all = np.array([x["t_err"] for x in errs])
            res["loop_edges"] = len(errs)
            res["loop_cross_agent"] = int(sum(x["cross"] for x in errs))
            res["loop_t_err_p50"] = round(float(np.median(t_all)), 3)
            res["loop_t_err_max"] = round(float(t_all.max()), 3)
            res["loop_bad_1m"] = int((t_all > 1.0).sum())
            for x in sorted(errs, key=lambda x: -x["t_err"])[:8]:
                print("LOOP_EDGE", json.dumps(x))

    print("MA_QUALITY " + json.dumps(res))


if __name__ == "__main__":
    main()
