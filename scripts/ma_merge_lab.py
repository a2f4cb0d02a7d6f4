"""Offline multi-agent merge lab: why does a cloud graph whose loop
edges are all metrically CORRECT still optimize to a distorted merged
map?

Loads a cloud run's .pg.g2o (every cloud vertex is a keyframe, so the
file is exactly the solve problem) + the synthetic world's GT poses and
compares three estimates:

  saved     -- the graph as the incremental run left it (what
               ma_quality scores)
  refine    -- LM re-run from the saved state to convergence
  tree-init -- poses rebuilt by BFS spanning tree over the edges from
               the anchor (odometry-composed initialization, the
               classic g2o bootstrap), then LM

If tree-init wins by a margin, the incremental pipeline's failure is a
LOCAL MINIMUM seeded by cross-coordinate-system merges, not bad edges
or a broken solver (reference merge behavior: system/core.py:466-514;
its Open3D backend has the same non-convexity, Open3D just never sees
it because the reference demo never merges maps this far apart).

Usage:
  python scripts/ma_merge_lab.py --g2o log_infer/ma_synth/cloud/\
cloud_trajectory.pg.g2o --gt_root /tmp/dpm_full_world2/scene0/0
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from scripts.ma_quality import npz_gt, split_start  # noqa: E402


from deeppointmap_tpu.slam.optimizer import (  # noqa: E402
    spanning_tree_init as tree_init)


def merged_ate(tokens, poses, gt, agents=3):
    from deeppointmap_tpu.utils.evaluation import ate_rmse

    frames = len(gt)
    seen = {}
    for tok, T in sorted(zip(tokens, poses), key=lambda x: x[0]):
        a = tok >> 16
        if a < 1 or a > agents:
            continue
        g = split_start(frames, agents, a - 1) + (tok & 0xFFFF)
        if g < frames:
            seen.setdefault(g, T)
    idx = sorted(seen)
    return float(ate_rmse(np.stack([seen[g] for g in idx]), gt[idx],
                          align=True)), len(idx)


def chi2(poses, edges):
    from deeppointmap_tpu.utils import se3 as se3m

    tot = 0.0
    for i, j, Z, info, w in edges:
        r = se3m.se3_log(np.linalg.inv(Z) @
                         (np.linalg.inv(poses[i]) @ poses[j]))
        tot += float(r @ (w * info) @ r)
    return tot


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--g2o", required=True)
    ap.add_argument("--gt_root", required=True)
    ap.add_argument("--agents", type=int, default=3)
    ns = ap.parse_args()

    from deeppointmap_tpu.slam.optimizer import load_g2o, optimize_pose_graph

    tokens, poses, edges = load_g2o(ns.g2o)
    gt = npz_gt(ns.gt_root)
    anchor = int(np.argmin(tokens))

    res = {}
    ate, cov = merged_ate(tokens, poses, gt, ns.agents)
    res["saved"] = dict(ate_m=round(ate, 3), chi2=round(chi2(poses, edges), 1))

    refined = optimize_pose_graph(poses, edges, fixed_idx=anchor,
                                  max_iters=300)
    ate, _ = merged_ate(tokens, refined, gt, ns.agents)
    res["refine"] = dict(ate_m=round(ate, 3),
                         chi2=round(chi2(refined, edges), 1))

    seeded = tree_init(poses, edges, anchor)
    ate, _ = merged_ate(tokens, seeded, gt, ns.agents)
    res["tree_init_raw"] = dict(ate_m=round(ate, 3),
                                chi2=round(chi2(seeded, edges), 1))
    opt = optimize_pose_graph(seeded, edges, fixed_idx=anchor,
                              max_iters=300)
    ate, _ = merged_ate(tokens, opt, gt, ns.agents)
    res["tree_init_lm"] = dict(ate_m=round(ate, 3),
                               chi2=round(chi2(opt, edges), 1))

    # loop-edge-only chi2: those edges are σ-verified and (on synthetic
    # GT) measured correct, so a solution violating them is wrong even
    # at equal total chi2
    ej = os.path.join(os.path.dirname(ns.g2o), "loop_edges.json")
    if os.path.exists(ej):
        with open(ej) as f:
            loop_pairs = {(e["src"], e["dst"]) for e in json.load(f)}
        tok = list(tokens)
        loop_edges = [e for e in edges
                      if (tok[e[0]], tok[e[1]]) in loop_pairs
                      or (tok[e[1]], tok[e[0]]) in loop_pairs]
        res["n_loop_edges"] = len(loop_edges)
        for name, sol in (("saved", poses), ("refine", refined),
                          ("tree_init_lm", opt)):
            res[name]["loop_chi2"] = round(chi2(sol, loop_edges), 1)

        # loop-upweighted escape: optimize from the saved state with
        # loop edges upweighted (the role Open3D's
        # preference_loop_closure plays for uncertain graphs), then
        # polish at weight 1
        loop_set = {id(e) for e in loop_edges}
        up = [(i, j, Z, info, 10.0 if id(e) in loop_set else w)
              for e in edges
              for (i, j, Z, info, w) in [e]]
        esc = optimize_pose_graph(poses, up, fixed_idx=anchor,
                                  max_iters=300)
        esc = optimize_pose_graph(esc, edges, fixed_idx=anchor,
                                  max_iters=300)
        ate, _ = merged_ate(tokens, esc, gt, ns.agents)
        res["loop_upweight_lm"] = dict(
            ate_m=round(ate, 3), chi2=round(chi2(esc, edges), 1),
            loop_chi2=round(chi2(esc, loop_edges), 1))

    # chi2 at the GT configuration: if chi2(GT) >> chi2(distorted
    # solution), the OBJECTIVE prefers distortion and the information
    # matrices (not the solver) are what needs fixing
    gt_poses = poses.copy()
    mapped = 0
    for k, tok in enumerate(tokens):
        a = tok >> 16
        if 1 <= a <= ns.agents:
            g = split_start(len(gt), ns.agents, a - 1) + (tok & 0xFFFF)
            if g < len(gt):
                gt_poses[k] = gt[g]
                mapped += 1
    ate, _ = merged_ate(tokens, gt_poses, gt, ns.agents)
    entry = dict(ate_m=round(ate, 3), chi2=round(chi2(gt_poses, edges), 1),
                 mapped=mapped)
    if os.path.exists(ej):
        entry["loop_chi2"] = round(chi2(gt_poses, loop_edges), 1)
    res["gt_config"] = entry

    # info-weight surgery: the GᵀG estimates are overconfident and
    # heterogeneous; test whether rebalancing them changes which basin
    # the solver prefers
    def with_info(transform):
        return [(i, j, Z, transform(info), w)
                for (i, j, Z, info, w) in edges]

    trials = {
        # unit-trace: every edge equal total weight, eigenstructure kept
        "norm_info": with_info(
            lambda M: M * (6.0 / max(np.trace(M), 1e-9))),
        # isotropic: pure geometric consensus
        "iso_info": with_info(lambda M: np.eye(6)),
    }
    for name, tedges in trials.items():
        seeded2 = tree_init(poses, tedges, anchor)
        sol = optimize_pose_graph(seeded2, tedges, fixed_idx=anchor,
                                  max_iters=300)
        ate, _ = merged_ate(tokens, sol, gt, ns.agents)
        res[name + "_tree_lm"] = dict(
            ate_m=round(ate, 3),
            chi2_orig=round(chi2(sol, edges), 1))
        sol = optimize_pose_graph(poses, tedges, fixed_idx=anchor,
                                  max_iters=300)
        ate, _ = merged_ate(tokens, sol, gt, ns.agents)
        res[name + "_saved_lm"] = dict(ate_m=round(ate, 3))

    res["frames_covered"] = cov
    print("MERGE_LAB " + json.dumps(res))


if __name__ == "__main__":
    main()
