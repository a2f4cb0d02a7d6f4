"""Diagnose loop-head separability: extract the OverlapHead's pooled
inputs for labeled near/far scan pairs and fit a ridge linear probe.

If even a linear probe on the pooled attention features cannot separate
"within `distance`" from "beyond", stage-2 training cannot succeed no
matter the optimizer -- the signal is missing upstream (world geometry or
backbone); if the probe separates but the trained head does not, the
problem is stage-2 optimization.

Usage: python scripts/probe_loop_features.py [--weights path] [--n 80]
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights",
                    default=os.path.join(REPO, "artifacts/full_size/"
                                               "weights_final.msgpack"))
    ap.add_argument("--root", default="/tmp/dpm_full_train")
    ap.add_argument("--scene", default="scene0")
    ap.add_argument("--n", type=int, default=80)
    ap.add_argument("--distance", type=float, default=10.0)
    ns = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from scripts.train_full_size import full_eval_args
    from deeppointmap_tpu.data.dataset import BasicAgent
    from deeppointmap_tpu.models.decoder import Decoder as _D
    from deeppointmap_tpu.pipeline.common import load_weights
    from deeppointmap_tpu.pipeline.infer import (device_preprocess_config,
                                                 make_infer_transform)
    from deeppointmap_tpu.slam.engine import InferenceEngine

    args = full_eval_args(ns.root, "/tmp/probe_loop")
    enc, dec, ep, dp = load_weights(args, ns.weights)
    engine = InferenceEngine(args, ep, dp, encoder=enc, decoder=dec,
                             preprocess_cfg=device_preprocess_config(args))
    agent = BasicAgent(root=os.path.join(ns.root, ns.scene, "0"),
                       reader="auto")
    agent.set_independent(make_infer_transform(args))

    # positions for labeling
    pos, raw, descs = [], {}, {}
    for i in range(len(agent)):
        pc, R, T, v, orig = agent[i]
        pos.append(np.asarray(T).reshape(3))
        raw[i] = (pc, v)
    pos = np.stack(pos)

    rng = np.random.default_rng(0)
    n_f = len(agent)

    def desc_of(i):
        # raw inputs and extracted descriptors live in SEPARATE dicts so a
        # cache hit can never be mistaken for an unextracted frame
        if i not in descs:
            pc, v = raw[i]
            d, dv, pv = engine.extract(pc, v)
            descs[i] = (np.asarray(d[0]), np.asarray(dv[0]))
        return descs[i]

    @jax.jit
    def pooled_inputs(sd, dd, sv, dv2):
        """The OverlapHead's exact pooled inputs (pre-MLP token mean of
        the correlated features)."""
        sf, df = dec.apply(dp, sd[None], dd[None], sv[None], dv2[None],
                           method=_D.correlate)
        return jnp.concatenate([sf[0].mean(0), df[0].mean(0)])

    X, y = [], []
    for _ in range(ns.n):
        a = int(rng.integers(0, n_f))
        # stratified: half near, half far
        d_all = np.linalg.norm(pos - pos[a], axis=1)
        if rng.random() < 0.5:
            cand = np.nonzero((d_all > 0) & (d_all <= ns.distance))[0]
        else:
            cand = np.nonzero(d_all > 2 * ns.distance)[0]
        if cand.size == 0:
            continue
        b = int(rng.choice(cand))
        da, va = desc_of(a)
        db, vb = desc_of(b)
        X.append(np.asarray(pooled_inputs(da, db, va, vb)))
        y.append(1.0 if d_all[b] <= ns.distance else 0.0)
    X = np.stack(X)
    y = np.asarray(y)
    print(f"pairs: {len(y)} ({int(y.sum())} positive)")

    # ridge linear probe, leave-out split
    mu, sd = X.mean(0), X.std(0) + 1e-6
    Xn = (X - mu) / sd
    n_tr = int(0.7 * len(y))
    idx = rng.permutation(len(y))
    tr, te = idx[:n_tr], idx[n_tr:]
    A = Xn[tr]
    w = np.linalg.solve(A.T @ A + 10.0 * np.eye(A.shape[1]),
                        A.T @ (2 * y[tr] - 1))
    s_te = Xn[te] @ w
    auc_pairs = [(si, yi) for si, yi in zip(s_te, y[te])]
    pos_s = [s for s, yy in auc_pairs if yy > 0.5]
    neg_s = [s for s, yy in auc_pairs if yy < 0.5]
    if pos_s and neg_s:
        auc = np.mean([[float(p_ > n_) + 0.5 * float(p_ == n_)
                        for n_ in neg_s] for p_ in pos_s])
        acc = np.mean((s_te > 0) == (y[te] > 0.5))
        print(f"linear probe on held-out pairs: AUC {auc:.3f}, "
              f"acc {acc:.3f}")
        print("verdict:", "features SEPARATE (stage-2 optimization issue)"
              if auc > 0.75 else
              "features DO NOT separate (upstream signal missing)")
    else:
        print("degenerate split; rerun with larger --n")


if __name__ == "__main__":
    main()
