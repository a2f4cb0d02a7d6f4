"""Offline robust-solver shootout on dumped correspondence sets.

Input: the npz from `diag_reg_decompose.py --dump` -- per pair, rows of
[sx(3) dx(3) o_sd(3) o_ds(3) conf(1) G(16)] where G is the GT relative
pose (dst = G @ src). Compares solver variants on identical inputs:

  ref      -- the production weighted_kabsch (reference trimming rule)
  trim     -- quantile trimming (keep best q each iter, more iters)
  ransac   -- confidence-seeded 3-point hypotheses + tau consensus +
              masked refinement (candidate tpu.robust_register design)

All candidates use ONLY deployment-available signals (conf, offsets) --
GT appears exclusively in scoring. Run on CPU; pure JAX so the winner
transplants into ops/kabsch.py unchanged.
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np
import jax
import jax.numpy as jnp

from deeppointmap_tpu.ops.kabsch import (_solve_rt, _apply_rt,
                                         weighted_kabsch)


def build_coords(rows):
    """Replicate Decoder.registration's correspondence assembly."""
    sx, dx = rows[:, 0:3], rows[:, 3:6]
    o_sd, o_ds = rows[:, 6:9], rows[:, 9:12]
    conf = rows[:, 12]
    G = rows[0, 13:29].reshape(4, 4)
    src2 = np.concatenate([sx + o_sd, sx], axis=0)
    dst2 = np.concatenate([dx, dx + o_ds], axis=0)
    c2 = np.concatenate([conf, conf])
    return (jnp.asarray(src2, jnp.float32), jnp.asarray(dst2, jnp.float32),
            jnp.asarray(c2, jnp.float32), G)


def err_of(R, t, G):
    dR = np.asarray(R).T @ G[:3, :3]
    ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    return float(np.linalg.norm(np.asarray(t) - G[:3, 3])), float(ang)


# ------------------------------------------------- candidate: quantile trim
def trim_solve(src, dst, w, keep_q=0.4, iters=6):
    valid = jnp.ones(src.shape[0], bool)
    R, t = _solve_rt(src, dst, w)
    for _ in range(iters):
        err = jnp.linalg.norm(_apply_rt(src, R, t) - dst, axis=-1)
        thr = jnp.quantile(err, keep_q)
        keep = err <= thr
        R, t = _solve_rt(src, dst, w * keep)
    return R, t


# --------------------------------------------------- candidate: RANSAC+refine
def ransac_solve(src, dst, w, n_hyp=512, tau=0.75, refine=3, seed=0):
    k = src.shape[0]
    key = jax.random.PRNGKey(seed)
    # confidence-biased 3-point hypotheses via Gumbel top-k
    logits = jnp.log(jnp.maximum(w, 1e-9))[None, :] + jax.random.gumbel(
        key, (n_hyp, k))
    _, hyp_idx = jax.lax.top_k(logits, 3)                   # (H, 3)
    hs, hd = src[hyp_idx], dst[hyp_idx]                     # (H, 3, 3)
    ones = jnp.ones((3,), jnp.float32)
    Rh, th = jax.vmap(lambda s, d: _solve_rt(s, d, ones))(hs, hd)
    res = jnp.linalg.norm(
        jnp.einsum("hij,kj->hki", Rh, src) + th[:, None, :] - dst[None],
        axis=-1)                                            # (H, K)
    score = jnp.sum((res < tau) * w[None, :], axis=-1)      # weighted consensus
    best = jnp.argmax(score)
    R, t = Rh[best], th[best]
    for _ in range(refine):
        err = jnp.linalg.norm(_apply_rt(src, R, t) - dst, axis=-1)
        keep = err < tau
        R, t = _solve_rt(src, dst, w * keep)
    return R, t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--npz", default="/tmp/pairs_occ.npz")
    ap.add_argument("--tau", type=float, default=0.75)
    ns = ap.parse_args()

    data = np.load(ns.npz)
    per_sep = {}
    for name in data.files:
        sep = int(name.split("_")[0][1:])
        per_sep.setdefault(sep, []).append(data[name])

    for sep in sorted(per_sep):
        rows_list = per_sep[sep]
        res = {m: [] for m in ("ref", "trim", "ransac")}
        for rows in rows_list:
            src, dst, c2, G = build_coords(rows)
            v = jnp.ones(src.shape[0], bool)
            R, t, _, _ = weighted_kabsch(src, dst, c2, v)
            res["ref"].append(err_of(R, t, G))
            R, t = trim_solve(src, dst, c2)
            res["trim"].append(err_of(R, t, G))
            R, t = ransac_solve(src, dst, c2, tau=ns.tau)
            res["ransac"].append(err_of(R, t, G))
        line = [f"sep {sep} ({len(rows_list)} pairs):"]
        for m, vals in res.items():
            te = np.array([v[0] for v in vals])
            re_ = np.array([v[1] for v in vals])
            line.append(f"{m} t p50/p90 {np.percentile(te, 50):.3f}/"
                        f"{np.percentile(te, 90):.3f} m rot p90 "
                        f"{np.percentile(re_, 90):.2f}d")
        print("  ".join(line), flush=True)


if __name__ == "__main__":
    main()
