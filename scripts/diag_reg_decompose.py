"""Decompose occluded-eval registration error into its three stages.

For frame pairs at a given separation, re-runs the decoder's
registration pieces (correlate -> dual-softmax pairing -> offset heads
-> weighted Kabsch) and scores each stage against the world's GT:

  match   -- GT residual of the top-K matched token positions BEFORE
             offsets: |GT @ src_xyz - dst_xyz|. High = dual-softmax
             matches wrong tokens (or the tokens themselves shift with
             viewpoint under occlusion).
  offset  -- same residual AFTER offset correction. If offsets do not
             shrink the residual, the offset head is not compensating
             the viewpoint-dependent token shift.
  kabsch  -- SE(3) error of (a) the production weighted solve and
             (b) an oracle unweighted solve on GT-verified inliers
             (residual < 1 m). If (b) is accurate while (a) is not, the
             confidence weighting is the problem; if both are off, the
             correspondences themselves are biased.

Usage: python scripts/diag_reg_decompose.py [--weights ...] [--sep 1]
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
                    default=os.path.join(
                        REPO, "artifacts/full_size_occ_v2/"
                              "weights_final.msgpack"))
    ap.add_argument("--root", default="/tmp/dpm_full_world2_occl")
    ap.add_argument("--seps", default="1,2,4")
    ap.add_argument("--step", type=int, default=12)
    ap.add_argument("--dump", default="",
                    help="npz path: save per-pair (sx, dx, o_sd, o_ds, "
                         "conf, GT) arrays for offline solver experiments")
    ns = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from scripts.train_full_size import (apply_artifact_render,
                                         build_eval_world, full_eval_args)
    from deeppointmap_tpu.data.dataset import BasicAgent
    from deeppointmap_tpu.models.decoder import Decoder, num_pairs_for
    from deeppointmap_tpu.ops.kabsch import weighted_kabsch
    from deeppointmap_tpu.pipeline.common import load_weights
    from deeppointmap_tpu.pipeline.infer import (device_preprocess_config,
                                                 make_infer_transform)
    from deeppointmap_tpu.slam.engine import InferenceEngine
    from deeppointmap_tpu.utils import se3 as se3m

    apply_artifact_render(ns.weights)
    build_eval_world(ns.root)
    args = full_eval_args(ns.root, "/tmp/diag_dec")
    enc, dec, ep, dp = load_weights(args, ns.weights)
    engine = InferenceEngine(args, ep, dp, encoder=enc, decoder=dec,
                             preprocess_cfg=device_preprocess_config(args))
    agent = BasicAgent(root=os.path.join(ns.root, "scene0", "0"),
                       reader="auto")
    agent.set_independent(make_infer_transform(args))

    n = len(agent)
    gt_pose, raw, descs = [], {}, {}
    for i in range(n):
        pc, R, T, v, orig = agent[i]
        G = np.eye(4)
        G[:3, :3] = np.asarray(R).reshape(3, 3)
        G[:3, 3] = np.asarray(T).reshape(3)
        gt_pose.append(G)
        raw[i] = (pc, v)

    def desc_of(i):
        if i not in descs:
            pc, v = raw[i]
            d, dv, pv = engine.extract(pc, v)
            descs[i] = (np.asarray(d[0]), np.asarray(dv[0]))
        return descs[i]

    def run_pair(sd, sv, dd, dv):
        m, nn = sd.shape[0], dd.shape[0]
        k = num_pairs_for(m, nn, args.slam_system.registration_sample_odometer)

        def fn(mod, sd, dd, sv, dv):
            sf, df = mod.correlate(sd[None], dd[None], sv[None], dv[None])
            sf, df = sf[0], df[0]
            sp = mod.similarity_head(sf)
            dpp = mod.similarity_head(df)
            sp = sp / jnp.maximum(jnp.linalg.norm(sp, axis=-1,
                                                  keepdims=True), 1e-12)
            dpp = dpp / jnp.maximum(jnp.linalg.norm(dpp, axis=-1,
                                                    keepdims=True), 1e-12)
            sim = jnp.dot(sp, dpp.T, preferred_element_type=jnp.float32)
            sim = jnp.where(sv[:, None] & dv[None, :], sim, -1e9)
            cm = (jax.nn.softmax(sim / mod.tau, axis=1)
                  * jax.nn.softmax(sim / mod.tau, axis=0))
            cm = cm * (sv[:, None] & dv[None, :])
            conf, flat = jax.lax.top_k(cm.reshape(-1), k)
            si, di = flat // cm.shape[1], flat % cm.shape[1]
            sfk, dfk = sf[si], df[di]
            o_sd = mod.offset_head(jnp.concatenate([sfk, dfk], axis=-1))
            o_ds = mod.offset_head(jnp.concatenate([dfk, sfk], axis=-1))
            return si, di, conf, o_sd, o_ds

        return [np.asarray(a) for a in dec.apply(
            dp, jnp.asarray(sd), jnp.asarray(dd), jnp.asarray(sv),
            jnp.asarray(dv), method=fn)]

    dump = {}
    for sep in [int(s) for s in ns.seps.split(",")]:
        agg = {key: [] for key in ("match", "off", "w_terr", "o_terr",
                                   "inl_frac")}
        for i in range(0, n - sep, ns.step):
            j = i + sep
            sd, sv = desc_of(j)
            dd, dv = desc_of(i)
            si, di, conf, o_sd, o_ds = run_pair(sd, sv, dd, dv)
            G = se3m.inv(gt_pose[i]) @ gt_pose[j]      # dst = G @ src
            if ns.dump:
                dump[f"s{sep}_i{i}"] = np.concatenate(
                    [sd[si, -3:], dd[di, -3:], o_sd, o_ds,
                     conf[:, None], np.broadcast_to(
                         G.reshape(1, 16), (len(si), 16))], axis=1)
            sx, dx = sd[si, -3:], dd[di, -3:]
            gt_src = sx @ G[:3, :3].T + G[:3, 3]
            res_match = np.linalg.norm(gt_src - dx, axis=1)
            gt_src_off = (sx + o_sd) @ G[:3, :3].T + G[:3, 3]
            res_off = np.linalg.norm(gt_src_off - dx, axis=1)
            agg["match"].append(np.median(res_match))
            agg["off"].append(np.median(res_off))
            agg["inl_frac"].append(float((res_match < 1.0).mean()))

            # production weighted solve (both offset directions)
            src2 = np.concatenate([sx + o_sd, sx], axis=0)
            dst2 = np.concatenate([dx, dx + o_ds], axis=0)
            c2 = np.concatenate([conf, conf])
            v2 = np.ones(len(src2), bool)
            R, t, inl, rmse = [np.asarray(a) for a in weighted_kabsch(
                jnp.asarray(src2, jnp.float32), jnp.asarray(dst2, jnp.float32),
                jnp.asarray(c2, jnp.float32), jnp.asarray(v2))]
            agg["w_terr"].append(np.linalg.norm(t - G[:3, 3]))

            # oracle: unweighted solve on GT-verified raw matches
            ok = res_match < 1.0
            if ok.sum() >= 8:
                Ro, to, _, _ = [np.asarray(a) for a in weighted_kabsch(
                    jnp.asarray(sx[ok], jnp.float32),
                    jnp.asarray(dx[ok], jnp.float32),
                    jnp.ones(int(ok.sum()), jnp.float32),
                    jnp.ones(int(ok.sum()), bool))]
                agg["o_terr"].append(np.linalg.norm(to - G[:3, 3]))

        fmt = {k: (round(float(np.median(v)), 3) if v else None)
               for k, v in agg.items()}
        print(f"sep {sep}: median-per-pair -- raw-match residual p50 "
              f"{fmt['match']} m | after-offset {fmt['off']} m | "
              f"GT-inlier frac {fmt['inl_frac']} | weighted-solve t_err "
              f"{fmt['w_terr']} m | GT-inlier-solve t_err {fmt['o_terr']} m",
              flush=True)
    if ns.dump:
        np.savez_compressed(ns.dump, **dump)
        print(f"dumped {len(dump)} pair arrays -> {ns.dump}", flush=True)


if __name__ == "__main__":
    main()
