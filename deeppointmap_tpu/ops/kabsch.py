"""Weighted Kabsch/SVD rigid registration with iterative inlier trimming.

Re-implements the reference's `_solve_transformation_SVD` (reference:
network/decoder/decoder.py:227-265) as a fixed-shape, jit-compatible
function: the dynamic `while` with early stopping becomes 3 unrolled solve
steps carrying a `stopped` flag, and dynamic inlier subsets become boolean
masks folded into the weights.

Numerics: the reference up-casts the 3x3 covariance to float64 before SVD
(reference: decoder.py:242). TPUs have no fast fp64, so we compute the
covariance with float32 MXU accumulation after *centering* (which removes
the catastrophic-cancellation risk the fp64 was guarding against) and run
`jnp.linalg.svd` on the 3x3 in fp32. A determinant correction guards
against reflections (improvement over the reference, which omits it).
Accuracy vs a NumPy fp64 oracle is covered by tests/test_ops.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_MIN_INLIERS = 30
_TOPK_SEED = 64


def _apply_rt(pts, R, t):
    """pts (K, 3) -> R pts + t, full fp32 precision."""
    return jnp.dot(pts, R.T, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST) + t[None, :]


def _solve_rt(src, dst, w):
    """One weighted Kabsch solve. src/dst (K, 3), w (K,) >= 0."""
    wsum = jnp.maximum(jnp.sum(w), 1e-12)
    cs = jnp.sum(src * w[:, None], axis=0) / wsum     # (3,)
    cd = jnp.sum(dst * w[:, None], axis=0) / wsum
    src_c = (src - cs) * w[:, None]
    dst_c = dst - cd
    S = jnp.dot(src_c.T, dst_c, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)  # (3,3)
    u, _, vt = jnp.linalg.svd(S)
    v = vt.T
    det = jnp.linalg.det(jnp.dot(v, u.T, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST))
    d = jnp.stack([jnp.float32(1.0), jnp.float32(1.0), det])  # [1, 1, det(VU^T)]
    R = jnp.dot(v * d[None, :], u.T, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
    t = cd - jnp.dot(R, cs, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    return R, t


def weighted_kabsch(
    src: jnp.ndarray,    # (K, 3) source points
    dst: jnp.ndarray,    # (K, 3) target points
    weight: jnp.ndarray, # (K,) pairing confidence, >= 0
    valid: jnp.ndarray,  # (K,) bool; padded/rejected pairs are False
    num_iter: int = 3,
    std_ratio: float = 3.0,
):
    """Returns (R (3,3), t (3,), inlier_mask (K,), rmse scalar).

    Trimming rule per solve (reference: decoder.py:247-256): residuals are
    measured over all pairs; pairs with err <= mean + std_ratio * sigma of
    the current inlier residuals stay. Stops early when the mask is stable
    or fewer than 30 inliers remain.
    """
    k = src.shape[0]
    src = src.astype(jnp.float32)
    dst = dst.astype(jnp.float32)
    w_masked = jnp.where(valid, weight.astype(jnp.float32), 0.0)

    # seed inliers: confidence > 0.5 union top-64 by confidence
    # (reference: decoder.py:233-235), restricted to valid pairs
    inlier0 = (w_masked > 0.5)
    kk = min(_TOPK_SEED, k)
    top_vals, top_idx = jax.lax.top_k(w_masked, kk)
    inlier0 = inlier0.at[top_idx].set(True)
    inlier0 = inlier0 & valid

    def step(carry, _):
        inlier, stopped, R_prev, t_prev = carry
        w = w_masked * inlier
        R, t = _solve_rt(src, dst, w)
        # freeze once stopped
        R = jnp.where(stopped, R_prev, R)
        t = jnp.where(stopped, t_prev, t)

        err = jnp.linalg.norm(_apply_rt(src, R, t) - dst, axis=-1)  # (K,)
        n_in = jnp.maximum(jnp.sum(inlier.astype(jnp.float32)), 1.0)
        mean = jnp.sum(jnp.where(inlier, err, 0.0)) / n_in
        var = jnp.sum(jnp.where(inlier, (err - mean) ** 2, 0.0)) \
            / jnp.maximum(n_in - 1.0, 1.0)
        std = jnp.sqrt(var)
        new_inlier = (err <= mean + std_ratio * std) & valid

        same = jnp.all(new_inlier == inlier)
        too_few = jnp.sum(new_inlier.astype(jnp.int32)) < _MIN_INLIERS
        next_inlier = jnp.where(stopped, inlier, new_inlier)
        next_stopped = stopped | same | too_few
        return (next_inlier, next_stopped, R, t), None

    init = (inlier0, jnp.bool_(False),
            jnp.eye(3, dtype=jnp.float32), jnp.zeros((3,), dtype=jnp.float32))
    (inlier, _, R, t), _ = jax.lax.scan(step, init, None, length=num_iter)

    err2 = jnp.sum((_apply_rt(src, R, t) - dst) ** 2, axis=-1)
    n_in = jnp.maximum(jnp.sum(inlier.astype(jnp.float32)), 1.0)
    rmse = jnp.sqrt(jnp.sum(jnp.where(inlier, err2, 0.0)) / n_in)
    return R, t, inlier, rmse


def ransac_kabsch(
    src: jnp.ndarray,    # (K, 3) source points
    dst: jnp.ndarray,    # (K, 3) target points
    weight: jnp.ndarray, # (K,) pairing confidence, >= 0
    valid: jnp.ndarray,  # (K,) bool; padded/rejected pairs are False
    n_hyp: int = 1024,
    tau: float = 0.5,
    refine_taus: tuple = (0.75, 0.5, 0.4),
):
    """Robust drop-in for `weighted_kabsch` (same signature/returns) for
    heavily contaminated correspondence sets.

    The reference's mean+3-sigma trimming assumes mostly-inlier matches;
    under viewpoint-dependent visibility (occluded LiDAR) dual-softmax
    matches carry 50-80% confident outliers and the trimmed solve is
    biased toward identity (measured: sep-1 frames t_err p50 0.25 m ->
    ATE 42.9 m two-lap). This solver: confidence-seeded 3-point
    hypotheses (Gumbel top-k over log-confidence), weighted consensus at
    `tau` meters, then masked re-solves at annealed `refine_taus`.
    Fixed-shape throughout: (n_hyp, K) residual matrix lives in
    registers/VMEM, the n_hyp 3x3 SVDs vmap on the VPU. Deterministic
    (constant fold key) so registration stays reproducible.

    Offline shootout vs the reference rule on dumped occluded-eval
    correspondence sets (scripts/solver_lab.py, BASELINE.md round 5):
    t_err p50/p90 at 3.3 m frame separation 0.25/0.94 -> 0.042/0.073 m;
    at 6.5 m 1.17/4.46 -> 0.041/0.103 m; GT-oracle floor 0.057 m.

    Reported rmse = inlier rmse / weighted inlier fraction. A raw
    inlier-only rmse saturates at "perfect" (<0.25 m) even when the
    consensus covers almost nothing -- measured on-chip: 13 m-separation
    failures (t_err 11.7 m) report rmse 0.24, identical to correct
    solves, blinding every reference gate (edge_rmse_drop, the keyframe
    EMA, s2m acceptance). Dividing by coverage restores graceful
    degradation: good occluded solves ~0.4-0.6, failures >2 (diag of
    2026-08-19), so reference-style thresholds separate them again.
    """
    k = src.shape[0]
    src = src.astype(jnp.float32)
    dst = dst.astype(jnp.float32)
    w_masked = jnp.where(valid, weight.astype(jnp.float32), 0.0)

    key = jax.random.PRNGKey(0)
    logits = (jnp.log(jnp.maximum(w_masked, 1e-9))[None, :]
              + jax.random.gumbel(key, (n_hyp, k)))
    _, hyp_idx = jax.lax.top_k(logits, 3)                     # (H, 3)
    ones3 = jnp.ones((3,), jnp.float32)
    Rh, th = jax.vmap(lambda s, d: _solve_rt(s, d, ones3))(
        src[hyp_idx], dst[hyp_idx])
    res = jnp.linalg.norm(
        jnp.einsum("hij,kj->hki", Rh, src,
                   precision=jax.lax.Precision.HIGHEST)
        + th[:, None, :] - dst[None], axis=-1)                # (H, K)
    score = jnp.sum((res < tau) * w_masked[None, :], axis=-1)
    best = jnp.argmax(score)
    R, t = Rh[best], th[best]

    inlier = valid
    for tr in refine_taus:
        err = jnp.linalg.norm(_apply_rt(src, R, t) - dst, axis=-1)
        inlier = (err < tr) & valid
        R, t = _solve_rt(src, dst, w_masked * inlier)

    err2 = jnp.sum((_apply_rt(src, R, t) - dst) ** 2, axis=-1)
    inlier = (jnp.sqrt(err2) < refine_taus[-1]) & valid
    n_in = jnp.maximum(jnp.sum(inlier.astype(jnp.float32)), 1.0)
    rmse_in = jnp.sqrt(jnp.sum(jnp.where(inlier, err2, 0.0)) / n_in)
    frac_w = (jnp.sum(w_masked * inlier)
              / jnp.maximum(jnp.sum(w_masked), 1e-9))
    rmse = rmse_in / jnp.clip(frac_w, 1.0 / 64.0, 1.0)
    return R, t, inlier, rmse
