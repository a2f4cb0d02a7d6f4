"""Registration training loss (JAX, fixed-shape, mask-aware).

Parity with the reference `RegistrationLoss` (reference: network/loss.py:10-179):
L = lambda_p * L_pairing + lambda_c * L_coarse + lambda_o * L_offset,
computed symmetrically src->dst and dst->src. The reference's dynamic
boolean indexing (loss.py:122-130) becomes masked means; neutral
(near-but-not-nearest) logits are pushed to -1e8 exactly as the reference
does (loss.py:128).
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp


class LossConfig(NamedTuple):
    tau: float = 0.1
    offset_value: str = "euclidean"
    eps_positive: float = 1.0
    eps_offset: float = 2.0
    lambda_p: float = 1.0
    lambda_c: float = 1.0
    lambda_o: float = 1.0

    @classmethod
    def from_args(cls, args) -> "LossConfig":
        c = args.loss
        return cls(tau=c.tau, offset_value=c.get("offset_value", "euclidean"),
                   eps_positive=c.get("eps_positive", 1.0),
                   eps_offset=c.eps_offset,
                   lambda_p=c.get("lambda_p", 1.0),
                   lambda_c=c.get("lambda_c", 1.0),
                   lambda_o=c.get("lambda_o", 1.0))


def make_pairs(src_global: jnp.ndarray, dst_global: jnp.ndarray,
               src_valid: jnp.ndarray, dst_valid: jnp.ndarray,
               eps_positive: float):
    """GT pairs: per-src-point nearest dst within eps, plus the neutral mask
    of near-but-not-nearest pairs (reference: loss.py:92-111).

    Returns (corr_ids (B,S) int32, corr_mask (B,S) bool, neutral (B,S,D) bool).
    """
    d2 = jnp.sum((src_global[:, :, None, :] - dst_global[:, None, :, :]) ** 2,
                 axis=-1)                                         # (B,S,D)
    d2 = jnp.where(dst_valid[:, None, :], d2, jnp.float32(1e18))
    min_d2 = jnp.min(d2, axis=-1)
    corr_ids = jnp.argmin(d2, axis=-1).astype(jnp.int32)          # (B,S)
    eps2 = jnp.float32(eps_positive ** 2)
    neutral = d2 <= eps2
    # knock out the argmin entry
    d = d2.shape[-1]
    onehot = jax.nn.one_hot(corr_ids, d, dtype=bool)
    neutral = neutral & ~onehot
    corr_mask = (min_d2 <= eps2) & src_valid
    return corr_ids, corr_mask, neutral


def _normalize(x):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


def pairing_loss(src_fea, dst_fea, src_valid, corr_ids, corr_mask, neutral,
                 tau: float):
    """Masked InfoNCE over cosine-sim logits (reference: loss.py:113-142)."""
    logits = jnp.einsum("bsc,bdc->bsd", _normalize(src_fea),
                        _normalize(dst_fea),
                        preferred_element_type=jnp.float32)
    logits = jnp.where(neutral, -1e8, logits)
    logprobs = jax.nn.log_softmax(logits / tau, axis=-1)          # (B,S,D)
    picked = jnp.take_along_axis(logprobs, corr_ids[..., None],
                                 axis=-1)[..., 0]                 # (B,S)
    use = corr_mask & src_valid
    n = jnp.maximum(jnp.sum(use.astype(jnp.float32)), 1.0)
    return -jnp.sum(jnp.where(use, picked, 0.0)) / n


def offset_loss(offset_res, pair_valid, offset_value: str = "euclidean"):
    """Mean offset residual magnitude over valid pairs
    (reference: loss.py:144-161). The mahalanobis variant whitens by the
    covariance of the *detached* residuals (reference: loss.py:150-156);
    its dynamic try/inv-except-identity becomes a masked 3x3 covariance
    with a determinant-gated identity fallback, which keeps the whole
    thing jittable at fixed shape."""
    if offset_value == "manhattan":
        err = jnp.sum(jnp.abs(offset_res), axis=-1)
    elif offset_value == "euclidean":
        err = jnp.linalg.norm(offset_res, axis=-1)
    elif offset_value == "mahalanobis":
        res = jax.lax.stop_gradient(offset_res).reshape(-1, 3)
        w = pair_valid.reshape(-1).astype(res.dtype)
        n = jnp.maximum(jnp.sum(w), 1.0)
        mean = jnp.sum(res * w[:, None], axis=0) / n
        cen = (res - mean) * w[:, None]
        cov = (cen.T @ cen) / jnp.maximum(n - 1.0, 1.0)
        # the reference falls back to the identity metric when the
        # covariance is singular (loss.py:152-154); invert a guaranteed-
        # invertible matrix and select, instead of branching. The gate is
        # SCALE-RELATIVE (det ~ sigma^6 shrinks as residuals converge; an
        # absolute threshold would silently flip well-conditioned small
        # covariances to euclidean): well-conditioned iff
        # det > eps * (trace/3)^3.
        tr = jnp.trace(cov)
        ok = jnp.abs(jnp.linalg.det(cov)) > \
            1e-6 * jnp.maximum(tr / 3.0, 1e-30) ** 3
        eye = jnp.eye(3, dtype=cov.dtype)
        cov_inv = jnp.where(ok, jnp.linalg.inv(jnp.where(ok, cov, eye)), eye)
        quad = jnp.einsum("...j,jk,...k->...", offset_res, cov_inv,
                          offset_res,
                          preferred_element_type=jnp.float32)
        err = jnp.sqrt(jnp.maximum(quad, 1e-12))
    else:
        raise ValueError(f"unsupported offset_value: {offset_value!r}")
    n = jnp.maximum(jnp.sum(pair_valid.astype(jnp.float32)), 1.0)
    return jnp.sum(jnp.where(pair_valid, err, 0.0)) / n


def top1_pairing_acc(src_fea, dst_fea, src_valid, corr_ids, corr_mask):
    """Top-1 pairing accuracy metric (reference: loss.py:163-179)."""
    sim = jnp.einsum("bsc,bdc->bsd", _normalize(src_fea), _normalize(dst_fea),
                     preferred_element_type=jnp.float32)
    pred = jnp.argmax(sim, axis=-1)
    use = corr_mask & src_valid
    hit = (pred == corr_ids) & use
    return jnp.sum(hit.astype(jnp.float32)) / \
        jnp.maximum(jnp.sum(use.astype(jnp.float32)), 1.0)


def registration_loss(cfg: LossConfig,
                      src_global, dst_global, src_valid, dst_valid,
                      dec_out: Dict) -> Dict:
    """Full symmetric loss. `src_global`/`dst_global` are GT-frame
    descriptor coordinates (B, S, 3) / (B, D, 3); `dec_out` is
    Decoder.train_forward's dict."""
    ids_s, mask_s, neu_s = make_pairs(src_global, dst_global,
                                      src_valid, dst_valid, cfg.eps_positive)
    ids_d, mask_d, neu_d = make_pairs(dst_global, src_global,
                                      dst_valid, src_valid, cfg.eps_positive)
    no_neutral_s = jnp.zeros_like(neu_s)
    no_neutral_d = jnp.zeros_like(neu_d)

    sp, dp = dec_out["src_pairing_fea"], dec_out["dst_pairing_fea"]
    sc, dc = dec_out["src_coarse_fea"], dec_out["dst_coarse_fea"]

    l_pair = (pairing_loss(sp, dp, src_valid, ids_s, mask_s, no_neutral_s, cfg.tau)
              + pairing_loss(dp, sp, dst_valid, ids_d, mask_d, no_neutral_d, cfg.tau)) / 2
    l_coarse = (pairing_loss(sc, dc, src_valid, ids_s, mask_s, neu_s, cfg.tau)
                + pairing_loss(dc, sc, dst_valid, ids_d, mask_d, neu_d, cfg.tau)) / 2
    l_off = (offset_loss(dec_out["src_offset_res"], dec_out["pair_valid"], cfg.offset_value)
             + offset_loss(dec_out["dst_offset_res"], dec_out["pair_valid"], cfg.offset_value)) / 2
    acc = (top1_pairing_acc(sp, dp, src_valid, ids_s, mask_s)
           + top1_pairing_acc(dp, sp, dst_valid, ids_d, mask_d)) / 2

    loss = cfg.lambda_p * l_pair + cfg.lambda_c * l_coarse + cfg.lambda_o * l_off
    return {"loss": loss, "loss_pairing": l_pair, "loss_coarse": l_coarse,
            "loss_offset": l_off, "top1_acc": acc}
