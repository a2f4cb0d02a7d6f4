"""Training-loss parity vs the reference RegistrationLoss with identical
inputs (reference: network/loss.py:10-179)."""

import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference mirror not available")

from deeppointmap_tpu.config import Config
from deeppointmap_tpu.models.loss import LossConfig, registration_loss

LOSS_ARGS = Config(loss=dict(
    tau=0.1, offset_value="euclidean", eps_positive=1.0, eps_offset=2.0,
    lambda_p=1.0, lambda_c=0.5, lambda_o=0.3))


@pytest.fixture(scope="module")
def ref_loss():
    import logging as _logging
    colorlog = types.ModuleType("colorlog")
    colorlog.getLogger = _logging.getLogger
    colorlog.INFO = _logging.INFO
    sys.modules.setdefault("colorlog", colorlog)
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from network.loss import RegistrationLoss
    return RegistrationLoss(LOSS_ARGS)


def test_registration_loss_parity(ref_loss):
    import torch

    rng = np.random.default_rng(0)
    B, S, D, C = 2, 40, 36, 16
    K = 25
    # clustered coords so some pairs fall within eps_positive
    src_g = rng.uniform(-4, 4, size=(B, S, 3)).astype(np.float32)
    dst_g = src_g[:, :D] + rng.normal(0, 0.8, size=(B, D, 3)).astype(np.float32)
    sp = rng.normal(size=(B, S, C)).astype(np.float32)
    dp = rng.normal(size=(B, D, C)).astype(np.float32)
    sc = rng.normal(size=(B, S, C)).astype(np.float32)
    dc = rng.normal(size=(B, D, C)).astype(np.float32)
    s_off = rng.normal(size=(K, 3)).astype(np.float32)
    d_off = rng.normal(size=(K, 3)).astype(np.float32)

    with torch.no_grad():
        t_loss, t_acc, t_lp, t_lc, t_lo = ref_loss(
            src_global_coor=torch.from_numpy(src_g.transpose(0, 2, 1)),
            dst_global_coor=torch.from_numpy(dst_g.transpose(0, 2, 1)),
            src_padding_mask=torch.zeros((B, S), dtype=torch.bool),
            dst_padding_mask=torch.zeros((B, D), dtype=torch.bool),
            src_pairing_fea=torch.from_numpy(sp.transpose(0, 2, 1)),
            dst_pairing_fea=torch.from_numpy(dp.transpose(0, 2, 1)),
            src_coarse_pairing_fea=torch.from_numpy(sc.transpose(0, 2, 1)),
            dst_coarse_pairing_fea=torch.from_numpy(dc.transpose(0, 2, 1)),
            src_offset_res=torch.from_numpy(s_off[:, :, None]),
            dst_offset_res=torch.from_numpy(d_off[:, :, None]),
        )

    import jax.numpy as jnp
    cfg = LossConfig.from_args(LOSS_ARGS)
    # our offset residuals live in the dec_out dict with a validity mask;
    # pad both to the same K with all-valid
    dec_out = {
        "src_pairing_fea": jnp.asarray(sp), "dst_pairing_fea": jnp.asarray(dp),
        "src_coarse_fea": jnp.asarray(sc), "dst_coarse_fea": jnp.asarray(dc),
        "src_offset_res": jnp.asarray(s_off)[None],
        "dst_offset_res": jnp.asarray(d_off)[None],
        "pair_valid": jnp.ones((1, K), bool),
    }
    out = registration_loss(cfg, jnp.asarray(src_g), jnp.asarray(dst_g),
                            jnp.ones((B, S), bool), jnp.ones((B, D), bool),
                            dec_out)

    np.testing.assert_allclose(float(out["loss_pairing"]), float(t_lp),
                               atol=1e-4)
    np.testing.assert_allclose(float(out["loss_coarse"]), float(t_lc),
                               atol=1e-4)
    np.testing.assert_allclose(float(out["loss_offset"]), float(t_lo),
                               atol=1e-4)
    np.testing.assert_allclose(float(out["top1_acc"]), float(t_acc),
                               atol=1e-5)
    np.testing.assert_allclose(float(out["loss"]), float(t_loss), atol=2e-4)


def test_mahalanobis_offset_parity(ref_loss):
    """Mahalanobis offset variant vs the reference formula
    (reference: loss.py:150-156): covariance of detached residuals,
    einsum quadratic form, identity fallback on singularity."""
    import torch

    import jax.numpy as jnp

    from deeppointmap_tpu.models.loss import offset_loss

    rng = np.random.default_rng(3)
    K = 40
    off = rng.normal(0, 0.5, size=(K, 3)).astype(np.float32)

    t_off = torch.from_numpy(off)
    cov_inv = torch.linalg.inv(torch.cov(t_off.T))
    t_err = torch.sqrt(torch.einsum("nj,jk,nk->n", t_off, cov_inv, t_off))
    t_loss = float(torch.sum(t_err) / K)

    ours = float(offset_loss(jnp.asarray(off)[None],
                             jnp.ones((1, K), bool), "mahalanobis"))
    np.testing.assert_allclose(ours, t_loss, rtol=1e-4)

    # singular covariance (all residuals identical) -> identity fallback,
    # i.e. plain euclidean norms
    const = np.tile(np.array([[0.3, -0.2, 0.1]], np.float32), (K, 1))
    ours_sing = float(offset_loss(jnp.asarray(const)[None],
                                  jnp.ones((1, K), bool), "mahalanobis"))
    np.testing.assert_allclose(ours_sing, float(np.linalg.norm(const[0])),
                               rtol=1e-4)

    # masked entries influence neither the covariance nor the mean
    mask = np.zeros((1, 2 * K), bool)
    mask[0, :K] = True
    padded = np.concatenate([off, rng.normal(9, 9, (K, 3))], 0).astype(
        np.float32)
    ours_masked = float(offset_loss(jnp.asarray(padded)[None],
                                    jnp.asarray(mask), "mahalanobis"))
    np.testing.assert_allclose(ours_masked, t_loss, rtol=1e-4)
