"""Layer-level parity: our Flax encoder/decoder vs the reference torch
implementation with identical (converted) weights.

The reference repo is used purely as a *test oracle* (imported read-only
from /root/reference with CPU torch); no reference code ships in this
package. Skipped when the reference mirror is absent.
"""

import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference mirror not available")


@pytest.fixture(scope="module")
def ref_modules():
    # the reference imports colorlog/easydict which aren't installed;
    # stub just enough for import
    import logging as _logging

    colorlog = types.ModuleType("colorlog")
    colorlog.getLogger = _logging.getLogger
    colorlog.INFO = _logging.INFO
    sys.modules.setdefault("colorlog", colorlog)
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import torch  # noqa: F401
    from network.encoder.encoder import Encoder as TorchEncoder
    from network.decoder.decoder import Decoder as TorchDecoder
    return TorchEncoder, TorchDecoder


from deeppointmap_tpu.config import Config

ENC_CFG = Config(encoder=dict(
    npoint=[64, 32, 16],
    radius_list=[[0.3, 0.5], [0.5, 0.8], [0.8, 1.2, 1.2]],
    nsample_list=[[8, 8], [8, 8], [8, 8, 8]],
    in_channel=3, out_channel=24, width=8, expansion=4, upsample_layers=2,
    sample=[{"type": "fps"}, {"type": "fps"}, {"type": "fps"}],
    norm="LN", bias=True,
))

DEC_CFG = Config(
    decoder=dict(in_channel=24, model_channel=48, attention_layers=2),
    loss=dict(tau=0.1, eps_offset=2.0),
)


def _torch_encoder(ref_modules):
    import torch
    TorchEncoder, _ = ref_modules
    torch.manual_seed(0)
    m = TorchEncoder(ENC_CFG)
    m.eval()
    return m


def _flax_encoder():
    from deeppointmap_tpu.models import Encoder
    return Encoder.from_config(ENC_CFG)


def test_encoder_parity(ref_modules):
    import torch
    import jax.numpy as jnp
    import jax

    from deeppointmap_tpu.models.weights import convert_encoder

    tm = _torch_encoder(ref_modules)
    fm = _flax_encoder()

    rng = np.random.default_rng(0)
    pts = rng.normal(size=(2, 128, 3)).astype(np.float32) * 2.0
    padding = np.zeros((2, 128), dtype=bool)

    with torch.no_grad():
        t_coor, t_fea, t_pad = tm(torch.from_numpy(pts).transpose(1, 2),
                                  torch.from_numpy(padding))
    t_coor = t_coor.numpy().transpose(0, 2, 1)
    t_fea = t_fea.numpy().transpose(0, 2, 1)

    irm_counts = [len(r) - 1 for r in ENC_CFG.encoder.radius_list]
    params = {"params": convert_encoder(tm.state_dict(), 3, irm_counts)}
    f_coor, f_fea, f_valid = jax.jit(fm.apply)(
        params, jnp.asarray(pts), jnp.asarray(~padding))

    np.testing.assert_allclose(np.asarray(f_coor), t_coor, atol=1e-4)
    assert bool(np.all(np.asarray(f_valid)))
    np.testing.assert_allclose(np.asarray(f_fea), t_fea, atol=2e-3, rtol=1e-3)


@pytest.fixture(scope="module")
def dec_pair(ref_modules):
    import torch
    _, TorchDecoder = ref_modules
    torch.manual_seed(1)
    tm = TorchDecoder(DEC_CFG)
    tm.eval()
    from deeppointmap_tpu.models import Decoder
    from deeppointmap_tpu.models.weights import convert_decoder
    fm = Decoder.from_config(DEC_CFG)
    params = {"params": convert_decoder(tm.state_dict(), 2)}
    return tm, fm, params


def _rand_desc(rng, n, c=27):
    d = rng.normal(size=(n, c)).astype(np.float32)
    d[:, -3:] *= 0.5
    return d


def test_loop_detection_parity(dec_pair):
    import torch
    import jax
    import jax.numpy as jnp
    from deeppointmap_tpu.models import Decoder

    tm, fm, params = dec_pair
    rng = np.random.default_rng(2)
    src = _rand_desc(rng, 48)
    dst = _rand_desc(rng, 40)

    with torch.no_grad():
        t_prob = tm.loop_detection_forward(
            torch.from_numpy(src.T), torch.from_numpy(dst.T)).numpy()

    f_prob = jax.jit(lambda p, s, d, sv, dv: fm.apply(
        p, s, d, sv, dv, method=Decoder.loop_detection))(
        params, jnp.asarray(src)[None], jnp.asarray(dst)[None],
        jnp.ones((1, 48), bool), jnp.ones((1, 40), bool))
    np.testing.assert_allclose(np.asarray(f_prob), t_prob, atol=1e-4)


def test_registration_parity(dec_pair):
    import torch
    import jax
    import jax.numpy as jnp
    import functools
    from deeppointmap_tpu.models import Decoder
    from deeppointmap_tpu.models.decoder import num_pairs_for

    tm, fm, params = dec_pair
    rng = np.random.default_rng(3)
    m = n = 64
    src = _rand_desc(rng, m)
    # make dst a rigid transform of src so registration is well-posed
    theta = 0.3
    R = np.array([[np.cos(theta), -np.sin(theta), 0],
                  [np.sin(theta), np.cos(theta), 0],
                  [0, 0, 1]], dtype=np.float32)
    dst = src.copy()
    dst[:, -3:] = src[:, -3:] @ R.T + np.array([0.2, -0.1, 0.05], np.float32)

    with torch.no_grad():
        t_R, t_T, t_conf, t_rmse = tm.registration_forward(
            torch.from_numpy(src.T), torch.from_numpy(dst.T), num_sample=0.5)

    k = num_pairs_for(m, n, 0.5)
    reg = jax.jit(functools.partial(fm.apply, method=Decoder.registration),
                  static_argnames="num_pairs")
    f_R, f_t, f_conf, f_rmse, n_in = reg(
        params, jnp.asarray(src), jnp.asarray(dst),
        jnp.ones((m,), bool), jnp.ones((n,), bool), num_pairs=k)

    np.testing.assert_allclose(np.asarray(f_R), t_R.numpy(), atol=2e-3)
    np.testing.assert_allclose(np.asarray(f_t), t_T.numpy().reshape(3), atol=2e-3)
    # confidence: reference averages top-30 of the inlier confidences
    from deeppointmap_tpu.slam.utils import simvec_to_num_np
    t_conf_scalar = simvec_to_num_np(t_conf.numpy().reshape(-1))
    assert abs(float(f_conf) - t_conf_scalar) < 1e-3
    assert abs(float(f_rmse) - float(t_rmse)) < 2e-3


def test_weight_roundtrip(ref_modules, dec_pair, tmp_path):
    """torch -> flax -> torch: state dicts identical; and the .pth save
    reloads through the standard loader."""
    import torch

    from deeppointmap_tpu.models.weights import (convert_decoder_back,
                                                 convert_encoder,
                                                 convert_encoder_back,
                                                 save_torch_weight)

    tm_enc = _torch_encoder(ref_modules)
    irm = [len(r) - 1 for r in ENC_CFG.encoder.radius_list]
    flax_enc = convert_encoder(tm_enc.state_dict(), 3, irm)
    back = convert_encoder_back(flax_enc, 3, irm)
    sd = tm_enc.state_dict()
    assert set(back) == set(sd)
    for k in sd:
        np.testing.assert_allclose(back[k], sd[k].numpy(), atol=1e-7, err_msg=k)

    tm_dec, fm, params = dec_pair
    back_dec = convert_decoder_back(params["params"], 2)
    sd_dec = tm_dec.state_dict()
    assert set(back_dec) == set(sd_dec)
    for k in sd_dec:
        np.testing.assert_allclose(back_dec[k], sd_dec[k].numpy(), atol=1e-7,
                                   err_msg=k)

    # save in the reference schema and reload through our loader
    cfg = Config(encoder=ENC_CFG.encoder, decoder=DEC_CFG.decoder,
                 loss=DEC_CFG.loss)
    path = str(tmp_path / "w.pth")
    save_torch_weight(path, {"params": flax_enc},
                      {"params": params["params"]}, cfg)
    from deeppointmap_tpu.models.weights import load_torch_weight
    ep2, dp2 = load_torch_weight(path, cfg)
    import jax
    for a, b in zip(jax.tree.leaves(ep2["params"]), jax.tree.leaves(flax_enc)):
        np.testing.assert_allclose(a, b, atol=1e-7)
