"""bf16 feature-activation path of the encoder (tpu.encoder_bf16).

On CPU the trace-time backend gate forces f32, so the bf16 branch is
exercised by spoofing the backend query inside the encoder module; JAX
executes bf16 arithmetic fine on CPU, only slower."""

import jax
import jax.numpy as jnp
import numpy as np

from deeppointmap_tpu.models import encoder as enc_mod


def _tiny_encoder(act):
    return enc_mod.Encoder(npoint=(64, 16), radius_list=((0.2, 0.4),
                                                         (0.4, 0.8)),
                           nsample_list=((8, 8), (8, 8)), in_channel=3,
                           out_channel=32, width=8, upsample_layers=1,
                           act_dtype=act)


def test_bf16_activations_close_to_f32(monkeypatch):
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.normal(0, 0.4, (2, 256, 3)), jnp.float32)
    valid = jnp.asarray(rng.random((2, 256)) > 0.1)

    enc32 = _tiny_encoder("float32")
    params = enc32.init(jax.random.PRNGKey(0), pts, valid)
    c32, f32_, v32 = enc32.apply(params, pts, valid)

    monkeypatch.setattr(enc_mod.jax, "default_backend", lambda: "tpu")
    encbf = _tiny_encoder("bfloat16")
    cbf, fbf, vbf = encbf.apply(params, pts, valid)

    # identical params + identical geometry path
    np.testing.assert_array_equal(np.asarray(cbf), np.asarray(c32))
    np.testing.assert_array_equal(np.asarray(vbf), np.asarray(v32))
    assert fbf.dtype == jnp.float32          # cast back at the boundary
    # features agree to bf16 tolerance
    err = np.abs(np.asarray(fbf) - np.asarray(f32_))
    scale = np.abs(np.asarray(f32_)).max()
    assert err.max() / max(scale, 1e-6) < 0.1, err.max()
    assert np.median(err) / max(scale, 1e-6) < 0.01


def test_from_config_knob():
    from deeppointmap_tpu.config import Config

    base = dict(npoint=[64, 16], radius_list=[[0.2, 0.4], [0.4, 0.8]],
                nsample_list=[[8, 8], [8, 8]], in_channel=3,
                out_channel=32, width=8, expansion=4, upsample_layers=1,
                sample=[{"type": "fps"}])
    args = Config(dict(encoder=dict(base), tpu=dict(encoder_bf16=True)))
    assert enc_mod.Encoder.from_config(args).act_dtype == "bfloat16"
    args2 = Config(dict(encoder=dict(base), tpu={}))
    assert enc_mod.Encoder.from_config(args2).act_dtype == "float32"
