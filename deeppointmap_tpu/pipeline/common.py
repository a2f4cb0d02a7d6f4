"""Shared pipeline helpers: model construction, weight IO, transforms."""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np

from deeppointmap_tpu.models import Decoder, Encoder

logger = logging.getLogger(__name__)


def init_params(args, seed: int = 0):
    """Random-init encoder/decoder params with the configured shapes."""
    enc = Encoder.from_config(args)
    dec = Decoder.from_config(args)
    key = jax.random.PRNGKey(seed)
    n = int(args.tpu.encoder_points)
    pts = jnp.zeros((1, n, 3), jnp.float32)
    valid = jnp.ones((1, n), bool)
    k1, k2 = jax.random.split(key)
    enc_params = jax.jit(enc.init)(k1, pts, valid)
    c = args.decoder.in_channel + 3
    desc = jnp.zeros((8, c), jnp.float32)
    dv = jnp.ones((8,), bool)
    dec_params = jax.jit(dec.init)(k2, desc[None], desc[None],
                                   dv[None], dv[None])
    return enc, dec, enc_params, dec_params


def load_weights(args, weight_path: str):
    """Load model weights: the reference torch schema
    ({'encoder': sd, 'decoder': sd} .pth -- reference: pipeline/
    infer.py:63-65) or our own .msgpack flax checkpoints."""
    enc = Encoder.from_config(args)
    dec = Decoder.from_config(args)
    if weight_path.endswith((".pth", ".pt", ".ckpt")):
        from deeppointmap_tpu.models.weights import load_torch_weight
        enc_params, dec_params = load_torch_weight(weight_path, args)
    elif weight_path.endswith(".msgpack"):
        from flax import serialization
        with open(weight_path, "rb") as f:
            blob = serialization.msgpack_restore(f.read())
        enc_params = {"params": blob["encoder"]}
        dec_params = {"params": blob["decoder"]}
    else:
        raise ValueError(f"unsupported weight format: {weight_path}")
    return enc, dec, enc_params, dec_params


def save_weights(path: str, enc_params, dec_params) -> None:
    from flax import serialization

    blob = {"encoder": enc_params["params"], "decoder": dec_params["params"]}
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(
            jax.tree.map(np.asarray, blob)))


def build_models(args, weight: str = ""):
    if weight:
        logger.info("loading weights from %s", weight)
        return load_weights(args, weight)
    logger.warning("no --weight given: using randomly initialized models")
    return init_params(args)


def infer_padding(args) -> int:
    """Static point-count for the encoder input. The reference pads
    dynamically (`padding_to: -1`, configs/infer/*.yaml:29); the TPU build
    always pads to the tpu.encoder_points bucket."""
    return int(args.tpu.encoder_points)
