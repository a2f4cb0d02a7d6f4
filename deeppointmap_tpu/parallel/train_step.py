"""Sharded training steps: registration (stage 1) and loop detection
(stage 2).

The reference's training wraps encoder+decoder+loss in one nn.Module and
builds src/dst "maps" by splitting S frames into two groups re-centered
with GT/ICP-refined relative poses (reference: pipeline/modules/
model_pipeline.py:33-181). TPU-first split of that work:

  * host (dataset/trainer): random grouping, relative-pose computation,
    curriculum K -- everything data-dependent and random;
  * device (this module): encode all B*S frames, rigidly move the
    descriptor tokens into their group frames, concatenate groups into
    map descriptor sets, decoder train_forward, loss, optax update.

Sharding: batch axis over the 'dp' mesh axis, params replicated -- the
gradient all-reduce is inserted by XLA (the reference's DDP/NCCL
equivalent, trainer.py:239-242).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from deeppointmap_tpu.models import Decoder, Encoder
from deeppointmap_tpu.models.decoder import Decoder as _D
from deeppointmap_tpu.models.loss import LossConfig, registration_loss


class TrainState(NamedTuple):
    enc_params: Any
    dec_params: Any
    opt_state: Any
    step: jnp.ndarray


class RegistrationBatch(NamedTuple):
    """One stage-1 batch, host-prepared. S = S1 + S2 frames per element.

    points     (B, S, P, 3) normalized coords, frame-local
    valid      (B, S, P)
    group_SE3  (B, S, 4, 4) frame -> its group anchor frame (meters)
    group_id   (B, S) int32: 0 = src map, 1 = dst map
    gt_R       (B, 3, 3) src-map -> dst-map rotation (meters)
    gt_t       (B, 3)
    """
    points: jnp.ndarray
    valid: jnp.ndarray
    group_SE3: jnp.ndarray
    group_id: jnp.ndarray
    gt_R: jnp.ndarray
    gt_t: jnp.ndarray


def _encode_frames(encoder: Encoder, enc_params, points, valid, coor_scale,
                   remat: bool = False):
    """(B, S, P, 3) -> descriptors (B, S, K, C+3) with xyz in meters.

    remat=True wraps the encoder in jax.checkpoint: its activations
    (B*S x P x width at every stage) are recomputed in the backward pass
    instead of living in HBM across the decoder+loss -- the standard
    memory/FLOPs trade for production shapes (16384-pt frames, K_max
    frames per element)."""
    b, s, p, _ = points.shape
    flat_pts = points.reshape(b * s, p, 3)
    flat_valid = valid.reshape(b * s, p)
    apply_fn = encoder.apply
    if remat:
        apply_fn = jax.checkpoint(apply_fn,
                                  static_argnums=())   # full remat
    coor, fea, out_valid = apply_fn(enc_params, flat_pts, flat_valid)
    k = coor.shape[1]
    desc = jnp.concatenate([fea, coor * coor_scale], axis=-1)
    return (desc.reshape(b, s, k, -1), out_valid.reshape(b, s, k))


def _build_maps(desc, dvalid, group_SE3, group_id):
    """Move tokens into group frames and split into src/dst map sets.

    Equivalent of the reference's map merge (model_pipeline.py:52-105)
    but fixed-shape: both maps are allocated S*K token slots; tokens of
    the other group are masked invalid.
    """
    b, s, k, c = desc.shape
    xyz = desc[..., -3:]
    R = group_SE3[..., :3, :3]                       # (B, S, 3, 3)
    t = group_SE3[..., :3, 3]                        # (B, S, 3)
    moved = jnp.einsum("bsij,bskj->bski", R, xyz) + t[:, :, None, :]
    desc = jnp.concatenate([desc[..., :-3], moved], axis=-1)

    desc_flat = desc.reshape(b, s * k, c)
    valid_flat = dvalid.reshape(b, s * k)
    gid = jnp.repeat(group_id, k, axis=1)            # (B, S*K)
    src_valid = valid_flat & (gid == 0)
    dst_valid = valid_flat & (gid == 1)
    return desc_flat, src_valid, dst_valid


def make_registration_train_step(
    encoder: Encoder, decoder: Decoder, loss_cfg: LossConfig,
    optimizer: optax.GradientTransformation, coor_scale: float = 60.0,
    max_pairs: int = 1024, remat: bool = False,
) -> Callable[[TrainState, RegistrationBatch], Tuple[TrainState, Dict]]:
    """Build the jittable stage-1 step (loss parity: network/loss.py:28-90)."""

    def loss_fn(params, batch: RegistrationBatch):
        enc_params, dec_params = params
        desc, dvalid = _encode_frames(encoder, enc_params, batch.points,
                                      batch.valid, coor_scale, remat=remat)
        tokens, src_valid, dst_valid = _build_maps(
            desc, dvalid, batch.group_SE3, batch.group_id)

        out = decoder.apply(dec_params, tokens, tokens, src_valid, dst_valid,
                            batch.gt_R, batch.gt_t, max_pairs,
                            method=_D.train_forward)
        # GT-frame coordinates for pair building: src tokens moved by gt
        xyz = tokens[..., -3:]
        src_global = jnp.einsum("bij,bnj->bni", batch.gt_R, xyz) \
            + batch.gt_t[:, None, :]
        dst_global = xyz
        metrics = registration_loss(loss_cfg, src_global, dst_global,
                                    src_valid, dst_valid, out)
        return metrics["loss"], metrics

    def train_step(state: TrainState, batch: RegistrationBatch):
        params = (state.enc_params, state.dec_params)
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch)
        updates, opt_state = optimizer.update(grads, state.opt_state, params)
        enc_params, dec_params = optax.apply_updates(params, updates)
        return TrainState(enc_params, dec_params, opt_state,
                          state.step + 1), metrics

    return train_step


class LoopBatch(NamedTuple):
    """One stage-2 batch: frame pairs + binary overlap labels
    (reference: model_pipeline.py:136-181)."""
    points_a: jnp.ndarray   # (B, P, 3)
    valid_a: jnp.ndarray
    points_b: jnp.ndarray
    valid_b: jnp.ndarray
    label: jnp.ndarray      # (B,) float 0/1: distance <= d


def make_loop_train_step(
    encoder: Encoder, decoder: Decoder,
    optimizer: optax.GradientTransformation, coor_scale: float = 60.0,
) -> Callable[[TrainState, LoopBatch], Tuple[TrainState, Dict]]:
    """Stage-2: BCE on the overlap head; encoder + non-loop heads frozen
    upstream by the optimizer mask (reference freezes params whose name
    lacks 'loop', model_pipeline.py:185-197)."""

    def loss_fn(params, batch: LoopBatch):
        enc_params, dec_params = params
        ca, fa, va = encoder.apply(enc_params, batch.points_a, batch.valid_a)
        cb, fb, vb = encoder.apply(enc_params, batch.points_b, batch.valid_b)
        da = jnp.concatenate([fa, ca * coor_scale], axis=-1)
        db = jnp.concatenate([fb, cb * coor_scale], axis=-1)
        prob = decoder.apply(dec_params, da, db, va, vb,
                             method=_D.loop_detection)
        eps = 1e-7
        p = jnp.clip(prob, eps, 1 - eps)
        y = batch.label
        bce = -(y * jnp.log(p) + (1 - y) * jnp.log(1 - p)).mean()
        pred = p > 0.5
        pos = y > 0.5
        acc = jnp.mean((pred == pos).astype(jnp.float32))
        # precision / recall / false-positive count, matching the
        # reference's stage-2 scalars (model_pipeline.py:175-180)
        tp = jnp.sum(pred & pos).astype(jnp.float32)
        fp = jnp.sum(pred & ~pos).astype(jnp.float32)
        fn = jnp.sum(~pred & pos).astype(jnp.float32)
        precision = tp / jnp.maximum(tp + fp, 1.0)
        recall = tp / jnp.maximum(tp + fn, 1.0)
        return bce, {"loss": bce, "acc": acc, "precision": precision,
                     "recall": recall, "fp": fp}

    def train_step(state: TrainState, batch: LoopBatch):
        params = (state.enc_params, state.dec_params)
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch)
        updates, opt_state = optimizer.update(grads, state.opt_state, params)
        enc_params, dec_params = optax.apply_updates(params, updates)
        return TrainState(enc_params, dec_params, opt_state,
                          state.step + 1), metrics

    return train_step


def loop_param_mask(params_pair) -> Any:
    """Optax mask: True = trainable. Stage 2 trains only the loop head
    (reference: model_pipeline.py:185-197 freezes by 'loop' in name)."""
    enc_params, dec_params = params_pair

    def mask_tree(tree, trainable):
        return jax.tree.map(lambda _: trainable, tree)

    dec_mask = {}
    for key, sub in dec_params["params"].items():
        dec_mask[key] = jax.tree.map(lambda _: key.startswith("loop"), sub)
    return (mask_tree(enc_params, False), {"params": dec_mask})
