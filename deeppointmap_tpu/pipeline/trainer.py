"""Trainer: two-stage curriculum training loop with checkpoint/resume.

Parity with the reference Trainer (reference: pipeline/modules/
trainer.py:30-336): stage 1 trains registration (loop head frozen),
stage 2 trains only the loop head; curriculum K grows as
K = K_0 * K_mult^(epoch // mult_epoch) capped at K_max
(trainer.py:131-140); checkpoints hold params/opt-state/epoch/step and
resume re-selects the stage; metrics stream to a JSONL file (the
reference uses TensorBoard, trainer.py:186-199).

TPU-first notes: the jitted train steps are compiled per (S, S1-agnostic)
shape bucket -- the curriculum's K growth adds a handful of compiles per
stage. Data parallelism replaces the reference's DDP/NCCL
(trainer.py:239-242): batches shard over a 1-D `dp` mesh
(tpu.data_parallel = "auto" uses every TPU chip), params stay replicated,
and XLA inserts the gradient all-reduce. The reference's AMP autocast
(trainer.py:45-48) maps to the tpu.bf16 matmul-precision knob.
"""

from __future__ import annotations

import json
import logging
import os
import pickle
import time
from typing import Optional

import jax
import numpy as np
import optax

from deeppointmap_tpu.models import Decoder, Encoder
from deeppointmap_tpu.models.loss import LossConfig
from deeppointmap_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                            replicated)
from deeppointmap_tpu.parallel.train_step import (
    RegistrationBatch, TrainState, loop_param_mask, make_loop_train_step,
    make_registration_train_step)
from deeppointmap_tpu.pipeline.batching import (build_loop_batch,
                                                build_registration_batch)
from deeppointmap_tpu.utils.precision import apply_matmul_precision
from deeppointmap_tpu.pipeline.common import save_weights
from deeppointmap_tpu.pipeline.train_utils import (Recorder, build_optimizer,
                                                   build_schedule)

logger = logging.getLogger(__name__)


def registration_param_mask(params_pair):
    """Stage 1: everything trainable EXCEPT the loop head
    (reference: model_pipeline.py:183-189)."""
    enc_params, dec_params = params_pair
    dec_mask = {k: jax.tree.map(lambda _: not k.startswith("loop"), v)
                for k, v in dec_params["params"].items()}
    return (jax.tree.map(lambda _: True, enc_params), {"params": dec_mask})


class Trainer:
    def __init__(self, args, dataset, encoder: Encoder, decoder: Decoder,
                 enc_params, dec_params,
                 rng: Optional[np.random.Generator] = None):
        self.args = args
        self.cfg = args.train
        self.dataset = dataset
        self.encoder = encoder
        self.decoder = decoder
        self.rng = rng or np.random.default_rng(0)
        self.loss_cfg = LossConfig.from_args(args)
        self.coor_scale = float(args.slam_system.coor_scale)
        self.pad_to = int(args.tpu.encoder_points)
        from deeppointmap_tpu.utils.compilation_cache import \
            enable_compilation_cache
        enable_compilation_cache()
        apply_matmul_precision(args.get("tpu"))
        self.mesh = self._build_mesh(args.tpu.get("data_parallel", "auto"))
        self._check_multihost_determinism()

        self.stage_epochs = [self.cfg.registration.num_epochs,
                             self.cfg.loop_detection.num_epochs]
        self.epoch = 0
        self.step = 0
        self.stage = 1
        self.log_dir = getattr(args, "infer_tgt", "./log_train") or "./log_train"
        os.makedirs(self.log_dir, exist_ok=True)
        self._metrics_file = open(
            os.path.join(self.log_dir, "metrics.jsonl"), "a")
        # TensorBoard scalars (reference: trainer.py:98,186-199); optional
        try:
            from torch.utils.tensorboard import SummaryWriter
            self._tb = SummaryWriter(os.path.join(self.log_dir, "tb"))
        except Exception:
            self._tb = None
        self._snapshot_source()

        self._params = (enc_params, dec_params)
        self._setup_stage()

    def _check_multihost_determinism(self) -> None:
        """Multi-host batch contract: every process builds the SAME global
        batch from its own dataset scan + RNG (the jit treats each host's
        numpy batch as one sharded global array and never verifies
        equality). The contract holds by construction -- sorted directory
        enumeration (data/dataset.py) + an identical default seed -- but a
        divergent filesystem or a differently-consumed RNG would corrupt
        gradients SILENTLY, so probe it explicitly at startup."""
        import jax

        if jax.process_count() <= 1:
            return
        from jax.experimental import multihost_utils

        state = self.rng.bit_generator.state          # snapshot
        # Fixed 65-element probe regardless of dataset size: allgather
        # needs identical shapes on every process even when the hosts
        # DISAGREE on len(dataset) -- the very fault being diagnosed. A
        # size-dependent probe would turn that fault into an opaque
        # collective shape error or a hang instead of the RuntimeError.
        probe = np.concatenate([
            [len(self.dataset)], self.rng.permutation(64)]).astype(np.int64)
        self.rng.bit_generator.state = state          # restore
        gathered = np.asarray(multihost_utils.process_allgather(probe))
        if not (gathered == gathered[0]).all():
            raise RuntimeError(
                "multi-host batch divergence: processes disagree on "
                "dataset size or RNG stream; every host must see the "
                "same files and pass the same seed "
                f"(probe rows: {gathered[:, :4]})")

    def _snapshot_source(self) -> None:
        """Zip the package source into the run dir for reproducibility
        (reference: trainer.py:67-71)."""
        import zipfile

        import deeppointmap_tpu

        pkg_root = os.path.dirname(os.path.abspath(deeppointmap_tpu.__file__))
        out = os.path.join(self.log_dir, "source_snapshot.zip")
        try:
            with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
                for root, _, files in os.walk(pkg_root):
                    for f in files:
                        if f.endswith(".py"):
                            p = os.path.join(root, f)
                            z.write(p, os.path.relpath(p,
                                                       os.path.dirname(pkg_root)))
        except OSError as e:
            logger.warning("source snapshot failed: %s", e)

    # ------------------------------------------------------------- mesh
    def _build_mesh(self, dp):
        """Data-parallel mesh: the reference trains DDP over NCCL
        (reference: pipeline/train.py:42-46, trainer.py:239-242); here the
        batch axis is sharded over a 1-D `dp` mesh and XLA inserts the
        gradient all-reduce.

        dp = "auto": all devices when running on TPU hardware, else
        single-device (CPU tests opt in with an explicit int)."""
        n_dev = len(jax.devices())
        if dp == "auto":
            n = n_dev if jax.default_backend() == "tpu" else 1
        else:
            n = min(int(dp or 1), n_dev)
        if n <= 1:
            return None
        mesh = make_mesh(n)
        logger.info("data-parallel mesh over %d %s devices", n,
                    jax.default_backend())
        return mesh

    def _n_shards(self) -> int:
        return 1 if self.mesh is None else self.mesh.devices.size

    def _batch_items(self) -> int:
        """Dataset items per global step, rounded up to a mesh multiple so
        the batch axis shards evenly (every item contributes num_map map
        groups in stage 1, so item-divisibility implies batch-divisibility)."""
        bs = (self.cfg.registration.batch_size if self.stage == 1
              else self.cfg.loop_detection.batch_size)
        bs = max(int(bs), 1)
        n = self._n_shards()
        rounded = ((bs + n - 1) // n) * n
        if rounded != bs:
            logger.warning("batch_size %d rounded up to %d (mesh of %d)",
                           bs, rounded, n)
        return rounded

    # ------------------------------------------------------------- stage
    def _steps_per_epoch(self) -> int:
        return max(len(self.dataset) // self._batch_items(), 1)

    def _setup_stage(self) -> None:
        """(Re)build optimizer + jitted step for the current stage
        (reference stage switch: trainer.py:313-336)."""
        if self.stage == 1:
            cfg = self.cfg.registration
            self.dataset.registration()
            mask_fn = registration_param_mask
        else:
            cfg = self.cfg.loop_detection
            self.dataset.loop_detection()
            mask_fn = loop_param_mask
        lr = float(cfg.optimizer.get("kwargs", {}).get("lr", 1e-3))
        schedule = build_schedule(cfg.get("scheduler"), lr,
                                  self._steps_per_epoch(), cfg.num_epochs)
        base_opt = build_optimizer(cfg.optimizer, schedule)
        # freeze via multi_transform + set_to_zero. NOT optax.masked: masked
        # leaves pass their raw gradient through as the update (masked only
        # skips the transformation), which slowly applies gradient ascent
        # to "frozen" params -- this silently destroyed the registration
        # backbone during stage-2 loop training.
        labels = jax.tree.map(lambda trainable: "train" if trainable
                              else "freeze", mask_fn(self._params))
        self.optimizer = optax.multi_transform(
            {"train": base_opt, "freeze": optax.set_to_zero()}, labels)
        opt_state = self.optimizer.init(self._params)
        self.state = TrainState(self._params[0], self._params[1], opt_state,
                                np.int32(self.step))
        if self.stage == 1:
            raw_step = make_registration_train_step(
                self.encoder, self.decoder, self.loss_cfg, self.optimizer,
                self.coor_scale,
                max_pairs=int(self.cfg.registration.get("max_pairs", 1024)),
                remat=bool(self.args.tpu.get("remat", False)))
        else:
            raw_step = make_loop_train_step(self.encoder, self.decoder,
                                            self.optimizer, self.coor_scale)
        if self.mesh is not None:
            # params/opt-state replicated, batch sharded over 'dp'; the
            # gradient all-reduce is XLA's (DDP equivalent). NumPy batches
            # passed to the jitted step are sharded by in_shardings.
            repl = replicated(self.mesh)
            bsh = batch_sharding(self.mesh)
            self._batch_shd = bsh
            self.state = jax.device_put(self.state, repl)
            jitted = jax.jit(raw_step, donate_argnums=(0,),
                             in_shardings=(repl, bsh),
                             out_shardings=(repl, repl))
            if jax.process_count() > 1:
                # Multi-host: numpy can't be auto-sharded over
                # non-addressable devices, so assemble each batch leaf
                # into a global jax.Array first. Every process builds the
                # IDENTICAL global batch (contract probed at startup by
                # _check_multihost_determinism), so each host just serves
                # the index-slices its local devices own -- the
                # fetch-by-index twin of the reference's per-rank
                # DistributedSampler (reference: trainer.py:88-91).
                self.train_step = lambda state, batch: jitted(
                    state, self._globalize(batch))
            else:
                self.train_step = jitted
        else:
            self._batch_shd = None
            self.train_step = jax.jit(raw_step, donate_argnums=(0,))

    def _globalize(self, batch):
        """Host-local numpy batch -> dp-sharded global jax.Array tree."""
        def one(leaf):
            arr = np.asarray(leaf)
            return jax.make_array_from_callback(
                arr.shape, self._batch_shd, lambda idx: arr[idx])
        return jax.tree.map(one, batch)

    def _curriculum_K(self) -> int:
        """K = min(K_0 * K_mult^(epoch // mult_epoch), K_max)
        (reference: trainer.py:131-140)."""
        cfg = self.cfg.registration
        times = self.epoch // int(cfg.get("mult_epoch", 1e9) or 1e9)
        k = int(cfg.get("K_0", cfg.K) * (cfg.get("K_mult", 1.0) ** times))
        return min(max(k, 2), int(cfg.get("K_max", cfg.K)))

    # ------------------------------------------------------------- train
    def run(self) -> None:
        total_epochs = sum(self.stage_epochs)
        while self.epoch < total_epochs:
            if self.stage == 1 and self.epoch >= self.stage_epochs[0]:
                logger.info("=== stage 2 (loop detection) begins")
                self.stage = 2
                self._params = (self.state.enc_params, self.state.dec_params)
                self._setup_stage()
            self.train_one_epoch()
            self.epoch += 1
            if self.epoch % int(self.cfg.get("save_cycle", 1)) == 0:
                self.save()
        self.save(final=True)

    def _epoch_indices(self, n_steps: int, bs: int):
        """Anchor indices per step: a fresh permutation of the dataset each
        epoch so every frame anchors once (reference DataLoader shuffle /
        DistributedSampler semantics, trainer.py:88-95); topped up with
        random extras when the dataset is smaller than one global batch."""
        perm = self.rng.permutation(len(self.dataset))
        need = n_steps * bs
        if need > len(perm):
            extra = self.rng.integers(0, len(self.dataset),
                                      size=need - len(perm))
            perm = np.concatenate([perm, extra])
        for i in range(n_steps):
            yield perm[i * bs:(i + 1) * bs]

    def _iter_batches(self):
        n = self._steps_per_epoch()
        bs = self._batch_items()
        if self.stage == 1:
            self.dataset.registration_cfg.K = self._curriculum_K()
            for idxs in self._epoch_indices(n, bs):
                # one S per global batch: every per-device shard must
                # compile to the same static shape under SPMD
                self.dataset.forced_S = self.dataset.sample_S()
                try:
                    parts = [build_registration_batch(
                        *self.dataset[int(i)], self.cfg.registration,
                        self.pad_to, self.rng) for i in idxs]
                finally:
                    self.dataset.forced_S = None
                if len(parts) == 1:
                    yield parts[0]
                else:
                    yield RegistrationBatch(*(np.concatenate(
                        [getattr(p, f) for p in parts], axis=0)
                        for f in RegistrationBatch._fields))
        else:
            for idxs in self._epoch_indices(n, bs):
                pairs = [self.dataset[int(i)] for i in idxs]
                yield build_loop_batch(pairs,
                                       self.cfg.loop_detection.distance,
                                       self.pad_to)

    def train_one_epoch(self) -> None:
        rec = Recorder()
        t0 = time.time()
        log_cycle = int(self.cfg.get("log_cycle", 50))
        for i, batch in enumerate(self._iter_batches()):
            self.state, metrics = self.train_step(self.state, batch)
            self.step += 1
            rec.add_dict({k: float(v) for k, v in metrics.items()})
            if (i + 1) % log_cycle == 0:
                summary = rec.summary()
                summary.update(epoch=self.epoch, step=self.step,
                               stage=self.stage,
                               sec_per_step=(time.time() - t0) / (i + 1))
                self._metrics_file.write(json.dumps(summary) + "\n")
                self._metrics_file.flush()
                if self._tb is not None:
                    for k, v in summary.items():
                        self._tb.add_scalar(f"stage{self.stage}/{k}", v,
                                            self.step)
                logger.info("epoch %d step %d %s", self.epoch, self.step,
                            {k: round(v, 4) for k, v in summary.items()})
        logger.info("epoch %d done in %.1fs: %s", self.epoch,
                    time.time() - t0,
                    {k: round(v, 4) for k, v in rec.summary().items()})

    # -------------------------------------------------------- checkpoint
    def _ckpt_manager(self):
        """Orbax CheckpointManager (async, retention, shard-native) --
        the TPU-idiomatic checkpointer. `tpu.checkpointer: pickle` falls
        back to the single-file format."""
        if getattr(self, "_ckpt_mgr", None) is not None:
            return self._ckpt_mgr
        if str(self.args.tpu.get("checkpointer", "orbax")) != "orbax":
            return None
        try:
            import orbax.checkpoint as ocp
        except ImportError:
            return None
        opts = ocp.CheckpointManagerOptions(
            max_to_keep=int(self.cfg.get("keep_checkpoints", 3)),
            enable_async_checkpointing=True)
        self._ckpt_mgr = ocp.CheckpointManager(
            os.path.abspath(os.path.join(self.log_dir, "checkpoints")),
            options=opts)
        return self._ckpt_mgr

    def save(self, final: bool = False) -> None:
        """Checkpoint params/opt-state/epoch/step (reference:
        trainer.py:210-233); final save is weights-only."""
        params = (self.state.enc_params, self.state.dec_params)
        if final:
            mgr = self._ckpt_manager()
            if mgr is not None:
                mgr.wait_until_finished()
            save_weights(os.path.join(self.log_dir, "weights_final.msgpack"),
                         *params)
            return
        mgr = self._ckpt_manager()
        if mgr is not None:
            import orbax.checkpoint as ocp

            state = {"enc_params": params[0], "dec_params": params[1],
                     "opt_state": self.state.opt_state}
            # force: a fresh run re-using a log dir must OVERWRITE the
            # previous run's checkpoint at the same epoch -- without it
            # the async save fails (step exists) and the failure only
            # surfaces at wait_until_finished, i.e. never for non-final
            # saves (observed: three consecutive full-size runs kept the
            # first run's stale checkpoints)
            mgr.save(self.epoch, force=True, args=ocp.args.Composite(
                state=ocp.args.StandardSave(state),
                meta=ocp.args.JsonSave({"epoch": self.epoch,
                                        "step": self.step,
                                        "stage": self.stage})))
            logger.info("orbax checkpoint queued (epoch %d)", self.epoch)
            return
        blob = {
            "enc_params": jax.tree.map(np.asarray, params[0]),
            "dec_params": jax.tree.map(np.asarray, params[1]),
            "opt_state": jax.tree.map(
                lambda x: np.asarray(x) if hasattr(x, "shape") else x,
                self.state.opt_state),
            "epoch": self.epoch,
            "step": self.step,
            "stage": self.stage,
        }
        path = os.path.join(self.log_dir, f"checkpoint_ep{self.epoch}.ckpt")
        with open(path, "wb") as f:
            pickle.dump(blob, f)
        logger.info("saved checkpoint %s", path)

    def _load_orbax(self, path: str) -> None:
        """Resume from an orbax checkpoint directory (the `checkpoints`
        dir a previous run's manager wrote)."""
        import orbax.checkpoint as ocp

        mgr = ocp.CheckpointManager(os.path.abspath(path))
        step = mgr.latest_step()
        assert step is not None, f"no checkpoints under {path}"
        meta = mgr.restore(step, args=ocp.args.Composite(
            meta=ocp.args.JsonRestore()))["meta"]
        self.epoch = int(meta["epoch"])
        self.step = int(meta["step"])
        self.stage = int(meta["stage"])
        # params restore structure-free (plain flax dicts), then the
        # stage rebuild gives the optimizer-state TARGET structure for a
        # second, typed restore
        loose = mgr.restore(step, args=ocp.args.Composite(
            state=ocp.args.StandardRestore()))["state"]
        self._params = (loose["enc_params"], loose["dec_params"])
        self._setup_stage()
        at_boundary = (self.stage == 1
                       and self.epoch == self.stage_epochs[0])
        if not at_boundary:
            target = {"enc_params": self.state.enc_params,
                      "dec_params": self.state.dec_params,
                      "opt_state": self.state.opt_state}
            typed = mgr.restore(step, args=ocp.args.Composite(
                state=ocp.args.StandardRestore(target)))["state"]
            self.state = TrainState(typed["enc_params"],
                                    typed["dec_params"],
                                    typed["opt_state"],
                                    np.int32(self.step))

    def load_checkpoint(self, path: str) -> None:
        """Resume training (reference: trainer.py:250-293). `path` is a
        pickle file or an orbax checkpoint directory."""
        if os.path.isdir(path):
            self._load_orbax(path)
            return
        with open(path, "rb") as f:
            blob = pickle.load(f)
        self.epoch = blob["epoch"]
        self.step = blob["step"]
        self.stage = blob["stage"]
        self._params = (blob["enc_params"], blob["dec_params"])
        self._setup_stage()
        # restore optimizer state unless we are exactly at the stage
        # boundary (the reference deliberately re-inits there,
        # trainer.py:272-291)
        at_boundary = (self.stage == 1
                       and self.epoch == self.stage_epochs[0])
        if not at_boundary and blob.get("opt_state") is not None:
            self.state = TrainState(self._params[0], self._params[1],
                                    blob["opt_state"], np.int32(self.step))

    def load_weight(self, path: str) -> None:
        """Weights-only load; fresh optimizer
        (reference: trainer.py:295-311)."""
        from deeppointmap_tpu.pipeline.common import load_weights

        _, _, enc_params, dec_params = load_weights(self.args, path)
        self._params = (enc_params, dec_params)
        self._setup_stage()
