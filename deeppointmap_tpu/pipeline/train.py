"""Training entry point.

CLI parity with the reference (reference: pipeline/train.py:31-75):
    python -m deeppointmap_tpu.pipeline.train --yaml_file train.yaml \
        [--checkpoint ckpt] [--weight w]
The reference initializes DDP/NCCL here (train.py:42-46). Single-host TPU
needs no process-group setup -- the train steps are jitted over the local
device mesh and gradient reduction is XLA's job. Multi-host pods pass
--distributed (plus either JAX coordinator env vars or
--coordinator_address/--num_processes/--process_id) to call
jax.distributed.initialize() at this seam; afterwards jax.devices() spans
the pod and the Trainer's "auto" data-parallel mesh covers every chip.
"""

from __future__ import annotations

import logging
import os

from deeppointmap_tpu.config import load_config, save_settings
from deeppointmap_tpu.data.dataset import SlamDatasets
from deeppointmap_tpu.data.transforms import PointCloudTransforms
from deeppointmap_tpu.pipeline.common import build_models
from deeppointmap_tpu.pipeline.trainer import Trainer

logger = logging.getLogger("deeppointmap_tpu.train")


def init_distributed(args) -> None:
    """Multi-host seam (the reference's dist.init_process_group,
    train.py:42-46). jax.distributed.initialize() reads coordinator/
    process info from flags or, when absent, from the cluster env."""
    import jax

    kwargs = {}
    if args.coordinator_address:
        kwargs["coordinator_address"] = args.coordinator_address
    if int(args.num_processes) > 0:
        kwargs["num_processes"] = int(args.num_processes)
    if int(args.process_id) >= 0:
        kwargs["process_id"] = int(args.process_id)
    jax.distributed.initialize(**kwargs)
    logger.info("jax.distributed: process %d/%d, %d global devices",
                jax.process_index(), jax.process_count(),
                len(jax.devices()))


def main(argv=None):
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(name)s %(levelname)s %(message)s")
    args = load_config(argv)
    args.mode = "train"
    if args.distributed:
        init_distributed(args)

    import numpy as np
    rng = np.random.default_rng(int(args.get("seed", 0) or 0))
    transforms = PointCloudTransforms(args, mode="train", rng=rng)
    dataset = SlamDatasets(args, data_transforms=transforms, rng=rng)
    logger.info("dataset: %d frames over %d datasets", len(dataset),
                len(dataset.dataset_list))

    enc, dec, enc_params, dec_params = build_models(args, args.weight)
    trainer = Trainer(args, dataset, enc, dec, enc_params, dec_params,
                      rng=rng)

    os.makedirs(trainer.log_dir, exist_ok=True)
    save_settings(args, os.path.join(trainer.log_dir, "settings.yaml"))

    if args.checkpoint:
        trainer.load_checkpoint(args.checkpoint)
        logger.info("resumed from %s (epoch %d)", args.checkpoint,
                    trainer.epoch)
    trainer.run()


if __name__ == "__main__":
    main()
