"""Training entry point.

CLI parity with the reference (reference: pipeline/train.py:31-75):
    python -m deeppointmap_tpu.pipeline.train --yaml_file train.yaml \
        [--checkpoint ckpt] [--weight w]
The reference initializes DDP/NCCL here (train.py:42-46); the TPU build
needs no process-group setup -- the train steps are jitted over the local
device mesh and gradient reduction is XLA's job. Multi-host runs would
add jax.distributed.initialize() at this seam.
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


def main(argv=None):
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(name)s %(levelname)s %(message)s")
    args = load_config(argv)
    args.mode = "train"

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
