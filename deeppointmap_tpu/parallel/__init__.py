"""Device-mesh parallelism: sharded training step and mesh helpers.

The reference scales training with DDP/NCCL (reference: pipeline/
train.py:42-46, pipeline/modules/trainer.py:239-242); here data
parallelism is a jax.sharding Mesh with batch-sharded inputs and
replicated params -- XLA inserts the gradient all-reduce over ICI.
"""

from deeppointmap_tpu.parallel.mesh import make_mesh
from deeppointmap_tpu.parallel.train_step import (TrainState,
                                                  make_registration_train_step,
                                                  make_loop_train_step)

__all__ = ["make_mesh", "TrainState", "make_registration_train_step",
           "make_loop_train_step"]
