"""Subprocess worker for the 2-process `jax.distributed` test.

Executes the REAL multi-host control plane the reference exercises with
torch DDP (reference: pipeline/train.py:42-46): each process calls
jax.distributed.initialize() on the CPU backend (2 local devices), builds
the same dataset + Trainer, and runs one production train step over the
4-device global mesh -- gradient all-reduce crosses the process boundary
via Gloo. Driven by tests/test_multihost.py; also runnable by hand:

    python tests/multihost_worker.py --process_id 0 --num_processes 2 \
        --port 9876 --root /tmp/ds --log /tmp/log &
    python tests/multihost_worker.py --process_id 1 ...
"""

import argparse
import os
import sys

ap = argparse.ArgumentParser()
ap.add_argument("--process_id", type=int, required=True)
ap.add_argument("--num_processes", type=int, default=2)
ap.add_argument("--port", type=int, required=True)
ap.add_argument("--root", required=True, help="shared dataset dir")
ap.add_argument("--log", required=True, help="shared output dir")
ap.add_argument("--seed", type=int, default=0,
                help="per-process seed; differing seeds must trip the "
                     "multi-host determinism probe")
ns = ap.parse_args()

# env BEFORE importing jax: CPU backend, 2 virtual devices per process
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_DEFAULT_MATMUL_PRECISION"] = "highest"

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
jax.distributed.initialize(coordinator_address=f"localhost:{ns.port}",
                           num_processes=ns.num_processes,
                           process_id=ns.process_id)
assert jax.process_count() == ns.num_processes
assert len(jax.local_devices()) == 2
assert len(jax.devices()) == 2 * ns.num_processes
print(f"INIT proc {jax.process_index()}/{jax.process_count()} "
      f"global_devices={len(jax.devices())}", flush=True)

import numpy as np  # noqa: E402

from test_trainer import train_args  # noqa: E402
from deeppointmap_tpu.data.dataset import SlamDatasets  # noqa: E402
from deeppointmap_tpu.data.transforms import PointCloudTransforms  # noqa: E402
from deeppointmap_tpu.pipeline.common import init_params  # noqa: E402
from deeppointmap_tpu.pipeline.trainer import Trainer  # noqa: E402

args = train_args(ns.root)
args.infer_tgt = os.path.join(ns.log, f"p{ns.process_id}")
args.tpu["data_parallel"] = 2 * ns.num_processes   # whole global mesh
args.train.registration.batch_size = 4             # 1 item per device

rng = np.random.default_rng(ns.seed)
tfs = PointCloudTransforms(args, mode="train", rng=rng)
tfs.transforms.transforms = tfs.transforms.transforms[:-1]
ds = SlamDatasets(args, data_transforms=tfs, rng=rng)
enc, dec, ep, dp = init_params(args, seed=7)

try:
    try:
        trainer = Trainer(args, ds, enc, dec, ep, dp, rng=rng)
    except RuntimeError as e:
        if "divergence" not in str(e):
            raise
        # expected in the seeded-divergence scenario: the startup probe
        # (trainer._check_multihost_determinism) caught mismatched RNG
        # streams across processes
        print("PROBE_RAISED", flush=True)
        jax.distributed.shutdown()
        sys.exit(0)

    assert trainer.mesh is not None \
        and trainer.mesh.devices.size == 2 * ns.num_processes

    trainer._steps_per_epoch = lambda: 1
    trainer._setup_stage()
    batch = next(trainer._iter_batches())
    trainer.state, metrics = trainer.train_step(trainer.state, batch)

    loss = float(metrics["loss"])
    leaves = (jax.tree.leaves(trainer.state.enc_params)
              + jax.tree.leaves(trainer.state.dec_params))
    flat = np.concatenate([np.asarray(x, np.float64).ravel()
                           for x in leaves])
    np.save(os.path.join(ns.log, f"params_p{ns.process_id}.npy"), flat)
    assert np.isfinite(loss)
    # marker LAST: the test keys on it, and distributed teardown below
    # can race (coordinator exit vs peer heartbeat) without invalidating
    # the run
    print(f"STEP_OK proc {ns.process_id} loss={loss:.6f} "
          f"params={flat.size}", flush=True)
except SystemExit:
    raise
except BaseException:
    import traceback

    traceback.print_exc(file=sys.stdout)
    sys.stdout.flush()
    raise
jax.distributed.shutdown()
