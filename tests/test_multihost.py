"""Multi-host control-plane execution: 2 REAL processes, each with 2
virtual CPU devices, joined by jax.distributed.initialize() into one
4-device mesh -- the TPU-pod analog of the reference's multi-process DDP
launch (reference: pipeline/train.py:42-46, trainer.py:77,121).

Proves (a) the `--distributed` seam and the Trainer's multi-process batch
globalization actually execute with process_count > 1 (cross-process
gradient all-reduce via Gloo), (b) both processes hold identical
post-step params, and (c) the startup determinism probe
(trainer._check_multihost_determinism) fires on seeded RNG divergence
instead of corrupting gradients silently."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from tests.test_trainer import make_synthetic_dataset

WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _spawn(pid, port, root, log, seed):
    from deeppointmap_tpu.utils.childenv import cpu_child_env

    env = cpu_child_env()   # CPU workers must not dial the relay
    # the worker sets its own JAX env before importing jax; drop the
    # pytest conftest's 8-device flag so it can't leak through
    env.pop("XLA_FLAGS", None)
    return subprocess.Popen(
        [sys.executable, WORKER, "--process_id", str(pid),
         "--num_processes", "2", "--port", str(port), "--root", root,
         "--log", log, "--seed", str(seed)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=os.path.dirname(os.path.dirname(WORKER)), env=env)


def _run_pair(tmp_path, seeds):
    root = str(tmp_path / "ds")
    make_synthetic_dataset(root, n_frames=8)
    log = str(tmp_path / "log")
    os.makedirs(log, exist_ok=True)
    port = _free_port()
    procs = [_spawn(i, port, root, log, seeds[i]) for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    return procs, outs, log


@pytest.mark.slow
def test_two_process_train_step_identical_params(tmp_path):
    procs, outs, log = _run_pair(tmp_path, seeds=(0, 0))
    for p, out in zip(procs, outs):
        # key on the success marker, not the exit code: jax.distributed
        # teardown can race (coordinator exit vs peer heartbeat) after
        # the step has completed and been saved
        assert "STEP_OK" in out, f"rc={p.returncode}\n{out[-3000:]}"
        assert "INIT proc" in out and "global_devices=4" in out
    a = np.load(os.path.join(log, "params_p0.npy"))
    b = np.load(os.path.join(log, "params_p1.npy"))
    assert a.shape == b.shape and a.size > 1000
    # the all-reduced update is the same computation on every process
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-8)
    # losses printed by both processes agree
    la = [l for l in outs[0].splitlines() if "STEP_OK" in l][0]
    lb = [l for l in outs[1].splitlines() if "STEP_OK" in l][0]
    assert la.split("loss=")[1].split()[0] == lb.split("loss=")[1].split()[0]


@pytest.mark.slow
def test_determinism_probe_fires_on_seed_divergence(tmp_path):
    procs, outs, _ = _run_pair(tmp_path, seeds=(0, 1))
    for p, out in zip(procs, outs):
        assert "PROBE_RAISED" in out, f"rc={p.returncode}\n{out[-3000:]}"
