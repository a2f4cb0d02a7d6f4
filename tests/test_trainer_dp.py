"""Data-parallel Trainer: the production train step jitted over an 8-device
mesh must (a) actually shard the batch, and (b) produce the same params and
loss as the single-device step on identical inputs (the sharded gradient
all-reduce is XLA's DDP equivalent, reference: trainer.py:239-242).

Runs on the 8 virtual CPU devices set up in conftest.py."""

import copy
import os

import jax
import numpy as np
import pytest

from tests.test_trainer import make_synthetic_dataset, train_args


def _make(tmp_path_factory, data_parallel, tag, seed=0):
    from deeppointmap_tpu.data.dataset import SlamDatasets
    from deeppointmap_tpu.data.transforms import PointCloudTransforms
    from deeppointmap_tpu.pipeline.common import init_params
    from deeppointmap_tpu.pipeline.trainer import Trainer

    root = str(tmp_path_factory.mktemp(f"dp_ds_{tag}"))
    make_synthetic_dataset(root, n_frames=16)
    args = train_args(root)
    args.infer_tgt = str(tmp_path_factory.mktemp(f"dp_log_{tag}"))
    args.tpu["data_parallel"] = data_parallel
    # 2 items per global step so the batch has something to shard/split
    args.train.registration.batch_size = 2
    args.train.loop_detection.batch_size = 2
    # SGD so params_after - params_before == -lr * grad: the equivalence
    # check below then compares raw gradients. (Adam normalizes by
    # sqrt(v) ~= |g|, which blows tiny cross-shard reduction-order noise
    # on near-zero gradients up to the size of lr itself.)
    for tree in (args.train.registration, args.train.loop_detection):
        tree.optimizer = dict(type="sgd", kwargs=dict(lr=1e-3))

    rng = np.random.default_rng(seed)
    tfs = PointCloudTransforms(args, mode="train", rng=rng)
    tfs.transforms.transforms = tfs.transforms.transforms[:-1]
    ds = SlamDatasets(args, data_transforms=tfs, rng=rng)
    enc, dec, ep, dp = init_params(args, seed=7)
    trainer = Trainer(args, ds, enc, dec, ep, dp, rng=rng)
    return trainer


@pytest.fixture(scope="module")
def trainers(tmp_path_factory):
    t_dp = _make(tmp_path_factory, data_parallel=2, tag="sharded")
    t_sd = _make(tmp_path_factory, data_parallel=1, tag="single")
    return t_dp, t_sd


def test_mesh_built_and_batch_sharded(trainers):
    t_dp, t_sd = trainers
    assert t_dp.mesh is not None and t_dp.mesh.devices.size == 2
    assert t_sd.mesh is None
    # params replicated over the mesh
    leaf = jax.tree.leaves(t_dp.state.enc_params)[0]
    assert len(leaf.sharding.device_set) == 2


def _one_batch(trainer, stage, seed=11):
    """A deterministic global batch via the trainer's own iterator."""
    trainer.stage = stage
    trainer.rng = np.random.default_rng(seed)
    trainer.dataset.rng = trainer.rng
    if stage == 1:
        trainer.dataset.registration()
    else:
        trainer.dataset.loop_detection()
    return next(trainer._iter_batches())


@pytest.mark.parametrize("stage", [1, 2])
def test_sharded_step_matches_single_device(trainers, stage):
    from deeppointmap_tpu.pipeline.common import init_params

    t_dp, t_sd = trainers
    for t in (t_dp, t_sd):
        # fresh params each parametrized run: the donated state of a
        # previous run deleted the original param buffers
        _, _, ep, dp = init_params(t.args, seed=7)
        t._params = (ep, dp)
        t.stage = stage
        t._setup_stage()

    batch = _one_batch(t_sd, stage)
    batch_dp = _one_batch(t_dp, stage)
    for a, b in zip(batch, batch_dp):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # re-setup so both start from the SAME freshly-initialized opt state
    # (the donated state was consumed by nothing yet; params identical by
    # construction: same init seed)
    state_dp, m_dp = t_dp.train_step(t_dp.state, batch)
    state_sd, m_sd = t_sd.train_step(t_sd.state, batch)

    assert np.isfinite(float(m_dp["loss"]))
    np.testing.assert_allclose(float(m_dp["loss"]), float(m_sd["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(state_dp.enc_params),
                    jax.tree.leaves(state_sd.enc_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)
    for a, b in zip(jax.tree.leaves(state_dp.dec_params),
                    jax.tree.leaves(state_sd.dec_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)


def test_adam_step_matches_single_device(tmp_path_factory):
    """DP equivalence on the PRODUCTION optimizer path (AdamW -- the
    SGD test above already proves raw-gradient equality). Adam divides
    by sqrt(v)+eps, so elements whose gradient is ~0 can flip update
    sign under cross-shard reduction-order noise; the contract is
    therefore distributional: the update mass agrees to float precision
    and no element moves more than ~2 lr."""
    from deeppointmap_tpu.pipeline.common import init_params

    lr = 1e-4
    ts = []
    for dp, tag in ((2, "adam_dp"), (1, "adam_sd")):
        t = _make(tmp_path_factory, data_parallel=dp, tag=tag, seed=3)
        for tree in (t.args.train.registration, t.args.train.loop_detection):
            tree.optimizer = dict(type="adamw", kwargs=dict(lr=lr))
        _, _, ep, dpp = init_params(t.args, seed=7)
        t._params = (ep, dpp)
        t.stage = 1
        t._setup_stage()
        ts.append(t)
    t_dp, t_sd = ts

    batch = _one_batch(t_sd, 1, seed=31)
    batch_dp = _one_batch(t_dp, 1, seed=31)
    for a, b in zip(batch, batch_dp):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    state_dp, m_dp = t_dp.train_step(t_dp.state, batch)
    state_sd, m_sd = t_sd.train_step(t_sd.state, batch)
    np.testing.assert_allclose(float(m_dp["loss"]), float(m_sd["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves((state_dp.enc_params,
                                     state_dp.dec_params)),
                    jax.tree.leaves((state_sd.enc_params,
                                     state_sd.dec_params))):
        diff = np.abs(np.asarray(a, np.float64) - np.asarray(b, np.float64))
        # no element moves more than ~2 optimizer steps apart ...
        assert diff.max() < 2.5 * lr, diff.max()
        # ... and the bulk of the update agrees far below the step size
        # (measured p99 ~1.5e-5 on CPU: reduction-order noise through
        # Adam's sqrt(v) normalization, not a sharding defect)
        assert np.percentile(diff, 99) < 5e-5, np.percentile(diff, 99)


def test_epoch_covers_every_frame(trainers):
    """Permutation sampling: every dataset frame anchors exactly once per
    epoch (reference DataLoader shuffle semantics, trainer.py:88-95)."""
    _, t_sd = trainers
    n = t_sd._steps_per_epoch()
    bs = t_sd._batch_items()
    seen = []
    for idxs in t_sd._epoch_indices(n, bs):
        seen.extend(int(i) for i in idxs)
    # n*bs <= len(dataset): no duplicates; each index distinct
    assert len(set(seen)) == len(seen)
    assert len(seen) == n * bs


def test_dp_trainer_runs_epoch(trainers):
    """Full sharded epoch end-to-end through Trainer.run()'s machinery."""
    from deeppointmap_tpu.pipeline.common import init_params

    t_dp, _ = trainers
    _, _, ep, dp = init_params(t_dp.args, seed=7)
    t_dp._params = (ep, dp)
    t_dp.stage = 1
    t_dp.dataset.registration()
    t_dp._steps_per_epoch_orig = t_dp._steps_per_epoch
    t_dp._steps_per_epoch = lambda: 2
    t_dp._setup_stage()
    t_dp.train_one_epoch()
    assert os.path.getsize(os.path.join(t_dp.log_dir, "metrics.jsonl")) >= 0
    t_dp._steps_per_epoch = t_dp._steps_per_epoch_orig


def test_remat_matches_no_remat(tmp_path_factory):
    """jax.checkpoint on the encoder must not change the computed
    gradients -- identical params after one SGD step."""
    import jax

    from deeppointmap_tpu.pipeline.common import init_params

    t_a = _make(tmp_path_factory, data_parallel=1, tag="remat_off", seed=2)
    t_b = _make(tmp_path_factory, data_parallel=1, tag="remat_on", seed=2)
    t_b.args.tpu["remat"] = True
    for t in (t_a, t_b):
        _, _, ep, dp = init_params(t.args, seed=7)
        t._params = (ep, dp)
        t.stage = 1
        t._setup_stage()
    batch = _one_batch(t_a, 1, seed=21)
    batch_b = _one_batch(t_b, 1, seed=21)
    for a, b in zip(batch, batch_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    s_a, m_a = t_a.train_step(t_a.state, batch)
    s_b, m_b = t_b.train_step(t_b.state, batch)
    np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]),
                               rtol=1e-6)
    for x, y in zip(jax.tree.leaves(s_a.enc_params),
                    jax.tree.leaves(s_b.enc_params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-5, atol=1e-8)
