"""Pallas FPS kernel vs the XLA path and a NumPy oracle (interpret mode
on CPU; the TPU path runs the identical kernel compiled by Mosaic)."""

import numpy as np
import pytest

from deeppointmap_tpu.ops.pallas_fps import fps_pallas, fps_pallas_batched
from deeppointmap_tpu.ops.sampling import farthest_point_sampling


def _numpy_fps(xyz, k, start=0):
    sel = [start]
    mind = np.full(xyz.shape[0], np.inf)
    for _ in range(1, k):
        d = ((xyz - xyz[sel[-1]]) ** 2).sum(1)
        mind = np.minimum(mind, d)
        mind[sel[-1]] = -1
        sel.append(int(np.argmax(mind)))
    return np.array(sel)


def test_matches_numpy_oracle():
    rng = np.random.default_rng(0)
    xyz = rng.normal(size=(700, 3)).astype(np.float32)
    valid = np.ones(700, bool)
    idx, sv = fps_pallas(xyz, valid, 96, interpret=True)
    np.testing.assert_array_equal(np.asarray(idx), _numpy_fps(xyz, 96))
    assert bool(np.all(np.asarray(sv)))


def test_batched_matches_xla_path():
    rng = np.random.default_rng(1)
    xyz = rng.normal(size=(3, 400, 3)).astype(np.float32)
    valid = np.stack([np.ones(400, bool),
                      np.arange(400) < 250,
                      np.arange(400) < 40])
    idx, sv = fps_pallas_batched(xyz, valid, 64, interpret=True)
    for b in range(3):
        ref_idx, ref_sv = farthest_point_sampling(xyz[b], valid[b], 64)
        m = np.asarray(sv[b])
        np.testing.assert_array_equal(np.asarray(idx[b])[m],
                                      np.asarray(ref_idx)[np.asarray(ref_sv)])


@pytest.mark.parametrize("k", [61, 13])
def test_k_not_multiple_of_8_trim_path(k):
    """The kernel rounds k up to a multiple of 8 (sublane packing) and
    trims the output to [:, :k]; exercise that path against the oracle."""
    rng = np.random.default_rng(7)
    xyz = rng.normal(size=(520, 3)).astype(np.float32)
    valid = np.ones(520, bool)
    idx, sv = fps_pallas(xyz, valid, k, interpret=True)
    assert idx.shape == (k,) and sv.shape == (k,)
    np.testing.assert_array_equal(np.asarray(idx), _numpy_fps(xyz, k))
    assert bool(np.all(np.asarray(sv)))


def test_exhausts_valid_points():
    rng = np.random.default_rng(2)
    xyz = rng.normal(size=(200, 3)).astype(np.float32)
    valid = np.arange(200) < 30
    idx, sv = fps_pallas(xyz, valid, 64, interpret=True)
    sel = np.asarray(idx)[np.asarray(sv)]
    assert len(sel) == 30
    assert set(sel.tolist()) == set(range(30))
