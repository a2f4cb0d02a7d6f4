"""Oracle tests for the fully fused preprocessing sweep kernel
(ops/pallas_sweep.py) in interpret mode on CPU, against the exact XLA
`filter_sweep` it replaces on TPU fast grades."""

import jax.numpy as jnp
import numpy as np
import pytest

from deeppointmap_tpu.ops.normals import filter_sweep
from deeppointmap_tpu.ops.pallas_sweep import fused_sweep_pallas, supported


def _cloud(n, seed=0, scale=20.0, invalid_frac=0.15):
    rng = np.random.default_rng(seed)
    pts = jnp.asarray(rng.normal(0, scale, (n, 3)), jnp.float32)
    valid = jnp.asarray(rng.random(n) > invalid_frac)
    return pts, valid


@pytest.mark.parametrize("n,radius", [(2048, 0.5), (4096, 0.8)])
def test_moments_match_exact_sweep(n, radius):
    pts, valid = _cloud(n)
    cnt_o, s_o, S6_o = filter_sweep(pts, valid, 0, radius, "exact")
    _, _, cnt_p, s_p, S6_p = fused_sweep_pallas(pts, valid, 17, radius,
                                                interpret=True)
    np.testing.assert_array_equal(np.asarray(cnt_p), np.asarray(cnt_o))
    np.testing.assert_allclose(np.asarray(s_p), np.asarray(s_o),
                               rtol=1e-6, atol=1e-4)
    np.testing.assert_allclose(np.asarray(S6_p), np.asarray(S6_o),
                               rtol=1e-6, atol=1e-2)


@pytest.mark.parametrize("n,k", [(2048, 17), (4096, 33)])
def test_topk_recall_vs_exact(n, k):
    """Stride-class candidate reduction must hit ~the same recall band
    as the XLA fast grade's approx_max_k (recall_target 0.95)."""
    pts, valid = _cloud(n, seed=1)
    idx_o, d2_o = filter_sweep(pts, valid, k, 0.0, "exact")
    idx_p, d2_p = fused_sweep_pallas(pts, valid, k, 0.0, interpret=True)

    hits = 0
    vrows = 0
    vn = np.asarray(valid)
    for r in np.nonzero(vn)[0][:512]:
        hits += len(set(np.asarray(idx_o[r])) & set(np.asarray(idx_p[r])))
        vrows += 1
    recall = hits / (vrows * k)
    assert recall > 0.97, recall   # measured 0.99 both cases

    # self is the zero-distance first hit on valid rows, and every
    # returned candidate distance is sane (invalid pushed to FAR)
    first = np.asarray(idx_p)[vn, 0]
    np.testing.assert_array_equal(first, np.nonzero(vn)[0][:len(first)])
    assert float(jnp.max(d2_p[jnp.asarray(vn), 0])) < 1e-3


def test_candidate_distances_match_indices():
    """Returned dist2 values are the true f32 distances of the returned
    indices (not a lossy rank key)."""
    pts, valid = _cloud(2048, seed=2)
    idx_p, d2_p = fused_sweep_pallas(pts, valid, 9, 0.0, interpret=True)
    p = np.asarray(pts)
    recomputed = np.sum(
        (p[:, None, :] - p[np.asarray(idx_p)]) ** 2, axis=-1)
    vn = np.asarray(valid)
    np.testing.assert_allclose(recomputed[vn], np.asarray(d2_p)[vn],
                               rtol=1e-3, atol=1e-3)


def test_supported_predicate():
    assert supported(16384) and supported(2048)
    assert not supported(2000) and not supported(1024 + 512)
