"""Oracle tests for the fused radius-moments Pallas kernel
(ops/pallas_moments.py) in interpret mode on CPU, against the XLA
`filter_sweep` moments tail it replaces on TPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeppointmap_tpu.ops.normals import filter_sweep, normals_from_moments
from deeppointmap_tpu.ops.pallas_moments import (radius_moments_pallas,
                                                 supported)


@pytest.mark.parametrize("n,radius", [(2048, 0.5), (4096, 0.8)])
def test_moments_match_filter_sweep(n, radius):
    rng = np.random.default_rng(0)
    # raw-scale coords (meters): the kernel must keep the far-from-origin
    # covariance signal exactly like the XLA path
    pts = jnp.asarray(rng.normal(0, 20.0, (n, 3)), jnp.float32)
    valid = jnp.asarray(rng.random(n) > 0.15)

    cnt_o, s_o, S6_o = filter_sweep(pts, valid, 0, radius, "exact")
    cnt_p, s_p, S6_p = radius_moments_pallas(pts, valid, radius,
                                             interpret=True)

    np.testing.assert_array_equal(np.asarray(cnt_p), np.asarray(cnt_o))
    np.testing.assert_allclose(np.asarray(s_p), np.asarray(s_o),
                               rtol=1e-6, atol=1e-4)
    np.testing.assert_allclose(np.asarray(S6_p), np.asarray(S6_o),
                               rtol=1e-6, atol=1e-2)


def test_normals_from_pallas_moments_match():
    """End to end: normals computed from kernel moments equal the XLA
    sweep's normals (up to sign, which is eigenvector-arbitrary)."""
    rng = np.random.default_rng(1)
    n = 2048
    # clustered planar patches so normals are well-conditioned
    base = rng.normal(0, 15.0, (32, 3))
    pts = (base[rng.integers(0, 32, n)]
           + rng.normal(0, 0.3, (n, 3)) * np.array([1.0, 1.0, 0.02]))
    pts = jnp.asarray(pts, jnp.float32)
    valid = jnp.ones(n, bool)

    m_o = filter_sweep(pts, valid, 0, 1.0, "exact")
    m_p = radius_moments_pallas(pts, valid, 1.0, interpret=True)
    n_o = np.asarray(normals_from_moments(pts, *m_o))
    n_p = np.asarray(normals_from_moments(pts, *m_p))
    dots = np.abs(np.sum(n_o * n_p, axis=1))
    assert np.quantile(dots, 0.01) > 0.999, dots.min()


def test_supported_predicate():
    assert supported(16384) and supported(2048)
    assert not supported(2000) and not supported(1024 + 512)
