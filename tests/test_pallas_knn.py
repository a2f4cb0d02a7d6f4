"""Oracle tests for the fused distance+top-k(+moments) Pallas kernel
(ops/pallas_knn.py) in interpret mode on CPU.

Contract it must satisfy to replace the XLA fast-grade query on TPU:
recall at or above approx_max_k's 0.95 target, decoded distances within
the packed key's 9-mantissa-bit rounding, ascending order, invalid
points excluded via the _FAR sentinel, and moments matching the exact
XLA filter_sweep (membership on HIGH-precision distances)."""

import jax.numpy as jnp
import numpy as np
import pytest

from deeppointmap_tpu.ops.normals import filter_sweep
from deeppointmap_tpu.ops.pallas_knn import (_N_CLASSES, fused_knn_moments,
                                             supported)


def _cloud(n, seed=0, scale=20.0, invalid_frac=0.15):
    rng = np.random.default_rng(seed)
    pts = rng.normal(0, scale, (n, 3)).astype(np.float32)
    valid = rng.random(n) > invalid_frac
    return pts, valid


def _oracle(pts, valid, ctr, k):
    D = ((ctr[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    D = D + np.where(valid, 0.0, 1e9)[None, :]
    oidx = np.argsort(D, axis=1)[:, :k]
    return D, oidx


@pytest.mark.parametrize("n,s,k", [(2048, 256, 17), (4096, 512, 33)])
def test_recall_and_decode(n, s, k):
    pts, valid = _cloud(n, seed=1)
    ctr = pts[:s]
    assert supported(n, s)
    idx, d2 = fused_knn_moments(jnp.asarray(pts), jnp.asarray(valid),
                                jnp.asarray(ctr), k=k, interpret=True)[:2]
    idx, d2 = np.asarray(idx), np.asarray(d2)
    D, oidx = _oracle(pts, valid, ctr, k)

    hits = sum(len(set(idx[i]) & set(oidx[i])) for i in range(s))
    recall = hits / (s * k)
    # the contract is the XLA fast grade's approx_max_k recall_target
    # 0.95; random gaussians are the worst case for index-mod classes
    # (measured 0.990 at k=17, 0.969 at k=33 -- real scans rank higher
    # because scan-order adjacency spreads neighbors across classes)
    assert recall > 0.95, recall

    # decoded dist2 = true distance of the returned index, rounded DOWN
    # to 9 mantissa bits (relative error < 2^-9) plus the hi/lo 3-pass
    # matmul rounding of the distance itself (~bf16-cross level)
    true = np.take_along_axis(D, idx, 1)
    near = true < 1e8                       # skip FAR-sentinel slots
    relerr = np.abs(d2 - true)[near] / np.maximum(true[near], 1.0)
    # p50 is the 9-bit packing floor; p99 adds the hi/lo 3-pass matmul
    # rounding, which is relative to the |c||p| cross magnitude, not the
    # (possibly small) distance -- measured 7e-4 / 1.3e-2 on this fixture
    assert np.percentile(relerr, 50) < 2e-3, np.percentile(relerr, 50)
    assert np.percentile(relerr, 99) < 2e-2, np.percentile(relerr, 99)

    # ascending keys => ascending distances (within decode rounding)
    assert np.all(np.diff(d2, axis=1) >= -1e-3)

    # no invalid point is ever returned with a near distance
    inv = ~valid[idx]
    assert np.all(true[inv] > 1e8)


def test_self_is_first_hit():
    pts, valid = _cloud(2048, seed=2)
    ctr = pts[:256]
    idx, d2 = fused_knn_moments(jnp.asarray(pts), jnp.asarray(valid),
                                jnp.asarray(ctr), k=9, interpret=True)[:2]
    idx, d2 = np.asarray(idx), np.asarray(d2)
    vrows = valid[:256]
    np.testing.assert_array_equal(idx[vrows, 0], np.arange(256)[vrows])
    # self-distance carries the 3-pass rounding, which is relative to
    # the |c||p| cross magnitude (~2|p|^2 * 2^-13 here), not to zero
    assert float(np.abs(d2[vrows, 0]).max()) < 0.2


@pytest.mark.parametrize("n,radius", [(2048, 0.5), (4096, 0.8)])
def test_moments_match_exact_sweep(n, radius):
    """Moments vs ops.normals.filter_sweep exact grade. Membership here
    is decided on HIGH-precision (3-pass hi/lo) distances -- like the
    production XLA filter grade, boundary points within the rounding
    band of r^2 may flip vs the exact oracle; away from the boundary the
    accumulation itself is exact-bf16-split (tighter than HIGH)."""
    rng = np.random.default_rng(0)
    pts = rng.normal(0, 20.0, (n, 3)).astype(np.float32)
    valid = rng.random(n) > 0.15
    cnt_o, s_o, S6_o = [np.asarray(a) for a in filter_sweep(
        jnp.asarray(pts), jnp.asarray(valid), 0, radius, "exact")]
    out = fused_knn_moments(jnp.asarray(pts), jnp.asarray(valid),
                            jnp.asarray(pts), k=17, radius=radius,
                            interpret=True)
    cnt_p, s_p, S6_p = (np.asarray(out[2]), np.asarray(out[3]),
                        np.asarray(out[4]))
    same = cnt_p == cnt_o
    assert same.mean() > 0.98, same.mean()   # measured 0.998 both shapes
    # accumulation error = |feature| * 2^-16 per member (hi/lo bf16
    # product pairs): coords up to ~60 -> 5e-3, squares up to ~3600 ->
    # 1e-1; still 40-70x tighter than a single-pass HIGH accumulation
    np.testing.assert_allclose(s_p[same], s_o[same], rtol=1e-5, atol=5e-3)
    np.testing.assert_allclose(S6_p[same], S6_o[same], rtol=1e-5,
                               atol=1e-1)


def test_supported_predicate():
    assert supported(16384, 4096)
    assert supported(2048, 256)
    assert not supported(16384 + 2048, 256)   # index > 14 bits
    assert not supported(1000, 256)           # ragged point tiles
    assert not supported(2048, 100)           # ragged center blocks
    assert _N_CLASSES >= 33                    # k range used by callers
