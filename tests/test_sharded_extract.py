"""Mesh-sharded batch extraction: results match the single-device engine
on a virtual 8-device CPU mesh."""

import numpy as np
import pytest

from tests.test_slam_e2e import small_args


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs the multi-device CPU mesh (conftest sets 8)")
    args = small_args(tmp_path_factory.mktemp("shard"))
    # the sharded offline extractor consumes fp32 directly (no tunnel, no
    # upload quantization); compare against an unquantized engine
    args.tpu["upload_quant"] = "none"
    from deeppointmap_tpu.pipeline.common import init_params
    from deeppointmap_tpu.slam.engine import InferenceEngine

    enc, dec, enc_params, dec_params = init_params(args, seed=0)
    engine = InferenceEngine(args, enc_params, dec_params,
                             encoder=enc, decoder=dec)
    return args, enc, enc_params, engine


def _clouds(rng, n_scans, pad):
    pts = np.zeros((n_scans, pad, 3), np.float32)
    val = np.zeros((n_scans, pad), bool)
    for i in range(n_scans):
        n = 900 + 37 * i
        pts[i, :n] = rng.normal(0, 0.3, size=(n, 3))
        val[i, :n] = True
    return pts, val


def test_sharded_matches_engine(setup):
    import jax

    args, enc, enc_params, engine = setup
    from deeppointmap_tpu.parallel.mesh import make_mesh
    from deeppointmap_tpu.parallel.sharded_extract import make_sharded_extract

    mesh = make_mesh(8)
    rng = np.random.default_rng(0)
    pts, val = _clouds(rng, 8, 4096)

    extract = make_sharded_extract(enc, enc_params, mesh,
                                   coor_scale=engine.coor_scale)
    d_sh, dv_sh, pv_sh = extract(pts, val)
    assert d_sh.shape[0] == 8

    d_ref, dv_ref, pv_ref = engine.extract(pts, val)
    np.testing.assert_allclose(d_sh, d_ref, atol=2e-5)
    np.testing.assert_array_equal(dv_sh, dv_ref)
    np.testing.assert_array_equal(pv_sh, pv_ref)


def test_extract_sequence_tail_padding(setup):
    args, enc, enc_params, engine = setup
    from deeppointmap_tpu.parallel.mesh import make_mesh
    from deeppointmap_tpu.parallel.sharded_extract import extract_sequence

    mesh = make_mesh(4)
    rng = np.random.default_rng(1)
    pts, val = _clouds(rng, 6, 4096)  # 6 scans over a 4-mesh -> padded tail

    d, dv, pv = extract_sequence(enc, enc_params, mesh, engine.coor_scale,
                                 pts, val)
    assert d.shape[0] == 6 and dv.shape[0] == 6 and pv.shape[0] == 6
    d_ref, dv_ref, _ = engine.extract(pts, val)
    np.testing.assert_allclose(d, d_ref, atol=2e-5)
    np.testing.assert_array_equal(dv, dv_ref)
