"""Viewer tests: the interactive HTML point-cloud viewer
(utils/visualization.py, replacing the reference's Open3D window,
reference: utils/visualization.py:7-54) must embed exactly the points it
was given (after optional filtering), with per-cloud colors and normals,
in a self-contained file (no external scripts)."""

import base64
import json
import re

import numpy as np
import pytest

from deeppointmap_tpu.utils.visualization import show_pcd


def _extract_data(html: str):
    m = re.search(r"const DATA = (\[.*?\]);\n", html, re.S)
    assert m, "DATA payload not found"
    return json.loads(m.group(1))


def _decode(b64: str) -> np.ndarray:
    return np.frombuffer(base64.b64decode(b64), np.float32).reshape(-1, 3)


def test_embeds_points_and_colors(tmp_path):
    rng = np.random.default_rng(0)
    a = rng.normal(0, 5, (500, 3)).astype(np.float32)
    b = rng.normal(0, 5, (300, 3)).astype(np.float32)
    out = show_pcd([a, b], colors=[(1, 0, 0), (0, 0, 1)],
                   window_name="t", out_html=str(tmp_path / "v.html"),
                   open_browser=False)
    html = open(out).read()
    data = _extract_data(html)
    assert len(data) == 2
    np.testing.assert_array_equal(_decode(data[0]["xyz"]), a)
    np.testing.assert_array_equal(_decode(data[1]["xyz"]), b)
    assert data[0]["color"] == [1, 0, 0]
    assert data[1]["color"] == [0, 0, 1]
    # self-contained: no external script/style/font references
    assert "<script src" not in html
    assert 'src="' not in html and "@import" not in html
    assert "https://" not in html and "http://" not in html


def test_statistical_filter_drops_outliers(tmp_path):
    rng = np.random.default_rng(1)
    dense = rng.normal(0, 1, (1000, 3)).astype(np.float32)
    outliers = np.array([[50, 50, 50], [-60, 0, 70]], np.float32)
    cloud = np.concatenate([dense, outliers])
    out = show_pcd([cloud], filter=True,
                   out_html=str(tmp_path / "f.html"), open_browser=False)
    kept = _decode(_extract_data(open(out).read())[0]["xyz"])
    assert len(kept) < len(cloud)
    assert np.abs(kept).max() < 20.0   # the far outliers are gone


def test_has_normals_passthrough_and_segments(tmp_path):
    rng = np.random.default_rng(2)
    xyz = rng.normal(0, 3, (200, 3)).astype(np.float32)
    nrm = np.tile(np.float32([0, 0, 1]), (200, 1))
    cloud = np.concatenate([xyz, nrm], axis=1)
    out = show_pcd([cloud], has_normals=True,
                   out_html=str(tmp_path / "n.html"), open_browser=False)
    data = _extract_data(open(out).read())
    np.testing.assert_array_equal(_decode(data[0]["normals"]), nrm)


def test_estimate_normals_on_plane(tmp_path):
    """Radius-PCA normals of a flat plane point +-z (ops/normals path,
    mirroring the reference's estimate_normals option)."""
    rng = np.random.default_rng(3)
    xy = rng.uniform(-5, 5, (800, 2)).astype(np.float32)
    cloud = np.concatenate([xy, np.zeros((800, 1), np.float32)], axis=1)
    out = show_pcd([cloud], estimate_normals=True,
                   estimate_kwargs=dict(radius=1.0, max_nn=30),
                   out_html=str(tmp_path / "e.html"), open_browser=False)
    nrm = _decode(_extract_data(open(out).read())[0]["normals"])
    assert np.all(np.abs(nrm[:, 2]) > 0.99)


def test_jax_arrays_accepted(tmp_path):
    import jax.numpy as jnp

    cloud = jnp.ones((64, 3))
    out = show_pcd([cloud], out_html=str(tmp_path / "j.html"),
                   open_browser=False)
    assert len(_decode(_extract_data(open(out).read())[0]["xyz"])) == 64


def test_rejects_bad_shape(tmp_path):
    with pytest.raises(ValueError):
        show_pcd([np.zeros((4, 2))], out_html=str(tmp_path / "x.html"),
                 open_browser=False)
