"""Device-side fused preprocessing vs the host transform chain on a real
KITTI scan (CPU backend: exact top-k, so results should agree up to
kNN tie-breaking)."""

import os

import numpy as np
import pytest

SAMPLE = "/root/reference/data/sample/seq06/velodyne/000000.bin"
pytestmark = pytest.mark.skipif(not os.path.exists(SAMPLE),
                                reason="sample data not available")


def test_device_matches_host_chain():
    import jax.numpy as jnp

    from deeppointmap_tpu.config import Config
    from deeppointmap_tpu.data.preprocess import (PreprocessConfig,
                                                  preprocess_jit)
    from deeppointmap_tpu.data.readers import read_auto
    from deeppointmap_tpu.data.transforms import PointCloudTransforms
    from deeppointmap_tpu.data.voxel import voxel_downsample_indices

    # voxel sampling is done once below (host side in both chains); the
    # compared portion is everything after it
    transforms_cfg = {
        "DistanceSample": {"min_dis": 1.0, "max_dis": 60.0},
        "OutlierFilter": {"nb_neighbors": 10, "std_ratio": 3.0},
        "LowPassFilter": {"normals_radius": 0.5, "normals_num": 16,
                          "filter_std": 2.0, "flux": 4, "max_remain": -1},
        "CoordinatesNormalization": {"ratio": 60.0},
        "ToTensor": {"padding_to": -1},
    }

    scan = read_auto(SAMPLE)
    vox_idx = voxel_downsample_indices(scan.xyz, 0.3, "first")
    vox = scan.xyz[vox_idx]
    # cap for test speed
    vox = vox[:8000]
    n = vox.shape[0]

    # host chain
    host_scan = read_auto(SAMPLE)
    host_scan.xyz = vox.copy()
    args = Config(transforms=transforms_cfg)
    tf = PointCloudTransforms(args, mode="infer")
    pts_host, _, _, valid_host, _ = tf(host_scan)

    # device chain (mask-based)
    cfg = PreprocessConfig.from_transforms(transforms_cfg)
    pad = np.zeros((8192, 3), np.float32)
    pad[:n] = vox
    v0 = np.zeros((8192,), bool)
    v0[:n] = True
    pts_dev, valid_dev = preprocess_jit(jnp.asarray(pad), jnp.asarray(v0),
                                        cfg)
    pts_dev = np.asarray(pts_dev)[np.asarray(valid_dev)]

    n_host = pts_host.shape[0]
    n_dev = pts_dev.shape[0]
    # survivors agree to within a small tolerance (kNN ties and the
    # host's exact Open3D-style normal neighborhoods differ slightly)
    assert abs(n_host - n_dev) / max(n_host, 1) < 0.05, (n_host, n_dev)

    # surviving device points are a near-superset/subset: compare sets of
    # rounded coordinates
    hs = {tuple(p) for p in np.round(pts_host * 1e4).astype(np.int64)}
    ds = {tuple(p) for p in np.round(pts_dev * 1e4).astype(np.int64)}
    inter = len(hs & ds)
    assert inter / max(len(hs), 1) > 0.95, (len(hs), len(ds), inter)


def test_smallest_eigvec():
    import jax.numpy as jnp

    from deeppointmap_tpu.ops.normals import smallest_eigvec_3x3

    rng = np.random.default_rng(0)
    # random SPD matrices with known smallest eigenvector
    vals = []
    for _ in range(50):
        q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
        lam = np.sort(rng.uniform(0.1, 5.0, 3))[::-1]
        C = q @ np.diag(lam) @ q.T
        vals.append((C, q[:, np.argmin(lam)]))
    C = jnp.asarray(np.stack([c for c, _ in vals]), jnp.float32)
    v = np.asarray(smallest_eigvec_3x3(C))
    for i, (_, expect) in enumerate(vals):
        cos = abs(np.dot(v[i], expect))
        assert cos > 0.999, (i, cos)
