"""Augmentation transform properties (reference semantics:
dataloader/transforms.py).

The key training-correctness invariant: RandomRT with pair=True augments
two consecutive frames with a SHARED base rotation and updates pose +
calib so the GT relative pose recovered through the calib chain is
unchanged (reference: transforms.py:477-547 and the calib usage in
model_pipeline.py:240-257)."""

import numpy as np

from deeppointmap_tpu.data.readers import Scan
from deeppointmap_tpu.data.transforms import (GroundFilter, RandomDrop,
                                              RandomOcclusion,
                                              RandomPosJitter, RandomRT,
                                              RandomShuffle, VerticalCorrect)
from deeppointmap_tpu.utils import se3 as se3m


def _scan(rng, n=500, R=None, T=None):
    return Scan(xyz=rng.normal(0, 10, size=(n, 3)).astype(np.float32),
                rotation=R, translation=T)


def test_random_rt_world_consistency():
    """After augmentation, pose @ xyz still lands at the same world
    points: R_new @ xyz_aug + T_new == R_old @ xyz_old + T_old."""
    rng = np.random.default_rng(0)
    scan = _scan(rng, R=np.eye(3), T=np.array([[1.0], [2.0], [3.0]]))
    world_before = scan.xyz @ scan.rotation.T + scan.translation.T
    RandomRT(p=1.0, pair=False, rng=rng)(scan)
    world_after = scan.xyz @ scan.rotation.T + scan.translation.T
    np.testing.assert_allclose(world_after, world_before, atol=1e-3)


def test_random_rt_calib_recovers_augmentation():
    """calib accumulates the augmentation: aug_xyz = calib @ orig_xyz."""
    rng = np.random.default_rng(1)
    scan = _scan(rng)
    orig = scan.xyz.copy()
    RandomRT(p=1.0, pair=False, rng=rng)(scan)
    back = (np.linalg.inv(scan.calib[:3, :3]) @
            (scan.xyz.T - scan.calib[:3, 3:])).T
    np.testing.assert_allclose(back, orig, atol=1e-4)


def test_random_rt_pairing_shares_base_rotation():
    """pair=True: call 1 stores the base rotation; call 2 composes on top
    (reference: transforms.py:495-511). The GT relative pose recovered
    via calib correction is invariant."""
    rng = np.random.default_rng(2)
    R1 = se3m.so3_exp([0.1, 0.2, 0.3])
    T1 = np.array([[5.0], [0.0], [0.0]])
    R2 = se3m.so3_exp([0.15, 0.18, 0.35])
    T2 = np.array([[7.0], [1.0], [0.0]])
    a = _scan(rng, R=R1, T=T1)
    b = _scan(rng, R=R2, T=T2)

    rel_before = se3m.inv(se3m.se3(R2, T2)) @ se3m.se3(R1, T1)

    t = RandomRT(p=1.0, pair=True, rng=rng)
    t(a)
    t(b)

    # recovered relative pose with calib correction
    # (model_pipeline.py:257: d_calib^-1 @ dst^-1 @ src @ s_calib)
    pose_a = se3m.se3(a.rotation, a.translation)
    pose_b = se3m.se3(b.rotation, b.translation)
    rel_after = np.linalg.inv(b.calib) @ se3m.inv(pose_b) @ pose_a @ a.calib
    np.testing.assert_allclose(rel_after, rel_before, atol=1e-4)


def test_occlusion_and_drop_reduce_points():
    rng = np.random.default_rng(3)
    scan = _scan(rng, n=2000)
    n0 = scan.n_points
    RandomOcclusion([30, 90], [2, 10], 3, p=1.0, rng=rng)(scan)
    assert scan.n_points <= n0
    RandomDrop(0.5, p=1.0, rng=rng)(scan)
    assert scan.n_points < n0


def test_shuffle_preserves_set():
    rng = np.random.default_rng(4)
    scan = _scan(rng, n=100)
    before = {tuple(p) for p in np.round(scan.xyz, 4)}
    RandomShuffle(p=1.0, rng=rng)(scan)
    after = {tuple(p) for p in np.round(scan.xyz, 4)}
    assert before == after


def test_jitter_bounded():
    rng = np.random.default_rng(5)
    scan = _scan(rng, n=300)
    before = scan.xyz.copy()
    RandomPosJitter(std=0.05, p=1.0, rng=rng)(scan)
    assert np.abs(scan.xyz - before).max() <= 0.15 + 1e-6  # 3 sigma clamp


def test_vertical_correct_preserves_range():
    rng = np.random.default_rng(6)
    scan = _scan(rng, n=300)
    r_before = np.linalg.norm(scan.xyz, axis=1)
    VerticalCorrect(angle=2.0)(scan)
    r_after = np.linalg.norm(scan.xyz, axis=1)
    np.testing.assert_allclose(r_after, r_before, rtol=1e-4)


def test_ground_filter_removes_flat_cells():
    rng = np.random.default_rng(7)
    # flat ground plane + a vertical pole
    ground = np.stack([rng.uniform(-10, 10, 3000),
                       rng.uniform(-10, 10, 3000),
                       rng.normal(0, 0.02, 3000)], 1).astype(np.float32)
    pole = np.stack([np.full(100, 2.0), np.full(100, 2.0),
                     np.linspace(0, 3, 100)], 1).astype(np.float32)
    scan = Scan(xyz=np.concatenate([ground, pole]))
    GroundFilter(img_len=64, img_width=64, grid_width=0.5,
                 ground_height=0.3)(scan)
    # most ground removed (one representative per flat cell kept), pole kept
    assert scan.n_points < 1800
    zmax = scan.xyz[:, 2].max()
    assert zmax > 2.5


def test_ground_filter_matches_loop_oracle():
    """The vectorized (reduceat) GroundFilter must keep exactly the same
    points in the same order as a direct per-grid loop implementation of
    the reference semantics (transforms.py:174-227)."""
    def loop_oracle(xyz, gf):
        row = (xyz[:, 0] / gf.grid_width + gf.img_len / 2).astype(np.int32)
        col = (xyz[:, 1] / gf.grid_width + gf.img_width / 2).astype(np.int32)
        inside = ((row >= 0) & (row < gf.img_len)
                  & (col >= 0) & (col < gf.img_width))
        ids = np.nonzero(inside)[0]
        gid = row[ids] * gf.img_width + col[ids]
        order = np.argsort(gid, kind="stable")
        ids, gid = ids[order], gid[order]
        z = xyz[ids, 2]
        _, starts = np.unique(gid, return_index=True)
        bounds = np.append(starts, len(gid))
        keep = []
        for b, e in zip(bounds[:-1], bounds[1:]):
            if e - b < 3:
                continue
            if z[b:e].max() - z[b:e].min() > gf.ground_height:
                keep.append(ids[b:e])
            elif gf.preserve_sparse_ground:
                keep.append(ids[b:b + 1])
        return (np.concatenate(keep) if keep
                else np.zeros((0,), np.int64))

    rng = np.random.default_rng(11)
    for trial, preserve in [(0, True), (1, False)]:
        xyz = np.concatenate([
            rng.uniform(-20, 20, size=(5000, 3)),      # volume points
            np.column_stack([rng.uniform(-20, 20, (4000, 2)),
                             rng.normal(0, 0.03, 4000)]),  # ground plane
        ]).astype(np.float32)
        gf = GroundFilter(img_len=64, img_width=64, grid_width=0.5,
                          ground_height=0.3, preserve_sparse_ground=preserve)
        expect = loop_oracle(xyz, gf)
        scan = Scan(xyz=xyz.copy())
        gf(scan)
        np.testing.assert_array_equal(scan.xyz, xyz[expect])
