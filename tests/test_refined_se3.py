"""refined_SE3.pkl end-to-end: generate the artifact with the ICP tool
(scripts/make_refined_se3.py), then feed it through the training batch
builder -- lookup, inversion, bridge composition, and calib correction
under RandomRT augmentation (reference: model_pipeline.py:199-298)."""

import os
import pickle
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from deeppointmap_tpu.data.readers import Scan
from deeppointmap_tpu.data.synthetic import (circle_trajectory, make_world,
                                             render_scan)
from deeppointmap_tpu.utils import se3 as se3m
from scripts.make_refined_se3 import (gt_relative_SE3, icp_point_to_point,
                                      refine_scene)


def rot_z(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    rng = np.random.default_rng(0)
    world = make_world(rng)
    poses = circle_trajectory(10, radius=12.0)
    scans = []
    for pose in poses:
        xyz = render_scan(world, pose, sensor_range=30.0, noise=0.01,
                          max_points=3000, rng=rng)
        scans.append(Scan(xyz=xyz, rotation=pose[:3, :3],
                          translation=pose[:3, 3:]))
    return scans, poses


def test_icp_recovers_perturbed_pose(scene):
    """ICP from a perturbed init must converge back to the true relative
    pose on overlapping synthetic scans."""
    scans, poses = scene
    true = gt_relative_SE3(scans[1], scans[0])
    perturb = se3m.se3(rot_z(0.03), np.array([0.2, -0.15, 0.02]))
    T, rmse = icp_point_to_point(
        np.asarray(scans[1].xyz, np.float64),
        np.asarray(scans[0].xyz, np.float64),
        perturb @ true, iters=30, max_corr=1.5)
    # rmse reflects independent per-scan subsampling of the world, not
    # registration error -- the pose-accuracy checks below are the signal
    assert rmse < 0.5
    dR = T[:3, :3] @ true[:3, :3].T
    ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    assert ang < 0.5, ang
    assert np.linalg.norm(T[:3, 3] - true[:3, 3]) < 0.05


def test_refine_scene_schema_and_accuracy(scene, tmp_path):
    scans, poses = scene
    refined = refine_scene(scans, max_distance=15.0, voxel=0.3, iters=15,
                           max_corr=1.0)
    assert refined, "no pairs within radius"
    for (i, j), T in refined.items():
        assert i < j and T.shape == (4, 4)
        true = gt_relative_SE3(scans[j], scans[i])
        # scans carry noise 0.01; ICP from GT must stay within a few cm
        assert np.linalg.norm(T[:3, 3] - true[:3, 3]) < 0.1, (i, j)
    # round-trips through pickle (the on-disk artifact)
    p = tmp_path / "refined_SE3.pkl"
    with open(p, "wb") as f:
        pickle.dump(refined, f)
    with open(p, "rb") as f:
        back = pickle.load(f)
    assert set(back) == set(refined)


def _write_pkl(tmp_path, d):
    p = str(tmp_path / "refined_SE3.pkl")
    with open(p, "wb") as f:
        pickle.dump(d, f)
    return p


def test_batch_builder_uses_refined_dict(scene, tmp_path):
    """build_registration_batch must take relative poses from the pickle
    (not GT) when present: perturbed dict values -> perturbed batch SE3s,
    with bridge composition for missing pairs."""
    from deeppointmap_tpu.config import Config
    from deeppointmap_tpu.pipeline.batching import (build_registration_batch,
                                                    load_refined_SE3)

    scans, poses = scene
    # deliberately-perturbed "ICP" dict so refined != GT is detectable
    delta = se3m.se3(rot_z(0.05), np.array([0.3, 0.0, 0.0]))
    refined = {}
    refined[(0, 1)] = delta @ gt_relative_SE3(scans[1], scans[0])
    refined[(0, 2)] = delta @ gt_relative_SE3(scans[2], scans[0])
    # NOTE: (1, 2) absent -> must bridge through frame 0
    path = _write_pkl(tmp_path, refined)
    load_refined_SE3.__globals__["_SE3_CACHE"].clear()

    frames = [scans[0], scans[1], scans[2], scans[0]]  # S=4 group of one map
    info = dict(num_map=1,
                dsf_index=[(0, 0, 0), (0, 0, 1), (0, 0, 2), (0, 0, 0)],
                refined_SE3_file=[path])
    cfg = Config(map_size_max=8, K=4, K_max=4, fill=True, distance=20.0)
    rng = np.random.default_rng(3)
    batch = build_registration_batch(frames, info, cfg, pad_to=3200, rng=rng)

    S1 = int(np.sum(batch.group_id[0] == 0))
    assert 1 <= S1 <= 3
    # frame 1 relative to its anchor must match the dict-composed value,
    # not plain GT
    from deeppointmap_tpu.pipeline.batching import accurate_relative_SE3
    anchor = 0 if S1 >= 2 else S1
    if S1 >= 2:   # frame index 1 is in src group, anchored at frame 0
        got = batch.group_SE3[0, 1]
        want = np.linalg.inv(refined[(0, 1)])            # 1 -> 0
        np.testing.assert_allclose(got, want.astype(np.float32), atol=1e-5)
        gt = gt_relative_SE3(scans[1], scans[0])
        assert np.linalg.norm(got[:3, 3] - gt[:3, 3]) > 0.05


def test_bridge_composition_and_calib_correction(scene, tmp_path):
    """Missing (s, t) pairs compose through the bridge frame; RandomRT
    augmentation is undone through the calib chain
    (reference: model_pipeline.py:240-257, get_SE3_from_dict)."""
    from deeppointmap_tpu.data.transforms import RandomRT
    from deeppointmap_tpu.pipeline.batching import (accurate_relative_SE3,
                                                    get_SE3_from_dict)

    scans, poses = scene
    refined = {
        (0, 1): gt_relative_SE3(scans[1], scans[0]),
        (0, 2): gt_relative_SE3(scans[2], scans[0]),
    }
    # bridge: 1 -> 2 via 0 must equal (0->2)^-1 @ (1->0)
    got = get_SE3_from_dict(refined, 1, 2, bridge=0)
    want = np.linalg.inv(refined[(0, 2)]) @ refined[(0, 1)]
    np.testing.assert_allclose(got, want, atol=1e-12)

    # RandomRT moves points+poses+calib consistently: the refined lookup
    # corrected by calib must equal the (augmented) GT relative pose
    a = Scan(xyz=scans[1].xyz.copy(), rotation=scans[1].rotation.copy(),
             translation=scans[1].translation.copy())
    b = Scan(xyz=scans[2].xyz.copy(), rotation=scans[2].rotation.copy(),
             translation=scans[2].translation.copy())
    rt = RandomRT(r_std=0.8, t_std=1.0, p=1.0, pair=True,
                  rng=np.random.default_rng(9))
    rt(a)
    rt(b)
    out = accurate_relative_SE3(1, 2, a, b, refined, bridge=0)
    R, T = se3m.global_to_relative(b.rotation, b.translation,
                                   a.rotation, a.translation)
    want_aug = se3m.se3(R, T)
    np.testing.assert_allclose(out, want_aug, atol=1e-4)
