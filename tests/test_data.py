import os

import numpy as np
import pytest

from deeppointmap_tpu.config import Config, config_from_yaml, update_args
from deeppointmap_tpu.data.readers import read_auto, read_bin, Scan
from deeppointmap_tpu.data.voxel import voxel_downsample_indices

SAMPLE_DIR = "/root/reference/data/sample/seq06/velodyne"
YAML = "/root/reference/configs/infer/DeepPointMap_B_Main_SemanticKITTI.yaml"


class TestReaders:
    @pytest.mark.skipif(not os.path.isdir(SAMPLE_DIR), reason="sample data missing")
    def test_bin_reader_matches_reference_parse(self):
        path = os.path.join(SAMPLE_DIR, "000000.bin")
        scan = read_bin(path)
        # reference parse (dataloader/heads/bin.py:12-25)
        ref = np.fromfile(path, dtype=np.float32).reshape(-1, 4)[:, :3]
        ref = ref[np.isnan(ref).sum(1) == 0]
        assert scan.xyz.shape == ref.shape
        assert np.array_equal(scan.xyz, ref)

    def test_auto_dispatch(self, tmp_path):
        xyz = np.random.default_rng(0).normal(size=(100, 3)).astype(np.float32)
        np.save(tmp_path / "a.npy", xyz)
        scan = read_auto(str(tmp_path / "a.npy"))
        assert np.array_equal(scan.xyz, xyz)

    def test_npz_with_pose(self, tmp_path):
        rng = np.random.default_rng(1)
        xyz = rng.normal(size=(64, 3)).astype(np.float32)
        R = np.eye(3, dtype=np.float32)
        t = np.ones((3, 1), dtype=np.float32)
        np.savez(tmp_path / "b.npz", lidar_pcd=xyz, ego_rotation=R, ego_translation=t)
        scan = read_auto(str(tmp_path / "b.npz"))
        assert np.array_equal(scan.rotation, R)
        assert np.array_equal(scan.translation, t)

    def test_scan_keep(self):
        scan = Scan(xyz=np.arange(30, dtype=np.float32).reshape(10, 3))
        scan.keep(np.array([0, 2, 4]))
        assert scan.n_points == 3


class TestVoxel:
    def test_one_point_per_voxel(self):
        rng = np.random.default_rng(0)
        xyz = rng.uniform(0, 10, size=(5000, 3)).astype(np.float32)
        keep = voxel_downsample_indices(xyz, 0.5, retention="first")
        v = ((xyz[keep] - xyz.min(0)) / 0.5).astype(np.int64)
        key = v[:, 0] * 10**8 + v[:, 1] * 10**4 + v[:, 2]
        assert len(np.unique(key)) == len(keep)

    def test_first_retention_keeps_first_occurrence(self):
        xyz = np.array([[0.1, 0.1, 0.1], [0.11, 0.1, 0.1], [5, 5, 5]], dtype=np.float32)
        keep = voxel_downsample_indices(xyz, 0.3, retention="first")
        assert set(keep.tolist()) == {0, 2}

    def test_center_retention_prefers_voxel_center(self):
        # two points in one voxel [0, 0.3): 0.15 is the center
        xyz = np.array([[0.01, 0.15, 0.15], [0.15, 0.15, 0.15]], dtype=np.float32)
        keep = voxel_downsample_indices(xyz, 0.3, retention="center")
        assert keep.tolist() == [1]

    def test_num_cap(self):
        rng = np.random.default_rng(0)
        xyz = rng.uniform(0, 10, size=(5000, 3)).astype(np.float32)
        keep = voxel_downsample_indices(xyz, 0.5, retention="first", num=100)
        assert len(keep) == 100


class TestConfig:
    def test_yaml_overrides_cli(self):
        args = Config({"name": "cli-name", "mode": "train"})
        update_args(args, {"name": "yaml-name"})
        assert args.name == "yaml-name"

    @pytest.mark.skipif(not os.path.exists(YAML), reason="reference yaml missing")
    def test_loads_reference_yaml_unchanged(self):
        args = config_from_yaml(YAML)
        assert args.encoder.npoint == [4096, 1024, 256, 64, 16]
        assert args.decoder.attention_layers == 3
        assert args.slam_system.key_frame_distance == "auto"
        assert args.slam_system.key_frame_distance_0 == 10
        assert args.transforms.VoxelSample.voxel_size == 0.3
        assert args.loss.tau == 0.1
        # nested attribute access works at all depths
        assert args.encoder.sample[0].type == "fps-t3d"
        # tpu defaults attached
        assert args.tpu.encoder_points == 16384


def test_npz_image_uvd_fields(tmp_path):
    """image/lidar_proj npz fields load and uvd follows point selection
    (reference: dataloader/heads/npz.py:12-27)."""
    import numpy as np
    from deeppointmap_tpu.data.readers import read_auto

    rng = np.random.default_rng(0)
    xyz = rng.normal(size=(100, 3)).astype(np.float32)
    uvd = rng.uniform(0, 1, size=(100, 3)).astype(np.float32)
    img = rng.integers(0, 255, size=(8, 12, 3)).astype(np.uint8)
    p = tmp_path / "f.npz"
    np.savez(p, lidar_pcd=xyz, lidar_proj=uvd, image=img)
    scan = read_auto(str(p))
    assert scan.image.shape == (8, 12, 3)
    np.testing.assert_array_equal(scan.uvd, uvd)
    scan.keep(np.arange(10))
    assert scan.uvd.shape == (10, 3)
    assert scan.image.shape == (8, 12, 3)  # image is not per-point


def test_render_scan_occlusion_shadows_and_overlap():
    """First-return occlusion (data/synthetic.py render_scan): a wall
    culls points behind it in the same spherical z-buffer cells, and
    scan overlap becomes viewpoint-dependent (near pairs keep overlap,
    far pairs lose it) -- the property the stage-2 loop label needs."""
    import numpy as np
    from deeppointmap_tpu.data.synthetic import (circle_trajectory,
                                                 make_world, render_scan)

    # wall at x=5 spanning z 0..3; a lone point behind it at x=15
    ys = np.linspace(-1, 1, 40)
    zs = np.linspace(0.0, 3.0, 30)
    wall = np.stack(np.meshgrid(ys, zs), -1).reshape(-1, 2)
    world = np.concatenate(
        [np.column_stack([np.full(len(wall), 5.0), wall[:, 0], wall[:, 1]]),
         np.array([[15.0, 0.0, 1.0]])]).astype(np.float32)
    pose = np.eye(4)
    plain = render_scan(world, pose, sensor_range=30, noise=0.0,
                        max_points=4000)
    occ = render_scan(world, pose, sensor_range=30, noise=0.0,
                      max_points=4000, occlusion_bins=256)
    assert any(np.linalg.norm(p - [15, 0, 1]) < 0.1 for p in plain)
    assert not any(np.linalg.norm(p - [15, 0, 1]) < 0.1 for p in occ)
    assert len(occ) > 0.9 * len(wall)      # the wall itself survives

    # overlap statistics on a full synthetic world
    rng = np.random.default_rng(0)
    world = make_world(rng, n_clusters=120, extent=60.0,
                       pts_per_cluster=300)
    poses = circle_trajectory(48, radius=25.0)

    def world_frame(scan, pose):
        return scan @ pose[:3, :3].T + pose[:3, 3]

    def overlap(i, j):
        kw = dict(sensor_range=45.0, max_points=6000, noise=0.0,
                  occlusion_bins=512, rng=np.random.default_rng(1))
        a = world_frame(render_scan(world, poses[i], **kw), poses[i])
        b = world_frame(render_scan(world, poses[j], **kw), poses[j])
        d2 = ((a[:, None, :] - b[None, :500, :]) ** 2).sum(-1)
        return (d2.min(1) < 0.5 ** 2).mean()

    near, far = overlap(0, 2), overlap(0, 24)
    assert near > 2.5 * far, (near, far)
