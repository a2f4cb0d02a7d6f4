"""UPLOAD_SCAN wire codec round-trips exactly."""

import numpy as np

from deeppointmap_tpu.slam.pose_graph import PoseGraphEdge, ScanPack
from deeppointmap_tpu.slam.serialization import decode_upload, encode_upload


def _scan(rng, agent=1, step=5):
    s = ScanPack(timestamp=0.5, agent_id=agent, timestep=step,
                 key_points=rng.normal(size=(32, 19)).astype(np.float32),
                 key_valid=rng.random(32) > 0.2,
                 full_pcd=rng.normal(size=(128, 3)).astype(np.float32),
                 full_valid=rng.random(128) > 0.1,
                 SE3_pred=np.eye(4) + 0.0,
                 SE3_gt=None,
                 gps_position=np.array([1.0, 2.0, 3.0]),
                 coor_sys=1)
    return s


def _edge(rng, s, d, etype="odom"):
    return PoseGraphEdge(s, d, np.eye(4), rng.normal(size=(6, 6)),
                         etype, confidence=0.8, rmse=0.1)


def test_roundtrip():
    rng = np.random.default_rng(0)
    scan = _scan(rng)
    odom = _edge(rng, 65540, scan.token)
    nbrs = [_edge(rng, 65541, scan.token, "locz"),
            _edge(rng, 65542, scan.token, "loop")]

    blob = encode_upload(scan, odom, nbrs)
    assert isinstance(blob, bytes) and len(blob) > 0
    scan2, odom2, nbrs2 = decode_upload(blob)

    assert scan2.token == scan.token
    assert scan2.type == scan.type
    np.testing.assert_array_equal(scan2.key_points, scan.key_points)
    np.testing.assert_array_equal(scan2.key_valid, scan.key_valid)
    np.testing.assert_array_equal(scan2.full_pcd, scan.full_pcd)
    np.testing.assert_allclose(scan2.SE3_pred, scan.SE3_pred)
    assert scan2.SE3_gt is None

    assert odom2.src_scan_token == odom.src_scan_token
    np.testing.assert_allclose(odom2.information_mat, odom.information_mat)
    assert odom2.confidence == odom.confidence
    assert [e.type for e in nbrs2] == ["locz", "loop"]


def test_no_odom_edge():
    rng = np.random.default_rng(1)
    scan = _scan(rng)
    blob = encode_upload(scan, None, [])
    scan2, odom2, nbrs2 = decode_upload(blob)
    assert odom2 is None and nbrs2 == []
    assert scan2.token == scan.token
