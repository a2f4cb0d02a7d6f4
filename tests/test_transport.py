"""TCP transport round-trip: agent-side RemoteCommModule -> wire ->
TransportServer -> cloud CommModule."""

import time

import numpy as np

from deeppointmap_tpu.slam.transport import RemoteCommModule, TransportServer
from deeppointmap_tpu.slam.utils import CommModule
from tests.test_serialization import _edge, _scan


def test_upload_over_tcp():
    rng = np.random.default_rng(0)
    comm = CommModule()
    server = TransportServer(comm, port=0)
    client = RemoteCommModule("127.0.0.1", server.port)

    scan = _scan(rng, agent=2, step=7)
    odom = _edge(rng, 131072, scan.token)
    client.send_message(2, 0, "UPLOAD_SCAN", dict(
        new_scan=scan, odometer_edge=odom, neighbor_edges=[]))
    client.send_message(2, 0, "AGENT_QUIT")
    client.send_message(2, 0, "QUIT")

    src, op, msg = comm.fetch_message(0, timeout=5)
    assert (src, op) == (2, "UPLOAD_SCAN")
    got = msg["new_scan"]
    assert got.token == scan.token
    np.testing.assert_array_equal(got.key_points, scan.key_points)
    assert msg["odometer_edge"].src_scan_token == 131072

    src, op, _ = comm.fetch_message(0, timeout=5)
    assert op == "AGENT_QUIT"
    src, op, _ = comm.fetch_message(0, timeout=5)
    assert op == "QUIT"

    client.close()
    server.close()
