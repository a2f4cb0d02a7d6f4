"""Threaded pipeline + multi-agent smoke tests (CPU, tiny model)."""

import os

import numpy as np
import pytest

SAMPLE = "/root/reference/data/sample/seq06/velodyne"
pytestmark = pytest.mark.skipif(not os.path.isdir(SAMPLE),
                                reason="sample data not available")

from tests.test_slam_e2e import small_args


@pytest.fixture(scope="module")
def engine_and_args(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("ma")
    args = small_args(tmp)
    from deeppointmap_tpu.pipeline.common import init_params
    from deeppointmap_tpu.slam.engine import InferenceEngine

    enc, dec, enc_params, dec_params = init_params(args, seed=0)
    engine = InferenceEngine(args, enc_params, dec_params,
                             encoder=enc, decoder=dec)
    return args, engine


def test_comm_module_roundtrip():
    from deeppointmap_tpu.slam.utils import CommModule

    comm = CommModule()
    comm.register(0)
    comm.register(1)
    comm.send_message(1, 0, "UPLOAD_SCAN", {"x": 42})
    src, op, msg = comm.fetch_message(0)
    assert (src, op, msg) == (1, "UPLOAD_SCAN", {"x": 42})
    assert comm.fetch_message(0, block=False) is None


def test_mt_pipeline(engine_and_args, tmp_path):
    """6-stage threaded pipeline processes frames and drains cleanly
    (reference: system/core.py:82-358)."""
    args, engine = engine_and_args
    from deeppointmap_tpu.data.dataset import BasicAgent
    from deeppointmap_tpu.pipeline.infer import make_infer_transform
    from deeppointmap_tpu.slam.system import SlamSystem

    agent = BasicAgent(root=SAMPLE, reader="auto")
    agent.set_independent(make_infer_transform(args))
    system = SlamSystem(args, engine, system_id=1, logger_dir=str(tmp_path))
    system.MT_Init()
    for i in range(4):
        system.MT_Step(agent[i])
    system.MT_Done()
    system.MT_Wait()
    assert system.posegraph_map.all_frame_num >= 1
    system.result_logger.save_trajectory("trajectory")
    assert os.path.exists(os.path.join(tmp_path, "trajectory.allframes.txt"))


def test_multiagent_cloud_merge(engine_and_args, tmp_path):
    """Agents upload to the cloud; the cloud merges pose graphs
    (reference: pipeline/infer_multiagents.py + system/core.py:451-546)."""
    args, engine = engine_and_args
    from deeppointmap_tpu.data.dataset import BasicAgent
    from deeppointmap_tpu.pipeline.infer import make_infer_transform
    from deeppointmap_tpu.slam.system import AgentSystem, CloudSystem
    from deeppointmap_tpu.slam.utils import CommModule

    comm = CommModule()
    cloud = CloudSystem(args, engine, logger_dir=str(tmp_path),
                        comm_module=comm)
    cloud.start()

    n_agents = 2
    agents = []
    for i in range(1, n_agents + 1):
        ds = BasicAgent(root=SAMPLE, reader="auto", split_num=n_agents,
                        split_index=i - 1)
        ds.set_independent(make_infer_transform(args))
        sys_i = AgentSystem(args, engine, system_id=i,
                            logger_dir=str(tmp_path), comm_module=comm)
        # keep it small: 3 frames each
        sys_i.start([ds[j] for j in range(3)])
        agents.append(sys_i)

    for a in agents:
        a.wait()
        comm.send_message(a.system_id, 0, "AGENT_QUIT")
    comm.send_message(0, 0, "QUIT")
    cloud.wait()

    # cloud received keyframes from both agents
    pg = cloud.posegraph_map
    agent_ids = {s.agent_id for s in pg.get_all_scans()}
    assert agent_ids >= {1, 2}, agent_ids
    for s in pg.get_all_scans():
        assert np.all(np.isfinite(s.SE3_pred))


def test_mt_stage_crash_drains_and_raises(engine_and_args, tmp_path):
    """A crashing pipeline stage must not hang MT_Wait: EXIT drains
    downstream and the error is re-raised to the caller."""
    args, engine = engine_and_args
    from deeppointmap_tpu.data.dataset import BasicAgent
    from deeppointmap_tpu.pipeline.infer import make_infer_transform
    from deeppointmap_tpu.slam.system import SlamSystem

    agent = BasicAgent(root=SAMPLE, reader="auto")
    agent.set_independent(make_infer_transform(args))
    system = SlamSystem(args, engine, system_id=9, logger_dir=str(tmp_path))

    def boom(new_scan, odom_edge):
        raise ValueError("injected mapping failure")

    system.mapping.process = boom
    system.MT_Init()
    for i in range(3):
        system.MT_Step(agent[i])
    system.MT_Done()
    with pytest.raises(RuntimeError, match="mapping.*injected"):
        system.MT_Wait()
