"""Pipelined (MT) mode on a long gentle stream with TRAINED weights:
frames kept, trajectory quality close to sequential mode.

Inter-frame motion here (~1.6 m at 35 m sensor range) matches the
KITTI-like envelope the MT pipeline is designed for; its in-flight
candidate staleness (2-4 frames) is then well inside the keyframe
distance. Harsh streams (several meters/frame) should use sequential
mode -- measured behavior documented in PARITY.md."""

import os

import numpy as np
import pytest

WEIGHTS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "artifacts/synthetic_demo/"
    "weights_final.msgpack")
pytestmark = [
    pytest.mark.skipif(not os.path.exists(WEIGHTS),
                       reason="trained weights artifact missing"),
    pytest.mark.slow,
]


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from deeppointmap_tpu.data.synthetic import (circle_trajectory,
                                                 make_world,
                                                 write_npz_sequence)
    from scripts.train_synthetic_demo import demo_args

    root = str(tmp_path_factory.mktemp("mt_world"))
    rng = np.random.default_rng(0)
    world = make_world(rng)
    lap = circle_trajectory(96, radius=25.0)   # ~1.6 m between frames
    write_npz_sequence(root, world, lap, rng=rng, max_points=2000)
    out = str(tmp_path_factory.mktemp("mt_out"))
    args = demo_args(root, out)
    args.slam_system.enable_loop_closure = False
    args.slam_system.enable_global_optimization = False
    return args, out


def _run(args, out, mt):
    from deeppointmap_tpu.data.dataset import BasicAgent
    from deeppointmap_tpu.pipeline.common import load_weights
    from deeppointmap_tpu.pipeline.infer import (device_preprocess_config,
                                                 make_infer_transform)
    from deeppointmap_tpu.slam.engine import InferenceEngine
    from deeppointmap_tpu.slam.system import SlamSystem
    from deeppointmap_tpu.utils.evaluation import ate_rmse

    enc, dec, ep, dp = load_weights(args, WEIGHTS)
    engine = InferenceEngine(args, ep, dp, encoder=enc, decoder=dec,
                             preprocess_cfg=device_preprocess_config(args))
    agent = BasicAgent(root=args.infer_src[0], reader="auto")
    agent.set_independent(make_infer_transform(args))
    system = SlamSystem(args, engine, system_id=1, logger_dir=out)
    if mt:
        system.MT_Init()
        for i in range(len(agent)):
            system.MT_Step(agent[i])
        system.MT_Done()
        system.MT_Wait()
    else:
        for i in range(len(agent)):
            system.step(agent[i])
    pg = system.posegraph_map
    scans = sorted(pg.get_all_scans(), key=lambda s: s.timestep)
    pred = np.stack([s.SE3_pred for s in scans])
    gt = np.stack([s.SE3_gt for s in scans])
    return system, pg, float(ate_rmse(pred, gt, align=True))


def test_mt_mode_close_to_sequential(setup):
    args, out = setup
    _, pg_seq, ate_seq = _run(args, out, mt=False)
    sys_mt, pg_mt, ate_mt = _run(args, out, mt=True)
    n = 96
    assert pg_seq.all_frame_num >= 0.95 * n
    assert pg_mt.all_frame_num >= 0.90 * n, pg_mt.all_frame_num
    assert ate_seq < 0.5, ate_seq
    # pipelined candidate staleness costs some accuracy; stays same order
    assert ate_mt < 4 * max(ate_seq, 0.1), (ate_mt, ate_seq)
    # the automatic staleness fallback must NOT fire on this gentle
    # (KITTI-envelope, ~1.6 m/frame) stream -- it would silently
    # serialize the pipeline and forfeit MT throughput
    assert sys_mt._staleness_events == 0, sys_mt._staleness_events
