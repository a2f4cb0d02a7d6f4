"""Automatic MT staleness fallback on a HARSH stream (3.3 m/frame --
twice the keyframe distance): the odometer detects that in-flight
candidate staleness x platform speed rivals the keyframe distance and
serializes against mapping, recovering near-sequential accuracy (the
unmitigated case measured ATE 5 m vs 0.2 m, PARITY.md harsh-stream
section). Gentle streams are covered by test_mt_long_stream."""

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

    root = str(tmp_path_factory.mktemp("harsh_world"))
    rng = np.random.default_rng(0)
    world = make_world(rng)
    # 48 frames around the 157 m lap = ~3.3 m/frame, vs keyframe
    # distance 4 m: nearly every frame is a keyframe and depth-2
    # staleness spans most of a keyframe interval
    lap = circle_trajectory(48, radius=25.0)
    write_npz_sequence(root, world, lap, rng=rng, max_points=2000)
    out = str(tmp_path_factory.mktemp("harsh_out"))
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


def test_fallback_recovers_harsh_stream(setup):
    args, out = setup
    _, pg_seq, ate_seq = _run(args, out, mt=False)
    sys_fb, pg_fb, ate_fb = _run(args, out, mt=True)

    assert ate_seq < 0.6, ate_seq
    # the fallback must actually have engaged on this stream ...
    assert sys_fb._staleness_events >= 1
    # ... and recover near-sequential accuracy (unmitigated depth-2 MT
    # measured 5 m ATE on a comparable 3.3 m/frame stream, PARITY.md)
    assert ate_fb < 2.5 * max(ate_seq, 0.15), (ate_fb, ate_seq)
    # frame coverage stays complete
    assert pg_fb.all_frame_num >= 0.9 * pg_seq.all_frame_num


def test_fallback_can_be_disabled(setup):
    args, out = setup
    args2 = type(args)(dict(args))
    args2.tpu = type(args.tpu)(dict(args.tpu))
    args2.tpu["staleness_fallback"] = False
    sys_off, _, _ = _run(args2, out, mt=True)
    assert sys_off._staleness_events == 0
