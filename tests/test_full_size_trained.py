"""The committed FULL-SIZE trained artifact (artifacts/full_size/,
produced by scripts/train_full_size.py at production DeepPointMap-B
shapes) loads and drives the complete SLAM system: a short full-density
synthetic stream must register accurately frame to frame.

The two-lap accuracy story for this model runs on real TPU inside
bench.py's accuracy block; this test guards the artifact + config
plumbing on CPU with a stream short enough for the suite."""

import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WEIGHTS = os.path.join(REPO, "artifacts/full_size/weights_final.msgpack")
pytestmark = [
    pytest.mark.skipif(not os.path.exists(WEIGHTS),
                       reason="full-size trained artifact missing"),
    pytest.mark.slow,
]


def test_full_size_trained_slam_short_stream(tmp_path):
    sys.path.insert(0, REPO)
    from scripts.train_full_size import (RENDER, WORLD,
                                         apply_artifact_render,
                                         full_eval_args)
    apply_artifact_render(WEIGHTS)   # match the artifact's render settings
    from deeppointmap_tpu.data.synthetic import (circle_trajectory,
                                                 make_world,
                                                 write_npz_sequence)
    from deeppointmap_tpu.data.dataset import BasicAgent
    from deeppointmap_tpu.pipeline.common import load_weights
    from deeppointmap_tpu.pipeline.infer import (device_preprocess_config,
                                                 make_infer_transform)
    from deeppointmap_tpu.slam.engine import InferenceEngine
    from deeppointmap_tpu.slam.system import SlamSystem
    from deeppointmap_tpu.utils.evaluation import ate_rmse

    # 8 frames of the eval world (seed 0, never trained on), rendered
    # with the SAME shared parameters training/eval/bench use
    root = str(tmp_path / "world")
    rng = np.random.default_rng(0)
    world = make_world(rng, **WORLD)
    poses = circle_trajectory(48, radius=25.0)[:8]
    agent_dir = write_npz_sequence(root, world, poses, rng=rng, **RENDER)

    out = str(tmp_path / "out")
    os.makedirs(out)
    args = full_eval_args(root, out)
    args.infer_src = [agent_dir]
    args.slam_system.enable_loop_closure = False
    args.slam_system.enable_global_optimization = False

    enc, dec, ep, dp = load_weights(args, WEIGHTS)
    engine = InferenceEngine(args, ep, dp, encoder=enc, decoder=dec,
                             preprocess_cfg=device_preprocess_config(args))
    agent = BasicAgent(root=agent_dir, reader="auto")
    agent.set_independent(make_infer_transform(args))
    system = SlamSystem(args, engine, system_id=1, logger_dir=out)
    for i in range(len(agent)):
        system.step(agent[i])

    pg = system.posegraph_map
    assert pg.all_frame_num == 8
    scans = sorted(pg.get_all_scans(), key=lambda s: s.timestep)
    pred = np.stack([s.SE3_pred for s in scans])
    gt = np.stack([s.SE3_gt for s in scans])
    ate = float(ate_rmse(pred, gt, align=True))
    # 8 frames x ~3.3 m: a trained full-B model tracks to decimeters
    assert ate < 0.5, ate
