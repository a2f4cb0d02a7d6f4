"""Collaborative multi-agent SLAM inference entry point.

Parity with the reference (reference: pipeline/infer_multiagents.py:41-130):
AGENT_NUMBER agents + one cloud share one sequence, each agent taking a
~1/N slice with 5% overlap (dataloader split, reference: dataloader/
body.py:340-348); agents upload keyframes + edges to the cloud over the
message bus; the cloud merges pose graphs and closes cross-agent loops.

All systems share ONE InferenceEngine (one set of compiled programs and
one TPU chip) -- the reference deep-copies the torch models per system
(infer_multiagents.py:100-120) because torch modules carry mutable state;
jitted functions are pure so sharing is free.
"""

from __future__ import annotations

import logging
import os

from deeppointmap_tpu.config import load_config, save_settings
from deeppointmap_tpu.data.dataset import BasicAgent
from deeppointmap_tpu.pipeline.common import build_models
from deeppointmap_tpu.pipeline.infer import (device_preprocess_config,
                                              make_infer_transform, prefetch)
from deeppointmap_tpu.slam.engine import InferenceEngine
from deeppointmap_tpu.slam.system import AgentSystem, CloudSystem
from deeppointmap_tpu.slam.utils import CommModule

logger = logging.getLogger("deeppointmap_tpu.infer_multiagents")

AGENT_NUMBER = 3  # reference: pipeline/infer_multiagents.py:38


def main(argv=None):
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(name)s %(levelname)s %(message)s")
    args = load_config(argv)
    args.mode = "infer"

    enc, dec, enc_params, dec_params = build_models(args, args.weight)
    engine = InferenceEngine(args, enc_params, dec_params,
                             encoder=enc, decoder=dec,
                             preprocess_cfg=device_preprocess_config(args))

    os.makedirs(args.infer_tgt, exist_ok=True)
    save_settings(args, os.path.join(args.infer_tgt, "settings.yaml"))

    comm = CommModule()
    seq_root = args.infer_src[0]

    cloud_dir = os.path.join(args.infer_tgt, "cloud")
    os.makedirs(cloud_dir, exist_ok=True)
    cloud = CloudSystem(args, engine, logger_dir=cloud_dir, comm_module=comm)
    cloud.start()

    agents = []
    for i in range(1, AGENT_NUMBER + 1):
        agent_dir = os.path.join(args.infer_tgt, f"agent_{i}")
        os.makedirs(agent_dir, exist_ok=True)
        dataset = BasicAgent(root=seq_root, reader="auto",
                             split_num=AGENT_NUMBER, split_index=i - 1)
        dataset.set_independent(make_infer_transform(args))
        system = AgentSystem(args, engine, system_id=i,
                             logger_dir=agent_dir, comm_module=comm)
        system.start(prefetch(dataset))
        agents.append(system)

    for a in agents:
        a.wait()
        a.result_logger.save_trajectory("trajectory")
        a.result_logger.save_posegraph("trajectory")
        comm.send_message(a.system_id, 0, "AGENT_QUIT")
    comm.send_message(0, 0, "QUIT")
    cloud.wait()
    cloud.result_logger.save_trajectory("cloud_trajectory")
    cloud.result_logger.save_posegraph("cloud_trajectory")
    try:
        cloud.result_logger.draw_trajectory("cloud_trajectory")
    except Exception as e:
        logger.warning("cloud map render failed: %s", e)
    logger.info("multi-agent run complete: %s", cloud.posegraph_map)


if __name__ == "__main__":
    main()
