"""Collaborative multi-agent SLAM inference entry point.

Parity with the reference (reference: pipeline/infer_multiagents.py:41-130):
AGENT_NUMBER agents + one cloud share one sequence, each agent taking a
~1/N slice with 5% overlap (dataloader split, reference: dataloader/
body.py:340-348); agents upload keyframes + edges to the cloud over the
message bus; the cloud merges pose graphs and closes cross-agent loops.

Two transports (--transport):
  inproc  -- reference-equivalent: agent threads + cloud in one process
             sharing ONE InferenceEngine (one set of compiled programs and
             one TPU chip). The reference deep-copies the torch models per
             system (infer_multiagents.py:100-120) because torch modules
             carry mutable state; jitted functions are pure so sharing is
             free.
  tcp     -- multi-process/multi-host: the cloud hosts a TransportServer;
             each agent runs in its OWN process (own JAX runtime, own
             chip on real deployments) and ships UPLOAD_SCAN messages over
             the wire codec (slam/transport.py). This process spawns the
             agent workers locally; on a real multi-host deployment start
             each worker yourself with --agent_index i --transport_host H
             --transport_port P.
"""

from __future__ import annotations

import logging
import os
import subprocess
import sys

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


def _build_engine(args) -> InferenceEngine:
    enc, dec, enc_params, dec_params = build_models(args, args.weight)
    return InferenceEngine(args, enc_params, dec_params, encoder=enc,
                           decoder=dec,
                           preprocess_cfg=device_preprocess_config(args))


def _make_agent(args, engine, comm, agent_id: int) -> AgentSystem:
    agent_dir = os.path.join(args.infer_tgt, f"agent_{agent_id}")
    os.makedirs(agent_dir, exist_ok=True)
    dataset = BasicAgent(root=args.infer_src[0], reader="auto",
                         split_num=AGENT_NUMBER, split_index=agent_id - 1)
    dataset.set_independent(make_infer_transform(args))
    system = AgentSystem(args, engine, system_id=agent_id,
                         logger_dir=agent_dir, comm_module=comm)
    system.start(prefetch(dataset))
    return system


def _finish_agent(system) -> None:
    system.wait()
    system.result_logger.save_trajectory("trajectory")
    system.result_logger.save_posegraph("trajectory")


def run_agent_worker(args) -> None:
    """One agent in its own process, uploading to the cloud over TCP."""
    from deeppointmap_tpu.slam.transport import RemoteCommModule

    i = int(args.agent_index)
    assert 1 <= i <= AGENT_NUMBER, f"agent_index {i} out of range"
    comm = RemoteCommModule(args.transport_host, int(args.transport_port))
    engine = _build_engine(args)
    system = _make_agent(args, engine, comm, i)
    _finish_agent(system)
    comm.send_message(i, 0, "AGENT_QUIT")
    comm.close()
    logger.info("agent %d done: %s", i, system.posegraph_map)


def _spawn_agent_procs(args, port: int):
    """Local agent worker processes. Children are forced onto the CPU
    backend by default: this box's TPU tunnel is single-client and the
    cloud process owns it (set tpu.agent_platform to override, e.g. on a
    pod where every process gets its own chips)."""
    platform = str((args.get("tpu") or {}).get("agent_platform", "cpu"))
    if platform == "cpu":
        # CPU-forced agents must not touch the single-client device
        # link AT ALL -- the PJRT plugin's sitecustomize registration
        # dials the relay at interpreter start, so a flapping link can
        # hang the child before JAX_PLATFORMS is even consulted.
        from deeppointmap_tpu.utils.childenv import cpu_child_env

        env = cpu_child_env(platform=platform)
    else:
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = platform
    procs = []
    for i in range(1, AGENT_NUMBER + 1):
        cmd = [sys.executable, "-m",
               "deeppointmap_tpu.pipeline.infer_multiagents",
               "--yaml_file", args.yaml_file, "--transport", "tcp",
               "--agent_index", str(i), "--transport_port", str(port),
               "--transport_host", args.transport_host,
               "--infer_tgt", args.infer_tgt]
        if args.weight:
            cmd += ["--weight", args.weight]
        procs.append(subprocess.Popen(cmd, env=env))
    return procs


def run_cloud_tcp(args) -> CloudSystem:
    """Cloud + TransportServer; spawns local agent processes and merges
    their uploads (multi-process equivalent of the in-proc flow)."""
    from deeppointmap_tpu.slam.transport import TransportServer

    engine = _build_engine(args)
    comm = CommModule()
    server = TransportServer(comm, host=args.transport_host,
                             port=int(args.transport_port))
    logger.info("cloud transport listening on %s:%d", args.transport_host,
                server.port)
    cloud_dir = os.path.join(args.infer_tgt, "cloud")
    os.makedirs(cloud_dir, exist_ok=True)
    cloud = CloudSystem(args, engine, logger_dir=cloud_dir, comm_module=comm)
    cloud.start()

    procs = _spawn_agent_procs(args, server.port)
    failed = [i + 1 for i, p in enumerate(procs) if p.wait() != 0]
    if failed:
        raise RuntimeError(f"agent processes failed: {failed}")
    comm.send_message(0, 0, "QUIT")
    cloud.wait()
    server.close()
    return cloud


def run_inproc(args) -> CloudSystem:
    engine = _build_engine(args)
    comm = CommModule()
    cloud_dir = os.path.join(args.infer_tgt, "cloud")
    os.makedirs(cloud_dir, exist_ok=True)
    cloud = CloudSystem(args, engine, logger_dir=cloud_dir, comm_module=comm)
    cloud.start()

    agents = [_make_agent(args, engine, comm, i)
              for i in range(1, AGENT_NUMBER + 1)]
    for a in agents:
        _finish_agent(a)
        comm.send_message(a.system_id, 0, "AGENT_QUIT")
    comm.send_message(0, 0, "QUIT")
    cloud.wait()
    return cloud


def main(argv=None):
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(name)s %(levelname)s %(message)s")
    args = load_config(argv)
    args.mode = "infer"

    if int(args.agent_index) >= 1:
        run_agent_worker(args)
        return

    os.makedirs(args.infer_tgt, exist_ok=True)
    save_settings(args, os.path.join(args.infer_tgt, "settings.yaml"))

    if args.transport == "tcp":
        cloud = run_cloud_tcp(args)
    else:
        cloud = run_inproc(args)

    # gate-by-gate observability for the cross-agent merge: where the
    # cloud's loop candidates die (reference merge: core.py:466-514)
    logger.info("cloud loop funnel: %s", cloud.loop.stats)
    if cloud.loop.recent_edges:
        logger.info("cloud recent (conf, rmse) pre-verification: %s",
                    [(round(c, 3), round(r, 3))
                     for c, r in cloud.loop.recent_edges[-12:]])
    loop_edges = [dict(src=int(e.src_scan_token), dst=int(e.dst_scan_token),
                       conf=float(e.confidence or 0.0),
                       rmse=float(e.rmse or 0.0), SE3=e.SE3.tolist())
                  for e in cloud.posegraph_map.get_all_edges()
                  if e.type == "loop"]
    import json as _json
    with open(os.path.join(args.infer_tgt, "cloud", "loop_edges.json"),
              "w") as f:
        _json.dump(loop_edges, f)
    cloud.result_logger.save_trajectory("cloud_trajectory")
    cloud.result_logger.save_posegraph("cloud_trajectory")
    try:
        cloud.result_logger.draw_trajectory("cloud_trajectory")
    except Exception as e:
        logger.warning("cloud map render failed: %s", e)
    logger.info("multi-agent run complete: %s", cloud.posegraph_map)


if __name__ == "__main__":
    main()
