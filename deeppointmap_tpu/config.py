"""Configuration system: argparse schema merged with a YAML file.

Parity with the reference CLI (reference: pipeline/parameters.py:37-82):
the same seven YAML-only trees (dataset, transforms, encoder, decoder,
train, loss, slam_system) and the same priority rule -- **YAML overrides
console arguments** (reference: pipeline/parameters.py:18-34, README.md:115).
Unknown YAML keys warn but are still set.
"""

from __future__ import annotations

import argparse
import logging
from typing import Any, Mapping

import yaml

logger = logging.getLogger(__name__)


class Config(dict):
    """A dict with attribute access, recursively applied (EasyDict-alike)."""

    def __init__(self, d: Mapping | None = None, **kwargs):
        super().__init__()
        if d:
            for k, v in d.items():
                self[k] = v
        for k, v in kwargs.items():
            self[k] = v

    @staticmethod
    def _wrap(value: Any) -> Any:
        if isinstance(value, Mapping) and not isinstance(value, Config):
            return Config(value)
        if isinstance(value, (list, tuple)):
            return type(value)(Config._wrap(v) for v in value)
        return value

    def __setitem__(self, key, value):
        super().__setitem__(key, Config._wrap(value))

    def __setattr__(self, key, value):
        self[key] = value

    def __getattr__(self, key):
        try:
            return self[key]
        except KeyError as e:
            raise AttributeError(key) from e

    def get(self, key, default=None):
        return super().get(key, default)


def str_to_bool(s: str) -> bool:
    if s.lower() == "true":
        return True
    if s.lower() == "false":
        return False
    raise argparse.ArgumentTypeError(f"{s!r} is not a boolean")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="DeepPointMap-TPU SLAM")
    p.add_argument("--name", default="DeepPointMap", type=str)
    p.add_argument("--version", default="v1.0", type=str)
    p.add_argument("--mode", default="train", type=str, choices=["train", "infer"])
    p.add_argument("--checkpoint", "-ckpt", default="", type=str,
                   help="Training checkpoint file")
    p.add_argument("--weight", "-w", default="", type=str,
                   help="Model weight file (.pth torch schema or .msgpack)")
    p.add_argument("--yaml_file", "-yaml", default="", type=str,
                   help="YAML config; values here override CLI values")
    p.add_argument("--num_workers", default=4, type=int)
    p.add_argument("--thread_safety", default=False, action="store_true")
    p.add_argument("--use_cuda", default="true", type=str_to_bool,
                   help="Accepted for reference-CLI parity; device choice is JAX's")
    p.add_argument("--gpu_index", default="0", type=str)
    p.add_argument("--use_ddp", default=False, action="store_true")
    p.add_argument("--local_rank", default=0, type=int)
    p.add_argument("--word_size", default=1, type=int)
    p.add_argument("--infer_src", default=[], type=list)
    p.add_argument("--infer_tgt", default="log_infer", type=str)
    p.add_argument("--multi_thread", "-mt", default=False, action="store_true")
    p.add_argument("--use_ros", "-ros", default=False, action="store_true")
    p.add_argument("--profile", default=False, action="store_true",
                   help="Capture a jax.profiler device trace during inference")
    # multi-agent transport (TPU build extension: the reference runs all
    # agents in one process over an in-memory bus)
    p.add_argument("--transport", default="inproc",
                   choices=["inproc", "tcp"],
                   help="multi-agent message transport")
    p.add_argument("--transport_host", default="127.0.0.1", type=str)
    p.add_argument("--transport_port", default=0, type=int,
                   help="cloud TCP port (0 = auto-pick)")
    p.add_argument("--agent_index", default=-1, type=int,
                   help=">=1: run as a single agent worker process "
                        "connecting to the cloud over TCP")
    # multi-host training seam
    p.add_argument("--distributed", default=False, action="store_true",
                   help="call jax.distributed.initialize() before training "
                        "(multi-host; reads JAX coordinator env vars)")
    p.add_argument("--coordinator_address", default="", type=str)
    p.add_argument("--num_processes", default=0, type=int)
    p.add_argument("--process_id", default=-1, type=int)
    # YAML-only trees
    p.add_argument("--dataset", help="yaml tree")
    p.add_argument("--transforms", help="yaml tree")
    p.add_argument("--encoder", help="yaml tree")
    p.add_argument("--decoder", help="yaml tree")
    p.add_argument("--train", help="yaml tree")
    p.add_argument("--loss", help="yaml tree")
    p.add_argument("--slam_system", help="yaml tree")
    # TPU-specific knobs (not in the reference)
    p.add_argument("--tpu", help="yaml tree: shape buckets, mesh, precision")
    return p


#: Default TPU-specific settings, overridable via the `tpu:` yaml tree.
TPU_DEFAULTS = Config(
    # static shape for padded encoder input point sets
    encoder_points=16384,
    # shape buckets for registration map tiles (descriptor token counts)
    reg_buckets=[256, 512, 1024, 2048, 4096],
    # batch bucket sizes for loop-closure candidate scoring
    loop_batch_buckets=[1, 4, 16, 64],
    # bfloat16 matmuls inside the network (accumulate fp32); false forces
    # full-precision fp32 MXU emulation (slower, precision escape hatch)
    bf16=True,
    # neighbor-query grade for the ENCODER's grouping queries: 'exact'
    # (f32 6-pass HIGHEST distances, f32 top-k input) or 'fast' (f32
    # 3-pass HIGH distances + bf16 top-k ranking; TPU only). fast is
    # rank-safe -- ~1e-5 relative distance rounding -- and measured in
    # PARITY.md. (Single-pass bf16 was tried and rejected: input rounding
    # at +-60 m scrambles sub-meter rankings and costs real ATE.)
    neighbor_grade="fast",
    # grade for DISTANCE-STATISTICS consumers: the device filter chain's
    # shared kNN (outlier mean / normal PCA / coherence) and the info-
    # matrix 1-NN correspondence sweep. 'filter' = the fast path with
    # recall 0.9 -- accuracy-neutral for statistics and ~2x cheaper
    # (PARITY.md). Also accepts 'fast' (recall 0.95) or 'exact'.
    filter_grade="filter",
    # serve the encoder's STAGE-1 hybrid grouping from the device filter
    # chain's shared distance sweep (widened top-k candidates) instead of
    # a fresh (npoint0, P) distance pass -- drops the hot path's largest
    # remaining HBM tile. Only takes effect with device_preprocess and
    # querier='hybrid'. Grouping recall then follows filter_grade
    # (default OFF until the on-chip ATE A/B is recorded in PARITY.md).
    sweep_reuse=False,
    # info-matrix source subsampling: 1 = the reference's full G^T G sum;
    # a power-of-2 stride estimates it from every stride-th source point
    # (rescaled — unbiased, ~1-2% relative noise at production sizes) and
    # shrinks the fused step's second-largest N^2 sweep by that factor.
    # Default 4: -13% on the fused odometry step on-chip (16.88 ->
    # 14.69 ms), ATE-neutral in BOTH end-to-end A/Bs (full-size two-lap:
    # identical trajectories; demo two-lap with an optimized loop edge:
    # 0.2094 vs 0.2093 m -- BASELINE.md round 4). Set 1 for the
    # reference-exact full accumulation (oracle tests do).
    infomat_stride=4,
    # data-parallel training width: "auto" = all chips on TPU hardware,
    # or an explicit device count (CPU tests/dryruns pass an int)
    data_parallel="auto",
    # rematerialize encoder activations in the training backward pass
    # (jax.checkpoint): trade ~1/3 more encoder FLOPs for O(stages x P)
    # less HBM -- enable at production shapes / large K
    remat=False,
    # multi-sequence data-parallel inference: number of concurrent SLAM
    # streams, each with an engine pinned to its own chip (capped at the
    # device count). 1 = sequential sequences on the default device.
    sequence_parallel=1,
    # MT odometer: frames in flight on the device before the oldest
    # result is fetched. With the lazy descriptor fetch (round 2) depth 2
    # measures ~10% faster than classic double buffering (26.3 vs 24.0
    # scans/s through the shared tunnel); deeper showed no further gain.
    # Costs one extra frame of candidate staleness vs depth 1.
    odometer_pipeline_depth=2,
    # automatic MT staleness fallback: when platform speed x in-flight
    # frames exceeds staleness_fallback_frac x the adaptive keyframe
    # distance, the odometer serializes against mapping (sequential
    # ordering) until the ratio recovers -- high-speed streams keep
    # sequential-grade accuracy instead of inflating keyframes/ATE
    # frac 0.9 with lag = pipeline depth: the KITTI-like gentle envelope
    # (1.6 m/frame, adaptive kfd 4-8 m, ratio 0.4-0.82) stays below it
    # even at stream start before the keyframe EMA adapts, while harsh
    # streams (3.3 m/frame, ratio >1.0) trip it. (The original 0.5 with
    # lag depth+1 latched ON even for gentle streams.)
    staleness_fallback=True,
    staleness_fallback_frac=0.9,
    # keep non-keyframe full point clouds on the host (reference parity:
    # every ScanPack retains full_pcd). False drops them at vertex
    # insertion -- bounds long-stream pose-graph memory at O(keyframes);
    # only the final map render/save loses non-keyframe density.
    retain_nonkeyframe_pcd=True,
)


def update_args(args: Config, cfg: Mapping) -> Config:
    """Merge a YAML dict into args. YAML wins over CLI values."""
    for key, value in cfg.items():
        if key not in args:
            logger.warning("Unknown parameter in yaml file: %s", key)
        args[key] = value
    return args


def load_config(argv: list[str] | None = None) -> Config:
    """Parse CLI args, merge the YAML file, return a Config."""
    parser = build_parser()
    ns = parser.parse_args(argv)
    args = Config(vars(ns))
    if args.yaml_file:
        with open(args.yaml_file, "r", encoding="utf-8") as f:
            cfg = yaml.safe_load(f)
        args = update_args(args, cfg)
    tpu = Config(TPU_DEFAULTS)
    for k, v in (args.get("tpu") or {}).items():
        tpu[k] = v
    args.tpu = tpu
    return args


def config_from_yaml(yaml_path: str, **overrides) -> Config:
    """Build a Config from a YAML file without CLI parsing (library use)."""
    args = Config(vars(build_parser().parse_args([])))
    with open(yaml_path, "r", encoding="utf-8") as f:
        cfg = yaml.safe_load(f)
    args = update_args(args, cfg)
    for k, v in overrides.items():
        args[k] = v
    tpu = Config(TPU_DEFAULTS)
    for k, v in (args.get("tpu") or {}).items():
        tpu[k] = v
    args.tpu = tpu
    return args


def save_settings(args: Config, path: str) -> None:
    """Snapshot the resolved config (reference: pipeline/infer.py:92-95)."""
    with open(path, "w+", encoding="utf-8") as f:
        for k in sorted(args.keys()):
            f.write(f"{k}: {args[k]}\n")
