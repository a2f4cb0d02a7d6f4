"""Single-agent SLAM inference entry point.

CLI parity with the reference (reference: pipeline/infer.py:35-121):
    python -m deeppointmap_tpu.pipeline.infer --yaml_file cfg.yaml \
        --weight DeepPointMapAAAI.pth
accepts the reference's YAML configs unchanged (yaml overrides CLI) and
writes the same result tree per sequence: settings.yaml snapshot,
trajectory.{allframes,allsteps,keyframes,keysteps}.txt, posegraph g2o,
map render.

A prefetch thread overlaps host-side preprocessing with device compute
(the reference uses torch DataLoader workers, infer.py:98).
"""

from __future__ import annotations

import logging
import os
import time

import numpy as np

from deeppointmap_tpu.config import load_config, save_settings
from deeppointmap_tpu.data.dataset import BasicAgent
from deeppointmap_tpu.data.transforms import PointCloudTransforms
from deeppointmap_tpu.pipeline.common import build_models, infer_padding
from deeppointmap_tpu.slam.engine import InferenceEngine
from deeppointmap_tpu.slam.system import SlamSystem

logger = logging.getLogger("deeppointmap_tpu.infer")


_DEVICE_CHAIN_KEYS = {"VoxelSample", "ToGPU", "ToCPU", "DistanceSample",
                      "OutlierFilter", "LowPassFilter",
                      "CoordinatesNormalization", "ToTensor"}


def device_preprocess_config(args):
    """PreprocessConfig when the yaml transform chain is the standard
    inference chain and device preprocessing is enabled; None -> host
    chain."""
    if not args.tpu.get("device_preprocess", True):
        return None
    if not set(dict(args.transforms)) <= _DEVICE_CHAIN_KEYS:
        return None
    from deeppointmap_tpu.data.preprocess import PreprocessConfig

    sweep_k = 0
    querier = str(args.encoder.get("querier", "hybrid")).lower()
    if (args.tpu.get("sweep_reuse", False)
            and querier in ("hybrid", "hybrid-t3d")):
        # stage-1 group size + self + 8 slack candidates for re-masking
        # filter-dropped points (models/encoder.py:_group_from_sweep)
        sweep_k = int(args.encoder.nsample_list[0][0]) + 9

    return PreprocessConfig.from_transforms(
        dict(args.transforms),
        neighbor_grade=str(args.tpu.get("filter_grade", "filter")),
        sweep_k=sweep_k)


def make_infer_transform(args):
    """Infer-mode preprocessing returning padded fixed-shape arrays.

    Host mode: the full transform chain runs here (~200 ms/scan of
    NumPy/scipy). Device mode (default for the standard chain): only the
    voxel downsample runs on the host; distance/outlier/lowpass/normalize
    run fused on-device inside the extract call (data/preprocess.py), so
    this returns RAW-METER points."""
    pad = infer_padding(args)
    dev_cfg = device_preprocess_config(args)

    if dev_cfg is None:
        tf = PointCloudTransforms(args, mode="infer")

        def run(scan):
            pts, R, T, valid, original = tf(scan)
            if pts.shape[0] != pad:
                padded = np.zeros((pad, 3), np.float32)
                v = np.zeros((pad,), bool)
                n = min(pts.shape[0], pad)
                padded[:n] = pts[:n]
                v[:n] = True
                pts, valid = padded, v
            return pts[None], R, T, valid[None], original

        return run

    from deeppointmap_tpu.data.voxel import voxel_downsample_indices

    vox = dict(args.transforms).get("VoxelSample")

    def run_device(scan):
        original = scan.xyz.copy()
        if vox is not None:
            keep = voxel_downsample_indices(
                scan.xyz, vox["voxel_size"], vox.get("retention", "center"))
            xyz = scan.xyz[keep]
        else:
            xyz = scan.xyz
        padded = np.zeros((pad, 3), np.float32)
        v = np.zeros((pad,), bool)
        n = min(xyz.shape[0], pad)
        padded[:n] = xyz[:n]
        v[:n] = True
        return padded[None], scan.rotation, scan.translation, v[None], original

    return run_device


def prefetch(dataset, n_buffer: int = 8, n_workers: int = 4):
    """Parallel order-preserving prefetch: host preprocessing (~200 ms of
    NumPy/scipy per scan, GIL-released) runs on a thread pool while the
    device computes (the reference uses torch DataLoader workers,
    infer.py:98)."""
    from concurrent.futures import ThreadPoolExecutor

    n = len(dataset)
    with ThreadPoolExecutor(max_workers=n_workers) as pool:
        futures = []
        head = 0
        for i in range(min(n_buffer, n)):
            futures.append(pool.submit(dataset.__getitem__, i))
        next_submit = len(futures)
        while head < n:
            item = futures[head].result()
            futures[head] = None  # free memory
            head += 1
            if next_submit < n:
                futures.append(pool.submit(dataset.__getitem__, next_submit))
                next_submit += 1
            yield item


def run_sequence(args, engine, seq_root: str, out_dir: str,
                 system_id: int = 1) -> SlamSystem:
    os.makedirs(out_dir, exist_ok=True)
    # scan tokens restart at (system_id << 16) every sequence: stale
    # token-keyed device-cache entries from a previous sequence on this
    # engine would otherwise collide (same token, same shapes, wrong data)
    engine.invalidate_device_cache()
    agent = BasicAgent(root=seq_root, reader="auto")
    agent.set_independent(make_infer_transform(args))
    system = SlamSystem(args, engine, system_id=system_id,
                        logger_dir=out_dir)

    if args.multi_thread:
        system.warmup(agent[0])
        system.MT_Init()
        for data in prefetch(agent):
            system.MT_Step(data)
        system.MT_Done()
        system.MT_Wait()
    else:
        t0 = time.perf_counter()
        for i, data in enumerate(prefetch(agent)):
            code = system.step(data)
            if (i + 1) % 50 == 0:
                stats = ", ".join(
                    f"{k}:{v[0] * 1000:.1f}ms"
                    for k, v in system.result_logger.log_time(50).items())
                logger.info("frame %d [%s] %s", i, code.name, stats)
        dt = time.perf_counter() - t0
        n = len(agent)
        logger.info("sequence done: %d frames in %.1fs = %.2f scans/s",
                    n, dt, n / max(dt, 1e-9))

    system.result_logger.save_trajectory("trajectory")
    system.result_logger.save_posegraph("trajectory")
    try:
        system.result_logger.draw_trajectory("trajectory", draft=False)
    except Exception as e:  # rendering must never kill a finished run
        logger.warning("map render failed: %s", e)
    return system


def main(argv=None):
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(name)s %(levelname)s %(message)s")
    args = load_config(argv)
    args.mode = "infer"

    engine_models = build_models(args, args.weight)

    os.makedirs(args.infer_tgt, exist_ok=True)
    save_settings(args, os.path.join(args.infer_tgt, "settings.yaml"))

    from deeppointmap_tpu.utils.timer import device_trace

    seqs = []
    for i, s in enumerate(args.infer_src):
        if os.path.isdir(s):
            seqs.append((i, s))
        else:
            logger.warning("skip missing sequence dir: %s", s)

    sp = int((args.get("tpu") or {}).get("sequence_parallel", 1) or 1)
    profile_dir = (os.path.join(args.infer_tgt, "profile")
                   if args.get("profile") else None)
    with device_trace(profile_dir):
        if sp > 1 and len(seqs) > 1:
            run_sequences_parallel(args, engine_models, seqs, sp)
        else:
            # built lazily: the sequence-parallel path pins one engine
            # per chip itself, and an abandoned engine here would hold a
            # dead param copy on device 0
            enc, dec, enc_params, dec_params = engine_models
            engine = InferenceEngine(
                args, enc_params, dec_params, encoder=enc, decoder=dec,
                preprocess_cfg=device_preprocess_config(args))
            for i, seq in seqs:
                out_dir = os.path.join(args.infer_tgt, f"Seq{i:02d}")
                logger.info("=== sequence %d: %s -> %s", i, seq, out_dir)
                run_sequence(args, engine, seq, out_dir, system_id=1)


def run_sequences_parallel(args, engine_models, seqs, n_streams: int):
    """Multi-sequence data-parallel inference: one engine pinned to each
    chip, independent SLAM streams running concurrently (the inference
    analog of data-parallel training -- fills a v5e-8 with 8 sequences).
    tpu.sequence_parallel caps the stream count at the device count."""
    import jax
    from concurrent.futures import ThreadPoolExecutor

    enc, dec, enc_params, dec_params = engine_models
    devices = jax.devices()
    n = min(n_streams, len(devices))
    engines = [InferenceEngine(args, enc_params, dec_params, encoder=enc,
                               decoder=dec,
                               preprocess_cfg=device_preprocess_config(args),
                               device=devices[k])
               for k in range(n)]
    logger.info("sequence-parallel: %d streams over %d devices",
                n, len(devices))

    # partition sequences per engine: an engine's token-keyed device
    # cache must never serve two concurrent streams (token collision)
    parts = [seqs[k::n] for k in range(n)]

    def worker(k):
        for i, seq in parts[k]:
            out_dir = os.path.join(args.infer_tgt, f"Seq{i:02d}")
            logger.info("=== sequence %d: %s -> %s (device %d)", i, seq,
                        out_dir, k)
            run_sequence(args, engines[k], seq, out_dir, system_id=1)

    with ThreadPoolExecutor(max_workers=n) as pool:
        list(pool.map(worker, range(n)))


if __name__ == "__main__":
    main()
