"""Mesh-sharded batch descriptor extraction.

Data-parallel twin of `slam/engine.py:extract` for throughput-bound
offline work -- building loop-closure descriptor databases, re-extracting
a whole sequence after a model update, or serving multi-agent extraction
from one multi-chip host. The per-scan pipeline (optional fused
preprocessing + encoder + coor_scale concat, reference:
system/modules/odometry.py:36-54) is jitted once with the batch axis
sharded over a 1-D device mesh; XLA partitions every op batch-wise so no
collectives are needed until results are gathered.

Online SLAM stays single-chip (one scan at a time cannot use a mesh);
this path is for the embarrassingly parallel batch case.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from deeppointmap_tpu.parallel.mesh import batch_sharding, replicated


def make_sharded_extract(encoder, enc_params, mesh: Mesh,
                         coor_scale: float,
                         preprocess_cfg=None,
                         axis_name: str = "dp"):
    """Build `extract(points (B, P, 3), valid (B, P)) -> (desc, desc_valid,
    pts_valid)` with B sharded over `mesh`.

    B must be a multiple of the mesh size (pad with invalid scans
    otherwise). Returns host NumPy arrays.
    """
    bs = batch_sharding(mesh, axis_name)
    rep = replicated(mesh)
    params = jax.device_put(enc_params, rep)

    def _impl(points, valid):
        sweep = None
        if preprocess_cfg is not None:
            from deeppointmap_tpu.data.preprocess import preprocess

            out = jax.vmap(
                lambda p, v: preprocess(p, v, preprocess_cfg))(points, valid)
            if preprocess_cfg.sweep_k > 0:
                points, valid, sweep = out
            else:
                points, valid = out
        coor, fea, out_valid = encoder.apply(params, points, valid,
                                             sweep=sweep)
        desc = jnp.concatenate([fea, coor * coor_scale], axis=-1)
        return desc, out_valid, valid

    fn = jax.jit(_impl, in_shardings=(bs, bs), out_shardings=(bs, bs, bs))

    def extract(points: np.ndarray, valid: np.ndarray):
        n = mesh.devices.size
        assert points.shape[0] % n == 0, (
            f"batch {points.shape[0]} not divisible by mesh size {n}; "
            "pad with invalid scans")
        out = fn(jnp.asarray(points), jnp.asarray(valid))
        return tuple(np.asarray(o) for o in jax.device_get(out))

    return extract


def extract_sequence(encoder, enc_params, mesh: Mesh, coor_scale: float,
                     scans, valids, preprocess_cfg=None,
                     batch_per_device: int = 1):
    """Extract descriptors for a whole sequence of padded scans.

    scans (N, P, 3) / valids (N, P) NumPy; processes in mesh-sized
    batches, padding the tail with invalid scans. Returns
    (desc (N, K, C+3), desc_valid (N, K), pts_valid (N, P))."""
    n_dev = mesh.devices.size
    step = n_dev * batch_per_device
    extract = make_sharded_extract(encoder, enc_params, mesh, coor_scale,
                                   preprocess_cfg)
    n = scans.shape[0]
    descs, dvs, pvs = [], [], []
    for start in range(0, n, step):
        pc = scans[start:start + step]
        va = valids[start:start + step]
        nb = pc.shape[0]
        if nb < step:
            pc = np.concatenate(
                [pc, np.zeros((step - nb, *pc.shape[1:]), pc.dtype)], 0)
            va = np.concatenate(
                [va, np.zeros((step - nb, va.shape[1]), bool)], 0)
        d, dv, pv = extract(pc, va)
        descs.append(d[:nb])
        dvs.append(dv[:nb])
        pvs.append(pv[:nb])
    return (np.concatenate(descs, 0), np.concatenate(dvs, 0),
            np.concatenate(pvs, 0))
