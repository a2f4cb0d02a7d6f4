"""Inference engine: the host<->device boundary of the SLAM system.

Wraps the three network entry points (descriptor extraction, pairwise
registration, loop scoring) plus the information-matrix op as jit-compiled
fixed-shape functions with **shape buckets**: variable-size inputs (map
tiles, candidate batches) are padded up to a small set of static sizes so
each shape compiles exactly once (the TPU-native equivalent of the
reference's dynamic shapes -- see SURVEY.md section 5 long-context notes).

The reference reaches these entry points at system/modules/odometry.py:39
(encoder), odometry.py:108 / mapping.py:152 / loop_closure.py:240
(registration_forward), loop_closure.py:171 (loop_detection_forward),
and system/modules/utils.py:60 (information matrix).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

import logging

from deeppointmap_tpu.models import Decoder, Encoder
from deeppointmap_tpu.models.decoder import num_pairs_for
from deeppointmap_tpu.ops.infomat import information_matrix

logger = logging.getLogger(__name__)


DEFAULT_REG_BUCKETS = (256, 512, 1024, 2048, 4096)
DEFAULT_BATCH_BUCKETS = (1, 4, 16, 64)
#: member-count buckets for device-assembled map tiles (the reference
#: bounds tiles to <=16 keyframes via graph level 5 + 20 m radius)
DEFAULT_TILE_MEMBER_BUCKETS = (4, 8, 16)
#: extraction batches larger than this are split into chunks of exactly
#: this size -- every XLA program shape is expensive to compile on this
#: toolchain, so extraction uses only two shapes: 1 and EXTRACT_CHUNK
DEFAULT_EXTRACT_CHUNK = 4
#: candidate-count buckets for batched multi-candidate registration
#: (odometer_candidates_num and per-anchor loop registration; the
#: reference caps odometry candidates at 5, loop sources at ~3)
DEFAULT_CAND_BUCKETS = (2, 4, 8)


def _bucket(n: int, buckets) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


class InferenceEngine:
    """Owns model params and compiled functions. NumPy in, NumPy out."""

    def __init__(self, args, enc_params, dec_params,
                 encoder: Optional[Encoder] = None,
                 decoder: Optional[Decoder] = None,
                 preprocess_cfg=None, device=None):
        from deeppointmap_tpu.utils.compilation_cache import \
            enable_compilation_cache

        from deeppointmap_tpu.utils.precision import apply_matmul_precision

        enable_compilation_cache()
        apply_matmul_precision(args.get("tpu"))
        self.args = args
        #: pin this engine to one chip (multi-sequence data-parallel
        #: inference: one independent SLAM stream per device). None =
        #: the default device.
        self.device = device
        #: when set, extract/odometry take RAW-METER padded points and the
        #: filter chain (distance/outlier/lowpass/normalize) runs fused
        #: on-device (data/preprocess.py); when None, inputs are already
        #: host-preprocessed normalized points
        self.preprocess_cfg = preprocess_cfg
        self.coor_scale = float(args.slam_system.coor_scale)
        tpu = args.get("tpu") or {}
        self.reg_buckets = tuple(tpu.get("reg_buckets", DEFAULT_REG_BUCKETS))
        self.batch_buckets = tuple(
            tpu.get("loop_batch_buckets", DEFAULT_BATCH_BUCKETS))
        self.cand_buckets = tuple(
            tpu.get("cand_buckets", DEFAULT_CAND_BUCKETS))
        self.extract_chunk = int(tpu.get("extract_chunk",
                                         DEFAULT_EXTRACT_CHUNK))
        # int16 fixed-point scan upload: the per-frame (P, 3) fp32 cloud +
        # bool mask cost ~208 KB of host->device traffic (~11 ms on this
        # link); int16 with a sentinel-coded validity column is 96 KB.
        # LSB = 2 mm in meters (raw mode) or its /coor_scale equivalent
        # (normalized mode) -- below LiDAR noise and the 0.3 m voxel grid.
        # Range is +-65.5 m: raw points beyond it CLIP, which is safe
        # because they land outside the <=60 m distance crop and are
        # filtered exactly like their true positions would be. The
        # measured trajectory cost is recorded in PARITY.md.
        self.upload_quant = str(tpu.get("upload_quant", "int16"))
        lsb = float(tpu.get("upload_quant_lsb", 0.002))
        self.quant_scale = lsb if preprocess_cfg is not None \
            else lsb / self.coor_scale
        if self.upload_quant == "int16":
            # int16 CLIPS at +-32767 * lsb (~65.5 m at the default 2 mm).
            # Clipping is only safe when the distance crop removes every
            # clipped point (its clipped norm still exceeds max_dis);
            # otherwise far points would survive at corrupted positions.
            qmax = 32767.0 * lsb
            t = dict(args.get("transforms") or {})
            max_dis = float(t.get("DistanceSample", {}).get("max_dis",
                                                            float("inf")))
            if max_dis > qmax:
                logger.warning(
                    "int16 upload disabled: DistanceSample.max_dis=%s "
                    "exceeds the +-%.1f m quantization range (raise "
                    "tpu.upload_quant_lsb or add a distance crop)",
                    max_dis, qmax)
                self.upload_quant = "none"
        self.tile_member_buckets = tuple(
            tpu.get("tile_member_buckets", DEFAULT_TILE_MEMBER_BUCKETS))
        #: grade for the info-matrix 1-NN correspondence sweep (a
        #: distance statistic; the encoder's separate tpu.neighbor_grade
        #: knob is read by Encoder.from_config)
        self.filter_grade = str(tpu.get("filter_grade", "filter"))
        #: info-matrix source subsampling (1 = reference-exact full sum;
        #: power-of-2 strides estimate G^T G from every stride-th point,
        #: ops/infomat.py). The EFFECTIVE default comes from
        #: TPU_DEFAULTS (stride=4 since the round-4 ATE-neutral A/Bs,
        #: -13% on the fused odometry step); the local fallback below is
        #: the reference-exact stride=1 and only applies when a bare tpu
        #: dict bypasses config.TPU_DEFAULTS.
        self.infomat_stride = int(tpu.get("infomat_stride", 1))
        self.encoder = encoder or Encoder.from_config(args)
        self.decoder = decoder or Decoder.from_config(args)
        if device is not None:
            enc_params = jax.device_put(enc_params, device)
            dec_params = jax.device_put(dec_params, device)
        self.enc_params = enc_params
        self.dec_params = dec_params

        self._extract_fn = jax.jit(self._extract_impl)
        self._register_fn = jax.jit(self._register_impl,
                                    static_argnames=("num_pairs",))
        self._loop_fn = jax.jit(self._loop_impl)
        self._info_fn = jax.jit(self._info_impl)
        self._odometry_fn = jax.jit(self._odometry_impl,
                                    static_argnames=("num_pairs",))
        self._reg_info_fn = jax.jit(self._register_info_impl,
                                    static_argnames=("num_pairs",))
        self._tile_reg_fn = jax.jit(self._tile_reg_info_impl,
                                    static_argnames=("num_pairs",))
        self._tile_tile_reg_fn = jax.jit(self._tile_tile_reg_info_impl,
                                         static_argnames=("num_pairs",))
        self._reg_info_multi_fn = jax.jit(self._register_info_batch_impl,
                                          static_argnames=("num_pairs",))
        self._loop_members_fn = jax.jit(self._loop_members_impl)
        # encoder output token count: coords of the FP target level
        e = args.encoder
        self.n_tokens = int(e.npoint[len(e.npoint) - 1 - e.upsample_layers])
        # device-resident cache of per-scan arrays: uploading a 16k-point
        # cloud through this machine's TPU link costs tens of ms, and the
        # SLAM loop reuses the same candidate/keyframe arrays many times.
        # The cache is shared by the MT odometer/mapping/backend threads
        # and, in multi-agent mode, by all agent threads + the cloud, so
        # every get->move/insert->evict sequence runs under one lock.
        import threading
        from collections import OrderedDict
        self._dcache: "OrderedDict" = OrderedDict()
        # byte-budgeted LRU (yaml `tpu.device_cache_mb`): an entry-count
        # cap is the wrong unit when the same cache holds ~134 KB
        # descriptors and ~256 KB point clouds -- and it silently
        # capsizes on long streams: once keyframes outnumber the cap,
        # EVERY loop-scoring event re-materializes + re-uploads hundreds
        # of candidate descriptors through the tunnel (measured 1-2 s
        # per event and unbounded host-buffer growth at 289 keyframes,
        # scripts/scale_run.py). 512 MB holds ~4000 keyframes' loop set.
        self._dcache_budget = int(
            float(tpu.get("device_cache_mb", 512)) * 2 ** 20)
        self._dcache_bytes = 0
        self._dcache_lock = threading.Lock()

    def _dev(self, arr, key=None):
        """Device placement with a thread-safe LRU cache for token-keyed
        arrays."""
        if key is None:
            return self._put(arr)
        with self._dcache_lock:
            hit = self._dcache.get(key)
            if hit is not None and hit.shape == arr.shape:
                self._dcache.move_to_end(key)
                return hit
        dev = self._put(arr)  # upload outside the lock (slow tunnel IO)
        self._dcache_put(key, dev)
        return dev

    @staticmethod
    def _dev_nbytes(dev) -> int:
        try:
            return int(dev.nbytes)
        except (AttributeError, TypeError):
            return 0

    def invalidate_device_cache(self, token=None) -> None:
        with self._dcache_lock:
            if token is None:
                self._dcache.clear()
                self._dcache_bytes = 0
            else:
                for k in [k for k in self._dcache if k[0] == token]:
                    self._dcache_bytes -= self._dev_nbytes(self._dcache[k])
                    del self._dcache[k]

    def _put(self, x, dtype=None):
        """Input placement: jnp.asarray on the default device, or a
        committed transfer to this engine's pinned device."""
        if dtype is not None:
            x = jnp.asarray(x, dtype)
        if self.device is None:
            return jnp.asarray(x)
        return jax.device_put(x, self.device)

    # ----------------------------------------------------- quantized upload
    _QUANT_SENTINEL = -32768

    def encode_points(self, points: np.ndarray, valid: np.ndarray
                      ) -> np.ndarray:
        """fp32 points + validity -> int16 fixed-point with sentinel-coded
        invalid rows (halves the per-frame host->device bytes)."""
        q = np.clip(np.round(np.asarray(points, np.float32)
                             / self.quant_scale), -32767, 32767)
        q = q.astype(np.int16)
        q[~np.asarray(valid, bool)] = np.int16(self._QUANT_SENTINEL)
        return q

    def _dequant_input(self, points, valid):
        """Trace-time input adapter: int16 uploads decode to fp32 +
        derived validity; fp32 passes through."""
        if points.dtype == jnp.int16:
            v = points[..., 0] != jnp.int16(self._QUANT_SENTINEL)
            pts = points.astype(jnp.float32) * jnp.float32(self.quant_scale)
            return pts, (v if valid is None else v & valid)
        if valid is None:
            valid = jnp.ones(points.shape[:-1], bool)
        return points, valid

    def _encode_host(self, points, valid):
        """Host-side upload prep: returns (array_to_upload, valid_arg)."""
        if (self.upload_quant == "int16"
                and isinstance(points, np.ndarray)
                and points.dtype != np.int16):
            return self.encode_points(points, valid), None
        if isinstance(points, np.ndarray):
            return points, (None if valid is None else np.asarray(valid))
        return points, valid  # already a device array (pre-uploaded)

    # ------------------------------------------------------------ extract
    def _maybe_preprocess(self, points, valid):
        """Fused device-side filter chain (no-op when host-preprocessed).
        Returns (normalized points, filtered validity, sweep-or-None);
        sweep is the widened neighbor-candidate graph when the config
        asked for stage-1 grouping reuse (preprocess_cfg.sweep_k > 0)."""
        if self.preprocess_cfg is None:
            return points, valid, None
        from deeppointmap_tpu.data.preprocess import preprocess

        out = jax.vmap(
            lambda p, v: preprocess(p, v, self.preprocess_cfg))(points, valid)
        if self.preprocess_cfg.sweep_k > 0:
            return out
        return out[0], out[1], None

    def _extract_impl(self, points, valid):
        points, valid = self._dequant_input(points, valid)
        pts_n, pts_valid, sweep = self._maybe_preprocess(points, valid)
        coor, fea, out_valid = self.encoder.apply(self.enc_params,
                                                  pts_n, pts_valid,
                                                  sweep=sweep)
        # descriptor = [features, xyz * coor_scale] (meters)
        # (reference: system/modules/odometry.py:47-49)
        desc = jnp.concatenate([fea, coor * self.coor_scale], axis=-1)
        return desc, out_valid, pts_valid

    def extract(self, points: np.ndarray, valid: np.ndarray):
        """points (B, P, 3) -> (descriptors (B, K, C+3) with xyz in
        meters, descriptor validity (B, K), filtered point validity
        (B, P)). Input coords are normalized, or raw meters when device
        preprocessing is enabled.

        Shape discipline: exactly TWO compiled shapes (B=1 and
        B=extract_chunk); larger batches are split into chunks (each
        program shape costs minutes of compilation on this toolchain)."""
        b = points.shape[0]
        if b == 1:
            pts_up, valid_up = self._encode_host(points, valid)
            out = self._extract_fn(
                self._put(pts_up),
                None if valid_up is None else self._put(valid_up))
            return jax.device_get(out)

        chunk = self.extract_chunk
        pending = []  # dispatch ALL chunks async, then ONE batched fetch:
        # each separately-awaited fetch pays a full host<->device round
        # trip, which dominates at tunnel latencies
        for start in range(0, b, chunk):
            pc = points[start:start + chunk]
            vc = valid[start:start + chunk]
            nb = pc.shape[0]
            if nb < chunk:
                pc = np.concatenate(
                    [pc, np.zeros((chunk - nb, *pc.shape[1:]), pc.dtype)], 0)
                vc = np.concatenate(
                    [vc, np.zeros((chunk - nb, vc.shape[1]), bool)], 0)
            pc_up, vc_up = self._encode_host(pc, vc)
            pending.append(
                (nb, self._extract_fn(
                    self._put(pc_up),
                    None if vc_up is None else self._put(vc_up))))
        fetched = jax.device_get([out for _, out in pending])
        descs, ovs, pvs = [], [], []
        for (nb, _), (d, ov, pv) in zip(pending, fetched):
            descs.append(d[:nb])
            ovs.append(ov[:nb])
            pvs.append(pv[:nb])
        return (np.concatenate(descs, 0), np.concatenate(ovs, 0),
                np.concatenate(pvs, 0))

    # --------------------------------------------------------- register
    def _register_impl(self, src, dst, sv, dv, num_pairs, num_pairs_actual):
        return self.decoder.apply(self.dec_params, src, dst, sv, dv,
                                  num_pairs, num_pairs_actual,
                                  method=Decoder.registration)

    def _pad_tokens(self, desc: np.ndarray, valid: np.ndarray):
        n = desc.shape[0]
        b = _bucket(n, self.reg_buckets)
        if n > b:
            # oversized tile: keep the tokens nearest the tile center
            # (tiles are centered on the query pose; reference tiles are
            # bounded to <= 16 keyframes x 256 by graph_search max_k)
            d = np.linalg.norm(desc[:, -3:], axis=1)
            d[~valid] = np.inf
            keep = np.argsort(d)[:b]
            return desc[keep], valid[keep], b
        if n < b:
            desc = np.concatenate(
                [desc, np.zeros((b - n, desc.shape[1]), desc.dtype)], 0)
            valid = np.concatenate([valid, np.zeros(b - n, bool)], 0)
        return desc, valid, b

    def register(self, src_desc, src_valid, dst_desc, dst_valid,
                 num_sample=0.5):
        """-> (SE3 (4,4) float64 with dst = SE3 @ src, confidence, rmse).

        Matches Decoder.registration_forward semantics: solves
        dst ~= R @ src + t over offset-corrected top-k pairs
        (reference: decoder.py:91-127)."""
        m_real = int(src_valid.sum())
        n_real = int(dst_valid.sum())
        src, sv, mb = self._pad_tokens(src_desc, src_valid)
        dst, dv, nb = self._pad_tokens(dst_desc, dst_valid)
        k_static = num_pairs_for(mb, nb, num_sample)
        k_actual = num_pairs_for(min(m_real, mb), min(n_real, nb), num_sample)
        R, t, conf, rmse, n_in = jax.device_get(self._register_fn(
            self._put(src), self._put(dst), self._put(sv),
            self._put(dv), num_pairs=k_static,
            num_pairs_actual=jnp.int32(k_actual)))
        SE3 = np.eye(4)
        SE3[:3, :3] = np.asarray(R, np.float64)
        SE3[:3, 3] = np.asarray(t, np.float64)
        return SE3, float(conf), float(rmse)

    # --------------------------------------- fused register + info matrix
    def _register_info_impl(self, src, dst, sv, dv, src_pcd, spv, dst_pcd,
                            dpv, num_pairs, num_pairs_actual):
        R, t, conf, rmse, n_in = self.decoder.apply(
            self.dec_params, src, dst, sv, dv, num_pairs, num_pairs_actual,
            method=Decoder.registration)
        info = information_matrix(src_pcd, spv, dst_pcd, dpv, R, t,
                                  grade=self.filter_grade,
                                  stride=self.infomat_stride)
        return R, t, conf, rmse, info

    def register_with_info_async(self, src_desc, src_valid, dst_desc,
                                 dst_valid, src_pcd, src_pvalid, dst_pcd,
                                 dst_pvalid, num_sample=0.5, src_token=None,
                                 dst_token=None):
        """Dispatch registration + info matrix WITHOUT waiting; returns a
        zero-arg resolver that fetches and formats the result. Dispatch and
        fetch each cost a full tunnel round-trip (~22/34 ms), so a caller
        processing a stream should dispatch item i+1 before resolving
        item i."""
        m_real = int(src_valid.sum())
        n_real = int(dst_valid.sum())
        src, sv, mb = self._pad_tokens(src_desc, src_valid)
        dst, dv, nb = self._pad_tokens(dst_desc, dst_valid)
        k_static = num_pairs_for(mb, nb, num_sample)
        k_actual = num_pairs_for(min(m_real, mb), min(n_real, nb), num_sample)
        skey = lambda name: (src_token, name) if src_token is not None else None
        dkey = lambda name: (dst_token, name) if dst_token is not None else None
        out = self._reg_info_fn(
            self._put(src), self._put(dst), self._put(sv),
            self._put(dv),
            self._dev(src_pcd, skey("pcd")), self._dev(src_pvalid, skey("pv")),
            self._dev(dst_pcd, dkey("pcd")), self._dev(dst_pvalid, dkey("pv")),
            num_pairs=k_static, num_pairs_actual=jnp.int32(k_actual))
        return self._se3_resolver(out)

    def _register_info_batch_impl(self, srcs_tup, svs_tup, spcds_tup,
                                  spvs_tup, dst, dv, dst_pcd, dpv,
                                  num_pairs, num_pairs_actual):
        """K candidates vs ONE new scan in a single program: vmapped
        register+info over the candidate axis. Candidate arrays arrive
        as tuples of per-token device refs (the token cache) and stack
        INSIDE the jit, so a batch never re-uploads cached scans."""
        src = jnp.stack(srcs_tup)
        sv = jnp.stack(svs_tup)
        sp = jnp.stack(spcds_tup)
        spv = jnp.stack(spvs_tup)
        fn = lambda s, v, p, pv, ka: self._register_info_impl(
            s, dst, v, dv, p, pv, dst_pcd, dpv, num_pairs, ka)
        return jax.vmap(fn)(src, sv, sp, spv, num_pairs_actual)

    def register_with_info_multi_async(self, cands, dst_desc, dst_valid,
                                       dst_pcd, dst_pvalid, num_sample=0.5,
                                       dst_token=None):
        """Batched multi-candidate registration: ONE bucketed device call
        for all candidates instead of one dispatch+fetch pair each (the
        reference batches its loop scoring the same way,
        loop_closure.py:166-174; per-candidate register programs run at
        ~2.8% MFU, so batching K candidates is nearly free device time
        while saving K-1 tunnel round-trips).

        cands: list of (desc, kvalid, pcd, pvalid, token) where desc/pcd/
        pvalid may be zero-arg callables (lazy device thunks). The
        candidate COUNT is padded up to a compile bucket by repeating the
        first candidate; padded results are never surfaced. Returns one
        zero-arg resolver per REAL candidate, all backed by one program.
        """
        assert cands, "register_with_info_multi_async with no candidates"
        k_real = len(cands)
        kb = _bucket(k_real, self.cand_buckets)
        cands = list(cands) + [cands[0]] * (kb - k_real)

        srcs, svs, sps, spvs, k_actuals = [], [], [], [], []
        mb_all = None
        for desc, kvalid, pcd, pvalid, token in cands:
            hit = self._dcache_probe(token, ("kp_pad", "kv_pad", "pcd",
                                             "pv"))
            if hit is not None:
                kp, kv, pc, pv = hit
                mb = kp.shape[0]
            else:
                kvalid = np.asarray(kvalid)
                src, sv, mb = self._pad_tokens(self._materialize(desc),
                                               kvalid)
                tk = lambda name: (token, name) if token is not None \
                    else None
                kp = self._dev(src, tk("kp_pad"))
                kv = self._dev(sv, tk("kv_pad"))
                pc = self._dev(self._materialize(pcd), tk("pcd"))
                pv = self._dev(self._materialize(pvalid), tk("pv"))
            assert mb_all is None or mb == mb_all, (
                "candidate token buckets diverge within one batch "
                f"({mb} vs {mb_all}); keyframe descriptor sets share "
                "one bucket by construction")
            mb_all = mb
            srcs.append(kp)
            svs.append(kv)
            sps.append(pc)
            spvs.append(pv)
            k_actuals.append(int(np.asarray(kvalid).sum()))

        n_real = int(np.asarray(dst_valid).sum())
        dstp, dvp, nb = self._pad_tokens(self._materialize(dst_desc),
                                         np.asarray(dst_valid))
        dk = lambda name: (dst_token, name) if dst_token is not None \
            else None
        k_static = num_pairs_for(mb_all, nb, num_sample)
        k_act = np.asarray(
            [num_pairs_for(min(m, mb_all), min(n_real, nb), num_sample)
             for m in k_actuals], np.int32)
        out = self._reg_info_multi_fn(
            tuple(srcs), tuple(svs), tuple(sps), tuple(spvs),
            self._put(dstp), self._put(dvp),
            self._dev(self._materialize(dst_pcd), dk("pcd")),
            self._dev(self._materialize(dst_pvalid), dk("pv")),
            num_pairs=k_static, num_pairs_actual=self._put(k_act))
        self._prefetch(*out)

        def resolver(i):
            def resolve():
                R, t, conf, rmse, info = jax.device_get(
                    jax.tree.map(lambda a: a[i], out))
                SE3 = np.eye(4)
                SE3[:3, :3] = np.asarray(R, np.float64)
                SE3[:3, 3] = np.asarray(t, np.float64)
                return SE3, float(conf), float(rmse), np.asarray(
                    info, np.float64)
            return resolve

        return [resolver(i) for i in range(k_real)]

    def register_with_info(self, src_desc, src_valid, dst_desc, dst_valid,
                           src_pcd, src_pvalid, dst_pcd, dst_pvalid,
                           num_sample=0.5, src_token=None, dst_token=None):
        """Registration + 6x6 information matrix in one device call
        (used by odometry/mapping/loop edges -- the reference computes
        them back-to-back at odometry.py:108-115, mapping.py:152-159,
        loop_closure.py:240-247). Pass src_token/dst_token to reuse
        device-cached per-scan point clouds."""
        return self.register_with_info_async(
            src_desc, src_valid, dst_desc, dst_valid, src_pcd, src_pvalid,
            dst_pcd, dst_pvalid, num_sample, src_token, dst_token)()

    # ---------------------------------------- device-assembled map tiles
    def _tile(self, descs_tup, kvs_tup, poses, mvalid):
        """(K,C) x S member descriptors (device refs) + relative poses
        (S,4,4) -> tile (S*K, C+3), tile validity (S*K,). Runs INSIDE the
        jit: the host uploads only the poses; member descriptors come
        from the token-keyed device cache."""
        d = jnp.stack(descs_tup)                       # (S, K, C)
        kv = jnp.stack(kvs_tup)                        # (S, K)
        R = poses[:, :3, :3]
        t = poses[:, :3, 3]
        xyz = d[..., -3:]
        moved = jnp.einsum("sij,skj->ski", R, xyz) + t[:, None, :]
        tile = jnp.concatenate([d[..., :-3], moved], axis=-1)
        s, k, c = tile.shape
        return (tile.reshape(s * k, c),
                (kv & mvalid[:, None]).reshape(s * k))

    def _tile_reg_info_impl(self, descs_tup, kvs_tup, poses, mvalid,
                            dst_desc, dst_kv, src_pcd, spv, dst_pcd, dpv,
                            num_pairs, num_pairs_actual):
        """Scan-to-map: tile assembly + registration + info matrix fused
        into one program (reference: mapping.py:136-170)."""
        tile, tvalid = self._tile(descs_tup, kvs_tup, poses, mvalid)
        R, t, conf, rmse, n_in = self.decoder.apply(
            self.dec_params, tile, dst_desc, tvalid, dst_kv,
            num_pairs, num_pairs_actual, method=Decoder.registration)
        info = information_matrix(src_pcd, spv, dst_pcd, dpv, R, t,
                                  grade=self.filter_grade,
                                  stride=self.infomat_stride)
        return R, t, conf, rmse, info

    def _tile_tile_reg_info_impl(self, s_descs, s_kvs, s_poses, s_mvalid,
                                 d_descs, d_kvs, d_poses, d_mvalid,
                                 src_pcd, spv, dst_pcd, dpv,
                                 num_pairs, num_pairs_actual):
        """Map-to-map (loop registration, reference: loop_closure.py:
        185-258): both tiles assembled on device."""
        s_tile, s_valid = self._tile(s_descs, s_kvs, s_poses, s_mvalid)
        d_tile, d_valid = self._tile(d_descs, d_kvs, d_poses, d_mvalid)
        R, t, conf, rmse, n_in = self.decoder.apply(
            self.dec_params, s_tile, d_tile, s_valid, d_valid,
            num_pairs, num_pairs_actual, method=Decoder.registration)
        info = information_matrix(src_pcd, spv, dst_pcd, dpv, R, t,
                                  grade=self.filter_grade,
                                  stride=self.infomat_stride)
        return R, t, conf, rmse, info

    def _members_dev(self, members):
        """members: [(token, key_points_ref, key_valid)] -> (desc device
        refs, kv device refs, total real valid tokens). Cache hits cost no
        upload; misses materialize + upload + cache."""
        descs, kvs, m_real = [], [], 0
        for token, kp_ref, kv in members:
            hit = self._dcache_probe(token, ("kp_pad", "kv_pad"))
            if hit is None:
                kp = self._materialize(kp_ref)
                d = self._dev(kp, (token, "kp_pad"))
                v = self._dev(np.asarray(kv, bool), (token, "kv_pad"))
            else:
                d, v = hit
            assert d.shape[0] == self.n_tokens, d.shape
            descs.append(d)
            kvs.append(v)
            m_real += int(np.asarray(kv).sum())
        return descs, kvs, m_real

    def _pad_members(self, members, centering_SE3):
        """Bucket the member list; oversize keeps the members nearest the
        tile center (the old host path cropped oversize tiles the same
        way). Returns (members, rel poses (S,4,4) f32, mvalid (S,))."""
        inv_c = np.linalg.inv(np.asarray(centering_SE3, np.float64))
        if len(members) > self.tile_member_buckets[-1]:
            c_t = np.asarray(centering_SE3, np.float64)[:3, 3]
            members = sorted(
                members,
                key=lambda m: np.linalg.norm(m[3][:3, 3] - c_t)
            )[:self.tile_member_buckets[-1]]
        s = _bucket(len(members), self.tile_member_buckets)
        poses = np.tile(np.eye(4, dtype=np.float32), (s, 1, 1))
        mvalid = np.zeros((s,), bool)
        for i, m in enumerate(members):
            poses[i] = (inv_c @ np.asarray(m[3], np.float64)
                        ).astype(np.float32)
            mvalid[i] = True
        padded = list(members) + [members[0]] * (s - len(members))
        return padded, poses, mvalid

    def register_scan_to_map_with_info_async(
            self, members, centering_SE3, dst_desc_ref, dst_kvalid,
            src_pcd_ref, src_pvalid_ref, dst_pcd_ref, dst_pvalid_ref,
            num_sample=0.5, src_token=None, dst_token=None):
        """Scan-to-map registration with the map tile assembled ON DEVICE.

        members: [(token, key_points_ref, key_valid, SE3_pred)] keyframes
        of the local map (key_points_ref may be an un-materialized device
        thunk). The host uploads only the (S,4,4) relative poses; a tile
        that used to cost a ~2 MB host->device transfer per keyframe event
        now costs ~1 KB when the members are device-cached.

        Returns a zero-arg resolver -> (SE3, conf, rmse, info)."""
        padded, poses, mvalid = self._pad_members(members, centering_SE3)
        descs, kvs, m_real = self._members_dev(
            [(m[0], m[1], m[2]) for m in padded[:len(members)]])
        descs += [descs[0]] * (len(padded) - len(members))
        kvs += [kvs[0]] * (len(padded) - len(members))

        dhit = self._dcache_probe(dst_token, ("kp_pad", "kv_pad"))
        if dhit is None:
            dd = self._dev(self._materialize(dst_desc_ref),
                           (dst_token, "kp_pad") if dst_token else None)
            dv = self._dev(np.asarray(dst_kvalid, bool),
                           (dst_token, "kv_pad") if dst_token else None)
        else:
            dd, dv = dhit
        n_real = int(np.asarray(dst_kvalid).sum())

        mb = len(padded) * self.n_tokens
        k_static = num_pairs_for(mb, self.n_tokens, num_sample)
        k_actual = num_pairs_for(min(m_real, mb),
                                 min(n_real, self.n_tokens), num_sample)
        skey = lambda n: (src_token, n) if src_token is not None else None
        dkey = lambda n: (dst_token, n) if dst_token is not None else None
        out = self._tile_reg_fn(
            tuple(descs), tuple(kvs), self._put(poses),
            self._put(mvalid), dd, dv,
            self._dev(self._materialize(src_pcd_ref), skey("pcd")),
            self._dev(self._materialize(src_pvalid_ref), skey("pv")),
            self._dev(self._materialize(dst_pcd_ref), dkey("pcd")),
            self._dev(self._materialize(dst_pvalid_ref), dkey("pv")),
            num_pairs=k_static, num_pairs_actual=jnp.int32(k_actual))
        return self._se3_resolver(out)

    def register_map_to_map_with_info_async(
            self, src_members, src_centering, dst_members, dst_centering,
            src_pcd_ref, src_pvalid_ref, dst_pcd_ref, dst_pvalid_ref,
            num_sample=0.5, src_token=None, dst_token=None):
        """Loop registration: BOTH map tiles assembled on device (members
        as in register_scan_to_map_with_info_async)."""
        sp, s_poses, s_mvalid = self._pad_members(src_members, src_centering)
        dp, d_poses, d_mvalid = self._pad_members(dst_members, dst_centering)
        s_descs, s_kvs, s_real = self._members_dev(
            [(m[0], m[1], m[2]) for m in sp[:len(src_members)]])
        d_descs, d_kvs, d_real = self._members_dev(
            [(m[0], m[1], m[2]) for m in dp[:len(dst_members)]])
        s_descs += [s_descs[0]] * (len(sp) - len(src_members))
        s_kvs += [s_kvs[0]] * (len(sp) - len(src_members))
        d_descs += [d_descs[0]] * (len(dp) - len(dst_members))
        d_kvs += [d_kvs[0]] * (len(dp) - len(dst_members))

        mb = len(sp) * self.n_tokens
        nb = len(dp) * self.n_tokens
        k_static = num_pairs_for(mb, nb, num_sample)
        k_actual = num_pairs_for(min(s_real, mb), min(d_real, nb),
                                 num_sample)
        skey = lambda n: (src_token, n) if src_token is not None else None
        dkey = lambda n: (dst_token, n) if dst_token is not None else None
        out = self._tile_tile_reg_fn(
            tuple(s_descs), tuple(s_kvs), self._put(s_poses),
            self._put(s_mvalid),
            tuple(d_descs), tuple(d_kvs), self._put(d_poses),
            self._put(d_mvalid),
            self._dev(self._materialize(src_pcd_ref), skey("pcd")),
            self._dev(self._materialize(src_pvalid_ref), skey("pv")),
            self._dev(self._materialize(dst_pcd_ref), dkey("pcd")),
            self._dev(self._materialize(dst_pvalid_ref), dkey("pv")),
            num_pairs=k_static, num_pairs_actual=jnp.int32(k_actual))
        return self._se3_resolver(out)

    @classmethod
    def _se3_resolver(cls, out):
        cls._prefetch(*out)

        def resolve():
            R, t, conf, rmse, info = jax.device_get(out)
            SE3 = np.eye(4)
            SE3[:3, :3] = np.asarray(R, np.float64)
            SE3[:3, 3] = np.asarray(t, np.float64)
            return SE3, float(conf), float(rmse), np.asarray(info,
                                                             np.float64)
        return resolve

    # ------------------------------------------------- fused odometry step
    def _odometry_impl(self, points, valid, cand_desc, cand_kvalid,
                       cand_pcd, cand_pvalid, num_pairs, num_pairs_actual):
        points, valid = self._dequant_input(points, valid)
        desc, dvalid, pts_valid = self._extract_impl(points, valid)
        R, t, conf, rmse, n_in = self.decoder.apply(
            self.dec_params, cand_desc, desc[0], cand_kvalid, dvalid[0],
            num_pairs, num_pairs_actual, method=Decoder.registration)
        if self.preprocess_cfg is None:
            new_pcd = points[0] * self.coor_scale
        else:
            new_pcd = points[0]  # already meters in raw mode
        info = information_matrix(cand_pcd, cand_pvalid, new_pcd,
                                  pts_valid[0], R, t,
                                  grade=self.filter_grade,
                                  stride=self.infomat_stride)
        # unbatched copies of the new scan's arrays (free inside the jit):
        # the streaming caller caches them device-side under the scan's
        # token so (a) they never re-upload when this scan becomes the
        # next candidate and (b) the resolver can skip fetching them
        return (desc, dvalid, pts_valid, R, t, conf, rmse, info,
                desc[0], dvalid[0], pts_valid[0], new_pcd)

    def _dcache_put(self, key, dev) -> None:
        nb = self._dev_nbytes(dev)
        with self._dcache_lock:
            old = self._dcache.pop(key, None)
            if old is not None:
                self._dcache_bytes -= self._dev_nbytes(old)
            self._dcache[key] = dev
            self._dcache_bytes += nb
            while self._dcache_bytes > self._dcache_budget \
                    and len(self._dcache) > 1:
                _, ev = self._dcache.popitem(last=False)
                self._dcache_bytes -= self._dev_nbytes(ev)

    def _dcache_probe(self, token, names):
        """Device-cache lookup of several per-token arrays (all or
        nothing). None when any is missing."""
        if token is None:
            return None
        with self._dcache_lock:
            out = []
            for name in names:
                hit = self._dcache.get((token, name))
                if hit is None:
                    return None
                out.append(hit)
            for name in names:
                self._dcache.move_to_end((token, name))
        return out

    @staticmethod
    def _materialize(x):
        return np.asarray(x() if callable(x) else x)

    @staticmethod
    def _prefetch(*arrays) -> None:
        """Start device->host copies in the background: a later
        jax.device_get finds the data already local instead of stalling a
        full tunnel round-trip (~35-45 ms measured; residual wait after an
        async copy ~0.7 ms). Used on every async-resolver output so the
        fetch hides behind the NEXT frame's device work."""
        for a in arrays:
            try:
                a.copy_to_host_async()
            except AttributeError:
                pass

    def odometry_step_async(self, points: np.ndarray, valid: np.ndarray,
                            cand_desc, cand_kvalid, cand_pcd, cand_pvalid,
                            num_sample=0.5, cand_token=None, new_token=None):
        """Dispatch the fused odometry step WITHOUT waiting; returns a
        zero-arg resolver. Lets a streaming caller overlap frame i+1's
        dispatch (+ device compute) with frame i's result fetch -- the
        two tunnel round-trips otherwise serialize per frame.

        Candidate arrays (`cand_desc`/`cand_pcd`/`cand_pvalid`) may be
        zero-arg callables: when the token-keyed device cache holds the
        candidate (it does for any scan dispatched with `new_token`),
        they are never called -- a candidate switch costs no host->device
        re-upload and no host materialization.

        With `new_token` set, the resolver returns LAZY descriptors:
        (desc_thunk () -> (K, C+3), desc_valid (K,), pts_valid_thunk
        () -> (P,), SE3, conf, rmse, info) -- ~150 KB/frame of device->host
        traffic drops off the critical path and is fetched only when the
        host actually touches the arrays. Without `new_token` the legacy
        batched eager contract is returned."""
        m_real = int(np.asarray(cand_kvalid).sum())
        n_tok = self.n_tokens
        ck = lambda name: (cand_token, name) if cand_token is not None else None

        hit = self._dcache_probe(cand_token, ("kp_pad", "kv_pad", "pcd",
                                              "pv"))
        if hit is not None:
            kp, kv, pc, pv = hit
            mb = kp.shape[0]
        else:
            src, sv, mb = self._pad_tokens(self._materialize(cand_desc),
                                           np.asarray(cand_kvalid))
            kp = self._dev(src, ck("kp_pad"))
            kv = self._dev(sv, ck("kv_pad"))
            pc = self._dev(self._materialize(cand_pcd), ck("pcd"))
            pv = self._dev(self._materialize(cand_pvalid), ck("pv"))
        k_static = num_pairs_for(mb, n_tok, num_sample)
        k_actual = num_pairs_for(min(m_real, mb), n_tok, num_sample)
        pts_up, valid_up = self._encode_host(points, valid)
        out = self._odometry_fn(
            self._put(pts_up),
            None if valid_up is None else self._put(valid_up),
            kp, kv, pc, pv,
            num_pairs=k_static, num_pairs_actual=jnp.int32(k_actual))
        (desc, dvalid, pts_valid, R, t, conf, rmse, info,
         desc0, dvalid0, pv0, new_pcd) = out

        if new_token is not None:
            self._dcache_put((new_token, "kp_pad"), desc0)
            self._dcache_put((new_token, "kv_pad"), dvalid0)
            self._dcache_put((new_token, "pcd"), new_pcd)
            self._dcache_put((new_token, "pv"), pv0)
            # pv0 (16 KB) is prefetched too: ScanPack.nonkeyframe()
            # materializes full_valid so the UNBOUNDED class of graph
            # nodes holds no device references (keyframe descriptors
            # stay lazily device-resident -- bounded by keyframe count
            # and memoized on first host access)
            self._prefetch(dvalid0, pv0, R, t, conf, rmse, info)

            def resolve_lazy():
                dv_h, R_h, t_h, conf_h, rmse_h, info_h = jax.device_get(
                    (dvalid0, R, t, conf, rmse, info))
                SE3 = np.eye(4)
                SE3[:3, :3] = np.asarray(R_h, np.float64)
                SE3[:3, 3] = np.asarray(t_h, np.float64)
                return (lambda: jax.device_get(desc0), np.asarray(dv_h),
                        lambda: jax.device_get(pv0), SE3, float(conf_h),
                        float(rmse_h), np.asarray(info_h, np.float64))

            return resolve_lazy

        self._prefetch(desc, dvalid, pts_valid, R, t, conf, rmse, info)

        def resolve():
            desc_h, dvalid_h, ptsv_h, R_h, t_h, conf_h, rmse_h, info_h = \
                jax.device_get((desc, dvalid, pts_valid, R, t, conf, rmse,
                                info))
            SE3 = np.eye(4)
            SE3[:3, :3] = np.asarray(R_h, np.float64)
            SE3[:3, 3] = np.asarray(t_h, np.float64)
            return (np.asarray(desc_h), np.asarray(dvalid_h),
                    np.asarray(ptsv_h), SE3, float(conf_h), float(rmse_h),
                    np.asarray(info_h, np.float64))

        return resolve

    def odometry_step(self, points: np.ndarray, valid: np.ndarray,
                      cand_desc, cand_kvalid, cand_pcd, cand_pvalid,
                      num_sample=0.5, cand_token=None):
        """Extraction + registration-against-candidate + information
        matrix fused into ONE device call (a synchronous dispatch through
        this machine's TPU tunnel costs ~28 ms regardless of work, so the
        per-frame hot path must minimize round-trips).

        points (1, P, 3) normalized (or raw meters in device-preprocess
        mode); candidate arrays unpadded. Returns (descriptors
        (1, K, C+3), desc_valid, filtered point validity (1, P), SE3
        (4,4) with new = SE3 @ cand, confidence, rmse, info (6,6))."""
        return self.odometry_step_async(points, valid, cand_desc,
                                        cand_kvalid, cand_pcd, cand_pvalid,
                                        num_sample, cand_token)()

    # ------------------------------------------------------ loop scoring
    def _loop_impl(self, src, dst, sv, dv):
        return self.decoder.apply(self.dec_params, src, dst, sv, dv,
                                  method=Decoder.loop_detection)

    def _loop_members_impl(self, src_descs, src_kvs, dst_desc, dst_kv):
        """Candidate batch stacked INSIDE the jit from device-cached
        per-scan descriptors; the new scan broadcast against all."""
        src = jnp.stack(src_descs)                       # (B, K, C)
        sv = jnp.stack(src_kvs)                          # (B, K)
        dst = jnp.broadcast_to(dst_desc[None], src.shape)
        dv = jnp.broadcast_to(dst_kv[None], sv.shape)
        return self.decoder.apply(self.dec_params, src, dst, sv, dv,
                                  method=Decoder.loop_detection)

    def loop_scores_by_token(self, members, new_desc_ref, new_kvalid,
                             new_token=None) -> np.ndarray:
        """Loop probabilities for candidate scans referenced by TOKEN:
        cached candidates never re-upload (the host path stacks + ships
        ~134 KB per candidate per loop-check event). members =
        [(token, key_points_ref, key_valid)].

        Candidates are scored in chunks of the LARGEST batch bucket:
        the jit signature takes one array per member, so an unchunked
        call would compile a fresh executable for every distinct
        candidate count -- on a long stream (candidate set grows with
        the keyframe count) that meant a 1-2 s recompile per loop event
        and unbounded compile-cache growth (scripts/scale_run.py)."""
        b = len(members)
        descs, kvs, _ = self._members_dev(members)
        dhit = self._dcache_probe(new_token, ("kp_pad", "kv_pad"))
        if dhit is None:
            dd = self._dev(self._materialize(new_desc_ref),
                           (new_token, "kp_pad") if new_token else None)
            dv = self._dev(np.asarray(new_kvalid, bool),
                           (new_token, "kv_pad") if new_token else None)
        else:
            dd, dv = dhit
        step = self.batch_buckets[-1]
        futs = []
        for off in range(0, b, step):     # dispatch all chunks, then get
            cd, ck = descs[off:off + step], kvs[off:off + step]
            bb = _bucket(len(cd), self.batch_buckets)
            cd = cd + [cd[0]] * (bb - len(cd))
            ck = ck + [ck[0]] * (bb - len(ck))
            futs.append((len(descs[off:off + step]), self._loop_members_fn(
                tuple(cd), tuple(ck), dd, dv)))
        probs = [np.asarray(jax.device_get(f))[:k] for k, f in futs]
        return np.concatenate(probs) if probs else np.zeros((0,))

    def loop_scores(self, src_batch, dst_batch, src_valid, dst_valid
                    ) -> np.ndarray:
        """(B, K, C+3) x2 -> loop probabilities (B,). Batch padded to a
        bucket (reference batches all candidates at once,
        loop_closure.py:166-174)."""
        b = src_batch.shape[0]
        step = self.batch_buckets[-1]
        if b > step:     # chunk: bucket padding can't shrink a batch
            return np.concatenate([
                self.loop_scores(src_batch[o:o + step],
                                 dst_batch[o:o + step],
                                 src_valid[o:o + step],
                                 dst_valid[o:o + step])
                for o in range(0, b, step)])
        bb = _bucket(b, self.batch_buckets)
        if bb != b:
            pad = lambda x: np.concatenate(
                [x, np.zeros((bb - b, *x.shape[1:]), x.dtype)], 0)
            src_batch, dst_batch = pad(src_batch), pad(dst_batch)
            src_valid, dst_valid = pad(src_valid), pad(dst_valid)
            # fully-invalid rows would NaN the attention softmax; make the
            # padded rows trivially valid on one token
            src_valid[b:, 0] = True
            dst_valid[b:, 0] = True
        probs = jax.device_get(self._loop_fn(
            self._put(src_batch), self._put(dst_batch),
            self._put(src_valid), self._put(dst_valid)))
        return probs[:b]

    # -------------------------------------------------- information matrix
    def _info_impl(self, src, sv, dst, dv, R, t):
        return information_matrix(src, sv, dst, dv, R, t,
                                  grade=self.filter_grade,
                                  stride=self.infomat_stride)

    def compute_information_matrix(self, src_pcd, src_valid, dst_pcd,
                                   dst_valid, SE3) -> np.ndarray:
        """6x6 Gauss-Newton information matrix
        (reference: system/modules/utils.py:60-113). src/dst are the
        fixed-size padded full point clouds."""
        R = self._put(SE3[:3, :3], jnp.float32)
        t = self._put(SE3[:3, 3], jnp.float32)
        out = self._info_fn(self._put(src_pcd), self._put(src_valid),
                            self._put(dst_pcd), self._put(dst_valid),
                            R, t)
        return np.asarray(out, np.float64)
