"""FULL-SIZE parity vs the reference: DeepPointMap-B production shapes
(npoint 4096/1024/256/64/16, 16384-pt pad, 256 tokens, 3 attention layers)
on REAL sample frames, with shared converted weights, through the
production InferenceEngine -- then a 5-frame odometry registration chain
comparing per-frame (R, t) and the composed trajectory.

The reference torch code is the oracle (imported read-only from
/root/reference, CPU). Weights are random-init (the trained .pth is
stripped from the mirror) but SHARED via the converter, so both networks
compute the same function; this validates computational parity at
production scale, complementing the toy-shape tests in
test_model_parity.py.
"""

import logging
import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
SAMPLE = os.path.join(REF, "data/sample/seq06/velodyne")
pytestmark = [
    pytest.mark.skipif(not os.path.isdir(SAMPLE),
                       reason="reference mirror not available"),
    pytest.mark.slow,
]


@pytest.fixture(scope="module")
def setup():
    colorlog = types.ModuleType("colorlog")
    colorlog.getLogger = logging.getLogger
    colorlog.INFO = logging.INFO
    sys.modules.setdefault("colorlog", colorlog)
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import torch
    from network.decoder.decoder import Decoder as TorchDecoder
    from network.encoder.encoder import Encoder as TorchEncoder

    from deeppointmap_tpu.config import config_from_yaml
    from deeppointmap_tpu.data.readers import read_auto
    from deeppointmap_tpu.data.transforms import PointCloudTransforms
    from deeppointmap_tpu.models import Decoder, Encoder
    from deeppointmap_tpu.models.weights import (convert_decoder,
                                                 convert_encoder)
    from deeppointmap_tpu.slam.engine import InferenceEngine

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    args = config_from_yaml(os.path.join(here, "configs/infer/sample.yaml"))
    args.tpu["bf16"] = False          # full fp32 for oracle comparison
    args.tpu["upload_quant"] = "none"  # exact input coordinates

    torch.manual_seed(0)
    t_enc = TorchEncoder(args)
    t_enc.eval()
    t_dec = TorchDecoder(args)
    t_dec.eval()

    irm = [len(r) - 1 for r in args.encoder.radius_list]
    enc_params = {"params": convert_encoder(t_enc.state_dict(),
                                            len(args.encoder.npoint), irm)}
    dec_params = {"params": convert_decoder(
        t_dec.state_dict(), int(args.decoder.attention_layers))}
    engine = InferenceEngine(args, enc_params, dec_params,
                             encoder=Encoder.from_config(args),
                             decoder=Decoder.from_config(args),
                             preprocess_cfg=None)   # host transforms

    tf = PointCloudTransforms(args, mode="infer")
    pad = int(args.tpu.encoder_points)

    def load_frame(i):
        scan = read_auto(os.path.join(SAMPLE, f"{i:06d}.bin"))
        pts, R, T, valid, orig = tf(scan)
        padded = np.zeros((pad, 3), np.float32)
        v = np.zeros((pad,), bool)
        n = min(pts.shape[0], pad)
        padded[:n] = pts[:n]
        v[:n] = True
        return pts, padded, v

    return args, t_enc, t_dec, engine, load_frame


def _torch_extract(t_enc, args, pts):
    import torch

    pad = np.zeros((1, pts.shape[0]), bool)
    with torch.no_grad():
        coor, fea, _ = t_enc(torch.from_numpy(pts[None]).transpose(1, 2),
                             torch.from_numpy(pad))
    scale = float(args.slam_system.coor_scale)
    # descriptor = [fea, xyz * coor_scale] (reference: odometry.py:47-49)
    desc = np.concatenate([fea.numpy()[0], coor.numpy()[0] * scale],
                          axis=0).T                       # (256, 131)
    return desc


def test_full_size_encoder_parity(setup):
    args, t_enc, _, engine, load_frame = setup
    pts, padded, valid = load_frame(0)
    t_desc = _torch_extract(t_enc, args, pts)

    f_desc, f_valid, _ = engine.extract(padded[None], valid[None])
    assert f_desc.shape[1] == 256 and bool(f_valid.all())

    # FPS picks and coordinate path must agree exactly-ish
    coor_err = np.abs(f_desc[0, :, -3:] - t_desc[:, -3:]).max()
    fea_rel = (np.abs(f_desc[0, :, :-3] - t_desc[:, :-3]).max()
               / (np.abs(t_desc[:, :-3]).max() + 1e-9))
    print(f"\nfull-size encoder: max coor err {coor_err:.2e} m, "
          f"max rel fea err {fea_rel:.2e}")
    assert coor_err < 1e-3, coor_err          # meters (xyz * 60)
    assert fea_rel < 0.02, fea_rel


def test_full_size_registration_chain(setup):
    """5-frame odometry chain: per-frame (R, t) and composed trajectory
    must match the reference at production token counts."""
    import torch

    args, t_enc, t_dec, engine, load_frame = setup

    frames = [load_frame(i) for i in range(5)]
    t_descs = [_torch_extract(t_enc, args, f[0]) for f in frames]
    f_out = [engine.extract(f[1][None], f[2][None]) for f in frames]

    t_traj = [np.eye(4)]
    f_traj = [np.eye(4)]
    ang_errs, t_errs = [], []
    for i in range(1, len(frames)):
        src_t, dst_t = t_descs[i], t_descs[i - 1]
        with torch.no_grad():
            R_t, T_t, _, rmse_t = t_dec.registration_forward(
                torch.from_numpy(src_t.T.copy()),
                torch.from_numpy(dst_t.T.copy()), num_sample=0.5)
        SE3_t = np.eye(4)
        SE3_t[:3, :3] = R_t.numpy()
        SE3_t[:3, 3] = T_t.numpy().reshape(3)

        desc_i, valid_i = f_out[i][0][0], f_out[i][1][0]
        desc_p, valid_p = f_out[i - 1][0][0], f_out[i - 1][1][0]
        SE3_f, conf_f, rmse_f = engine.register(desc_i, valid_i,
                                                desc_p, valid_p,
                                                num_sample=0.5)

        dR = SE3_f[:3, :3] @ SE3_t[:3, :3].T
        ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
        dt = np.linalg.norm(SE3_f[:3, 3] - SE3_t[:3, 3])
        ang_errs.append(ang)
        t_errs.append(dt)
        t_traj.append(t_traj[-1] @ SE3_t)
        f_traj.append(f_traj[-1] @ SE3_f)

    endpoint = np.linalg.norm(t_traj[-1][:3, 3] - f_traj[-1][:3, 3])
    ate = np.sqrt(np.mean([np.sum((a[:3, 3] - b[:3, 3]) ** 2)
                           for a, b in zip(t_traj, f_traj)]))
    print(f"\nregistration chain: max ang err {max(ang_errs):.4f} deg, "
          f"max t err {max(t_errs) * 100:.2f} cm, "
          f"trajectory ATE {ate * 100:.2f} cm, endpoint {endpoint * 100:.2f} cm")
    assert max(ang_errs) < 0.1, ang_errs
    assert max(t_errs) < 0.02, t_errs
    assert ate < 0.02, ate
