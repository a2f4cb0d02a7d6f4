"""Torch state-dict -> Flax params converter.

The reference's weight file is `{'encoder': state_dict, 'decoder':
state_dict}` (reference: pipeline/infer.py:63-65). This module maps those
torch parameter names onto our Flax module tree so pretrained reference
weights run unchanged on TPU, and so layer-level parity tests can compare
the two implementations with identical weights.

Layout rules:
  torch Conv1d (out, in, 1)    -> Dense kernel (in, out) = w[:, :, 0].T
  torch Conv2d (out, in, 1, 1) -> Dense kernel (in, out) = w[:, :, 0, 0].T
  torch Linear (out, in)       -> Dense kernel (in, out) = w.T
  torch LayerNorm weight/bias  -> scale/bias
  torch MHA in_proj_weight (3C, C) -> in_proj_kernel (C, 3C) = w.T
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np


def _t(w):  # torch Linear / MHA in_proj
    return np.asarray(w).T


def _c1(w):  # Conv1d k=1
    w = np.asarray(w)
    return w[:, :, 0].T


def _c2(w):  # Conv2d k=1x1
    w = np.asarray(w)
    return w[:, :, 0, 0].T


def _set(tree: dict, path: str, value) -> None:
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = np.asarray(value, dtype=np.float32)


def _np(sd: Mapping, key: str):
    v = sd[key]
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v)


def _mlp_block(tree, sd, torch_prefix, flax_prefix, n_layers, conv):
    """build_mlp stack: torch indices 0,1[,3,4,...] = conv,ln pairs with the
    relu (no params) between pairs (reference: network/encoder/utils.py:378-389)."""
    for i in range(n_layers):
        ti = i * 3  # conv at 0, norm at 1, act at 2, next conv at 3 ...
        _set(tree, f"{flax_prefix}/dense{i}/kernel", conv(_np(sd, f"{torch_prefix}.{ti}.weight")))
        if f"{torch_prefix}.{ti}.bias" in sd:
            _set(tree, f"{flax_prefix}/dense{i}/bias", _np(sd, f"{torch_prefix}.{ti}.bias"))
        _set(tree, f"{flax_prefix}/norm{i}/scale", _np(sd, f"{torch_prefix}.{ti + 1}.ln.weight"))
        _set(tree, f"{flax_prefix}/norm{i}/bias", _np(sd, f"{torch_prefix}.{ti + 1}.ln.bias"))


def convert_encoder(sd: Mapping, npoint_count: int, irm_counts) -> Dict:
    """Torch encoder state-dict -> flax params dict (without 'params' root).

    irm_counts[i] = len(radius_list[i]) - 1 InvResMLP blocks per stage
    (reference: network/encoder/pointnext.py:158-167).
    """
    p: Dict = {}
    _set(p, "point_mlp0/kernel", _c1(_np(sd, "point_mlp0.weight")))
    _set(p, "point_mlp0/bias", _np(sd, "point_mlp0.bias"))
    for i in range(npoint_count):
        base = f"downsampler.{i}"
        _mlp_block(p, sd, f"{base}.sa.mlp", f"down{i}/sa/mlp", 1, _c2)
        for j in range(irm_counts[i]):
            tb = f"{base}.irm.{j}"
            fb = f"down{i}/irm{j}"
            _mlp_block(p, sd, f"{tb}.la.mlp", f"{fb}/la/mlp", 1, _c2)
            _mlp_block(p, sd, f"{tb}.pw_conv", f"{fb}/pw_conv", 2, _c1)
    # upsamplers: 2-layer 1d mlps
    ups = sorted({k.split(".")[1] for k in sd if k.startswith("upsampler.")})
    for i in ups:
        _mlp_block(p, sd, f"upsampler.{i}.mlp", f"up{i}/mlp", 2, _c1)
    return p


def _attn(p, sd, tb, fb):
    _set(p, f"{fb}/in_proj_kernel", _t(_np(sd, f"{tb}.in_proj_weight")))
    _set(p, f"{fb}/in_proj_bias", _np(sd, f"{tb}.in_proj_bias"))
    _set(p, f"{fb}/out_proj/kernel", _t(_np(sd, f"{tb}.out_proj.weight")))
    _set(p, f"{fb}/out_proj/bias", _np(sd, f"{tb}.out_proj.bias"))


def _seq_head(p, sd, tb, fb, names=("dense0", "dense1")):
    """Conv1d-relu-Conv1d heads (similarity / coarse pairing / loop mlp)."""
    for ti, fn in zip((0, 2), names):
        _set(p, f"{fb}/{fn}/kernel", _c1(_np(sd, f"{tb}.{ti}.weight")))
        _set(p, f"{fb}/{fn}/bias", _np(sd, f"{tb}.{ti}.bias"))


def convert_decoder(sd: Mapping, attention_layers: int = 3) -> Dict:
    p: Dict = {}
    _set(p, "projection/kernel", _c1(_np(sd, "projection.weight")))
    _set(p, "projection/bias", _np(sd, "projection.bias"))
    for i in range(attention_layers):
        tb = f"descriptor_attention.{i}"
        fb = f"attn{i}"
        _attn(p, sd, f"{tb}.self_attn", f"{fb}/self_attn")
        _attn(p, sd, f"{tb}.cross_attn", f"{fb}/cross_attn")
        for ti, fn in ((0, "mlp0"), (2, "mlp1")):
            _set(p, f"{fb}/{fn}/kernel", _t(_np(sd, f"{tb}.mlp.{ti}.weight")))
            _set(p, f"{fb}/{fn}/bias", _np(sd, f"{tb}.mlp.{ti}.bias"))
        for norm in ("norm1", "norm2", "norm3"):
            _set(p, f"{fb}/{norm}/scale", _np(sd, f"{tb}.{norm}.weight"))
            _set(p, f"{fb}/{norm}/bias", _np(sd, f"{tb}.{norm}.bias"))
    _seq_head(p, sd, "similarity_head", "similarity_head")
    _seq_head(p, sd, "coarse_pairing_head", "coarse_pairing_head")
    # offset head: mlp convs at 0, 2, 4 + downsample + head
    for ti, fn in ((0, "mlp0"), (2, "mlp1"), (4, "mlp2")):
        _set(p, f"offset_head/{fn}/kernel", _c1(_np(sd, f"offset_head.mlp.{ti}.weight")))
        _set(p, f"offset_head/{fn}/bias", _np(sd, f"offset_head.mlp.{ti}.bias"))
    _set(p, "offset_head/downsample/kernel", _c1(_np(sd, "offset_head.downsample.weight")))
    _set(p, "offset_head/downsample/bias", _np(sd, "offset_head.downsample.bias"))
    _set(p, "offset_head/head/kernel", _c1(_np(sd, "offset_head.head.weight")))
    _set(p, "offset_head/head/bias", _np(sd, "offset_head.head.bias"))
    _seq_head(p, sd, "loop_head.mlp", "loop_head", names=("mlp0", "mlp1"))
    for ti, fn in ((0, "proj0"), (2, "proj1")):
        _set(p, f"loop_head/{fn}/kernel", _t(_np(sd, f"loop_head.projection.{ti}.weight")))
        _set(p, f"loop_head/{fn}/bias", _np(sd, f"loop_head.projection.{ti}.bias"))
    return p


# --------------------------------------------------------------- inverse
def _get(tree: dict, path: str):
    node = tree
    for p in path.split("/"):
        node = node[p]
    return np.asarray(node)


def _inv_mlp_block(out, tree, torch_prefix, flax_prefix, n_layers, to_conv):
    for i in range(n_layers):
        ti = i * 3
        out[f"{torch_prefix}.{ti}.weight"] = to_conv(
            _get(tree, f"{flax_prefix}/dense{i}/kernel"))
        try:
            out[f"{torch_prefix}.{ti}.bias"] = _get(
                tree, f"{flax_prefix}/dense{i}/bias")
        except KeyError:
            pass
        out[f"{torch_prefix}.{ti + 1}.ln.weight"] = _get(
            tree, f"{flax_prefix}/norm{i}/scale")
        out[f"{torch_prefix}.{ti + 1}.ln.bias"] = _get(
            tree, f"{flax_prefix}/norm{i}/bias")


def _to_c1(k):  # Dense kernel (in, out) -> Conv1d weight (out, in, 1)
    return np.asarray(k).T[:, :, None]


def _to_c2(k):  # -> Conv2d weight (out, in, 1, 1)
    return np.asarray(k).T[:, :, None, None]


def convert_encoder_back(params: dict, npoint_count: int, irm_counts) -> dict:
    """Flax encoder params -> reference torch state-dict layout (inverse
    of convert_encoder), so models trained here run in the reference."""
    out: dict = {}
    out["point_mlp0.weight"] = _to_c1(_get(params, "point_mlp0/kernel"))
    out["point_mlp0.bias"] = _get(params, "point_mlp0/bias")
    for i in range(npoint_count):
        _inv_mlp_block(out, params, f"downsampler.{i}.sa.mlp",
                       f"down{i}/sa/mlp", 1, _to_c2)
        for j in range(irm_counts[i]):
            _inv_mlp_block(out, params, f"downsampler.{i}.irm.{j}.la.mlp",
                           f"down{i}/irm{j}/la/mlp", 1, _to_c2)
            _inv_mlp_block(out, params, f"downsampler.{i}.irm.{j}.pw_conv",
                           f"down{i}/irm{j}/pw_conv", 2, _to_c1)
    i = 0
    while f"up{i}" in params:
        _inv_mlp_block(out, params, f"upsampler.{i}.mlp", f"up{i}/mlp", 2,
                       _to_c1)
        i += 1
    return out


def convert_decoder_back(params: dict, attention_layers: int = 3) -> dict:
    out: dict = {}
    out["projection.weight"] = _to_c1(_get(params, "projection/kernel"))
    out["projection.bias"] = _get(params, "projection/bias")
    for i in range(attention_layers):
        tb = f"descriptor_attention.{i}"
        fb = f"attn{i}"
        for attn in ("self_attn", "cross_attn"):
            out[f"{tb}.{attn}.in_proj_weight"] = _get(
                params, f"{fb}/{attn}/in_proj_kernel").T
            out[f"{tb}.{attn}.in_proj_bias"] = _get(
                params, f"{fb}/{attn}/in_proj_bias")
            out[f"{tb}.{attn}.out_proj.weight"] = _get(
                params, f"{fb}/{attn}/out_proj/kernel").T
            out[f"{tb}.{attn}.out_proj.bias"] = _get(
                params, f"{fb}/{attn}/out_proj/bias")
        for ti, fn in ((0, "mlp0"), (2, "mlp1")):
            out[f"{tb}.mlp.{ti}.weight"] = _get(params,
                                                f"{fb}/{fn}/kernel").T
            out[f"{tb}.mlp.{ti}.bias"] = _get(params, f"{fb}/{fn}/bias")
        for norm in ("norm1", "norm2", "norm3"):
            out[f"{tb}.{norm}.weight"] = _get(params, f"{fb}/{norm}/scale")
            out[f"{tb}.{norm}.bias"] = _get(params, f"{fb}/{norm}/bias")
    for tb, fb, names in (("similarity_head", "similarity_head",
                           ("dense0", "dense1")),
                          ("coarse_pairing_head", "coarse_pairing_head",
                           ("dense0", "dense1")),
                          ("loop_head.mlp", "loop_head", ("mlp0", "mlp1"))):
        for ti, fn in zip((0, 2), names):
            out[f"{tb}.{ti}.weight"] = _to_c1(_get(params, f"{fb}/{fn}/kernel"))
            out[f"{tb}.{ti}.bias"] = _get(params, f"{fb}/{fn}/bias")
    for ti, fn in ((0, "mlp0"), (2, "mlp1"), (4, "mlp2")):
        out[f"offset_head.mlp.{ti}.weight"] = _to_c1(
            _get(params, f"offset_head/{fn}/kernel"))
        out[f"offset_head.mlp.{ti}.bias"] = _get(params,
                                                 f"offset_head/{fn}/bias")
    for name in ("downsample", "head"):
        out[f"offset_head.{name}.weight"] = _to_c1(
            _get(params, f"offset_head/{name}/kernel"))
        out[f"offset_head.{name}.bias"] = _get(params,
                                               f"offset_head/{name}/bias")
    for ti, fn in ((0, "proj0"), (2, "proj1")):
        out[f"loop_head.projection.{ti}.weight"] = _get(
            params, f"loop_head/{fn}/kernel").T
        out[f"loop_head.projection.{ti}.bias"] = _get(params,
                                                      f"loop_head/{fn}/bias")
    return out


def save_torch_weight(path: str, enc_params, dec_params, args) -> None:
    """Write weights in the reference's .pth schema
    ({'encoder': sd, 'decoder': sd}, reference: pipeline/infer.py:63-65)."""
    import torch

    e = args.encoder
    irm_counts = [len(r) - 1 for r in e.radius_list]
    enc_sd = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in
              convert_encoder_back(enc_params["params"], len(e.npoint),
                                   irm_counts).items()}
    dec_sd = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in
              convert_decoder_back(dec_params["params"],
                                   args.decoder.attention_layers).items()}
    torch.save({"encoder": enc_sd, "decoder": dec_sd}, path)


def load_torch_weight(path: str, args):
    """Load a reference-schema .pth weight file -> (enc_params, dec_params)
    as flax-ready {'params': ...} trees."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    enc_sd = blob["encoder"]
    dec_sd = blob["decoder"]
    e = args.encoder
    irm_counts = [len(r) - 1 for r in e.radius_list]
    enc = convert_encoder(enc_sd, len(e.npoint), irm_counts)
    dec = convert_decoder(dec_sd, args.decoder.attention_layers)
    return {"params": enc}, {"params": dec}
