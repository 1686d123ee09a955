"""mmflow RAFT checkpoint → flax variables converter.

Maps the reference mmflow RAFT state-dict names (raft_8x2_*.pth from the
model zoo: ``encoder.conv1``, ``encoder.layerN.M.convK`` via mmcv ResLayer,
``context.*`` with BatchNorm running stats, ``decoder.encoder.corr_net/
flow_net/out_net`` ConvModule stacks, ``decoder.gru.conv_{z,r,q}.{0,1}``,
``decoder.flow_pred/mask_pred.layers.0 + .predict_layer``) onto
``flow.raft.RAFT``'s module tree. Conventions as in the other converters:
torch Conv2d (out,in,kh,kw) → flax (kh,kw,in,out).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np


def _t(v) -> np.ndarray:
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v, dtype=np.float32)


def _conv(sd, prefix):
    out = {"kernel": _t(sd[f"{prefix}.weight"]).transpose(2, 3, 1, 0)}
    if f"{prefix}.bias" in sd:
        out["bias"] = _t(sd[f"{prefix}.bias"])
    return out


def _norm(sd, prefix, kind: str):
    """kind 'instance' → GroupNorm_0 {scale, bias}; 'batch' → BatchNorm_0
    params + batch_stats (returned as (params, stats))."""
    if kind == "instance":
        return ({"GroupNorm_0": {"scale": _t(sd[f"{prefix}.weight"]),
                                 "bias": _t(sd[f"{prefix}.bias"])}}, None)
    params = {"BatchNorm_0": {"scale": _t(sd[f"{prefix}.weight"]),
                              "bias": _t(sd[f"{prefix}.bias"])}}
    stats = {"BatchNorm_0": {"mean": _t(sd[f"{prefix}.running_mean"]),
                             "var": _t(sd[f"{prefix}.running_var"])}}
    return params, stats


def _encoder(sd: Mapping[str, Any], prefix: str, kind: str):
    """RAFTEncoder tree (raft_encoder.py naming: conv1/norm1,
    res_layerN.M.{conv1,bn1,conv2,bn2,downsample.0/1}, conv2)."""
    params: Dict[str, Any] = {"conv1": _conv(sd, f"{prefix}.conv1"),
                              "conv2": _conv(sd, f"{prefix}.conv2")}
    stats: Dict[str, Any] = {}

    def put_norm(name, src):
        p, st = _norm(sd, src, kind)
        params[name] = {**params.get(name, {}), **p}
        if st is not None:
            stats[name] = st

    put_norm("norm1", f"{prefix}.norm1")
    for layer in (1, 2, 3):
        for block in (0, 1):
            src = f"{prefix}.res_layer{layer}.{block}"
            dst = f"layer{layer}_{block}"
            params[dst] = {
                "conv1": _conv(sd, f"{src}.conv1"),
                "conv2": _conv(sd, f"{src}.conv2"),
            }
            bstats: Dict[str, Any] = {}
            for tn, fn in (("bn1", "norm1"), ("bn2", "norm2")):
                p, st = _norm(sd, f"{src}.{tn}", kind)
                params[dst][fn] = p
                if st is not None:
                    bstats[fn] = st
            if f"{src}.downsample.0.weight" in sd:
                params[dst]["downsample_conv"] = _conv(
                    sd, f"{src}.downsample.0")
                p, st = _norm(sd, f"{src}.downsample.1", kind)
                params[dst]["downsample_norm"] = p
                if st is not None:
                    bstats["downsample_norm"] = st
            if bstats:
                stats[dst] = bstats
    return params, stats


def convert_mmflow_raft(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """Full mmflow RAFT checkpoint (possibly wrapped in {'state_dict': ...})
    → ``{"params", "batch_stats"}`` for ``flow.raft.RAFT``."""
    sd = state_dict.get("state_dict", state_dict)
    sd = {k: v for k, v in sd.items()}

    enc_params, _ = _encoder(sd, "encoder", "instance")
    cxt_params, cxt_stats = _encoder(sd, "context", "batch")

    dec_sd_prefix = "decoder"
    m = f"{dec_sd_prefix}.encoder"  # MotionEncoder
    dec_params: Dict[str, Any] = {
        "encoder": {
            "corr_conv1": _conv(sd, f"{m}.corr_net.0.conv"),
            "corr_conv2": _conv(sd, f"{m}.corr_net.1.conv"),
            "flow_conv1": _conv(sd, f"{m}.flow_net.0.conv"),
            "flow_conv2": _conv(sd, f"{m}.flow_net.1.conv"),
            "out_conv": _conv(sd, f"{m}.out_net.0.conv"),
        },
        "gru": {},
        "flow_pred": {
            "conv": _conv(sd, f"{dec_sd_prefix}.flow_pred.layers.0.conv"),
            "predict": _conv(sd, f"{dec_sd_prefix}.flow_pred.predict_layer"),
        },
        "mask_pred": {
            "conv": _conv(sd, f"{dec_sd_prefix}.mask_pred.layers.0.conv"),
            "predict": _conv(sd, f"{dec_sd_prefix}.mask_pred.predict_layer"),
        },
    }
    for gate in ("z", "r", "q"):
        for i in (0, 1):
            dec_params["gru"][f"conv_{gate}{i}"] = _conv(
                sd, f"{dec_sd_prefix}.gru.conv_{gate}.{i}.conv")

    return {
        "params": {"encoder": enc_params, "context": cxt_params,
                   "decoder": dec_params},
        "batch_stats": {"context": cxt_stats},
    }


def load_mmflow_raft_checkpoint(path: str) -> Dict[str, Any]:
    import torch

    return convert_mmflow_raft(torch.load(path, map_location="cpu"))
