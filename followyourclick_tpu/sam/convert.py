"""SAM PyTorch checkpoint → flax variables converter.

Maps the official ``sam_vit_{h,l,b}.pth`` state-dict names (reference
``segment_anything/build_sam.py:103-107`` loads them verbatim) onto this
package's module tree. Conventions:
- torch Linear weight (out, in) → flax Dense kernel (in, out): transpose;
- torch Conv2d weight (out, in, kh, kw) → flax Conv kernel (kh, kw, in, out);
- torch ConvTranspose2d weight (in, out, kh, kw) → flax ConvTranspose
  (transpose_kernel=True) kernel (kh, kw, out, in);
- nn.Embedding weights stay as-is (tables).
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _t(w) -> np.ndarray:
    return np.asarray(w, dtype=np.float32)


def _linear(sd, prefix):
    out = {"kernel": _t(sd[prefix + ".weight"]).T}
    if prefix + ".bias" in sd:
        out["bias"] = _t(sd[prefix + ".bias"])
    return out


def _conv(sd, prefix):
    out = {"kernel": _t(sd[prefix + ".weight"]).transpose(2, 3, 1, 0)}
    if prefix + ".bias" in sd:
        out["bias"] = _t(sd[prefix + ".bias"])
    return out


def _conv_transpose(sd, prefix):
    # flax ConvTranspose(transpose_kernel=True) expects (kh, kw, OUT, IN) —
    # verified numerically against torch ConvTranspose2d
    out = {"kernel": _t(sd[prefix + ".weight"]).transpose(2, 3, 1, 0)}
    if prefix + ".bias" in sd:
        out["bias"] = _t(sd[prefix + ".bias"])
    return out


def _ln(sd, prefix):
    return {"scale": _t(sd[prefix + ".weight"]),
            "bias": _t(sd[prefix + ".bias"])}


def _ln2d(sd, prefix):
    return {"weight": _t(sd[prefix + ".weight"]),
            "bias": _t(sd[prefix + ".bias"])}


def _attention(sd, prefix):
    return {
        "q_proj": _linear(sd, prefix + ".q_proj"),
        "k_proj": _linear(sd, prefix + ".k_proj"),
        "v_proj": _linear(sd, prefix + ".v_proj"),
        "out_proj": _linear(sd, prefix + ".out_proj"),
    }


def convert_sam_state_dict(
    state_dict: Dict[str, Any], depth: int, decoder_depth: int = 2,
    num_mask_tokens: int = 4,
) -> Dict[str, Any]:
    """Full SAM state dict → ``{"params": ...}`` for ``sam.Sam``."""
    sd = {k: v for k, v in state_dict.items()}

    enc: Dict[str, Any] = {
        "patch_embed": _conv(sd, "image_encoder.patch_embed.proj"),
        "neck_conv1": _conv(sd, "image_encoder.neck.0"),
        "neck_ln1": _ln2d(sd, "image_encoder.neck.1"),
        "neck_conv2": _conv(sd, "image_encoder.neck.2"),
        "neck_ln2": _ln2d(sd, "image_encoder.neck.3"),
    }
    if "image_encoder.pos_embed" in sd:
        enc["pos_embed"] = _t(sd["image_encoder.pos_embed"])
    for i in range(depth):
        p = f"image_encoder.blocks.{i}"
        enc[f"block{i}"] = {
            "norm1": _ln(sd, p + ".norm1"),
            "norm2": _ln(sd, p + ".norm2"),
            "attn": {
                "qkv": _linear(sd, p + ".attn.qkv"),
                "proj": _linear(sd, p + ".attn.proj"),
                "rel_pos_h": _t(sd[p + ".attn.rel_pos_h"]),
                "rel_pos_w": _t(sd[p + ".attn.rel_pos_w"]),
            },
            "mlp_lin1": _linear(sd, p + ".mlp.lin1"),
            "mlp_lin2": _linear(sd, p + ".mlp.lin2"),
        }

    pe: Dict[str, Any] = {
        "pe_layer": {
            "positional_encoding_gaussian_matrix": _t(
                sd["prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"]
            )
        },
        "point_embeddings": np.concatenate(
            [
                _t(sd[f"prompt_encoder.point_embeddings.{i}.weight"])
                for i in range(4)
            ],
            axis=0,
        ),
        "not_a_point_embed": _t(sd["prompt_encoder.not_a_point_embed.weight"]),
        "no_mask_embed": _t(sd["prompt_encoder.no_mask_embed.weight"]),
        "mask_conv1": _conv(sd, "prompt_encoder.mask_downscaling.0"),
        "mask_ln1": _ln2d(sd, "prompt_encoder.mask_downscaling.1"),
        "mask_conv2": _conv(sd, "prompt_encoder.mask_downscaling.3"),
        "mask_ln2": _ln2d(sd, "prompt_encoder.mask_downscaling.4"),
        "mask_conv3": _conv(sd, "prompt_encoder.mask_downscaling.6"),
    }

    def twoway_block(p):
        return {
            "self_attn": _attention(sd, p + ".self_attn"),
            "norm1": _ln(sd, p + ".norm1"),
            "cross_attn_token_to_image": _attention(
                sd, p + ".cross_attn_token_to_image"
            ),
            "norm2": _ln(sd, p + ".norm2"),
            "mlp_lin1": _linear(sd, p + ".mlp.lin1"),
            "mlp_lin2": _linear(sd, p + ".mlp.lin2"),
            "norm3": _ln(sd, p + ".norm3"),
            "cross_attn_image_to_token": _attention(
                sd, p + ".cross_attn_image_to_token"
            ),
            "norm4": _ln(sd, p + ".norm4"),
        }

    transformer = {
        f"layer{i}": twoway_block(f"mask_decoder.transformer.layers.{i}")
        for i in range(decoder_depth)
    }
    transformer["final_attn_token_to_image"] = _attention(
        sd, "mask_decoder.transformer.final_attn_token_to_image"
    )
    transformer["norm_final_attn"] = _ln(
        sd, "mask_decoder.transformer.norm_final_attn"
    )

    dec: Dict[str, Any] = {
        "iou_token": _t(sd["mask_decoder.iou_token.weight"]),
        "mask_tokens": _t(sd["mask_decoder.mask_tokens.weight"]),
        "transformer": transformer,
        "upscale_conv1": _conv_transpose(sd, "mask_decoder.output_upscaling.0"),
        "upscale_ln": _ln2d(sd, "mask_decoder.output_upscaling.1"),
        "upscale_conv2": _conv_transpose(sd, "mask_decoder.output_upscaling.3"),
        "iou_prediction_head": {
            f"layer{i}": _linear(
                sd, f"mask_decoder.iou_prediction_head.layers.{i}"
            )
            for i in range(3)
        },
    }
    for i in range(num_mask_tokens):
        dec[f"hyper_mlp{i}"] = {
            f"layer{j}": _linear(
                sd, f"mask_decoder.output_hypernetworks_mlps.{i}.layers.{j}"
            )
            for j in range(3)
        }

    return {
        "params": {
            "image_encoder": enc,
            "prompt_encoder": pe,
            "mask_decoder": dec,
        }
    }


def load_sam_checkpoint(path: str, depth: int) -> Dict[str, Any]:
    """Load an official ``.pth`` checkpoint from disk (torch pickles)."""
    import torch

    sd = torch.load(path, map_location="cpu")
    sd = {k: v.numpy() for k, v in sd.items()}
    return convert_sam_state_dict(sd, depth=depth)
