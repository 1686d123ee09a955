"""PyTorch checkpoint → JAX param-tree converters.

Covers the reference's four checkpoint dialects (SURVEY.md §5.4): HF
``from_pretrained`` directories, DDP-prefixed ``.ckpt`` pickles, LDM
``.safetensors`` (via the LDM→diffusers key remap), and LoRA weights (see
``utils/lora.py``). The mapping is keyed off the reference's own state-dict
names (``animatediff/models/unet.py``, ``diffusers/models/vae.py``) so released
checkpoints load directly.

Value transforms are rank-driven: rank-1 → norm scale / bias as-is, rank-2
linear → transposed kernel, rank-3 conv1d → (k, in, out), rank-4 conv2d →
(kh, kw, in, out).
"""

from __future__ import annotations

import re
from typing import Dict, Mapping, Tuple

import numpy as np


def _to_numpy(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().float().numpy()
    return np.asarray(t)


def _leaf(name: str, tensor: np.ndarray) -> Tuple[str, np.ndarray]:
    """Map a torch parameter leaf to (flax_leaf_name, transformed_value)."""
    if name == "bias":
        return "bias", tensor
    if name != "weight":
        return name, tensor
    if tensor.ndim == 1:
        return "scale", tensor
    if tensor.ndim == 2:
        return "kernel", tensor.T
    if tensor.ndim == 3:  # conv1d (out, in, k) -> (k, in, out)
        return "kernel", tensor.transpose(2, 1, 0)
    if tensor.ndim == 4:  # conv2d (out, in, kh, kw) -> (kh, kw, in, out)
        return "kernel", tensor.transpose(2, 3, 1, 0)
    raise ValueError(f"unhandled weight rank {tensor.ndim} for {name}")


def _set(tree: Dict, path: Tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


_LIST_MODULES = (
    "down_blocks|up_blocks|resnets|attentions|motion_modules|"
    "transformer_blocks|attention_blocks|norms|downsamplers|upsamplers"
)

# "pos_encoder.pe" is a sinusoidal buffer we recompute; attn biases likewise.
_SKIP_PATTERNS = (
    re.compile(r"pos_encoder\.pe$"),
    re.compile(r"rope\."),
    re.compile(r"position_ids$"),
)

# conv modules implemented as InflatedConv (wraps an inner nn.Conv "conv")
_INFLATED_CONVS = re.compile(
    r"(^|\.)(conv_in|conv_out|conv1|conv2|conv_shortcut)$")


def _map_unet_key(key: str) -> Tuple[str, ...] | None:
    """reference UNet3D state-dict name -> flax path (without leaf)."""
    for pat in _SKIP_PATTERNS:
        if pat.search(key):
            return None
    parts = key.split(".")
    leaf = parts.pop()  # weight / bias
    name = ".".join(parts)

    # temporal transformer lives under motion_modules.N.temporal_transformer.*
    name = name.replace(".temporal_transformer.", ".")
    # attention out projections: to_out.0 -> to_out (dropout .1 has no params)
    name = re.sub(r"\.to_out\.0$", ".to_out", name)
    # GEGLU feed-forward: ff.net.0.proj -> ff.proj ; ff.net.2 -> ff.out
    name = re.sub(r"\.ff\.net\.0\.proj$", ".ff.proj", name)
    name = re.sub(r"\.ff\.net\.2$", ".ff.out", name)
    # LoRA layers keep torch names to_q_lora.down/up
    # fold list indices into flax module names: resnets.0 -> resnets_0
    name = re.sub(rf"\b({_LIST_MODULES})\.(\d+)", r"\1_\2", name)

    parts = name.split(".")
    # inflated convs have an inner nn.Conv named "conv"
    if _INFLATED_CONVS.search(parts[-1]):
        parts = parts + ["conv"]
    return tuple(parts) + (leaf,)


def convert_unet3d_state_dict(
    state_dict: Mapping[str, object],
    use_pseudo_conv3d: bool = False,
) -> Dict:
    """Reference ``UNet3DConditionModel.state_dict()`` → flax params tree.

    DDP ``module.`` prefixes are stripped (reference scripts/inference.py:175).
    ``image_proj_model.*`` entries are returned under their own subtree — the
    pipeline owns the IP projection model here.
    """
    tree: Dict = {}
    for key, tensor in state_dict.items():
        if key.startswith("module."):
            key = key[len("module."):]
        path = _map_unet_key(key)
        if path is None:
            continue
        arr = _to_numpy(tensor)
        leaf_name, value = _leaf(path[-1], arr)
        full = path[:-1] + (leaf_name,)
        if use_pseudo_conv3d:
            full = tuple("spatial_conv" if p == "conv" else p for p in full)
        _set(tree, full, value)
    return tree


# ---------------------------------------------------------------------------
# VAE
# ---------------------------------------------------------------------------

def _map_vae_key(key: str) -> Tuple[str, ...] | None:
    parts = key.split(".")
    leaf = parts.pop()
    name = ".".join(parts)

    # encoder.down_blocks.i.resnets.j -> encoder.down_{i}_resnet_{j}
    name = re.sub(r"(encoder)\.down_blocks\.(\d+)\.resnets\.(\d+)",
                  r"\1.down_\2_resnet_\3", name)
    name = re.sub(r"(encoder)\.down_blocks\.(\d+)\.downsamplers\.0\.conv",
                  r"\1.down_\2_downsample", name)
    name = re.sub(r"(decoder)\.up_blocks\.(\d+)\.resnets\.(\d+)",
                  r"\1.up_\2_resnet_\3", name)
    name = re.sub(r"(decoder)\.up_blocks\.(\d+)\.upsamplers\.0\.conv",
                  r"\1.up_\2_upsample", name)
    name = re.sub(r"mid_block\.resnets\.(\d+)",
                  lambda m: f"mid_resnet_{int(m.group(1)) + 1}", name)
    name = name.replace("mid_block.attentions.0", "mid_attn_1")
    return tuple(name.split(".")) + (leaf,)


def convert_vae_state_dict(state_dict: Mapping[str, object]) -> Dict:
    """diffusers ``AutoencoderKL.state_dict()`` → flax params tree."""
    tree: Dict = {}
    for key, tensor in state_dict.items():
        if key.startswith("module."):
            key = key[len("module."):]
        path = _map_vae_key(key)
        if path is None:
            continue
        arr = _to_numpy(tensor)
        # VAE attention q/k/v/proj_attn are Linear in diffusers>=0.11 but may
        # appear as 1x1 convs in older LDM dumps; normalize to Dense kernels.
        if path[-1] == "weight" and arr.ndim == 4 and arr.shape[2:] == (1, 1) \
                and path[-2] in ("query", "key", "value", "proj_attn"):
            arr = arr[:, :, 0, 0]
        leaf_name, value = _leaf(path[-1], arr)
        _set(tree, path[:-1] + (leaf_name,), value)
    return tree


# ---------------------------------------------------------------------------
# CLIP text encoder
# ---------------------------------------------------------------------------

def _map_clip_key(key: str) -> Tuple[str, ...] | None:
    if key.endswith("position_ids"):
        return None
    parts = key.split(".")
    leaf = parts.pop()
    name = ".".join(parts)
    name = re.sub(r"^text_model\.", "", name)
    name = re.sub(r"encoder\.layers\.(\d+)", r"layers_\1", name)
    name = name.replace("embeddings.token_embedding", "token_embedding")
    name = name.replace("embeddings.position_embedding", "position_embedding")
    name = name.replace("mlp.fc1", "mlp_fc1").replace("mlp.fc2", "mlp_fc2")
    return tuple(name.split(".")) + (leaf,)


def convert_clip_text_state_dict(state_dict: Mapping[str, object]) -> Dict:
    """HF ``CLIPTextModel.state_dict()`` → flax params tree."""
    tree: Dict = {}
    for key, tensor in state_dict.items():
        path = _map_clip_key(key)
        if path is None:
            continue
        arr = _to_numpy(tensor)
        if path[-2] in ("token_embedding", "position_embedding"):
            _set(tree, path[:-1] + ("embedding",), arr)
            continue
        leaf_name, value = _leaf(path[-1], arr)
        _set(tree, path[:-1] + (leaf_name,), value)
    return tree


# ---------------------------------------------------------------------------
# Structure audit
# ---------------------------------------------------------------------------

def audit_params(converted: Dict, reference_tree: Dict,
                 prefix: str = "") -> Tuple[list, list, list]:
    """Compare a converted tree against a model-initialized tree.

    Returns (missing, unexpected, shape_mismatches) — the JAX analogue of the
    reference's missing/unexpected-keys audits (unet.py:719-720).
    """
    missing, unexpected, mismatched = [], [], []

    def walk(conv, ref, path):
        conv_keys = set(conv) if isinstance(conv, dict) else set()
        ref_keys = set(ref) if isinstance(ref, dict) else set()
        if not isinstance(ref, dict):
            if not hasattr(conv, "shape"):
                mismatched.append((path, "leaf-vs-tree"))
            elif tuple(conv.shape) != tuple(ref.shape):
                mismatched.append((path, tuple(conv.shape), tuple(ref.shape)))
            return
        if not isinstance(conv, dict):
            mismatched.append((path, "tree-vs-leaf"))
            return
        for k in ref_keys - conv_keys:
            missing.append(path + (k,))
        for k in conv_keys - ref_keys:
            unexpected.append(path + (k,))
        for k in ref_keys & conv_keys:
            walk(conv[k], ref[k], path + (k,))

    walk(converted, reference_tree, (prefix,) if prefix else ())
    return missing, unexpected, mismatched


def merge_params(base: Dict, overlay: Dict) -> Dict:
    """Recursively merge ``overlay`` into a copy of ``base`` (partial loads,
    e.g. a motion-module checkpoint over an inflated 2D UNet)."""
    out = dict(base)
    for k, v in overlay.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = merge_params(out[k], v)
        else:
            out[k] = v
    return out
