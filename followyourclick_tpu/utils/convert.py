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


# ---------------------------------------------------------------------------
# IP-Adapter (image-prompt conditioning)
# ---------------------------------------------------------------------------

def convert_image_proj_state_dict(state_dict: Mapping[str, object]) -> Dict:
    """Vanilla ``ImageProjModel.state_dict()`` (proj Linear + norm LN,
    reference my_ip_adapter.py ImageProjModel) → flax params."""
    return {
        "proj": {"kernel": _to_numpy(state_dict["proj.weight"]).T,
                 "bias": _to_numpy(state_dict["proj.bias"])},
        "norm": {"scale": _to_numpy(state_dict["norm.weight"]),
                 "bias": _to_numpy(state_dict["norm.bias"])},
    }


def convert_resampler_state_dict(state_dict: Mapping[str, object]) -> Dict:
    """Reference ``Resampler.state_dict()`` (resampler.py:81-147: latents,
    proj_in/out, norm_out, layers.{i}.0 = PerceiverAttention,
    layers.{i}.1 = Sequential(LN, Linear, GELU, Linear)) → flax params."""
    sd = state_dict
    tree: Dict = {
        "latents": _to_numpy(sd["latents"]),
        "proj_in": {"kernel": _to_numpy(sd["proj_in.weight"]).T,
                    "bias": _to_numpy(sd["proj_in.bias"])},
        "proj_out": {"kernel": _to_numpy(sd["proj_out.weight"]).T,
                     "bias": _to_numpy(sd["proj_out.bias"])},
        "norm_out": {"scale": _to_numpy(sd["norm_out.weight"]),
                     "bias": _to_numpy(sd["norm_out.bias"])},
    }
    depth = 0
    while f"layers.{depth}.0.to_q.weight" in sd:
        p = f"layers.{depth}"
        tree[f"layers_{depth}_attn"] = {
            "norm1": {"scale": _to_numpy(sd[f"{p}.0.norm1.weight"]),
                      "bias": _to_numpy(sd[f"{p}.0.norm1.bias"])},
            "norm2": {"scale": _to_numpy(sd[f"{p}.0.norm2.weight"]),
                      "bias": _to_numpy(sd[f"{p}.0.norm2.bias"])},
            "to_q": {"kernel": _to_numpy(sd[f"{p}.0.to_q.weight"]).T},
            "to_kv": {"kernel": _to_numpy(sd[f"{p}.0.to_kv.weight"]).T},
            "to_out": {"kernel": _to_numpy(sd[f"{p}.0.to_out.weight"]).T},
        }
        tree[f"layers_{depth}_ff_norm"] = {
            "scale": _to_numpy(sd[f"{p}.1.0.weight"]),
            "bias": _to_numpy(sd[f"{p}.1.0.bias"])}
        tree[f"layers_{depth}_ff_in"] = {
            "kernel": _to_numpy(sd[f"{p}.1.1.weight"]).T}
        tree[f"layers_{depth}_ff_out"] = {
            "kernel": _to_numpy(sd[f"{p}.1.3.weight"]).T}
        depth += 1
    return tree


def convert_clip_vision_state_dict(state_dict: Mapping[str, object]) -> Dict:
    """transformers ``CLIPVisionModelWithProjection.state_dict()`` → flax
    params for ``models.ip_adapter.CLIPVisionModel``."""
    tree: Dict = {}
    for key, tensor in state_dict.items():
        arr = _to_numpy(tensor)
        k = key.replace("vision_model.", "")
        if k == "embeddings.class_embedding":
            _set(tree, ("class_embedding",), arr)
        elif k == "embeddings.patch_embedding.weight":
            _set(tree, ("patch_embedding", "kernel"),
                 arr.transpose(2, 3, 1, 0))
        elif k == "embeddings.position_embedding.weight":
            _set(tree, ("position_embedding", "embedding"), arr)
        elif k == "visual_projection.weight":
            _set(tree, ("visual_projection", "kernel"), arr.T)
        elif k.startswith("pre_layrnorm") or k.startswith("post_layernorm"):
            mod, leaf = k.split(".")
            _set(tree, (mod, "scale" if leaf == "weight" else "bias"), arr)
        elif k.startswith("encoder.layers."):
            parts = k.split(".")
            idx = parts[2]
            rest = parts[3:]
            if rest[0] == "self_attn":
                mod = rest[1]
            elif rest[0] == "mlp":
                mod = {"fc1": "mlp_fc1", "fc2": "mlp_fc2"}[rest[1]]
            else:
                mod = rest[0]  # layer_norm1 / layer_norm2
            leaf = rest[-1]
            if mod.startswith("layer_norm"):
                name = "scale" if leaf == "weight" else "bias"
                _set(tree, (f"layers_{idx}", mod, name), arr)
            else:
                name, val = _leaf(leaf, arr)
                _set(tree, (f"layers_{idx}", mod, name), val)
    return tree


def graft_ip_cross_attention(
    unet_params: Dict, ip_state_dict: Mapping[str, object]
) -> Dict:
    """Positional graft of the ip ckpt's decoupled k/v weights onto every
    ``to_k_ip``/``to_v_ip`` kernel in the UNet tree — replicating the
    reference's state-dict-order zip (my_ip_adapter.py:103-125: '_ip' keys
    in module order vs ckpt key order)."""
    import jax

    ckpt = [(k, _to_numpy(v)) for k, v in ip_state_dict.items()
            if "_ip" in k]

    paths = []

    def collect(tree, path):
        for k in sorted(tree):
            v = tree[k]
            if isinstance(v, dict):
                if k in ("to_k_ip", "to_v_ip"):
                    paths.append(path + (k,))
                else:
                    collect(v, path + (k,))

    out = jax.tree_util.tree_map(lambda x: x, unet_params)  # deep-ish copy
    collect(out, ())
    if len(paths) != len(ckpt):
        raise ValueError(
            f"ip ckpt has {len(ckpt)} '_ip' tensors but the UNet exposes "
            f"{len(paths)} ip projections")
    for path, (name, arr) in zip(paths, ckpt):
        node = out
        for p in path[:-1]:
            node = node[p]
        node = node.setdefault(path[-1], {}) if isinstance(
            node.get(path[-1]), type(None)) else node[path[-1]]
        expected = node["kernel"].shape
        kernel = arr.T
        if tuple(kernel.shape) != tuple(expected):
            raise ValueError(
                f"shape mismatch grafting {name} -> {'/'.join(path)}: "
                f"{kernel.shape} vs {expected}")
        node["kernel"] = kernel
    return out
