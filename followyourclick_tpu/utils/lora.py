"""LoRA merge-at-load for SD (kohya) and motion-module LoRA checkpoints.

Behavior spec: reference ``animatediff/utils/convert_lora_safetensor_to_diffusers.py``
— ``convert_motion_lora_ckpt_to_diffusers`` (:26-51: ``W += α·up@down`` into
the named layer) and ``convert_lora`` (:95-: kohya underscore-flattened names,
greedy attribute resolution, same merge rule).

In JAX this is a pure tree-map: resolve each LoRA pair to a kernel path in the
param tree and add ``α·(up@down)ᵀ`` — no module surgery (SURVEY.md §7 step 7).
"""

from __future__ import annotations

from typing import Dict, Mapping, Tuple

import numpy as np

from followyourclick_tpu.utils.convert import _map_unet_key, _to_numpy


def _get(tree: Dict, path: Tuple[str, ...]):
    node = tree
    for p in path:
        node = node[p]
    return node


def _add_at(tree: Dict, path: Tuple[str, ...], delta: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node[p]
    leaf = node[path[-1]]
    assert leaf.shape == delta.shape, (path, leaf.shape, delta.shape)
    node[path[-1]] = np.asarray(leaf) + delta.astype(np.asarray(leaf).dtype)


def merge_motion_lora(unet_params: Dict, state_dict: Mapping[str, object],
                      alpha: float = 1.0) -> Dict:
    """Merge a camera-motion LoRA checkpoint into UNet params (copy).

    Keys look like ``...processor.to_q_lora.down.weight`` (reference :26-51);
    the target layer is the key with ``processor./_lora/down./up.`` stripped.
    """
    import copy

    params = copy.deepcopy(unet_params)
    for key in state_dict:
        if "lora" not in key or ".up." in key:
            continue
        up_key = key.replace(".down.", ".up.")
        model_key = (key.replace("processor.", "").replace("_lora", "")
                     .replace("down.", "").replace("up.", "")
                     .replace("module.", ""))
        down = _to_numpy(state_dict[key])
        up = _to_numpy(state_dict[up_key])
        path = _map_unet_key(model_key)
        assert path is not None and path[-1] == "weight", model_key
        # torch W (out,in) += up@down ; flax kernel (in,out) += (up@down)^T
        delta = alpha * (up @ down).T
        _add_at(params, path[:-1] + ("kernel",), delta)
    return params


def _resolve_underscore_name(tree: Dict, flat: str) -> Tuple[str, ...]:
    """Resolve a kohya underscore-flattened module name against the actual
    param tree by greedy longest-prefix matching (the reference does the same
    thing with getattr probing, :118-131)."""
    segments = flat.split("_")
    path = []
    node = tree
    i = 0
    while i < len(segments):
        match = None
        # longest candidate first
        for j in range(len(segments), i, -1):
            cand = "_".join(segments[i:j])
            if isinstance(node, dict) and cand in node:
                match = (cand, j)
                break
        if match is None:
            raise KeyError(
                f"cannot resolve '{flat}' at segment {i} "
                f"(options: {list(node)[:8] if isinstance(node, dict) else 'leaf'})")
        path.append(match[0])
        node = node[match[0]]
        i = match[1]
    return tuple(path)


# kohya name fragments that need renaming to our tree before resolution
_KOHYA_RENAMES = (
    ("_to_out_0", "_to_out"),
    ("_ff_net_0_proj", "_ff_proj"),
    ("_ff_net_2", "_ff_out"),
    ("_text_model", ""),
    ("_mlp_fc1", "_mlp_fc1"),  # identity, for clarity
)


def merge_sd_lora(unet_params: Dict, text_encoder_params: Dict | None,
                  state_dict: Mapping[str, object],
                  alpha: float = 0.6) -> Tuple[Dict, Dict | None]:
    """Merge a kohya-format SD LoRA (``lora_unet_*`` / ``lora_te_*``) into
    copies of the UNet / text-encoder params (reference convert_lora :95-)."""
    import copy

    unet = copy.deepcopy(unet_params)
    te = copy.deepcopy(text_encoder_params) if text_encoder_params else None
    visited = set()
    for key in state_dict:
        if ".alpha" in key or key in visited or "lora_down" not in key:
            continue
        up_key = key.replace("lora_down", "lora_up")
        visited.update((key, up_key))

        flat = key.split(".")[0]
        if flat.startswith("lora_te_"):
            if te is None:
                continue
            name = flat[len("lora_te_"):]
            for old, new in _KOHYA_RENAMES:
                name = name.replace(old, new)
            name = name.removeprefix("text_model_")
            name = name.replace("encoder_layers_", "layers_")
            tree = te
        elif flat.startswith("lora_unet_"):
            name = flat[len("lora_unet_"):]
            for old, new in _KOHYA_RENAMES:
                name = name.replace(old, new)
            tree = unet
        else:
            continue

        path = _resolve_underscore_name(tree, name)
        down = _to_numpy(state_dict[key])
        up = _to_numpy(state_dict[up_key])
        if down.ndim == 4:  # conv LoRA: down (r, in, kh, kw), up (out, r, 1, 1)
            delta = np.einsum("or,rihw->oihw", up[:, :, 0, 0], down)
            delta = alpha * delta.transpose(2, 3, 1, 0)  # -> (kh, kw, in, out)
            leaf_path = path + ("kernel",)
        else:
            delta = alpha * (up @ down).T
            leaf_path = path + ("kernel",)
        target = _get(tree, path)
        if "kernel" not in target:
            raise KeyError(f"no kernel at {path}")
        _add_at(tree, leaf_path, delta)
    return unet, te
