"""Big-LaMa PyTorch checkpoint → flax variables converter.

The released ``big-lama`` checkpoint stores the generator as a flat
``nn.Sequential`` (reference ffc.py:315-364): index 0 = ReflectionPad,
1 = stem FFC_BN_ACT, 2..(1+D) = downsamples, then N resnet blocks, a
ConcatTupleLayer, D×(ConvTranspose2d, BN, ReLU), ReflectionPad, head Conv,
sigmoid. Keys are ``generator.model.{idx}....`` in the training checkpoint
(``best.ckpt``) or ``model.{idx}....`` after scripting.

BatchNorm running stats map into the ``batch_stats`` collection.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from followyourclick_tpu.inpaint.lama import LamaConfig


def _t(w):
    return np.asarray(w, dtype=np.float32)


class _Tree:
    """Two-collection (params / batch_stats) nested-dict builder."""

    def __init__(self):
        self.params: Dict[str, Any] = {}
        self.stats: Dict[str, Any] = {}

    def _set(self, root, path, leaf):
        d = root
        for k in path[:-1]:
            d = d.setdefault(k, {})
        d[path[-1]] = leaf

    def conv(self, sd, src, *path):
        self._set(self.params, path + ("kernel",),
                  _t(sd[src + ".weight"]).transpose(2, 3, 1, 0))
        if src + ".bias" in sd:
            self._set(self.params, path + ("bias",), _t(sd[src + ".bias"]))

    def conv_transpose(self, sd, src, *path):
        # flax ConvTranspose(transpose_kernel=True): (kh, kw, out, in)
        self._set(self.params, path + ("kernel",),
                  _t(sd[src + ".weight"]).transpose(2, 3, 1, 0))
        if src + ".bias" in sd:
            self._set(self.params, path + ("bias",), _t(sd[src + ".bias"]))

    def bn(self, sd, src, *path):
        inner = path + ("BatchNorm_0",)
        self._set(self.params, inner + ("scale",), _t(sd[src + ".weight"]))
        self._set(self.params, inner + ("bias",), _t(sd[src + ".bias"]))
        self._set(self.stats, inner + ("mean",), _t(sd[src + ".running_mean"]))
        self._set(self.stats, inner + ("var",), _t(sd[src + ".running_var"]))


def _spectral(tree, sd, src, *path):
    tree.conv(sd, src + ".conv1.0", *path, "conv1")
    tree.bn(sd, src + ".conv1.1", *path, "bn1")
    tree.conv(sd, src + ".fu.conv_layer", *path, "fu", "conv")
    tree.bn(sd, src + ".fu.bn", *path, "fu", "bn")
    if src + ".lfu.conv_layer.weight" in sd:
        tree.conv(sd, src + ".lfu.conv_layer", *path, "lfu", "conv")
        tree.bn(sd, src + ".lfu.bn", *path, "lfu", "bn")
    tree.conv(sd, src + ".conv2", *path, "conv2")


def _ffc_bn_act(tree, sd, src, *path):
    for name in ("convl2l", "convl2g", "convg2l"):
        if f"{src}.ffc.{name}.weight" in sd:
            tree.conv(sd, f"{src}.ffc.{name}", *path, "ffc", name)
    if f"{src}.ffc.convg2g.conv2.weight" in sd:
        _spectral(tree, sd, f"{src}.ffc.convg2g", *path, "ffc", "convg2g")
    if f"{src}.bn_l.weight" in sd:
        tree.bn(sd, f"{src}.bn_l", *path, "bn_l")
    if f"{src}.bn_g.weight" in sd:
        tree.bn(sd, f"{src}.bn_g", *path, "bn_g")


def convert_lama_state_dict(
    state_dict: Dict[str, Any], config: LamaConfig = LamaConfig()
) -> Dict[str, Any]:
    """torch generator state dict → ``{"params", "batch_stats"}`` for
    ``FFCResNetGenerator``. Accepts ``generator.model.*`` or ``model.*``
    key prefixes."""
    sd = {}
    for k, v in state_dict.items():
        if k.startswith("generator."):
            k = k[len("generator."):]
        if k.startswith("model."):
            sd[k] = v
    tree = _Tree()
    D, N = config.n_downsampling, config.n_blocks

    _ffc_bn_act(tree, sd, "model.1", "stem")
    for i in range(D):
        _ffc_bn_act(tree, sd, f"model.{2 + i}", f"down{i}")
    base = 2 + D
    for i in range(N):
        blk = f"model.{base + i}"
        _ffc_bn_act(tree, sd, f"{blk}.conv1", f"block{i}", "conv1")
        _ffc_bn_act(tree, sd, f"{blk}.conv2", f"block{i}", "conv2")
    up_base = base + N + 1  # +1 skips ConcatTupleLayer
    for i in range(D):
        tree.conv_transpose(sd, f"model.{up_base + 3 * i}", f"up{i}")
        tree.bn(sd, f"model.{up_base + 3 * i + 1}", f"up_bn{i}")
    head_idx = up_base + 3 * D + 1  # +1 skips the ReflectionPad
    tree.conv(sd, f"model.{head_idx}", "head")

    return {"params": tree.params, "batch_stats": tree.stats}


def load_lama_checkpoint(
    path: str, config: LamaConfig = LamaConfig()
) -> Dict[str, Any]:
    import torch

    ckpt = torch.load(path, map_location="cpu")
    sd = ckpt.get("state_dict", ckpt)
    sd = {k: v.numpy() for k, v in sd.items()}
    return convert_lama_state_dict(sd, config)
