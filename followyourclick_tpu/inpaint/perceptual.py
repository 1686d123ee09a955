"""Perceptual losses for LaMa training + LPIPS eval.

Behavior spec: reference
``Inpaint-Anything/third_party/lama/saicinpainting/training/losses/perceptual.py``
— ``ResNetPL`` (dilated ade20k ResNet-50 encoder, per-stage feature MSE sum)
and ``PerceptualLoss`` (VGG19 features with MaxPool→AvgPool swap, masked MSE
at every ReLU of the first 30 layers); LPIPS per
``saicinpainting/evaluation/losses/lpips.py`` (VGG16 taps, unit-normalized
channels, learned 1×1 linear heads).

Pretrained weights (ade20k resnet50dilated / torchvision vgg / lpips lins)
are external downloads unavailable here — every tower ships with a
state-dict converter so released checkpoints load directly
(``convert_ade20k_resnet_state_dict`` / ``convert_vgg_features_state_dict``
/ ``convert_lpips_state_dict``).

All towers are frozen feature extractors: BatchNorm is inference-mode
(running statistics folded into a scale/bias affine), NHWC layout.
"""

from __future__ import annotations

from typing import Dict, Mapping, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def imagenet_normalize(x: jnp.ndarray) -> jnp.ndarray:
    """[0,1] RGB (..., 3) → ImageNet-normalized."""
    return (x - IMAGENET_MEAN) / IMAGENET_STD


class FrozenBatchNorm(nn.Module):
    """Inference-mode BatchNorm2d: running stats are parameters."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        mean = self.param("mean", nn.initializers.zeros, (c,), jnp.float32)
        var = self.param("var", nn.initializers.ones, (c,), jnp.float32)
        inv = scale / jnp.sqrt(var + self.epsilon)
        return x * inv + (bias - mean * inv)


class Bottleneck(nn.Module):
    """ade20k ResNet bottleneck (resnet.py:57-93): 1×1 → 3×3(stride/dilate)
    → 1×1(×4), ReLU after the residual add."""

    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        out = nn.Conv(self.planes, (1, 1), use_bias=False, name="conv1")(x)
        out = nn.relu(FrozenBatchNorm(name="bn1")(out))
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride,) * 2,
                      kernel_dilation=(self.dilation,) * 2,
                      padding=[(self.dilation,) * 2] * 2,
                      use_bias=False, name="conv2")(out)
        out = nn.relu(FrozenBatchNorm(name="bn2")(out))
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False,
                      name="conv3")(out)
        out = FrozenBatchNorm(name="bn3")(out)
        if self.downsample:
            x = nn.Conv(self.planes * 4, (1, 1), strides=(self.stride,) * 2,
                        use_bias=False, name="downsample_conv")(x)
            x = FrozenBatchNorm(name="downsample_bn")(x)
        return nn.relu(out + x)


class DilatedResNet50Encoder(nn.Module):
    """ade20k ``resnet50dilated`` (ResnetDilated(dilate_scale=8), base.py:393):
    deep 3-conv stem (resnet.py:101-109), bottleneck stages [3,4,6,3];
    layer3/layer4 strides removed with dilation 2/4 (the stride-2 3×3 of the
    first block keeps dilation dilate//2 — base.py:423-436). Returns the four
    stage feature maps (NHWC)."""

    layers: Sequence[int] = (3, 4, 6, 3)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
        def stem_conv(feat, ch, stride, name):
            feat = nn.Conv(ch, (3, 3), strides=(stride, stride),
                           padding=[(1, 1), (1, 1)], use_bias=False,
                           name=name)(feat)
            return nn.relu(FrozenBatchNorm(name=name.replace("conv", "bn"))(feat))

        x = stem_conv(x, 64, 2, "conv1")
        x = stem_conv(x, 64, 1, "conv2")
        x = stem_conv(x, 128, 1, "conv3")
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        outs = []
        # (planes, first-block stride, first-block dilation, rest dilation)
        stages = [(64, 1, 1, 1), (128, 2, 1, 1), (256, 1, 1, 2),
                  (512, 1, 2, 4)]
        in_ch = 128
        for si, ((planes, stride, dil0, dil), n_blocks) in enumerate(
                zip(stages, self.layers)):
            for bi in range(n_blocks):
                first = bi == 0
                x = Bottleneck(
                    planes=planes,
                    stride=stride if first else 1,
                    dilation=dil0 if first else dil,
                    downsample=first and (stride != 1
                                          or in_ch != planes * 4),
                    name=f"layer{si + 1}_{bi}")(x)
                in_ch = planes * 4
            outs.append(x)
        return tuple(outs)


def resnet_pl_loss(params: Dict, pred: jnp.ndarray, target: jnp.ndarray,
                   weight: float = 30.0,
                   layers: Sequence[int] = (3, 4, 6, 3)) -> jnp.ndarray:
    """ResNet-PL (reference perceptual.py:89-115): ImageNet-normalize, run
    the frozen dilated encoder on pred and target, sum per-stage feature
    MSEs × weight. ``pred``/``target``: (B, H, W, 3) in [0, 1]. Default
    weight 30 per the big-lama training config."""
    enc = DilatedResNet50Encoder(layers=tuple(layers))
    pf = enc.apply({"params": params}, imagenet_normalize(pred))
    tf = enc.apply({"params": params}, imagenet_normalize(target))
    losses = [jnp.mean((a - b) ** 2) for a, b in zip(pf, tf)]
    return weight * sum(losses)


def convert_ade20k_resnet_state_dict(state_dict: Mapping[str, object]) -> Dict:
    """torch ``ResnetDilated``/ade20k-ResNet50 state dict → flax params.

    Accepts both raw ``resnet50`` names and the segmentation ckpt's
    ``encoder.`` prefix; ``fc``/``avgpool``/decoder keys are skipped."""
    from followyourclick_tpu.utils.convert import _set, _to_numpy

    tree: Dict = {}
    for key, tensor in state_dict.items():
        key = key.removeprefix("module.").removeprefix("encoder.")
        if key.startswith(("fc.", "avgpool.", "decoder.")):
            continue
        arr = _to_numpy(tensor)
        parts = key.split(".")
        if parts[0].startswith("layer") and len(parts) >= 3:
            stage, block, rest = parts[0], parts[1], parts[2:]
            mod = f"{stage}_{block}"
            if rest[0] == "downsample":
                sub = "downsample_conv" if rest[1] == "0" else "downsample_bn"
                rest = [sub] + rest[2:]
            path = (mod,) + tuple(rest[:-1])
            leaf = rest[-1]
        else:
            path = tuple(parts[:-1])
            leaf = parts[-1]
        mod_name = path[-1] if path else ""
        if mod_name.startswith("bn") or mod_name.endswith("_bn"):
            name = {"weight": "scale", "bias": "bias",
                    "running_mean": "mean", "running_var": "var"}.get(leaf)
            if name is None:  # num_batches_tracked
                continue
            _set(tree, path + (name,), arr)
        elif leaf == "weight" and arr.ndim == 4:
            _set(tree, path + ("kernel",), arr.transpose(2, 3, 1, 0))
        elif leaf == "bias":
            _set(tree, path + ("bias",), arr)
    return tree


# --------------------------------------------------------------- VGG19 -----

# torchvision vgg19.features layout: conv indices and pool positions
_VGG19_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
              512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]
_VGG16_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
              512, 512, 512, "M", 512, 512, 512, "M"]


class VGGFeatures(nn.Module):
    """torchvision VGG ``features`` tower with MaxPool→AvgPool swap
    (reference perceptual.py:24-36) and per-ReLU feature taps.

    ``max_layers`` truncates like the reference's ``vgg[:30]`` slice
    (counted in torchvision features indices: conv, relu and pool each
    count as one layer). Returns the list of tapped activations.
    """

    cfg: Sequence = tuple(_VGG19_CFG)
    max_layers: Optional[int] = None
    use_avg_pool: bool = True
    tap: str = "relu"  # "relu" = every ReLU; "pre_pool" = last conv per block

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        taps = []
        layer_idx = 0
        conv_idx = 0
        prev_relu = None
        for v in self.cfg:
            if self.max_layers is not None and layer_idx >= self.max_layers:
                break
            if v == "M":
                if self.tap == "pre_pool" and prev_relu is not None:
                    taps.append(prev_relu)
                if self.use_avg_pool:
                    x = nn.avg_pool(x, (2, 2), strides=(2, 2))
                else:
                    x = nn.max_pool(x, (2, 2), strides=(2, 2))
                layer_idx += 1
            else:
                x = nn.Conv(v, (3, 3), padding=[(1, 1), (1, 1)],
                            name=f"conv_{conv_idx}")(x)
                conv_idx += 1
                layer_idx += 1
                if self.max_layers is not None and layer_idx >= self.max_layers:
                    break
                x = nn.relu(x)
                prev_relu = x
                layer_idx += 1
                if self.tap == "relu":
                    taps.append(x)
        if (self.tap == "pre_pool" and prev_relu is not None
                and self.max_layers is None and self.cfg[-1] != "M"):
            taps.append(prev_relu)  # trailing block without a closing pool
        return taps


def vgg_perceptual_partial_losses(
    params: Dict, pred: jnp.ndarray, target: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
) -> Sequence[jnp.ndarray]:
    """Reference ``PerceptualLoss.partial_losses`` (perceptual.py:41-70):
    VGG19[:30] with avg-pooling; at every ReLU, per-sample MSE; with a mask,
    the loss is weighted by (1 − mask) interpolated to the feature size.
    Inputs (B, H, W, 3) in [0, 1]; returns list of (B,) losses."""
    import jax

    model = VGGFeatures(cfg=tuple(_VGG19_CFG), max_layers=30,
                        use_avg_pool=True, tap="relu")
    taps_p = model.apply({"params": params}, imagenet_normalize(pred))
    taps_t = model.apply({"params": params}, imagenet_normalize(target))
    losses = []
    for fp, ft in zip(taps_p, taps_t):
        err = (fp - ft) ** 2
        if mask is not None:
            m = jax.image.resize(
                mask, mask.shape[:1] + fp.shape[1:3] + mask.shape[3:],
                method="bilinear")
            err = err * (1.0 - m)
        losses.append(err.mean(axis=tuple(range(1, err.ndim))))
    return losses


def vgg_perceptual_loss(params: Dict, pred: jnp.ndarray,
                        target: jnp.ndarray,
                        mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Reference ``PerceptualLoss.forward``: sum of partial losses, (B,)."""
    losses = vgg_perceptual_partial_losses(params, pred, target, mask)
    return sum(losses)


def convert_vgg_features_state_dict(state_dict: Mapping[str, object]) -> Dict:
    """torchvision ``vgg*.features.state_dict()`` (``N.weight``/``N.bias``
    indexed by sequential position) → flax VGGFeatures params (conv order)."""
    from followyourclick_tpu.utils.convert import _set, _to_numpy

    items = []
    for key, tensor in state_dict.items():
        key = key.removeprefix("features.")
        idx, leaf = key.split(".")
        items.append((int(idx), leaf, _to_numpy(tensor)))
    items.sort(key=lambda kv: (kv[0], kv[1]))
    tree: Dict = {}
    conv_order = sorted({idx for idx, _, _ in items})
    remap = {idx: i for i, idx in enumerate(conv_order)}
    for idx, leaf, arr in items:
        name = f"conv_{remap[idx]}"
        if leaf == "weight":
            _set(tree, (name, "kernel"), arr.transpose(2, 3, 1, 0))
        else:
            _set(tree, (name, "bias"), arr)
    return tree


# --------------------------------------------------------------- LPIPS -----


class LPIPS(nn.Module):
    """LPIPS(VGG16): five block taps (relu1_2..relu5_3), channel-unit-
    normalize, squared difference, learned 1×1 linear head per tap, spatial
    mean, sum over taps (reference evaluation/losses/lpips.py — the PNetLin
    ``pnet_type='vgg'``, ``spatial=False`` configuration)."""

    @nn.compact
    def __call__(self, pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        # lpips 'scaling layer' constants (shift/scale from the package)
        shift = jnp.asarray([-0.030, -0.088, -0.188], jnp.float32)
        scale = jnp.asarray([0.458, 0.448, 0.450], jnp.float32)

        def norm_input(x):
            x = 2.0 * x - 1.0  # [0,1] → [-1,1]
            return (x - shift) / scale

        vgg = VGGFeatures(cfg=tuple(_VGG16_CFG), use_avg_pool=False,
                          tap="pre_pool", name="net")
        fp = vgg(norm_input(pred))
        ft = vgg(norm_input(target))

        total = 0.0
        for i, (a, b) in enumerate(zip(fp, ft)):
            def unit(t):
                n = jnp.sqrt(jnp.sum(t ** 2, axis=-1, keepdims=True))
                return t / (n + 1e-10)

            d = (unit(a) - unit(b)) ** 2
            head = nn.Conv(1, (1, 1), use_bias=False, name=f"lin{i}")
            total = total + head(d).mean(axis=(1, 2, 3))
        return total


def convert_lpips_state_dict(vgg_features_sd: Mapping[str, object],
                             lins_sd: Mapping[str, object]) -> Dict:
    """(torchvision vgg16.features sd, lpips package lins sd with keys like
    ``lin0.model.1.weight``) → flax LPIPS params."""
    from followyourclick_tpu.utils.convert import _set, _to_numpy

    tree: Dict = {"net": convert_vgg_features_state_dict(vgg_features_sd)}
    for key, tensor in lins_sd.items():
        key = key.removeprefix("lins.")
        head = key.split(".")[0]  # lin0..lin4
        arr = _to_numpy(tensor)
        _set(tree, (head, "kernel"), arr.transpose(2, 3, 1, 0))
    return tree
