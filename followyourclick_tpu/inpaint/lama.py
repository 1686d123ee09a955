"""LaMa FFC-ResNet inpainting generator.

Behavior spec: reference ``Inpaint-Anything/third_party/lama/saicinpainting/
training/modules/ffc.py`` — ``FourierUnit`` :49 (rfft2 → 1x1 conv + BN+ReLU
on stacked real/imag → irfft2, fft_norm='ortho'), ``SpectralTransform`` :116,
``FFC`` :166 (local/global split with cross convs), ``FFC_BN_ACT`` :228,
``FFCResnetBlock`` :258, ``FFCResNetGenerator`` :305. Architecture constants
from the released big-lama config
(``configs/training/big-lama.yaml:26-45``): input 4ch (RGB + mask), ngf 64,
3 downsamples, 18 resnet blocks @ ratio 0.75, LFU disabled, sigmoid output.

TPU-first: NHWC; reflect padding is an explicit static ``jnp.pad``; the FFT
channel interleave matches torch's (channel-major, real/imag inner) so
released ``big-lama`` checkpoints convert directly.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class LamaConfig:
    input_nc: int = 4
    output_nc: int = 3
    ngf: int = 64
    n_downsampling: int = 3
    n_blocks: int = 18
    max_features: int = 1024
    resnet_ratio: float = 0.75
    enable_lfu: bool = False
    add_out_act: str = "sigmoid"
    dtype: Any = jnp.float32


class _BN(nn.Module):
    """BatchNorm with running stats (torch nn.BatchNorm2d semantics)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype,
        )(x)


def _reflect_conv(
    x: jnp.ndarray, features: int, kernel: int, stride: int, pad: int,
    dilation: int, name: str, dtype, parent,
) -> jnp.ndarray:
    """Conv with reflect padding (torch padding_mode='reflect')."""
    if pad:
        x = jnp.pad(
            x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect"
        )
    return nn.Conv(
        features, (kernel, kernel), strides=(stride, stride),
        padding="VALID", kernel_dilation=(dilation, dilation),
        use_bias=False, dtype=dtype, name=name, parent=parent,
    )(x)


class FourierUnit(nn.Module):
    """Spectral conv (ffc.py:49-113): rfft2 → stack(real, imag) as channels
    (channel-major, real/imag innermost — torch's view layout) → 1x1 conv +
    BN + ReLU → complex → irfft2(norm='ortho')."""

    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        B, H, W, C = x.shape
        ffted = jnp.fft.rfft2(
            x.astype(jnp.float32), axes=(1, 2), norm="ortho"
        )  # (B, H, W//2+1, C) complex
        f = jnp.stack([ffted.real, ffted.imag], axis=-1)  # (B,H,Wf,C,2)
        f = f.reshape(B, H, W // 2 + 1, C * 2).astype(self.dtype)
        f = nn.Conv(
            self.out_channels * 2, (1, 1), use_bias=False, dtype=self.dtype,
            name="conv",
        )(f)
        f = _BN(self.dtype, name="bn")(f, train)
        f = nn.relu(f)
        f = f.reshape(B, H, W // 2 + 1, self.out_channels, 2)
        comp = jax.lax.complex(
            f[..., 0].astype(jnp.float32), f[..., 1].astype(jnp.float32)
        )
        out = jnp.fft.irfft2(comp, s=(H, W), axes=(1, 2), norm="ortho")
        return out.astype(self.dtype)


class SpectralTransform(nn.Module):
    """ffc.py:116-163: 1x1 conv+BN+ReLU → FourierUnit (+ optional LFU) →
    residual 1x1 conv."""

    out_channels: int
    stride: int = 1
    enable_lfu: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.stride == 2:
            B, H, W, C = x.shape
            x = x.reshape(B, H // 2, 2, W // 2, 2, C).mean(axis=(2, 4))
        half = self.out_channels // 2
        x = nn.Conv(
            half, (1, 1), use_bias=False, dtype=self.dtype, name="conv1"
        )(x)
        x = nn.relu(_BN(self.dtype, name="bn1")(x, train))
        out = FourierUnit(half, self.dtype, name="fu")(x, train)
        if self.enable_lfu:
            B, H, W, C = x.shape
            s = H // 2
            # quarter-channel, 2x2 spatial tiling into channels (ffc.py:146-155)
            xs = x[..., : C // 4]
            xs = jnp.concatenate(jnp.split(xs, 2, axis=1), axis=-1)
            xs = jnp.concatenate(jnp.split(xs, 2, axis=2), axis=-1)
            xs = FourierUnit(half, self.dtype, name="lfu")(xs, train)
            xs = jnp.tile(xs, (1, 2, 2, 1))
        else:
            xs = 0.0
        return nn.Conv(
            self.out_channels, (1, 1), use_bias=False, dtype=self.dtype,
            name="conv2",
        )(x + out + xs)


class FFC(nn.Module):
    """Local/global split convolution (ffc.py:166-226)."""

    in_channels: int
    out_channels: int
    kernel_size: int
    ratio_gin: float
    ratio_gout: float
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    enable_lfu: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, x_l: jnp.ndarray, x_g: Optional[jnp.ndarray],
        train: bool = False,
    ) -> Tuple[Optional[jnp.ndarray], Optional[jnp.ndarray]]:
        in_cg = int(self.in_channels * self.ratio_gin)
        in_cl = self.in_channels - in_cg
        out_cg = int(self.out_channels * self.ratio_gout)
        out_cl = self.out_channels - out_cg

        def conv(name, src, features):
            return _reflect_conv(
                src, features, self.kernel_size, self.stride, self.padding,
                self.dilation, name, self.dtype, self,
            )

        out_xl = out_xg = None
        if out_cl:
            out_xl = 0.0
            if in_cl:
                out_xl = out_xl + conv("convl2l", x_l, out_cl)
            if in_cg:
                out_xl = out_xl + conv("convg2l", x_g, out_cl)
        if out_cg:
            out_xg = 0.0
            if in_cl:
                out_xg = out_xg + conv("convl2g", x_l, out_cg)
            if in_cg:
                out_xg = out_xg + SpectralTransform(
                    out_cg, self.stride, self.enable_lfu, self.dtype,
                    name="convg2g",
                )(x_g, train)
        return out_xl, out_xg


class FFC_BN_ACT(nn.Module):
    """FFC followed by per-branch BN + ReLU (ffc.py:228-255)."""

    in_channels: int
    out_channels: int
    kernel_size: int
    ratio_gin: float
    ratio_gout: float
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    enable_lfu: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x_l, x_g, train: bool = False):
        x_l, x_g = FFC(
            self.in_channels, self.out_channels, self.kernel_size,
            self.ratio_gin, self.ratio_gout, self.stride, self.padding,
            self.dilation, self.enable_lfu, self.dtype, name="ffc",
        )(x_l, x_g, train)
        if x_l is not None:
            x_l = nn.relu(_BN(self.dtype, name="bn_l")(x_l, train))
        if x_g is not None:
            x_g = nn.relu(_BN(self.dtype, name="bn_g")(x_g, train))
        return x_l, x_g


class FFCResnetBlock(nn.Module):
    """Two FFC_BN_ACT with per-branch residual (ffc.py:258-287)."""

    dim: int
    ratio: float
    dilation: int = 1
    enable_lfu: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x_l, x_g, train: bool = False):
        id_l, id_g = x_l, x_g
        x_l, x_g = FFC_BN_ACT(
            self.dim, self.dim, 3, self.ratio, self.ratio,
            padding=self.dilation, dilation=self.dilation,
            enable_lfu=self.enable_lfu, dtype=self.dtype, name="conv1",
        )(x_l, x_g, train)
        x_l, x_g = FFC_BN_ACT(
            self.dim, self.dim, 3, self.ratio, self.ratio,
            padding=self.dilation, dilation=self.dilation,
            enable_lfu=self.enable_lfu, dtype=self.dtype, name="conv2",
        )(x_l, x_g, train)
        return id_l + x_l, id_g + x_g


class FFCResNetGenerator(nn.Module):
    """ffc.py:305-371: reflect-pad 7x7 stem → 3 stride-2 downsamples (last
    one splits off the global branch) → n FFC resnet blocks → concat →
    3 transposed-conv upsamples → reflect-pad 7x7 head → sigmoid."""

    config: LamaConfig = LamaConfig()

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        cfg = self.config
        dt = cfg.dtype

        x_l, x_g = FFC_BN_ACT(
            cfg.input_nc, cfg.ngf, 7, 0.0, 0.0, padding=3,
            enable_lfu=cfg.enable_lfu, dtype=dt, name="stem",
        )(x, None, train)

        for i in range(cfg.n_downsampling):
            mult = 2**i
            gout = (
                cfg.resnet_ratio if i == cfg.n_downsampling - 1 else 0.0
            )
            # every downsample has ratio_gin 0 (big-lama.yaml:38-40: the
            # global branch only appears at the LAST downsample's output)
            x_l, x_g = FFC_BN_ACT(
                min(cfg.max_features, cfg.ngf * mult),
                min(cfg.max_features, cfg.ngf * mult * 2),
                3, 0.0, gout, stride=2, padding=1,
                enable_lfu=cfg.enable_lfu, dtype=dt, name=f"down{i}",
            )(x_l, x_g, train)

        mult = 2**cfg.n_downsampling
        feats = min(cfg.max_features, cfg.ngf * mult)
        for i in range(cfg.n_blocks):
            x_l, x_g = FFCResnetBlock(
                feats, cfg.resnet_ratio, enable_lfu=cfg.enable_lfu,
                dtype=dt, name=f"block{i}",
            )(x_l, x_g, train)

        x = jnp.concatenate([x_l, x_g], axis=-1)

        for i in range(cfg.n_downsampling):
            mult = 2 ** (cfg.n_downsampling - i)
            feats = min(cfg.max_features, int(cfg.ngf * mult / 2))
            # torch ConvTranspose2d(k3, s2, p1, output_padding=1): VALID
            # transpose then crop 1 from top/left (exact-size emulation)
            x = nn.ConvTranspose(
                feats, (3, 3), strides=(2, 2), padding="VALID",
                transpose_kernel=True, dtype=dt, name=f"up{i}",
            )(x)
            x = x[:, 1:, 1:, :]
            x = nn.relu(_BN(dt, name=f"up_bn{i}")(x, train))

        x = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)), mode="reflect")
        x = nn.Conv(
            cfg.output_nc, (7, 7), padding="VALID", dtype=dt, name="head"
        )(x)
        if cfg.add_out_act == "sigmoid":
            x = nn.sigmoid(x)
        elif cfg.add_out_act == "tanh":
            x = nn.tanh(x)
        return x


@functools.partial(jax.jit, static_argnums=(0,))
def _inpaint_jit(model, variables, image, mask):
    masked = image * (1.0 - mask)
    inp = jnp.concatenate([masked, mask], axis=-1)
    pred = model.apply(variables, inp)
    return mask * pred + (1.0 - mask) * image


class LamaInpainter:
    """End-to-end inpaint wrapper (reference ``lama_inpaint.py:28-86``
    inpaint_img_with_lama): img [0,255] uint8 + binary mask → inpainted
    uint8; sizes padded up to a multiple of 8 (``pad_img_to_modulo``)."""

    def __init__(self, model: FFCResNetGenerator, variables):
        self.model = model
        self.variables = variables

    @staticmethod
    def init_random(config: LamaConfig = LamaConfig(), seed: int = 0):
        model = FFCResNetGenerator(config)
        variables = model.init(
            jax.random.PRNGKey(seed), jnp.zeros((1, 64, 64, config.input_nc))
        )
        return LamaInpainter(model, variables)

    def __call__(self, image: np.ndarray, mask: np.ndarray) -> np.ndarray:
        assert image.ndim == 3 and image.shape[2] == 3
        h, w = image.shape[:2]
        ph = (-h) % 8
        pw = (-w) % 8
        img = image.astype(np.float32) / 255.0
        m = (np.asarray(mask) > 0).astype(np.float32)
        img = np.pad(img, ((0, ph), (0, pw), (0, 0)), mode="symmetric")
        m = np.pad(m, ((0, ph), (0, pw)), mode="symmetric")
        out = _inpaint_jit(
            self.model, self.variables, jnp.asarray(img)[None],
            jnp.asarray(m)[None, ..., None],
        )
        out = np.asarray(out[0])[:h, :w]
        return np.clip(out * 255.0, 0, 255).astype(np.uint8)
