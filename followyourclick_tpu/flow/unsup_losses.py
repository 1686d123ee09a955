"""Occlusion BCE + unsupervised photometric/smoothness flow losses.

Behavior spec: reference ``mmflow/mmflow/models/losses/multilevel_bce.py``
(sigmoid BCE with optional IRR-style class balancing — weights
0.5·HW/(Σtarget+Σpred) — 'sum' reduction = sum/batch, multi-level weighting
with average-pooled downsampled targets), ``census_loss.py`` (soft census
transform on grayscale×255, soft hamming distance, edge-masked mean) and
``smooth_loss.py`` (edge-weighted 1st/2nd-order flow smoothness with
exponential or gaussian weighting).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Union

import jax
import jax.numpy as jnp


def binary_cross_entropy(
    pred: jnp.ndarray,     # (B, H, W, 1) logits
    target: jnp.ndarray,   # (B, H, W, 1) in {0, 1}
    balance: bool = False,
    reduction: str = "sum",
) -> jnp.ndarray:
    """Occlusion BCE (multilevel_bce.py:11-83)."""
    assert pred.shape == target.shape
    b = pred.shape[0]
    h, w = pred.shape[1:3]
    p = jax.nn.sigmoid(pred)
    if balance:
        tp_w = 0.5 * h * w / (
            target.sum(axis=(1, 2, 3)) + p.sum(axis=(1, 2, 3)) + 1e-8)
        fn_w = 0.5 * h * w / (
            (1 - target).sum(axis=(1, 2, 3)) + (1 - p).sum(axis=(1, 2, 3))
            + 1e-8)
    else:
        tp_w = jnp.ones((b,), pred.dtype)
        fn_w = jnp.ones((b,), pred.dtype)
    tp = -target * jnp.log(p + 1e-8) * tp_w[:, None, None, None]
    fn = -(1 - target) * jnp.log(1 - p + 1e-8) * fn_w[:, None, None, None]
    bce = tp + fn
    if reduction == "none":
        return bce[..., 0]
    if reduction == "mean":
        return bce.mean()
    return bce.sum() / b


def multi_level_bce(
    preds: Dict[str, Union[jnp.ndarray, Sequence[jnp.ndarray]]],
    target: jnp.ndarray,
    weights: Optional[Dict[str, float]] = None,
    balance: bool = False,
) -> jnp.ndarray:
    """Multi-level occlusion loss (``MultiLevelBCE``): GT average-pooled to
    each level; list-valued levels (IRR's [raw, refined]) are averaged."""
    if weights is None:
        weights = {
            "level6": 0.32, "level5": 0.08, "level4": 0.02,
            "level3": 0.01, "level2": 0.005,
        }
    B, H, W, _ = target.shape
    total = 0.0
    for name, w in weights.items():
        level_preds = preds[name]
        if not isinstance(level_preds, (list, tuple)):
            level_preds = [level_preds]
        for pred in level_preds:
            h, wd = pred.shape[1:3]
            gt = target.reshape(B, h, H // h, wd, W // wd, 1).mean(
                axis=(2, 4))
            total = total + w * binary_cross_entropy(
                pred, gt, balance=balance) / len(level_preds)
    return total


def census_loss(
    image1: jnp.ndarray, image2: jnp.ndarray, patch_size: int = 3
) -> jnp.ndarray:
    """Soft census loss (census_loss.py:7-63): soft census transform of the
    255-scaled grayscale, soft hamming distance, border-masked mean.
    Images NHWC in [0, 1]."""

    def gray(img):
        g = (img[..., 0] * 0.2989 + img[..., 1] * 0.5870
             + img[..., 2] * 0.1140)
        return g[..., None] * 255.0

    p = patch_size // 2
    k = patch_size * patch_size

    def census(img):
        inten = gray(img)
        padded = jnp.pad(inten, ((0, 0), (p, p), (p, p), (0, 0)))
        H, W = inten.shape[1:3]
        patches = jnp.concatenate(
            [padded[:, dy : dy + H, dx : dx + W]
             for dy in range(patch_size) for dx in range(patch_size)],
            axis=-1,
        )  # (B, H, W, k)
        t = patches - inten
        return t / jnp.sqrt(0.81 + t * t)

    t1 = census(image1)
    t2 = census(image2)
    dist = (t1 - t2) ** 2
    dist = dist / (0.1 + dist)
    dist = dist.mean(axis=-1, keepdims=True)

    B, H, W, _ = image1.shape
    mask = jnp.zeros((B, H, W, 1)).at[:, p : H - p, p : W - p].set(1.0)
    return (dist * mask).sum() / mask.sum()


def _gradient(x: jnp.ndarray, stride: int = 1):
    dx = x[:, :, stride:] - x[:, :, :-stride]
    dy = x[:, stride:] - x[:, :-stride]
    return dx, dy


def smooth_1st_loss(
    flow: jnp.ndarray, image: jnp.ndarray, alpha: float = 0.0,
    smooth_edge_weighting: str = "exponential",
) -> jnp.ndarray:
    """Edge-weighted first-order smoothness (smooth_loss.py:27-71)."""
    abs_fn = jnp.abs if smooth_edge_weighting == "exponential" else jnp.square
    img_dx, img_dy = _gradient(image)
    wx = jnp.exp(-abs_fn(img_dx * alpha).mean(axis=-1, keepdims=True))
    wy = jnp.exp(-abs_fn(img_dy * alpha).mean(axis=-1, keepdims=True))
    dx, dy = _gradient(flow)
    return (wx * jnp.abs(dx) / 2.0).mean() + (wy * jnp.abs(dy) / 2.0).mean()


def smooth_2nd_loss(
    flow: jnp.ndarray, image: jnp.ndarray, alpha: float = 0.0,
    smooth_edge_weighting: str = "exponential",
) -> jnp.ndarray:
    """Edge-weighted second-order smoothness (smooth_loss.py:73-120)."""
    abs_fn = jnp.abs if smooth_edge_weighting == "exponential" else jnp.square
    img_dx, img_dy = _gradient(image, stride=2)
    wx = jnp.exp(-abs_fn(img_dx * alpha).mean(axis=-1, keepdims=True))
    wy = jnp.exp(-abs_fn(img_dy * alpha).mean(axis=-1, keepdims=True))
    fdx, fdy = _gradient(flow)
    fdx2 = fdx[:, :, 1:] - fdx[:, :, :-1]
    fdy2 = fdy[:, 1:] - fdy[:, :-1]
    return (wx * jnp.abs(fdx2) / 2.0).mean() + (wy * jnp.abs(fdy2) / 2.0).mean()
