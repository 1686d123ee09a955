"""Flow training losses.

Behavior spec: reference ``mmflow/mmflow/models/losses/sequence_loss.py``
(gamma-weighted L1 over the RAFT iteration sequence, max_flow valid masking)
and ``mmflow/mmflow/models/losses/multilevel_flow_loss.py`` +
``multilevel_epe.py`` / ``multilevel_charbonnier_loss.py`` (per-level
weighted losses for the FlowNet/PWC families: GT divided by ``flow_div=20``,
average-pool downsampled to each level, 'sum' reduction = sum / batch).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp


def sequence_loss(
    preds: jnp.ndarray,
    flow_gt: jnp.ndarray,
    gamma: float = 0.8,
    valid: Optional[jnp.ndarray] = None,
    max_flow: float = 400.0,
) -> jnp.ndarray:
    """RAFT sequence loss (sequence_loss.py:11-40).

    preds: ``(iters, B, H, W, 2)`` upsampled per-iteration predictions;
    flow_gt: ``(B, H, W, 2)``; valid: ``(B, H, W)`` or None. Weight of
    iteration i is ``gamma**(n-i-1)`` (later iterations weigh more).
    """
    n_preds = preds.shape[0]
    mag = jnp.sqrt(jnp.sum(flow_gt**2, axis=-1))
    if valid is None:
        valid = jnp.ones_like(mag)
    else:
        valid = ((valid >= 0.5) & (mag < max_flow)).astype(flow_gt.dtype)

    i = jnp.arange(n_preds, dtype=flow_gt.dtype)
    weights = gamma ** (n_preds - i - 1.0)
    # reference: (valid[:, None] * |pred - gt|).mean() over ALL elements
    # (not valid-normalised), sequence_loss.py:35-39
    per_iter = (jnp.abs(preds - flow_gt[None]) * valid[None, ..., None]).mean(
        axis=(1, 2, 3, 4)
    )
    return jnp.sum(weights * per_iter)


def _downsample_to(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Average-pool ``(B, H, W, C)`` down to ``(B, h, w, C)`` — the
    F.adaptive_avg_pool2d used by the reference's 'downsample' resize_flow
    (exact for integer ratios, which all pyramid levels are)."""
    B, H, W, C = x.shape
    return x.reshape(B, h, H // h, w, W // w, C).mean(axis=(2, 4))


def _multi_level_loss(
    per_px_fn,
    preds: Dict[str, jnp.ndarray],
    flow_gt: jnp.ndarray,
    weights: Optional[Dict[str, float]],
    valid: Optional[jnp.ndarray],
    flow_div: float,
    max_flow: float,
    scale_as_level: bool,
) -> jnp.ndarray:
    if weights is None:
        weights = {
            "level6": 0.32, "level5": 0.08, "level4": 0.02,
            "level3": 0.01, "level2": 0.005,
        }
    B, H, W, _ = flow_gt.shape
    mag = jnp.sqrt(jnp.sum(flow_gt**2, axis=-1))
    if valid is None:
        valid_full = jnp.ones_like(mag)
    else:
        valid_full = ((valid >= 0.5) & (mag < max_flow)).astype(flow_gt.dtype)
    target_div = flow_gt / flow_div

    total = 0.0
    for name, w in weights.items():
        pred = preds[name]
        h, wd = pred.shape[1:3]
        scale = (
            jnp.asarray([wd / W, h / H], dtype=flow_gt.dtype)
            if scale_as_level
            else 1.0
        )
        gt = _downsample_to(target_div * scale, h, wd)
        v = _downsample_to(valid_full[..., None], h, wd)[..., 0]
        v = (v >= 0.5).astype(flow_gt.dtype)
        per_px = per_px_fn(pred, gt) * v
        # 'sum' reduction: summed epe map averaged by batch size
        total = total + w * per_px.sum() / B
    return total


def multi_level_epe_loss(
    preds: Dict[str, jnp.ndarray],
    flow_gt: jnp.ndarray,
    weights: Optional[Dict[str, float]] = None,
    valid: Optional[jnp.ndarray] = None,
    flow_div: float = 20.0,
    max_flow: float = float("inf"),
    p: float = 2.0,
    q: Optional[float] = None,
    eps: float = 0.0,
    scale_as_level: bool = False,
) -> jnp.ndarray:
    """Multi-level end-point-error loss (mmflow ``MultiLevelEPE``):
    ``‖pred − gt/flow_div‖_p`` per pixel (or the generalised
    ``(Σ|diff|^p + eps)^q``), summed per level, weighted, / batch."""

    def per_px(pred, gt):
        diff = pred - gt
        if q is None:
            return jnp.sqrt(jnp.sum(diff**2, axis=-1) + eps)
        return (jnp.sum(jnp.abs(diff) ** p, axis=-1) + eps) ** q

    return _multi_level_loss(
        per_px, preds, flow_gt, weights, valid, flow_div, max_flow,
        scale_as_level,
    )


def multi_level_charbonnier_loss(
    preds: Dict[str, jnp.ndarray],
    flow_gt: jnp.ndarray,
    weights: Optional[Dict[str, float]] = None,
    valid: Optional[jnp.ndarray] = None,
    flow_div: float = 20.0,
    max_flow: float = float("inf"),
    q: float = 0.2,
    eps: float = 0.01,
    scale_as_level: bool = False,
) -> jnp.ndarray:
    """Charbonnier variant: ``(‖diff‖² + eps)^q`` per pixel (mmflow
    ``MultiLevelCharbonnierLoss``)."""

    def per_px(pred, gt):
        return (jnp.sum((pred - gt) ** 2, axis=-1) + eps) ** q

    return _multi_level_loss(
        per_px, preds, flow_gt, weights, valid, flow_div, max_flow,
        scale_as_level,
    )
