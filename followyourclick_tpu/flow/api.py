"""Flow inference API + the motion-score ("flow_control") extractor.

Behavior spec: reference ``mmflow/mmflow/apis/inference.py`` (init_model /
inference_model) and the Follow-Your-Click training conditioning: per-clip
optical-flow magnitude → scalar ``flow_control`` consumed by the UNet's
motion embedding (reference animatediff/models/unet.py:554-558; training
config `flow_control` fields).

TPU-first: one jitted function computes flow for ALL consecutive frame pairs
of a clip at once (pairs folded into the batch axis) and reduces to the mean
magnitude on device — no per-pair host round trips.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from followyourclick_tpu.flow.raft import RAFT, RAFTConfig

# mmflow RAFT datasets normalise with mean=std=127.5 (img_norm_cfg in
# mmflow/configs/_base_/datasets/*raft*.py): x -> (x - 127.5) / 127.5
_MEAN = 127.5
_STD = 127.5


def init_model(
    config: Optional[RAFTConfig] = None,
    checkpoint: Optional[Dict[str, Any]] = None,
    seed: int = 0,
    image_size: Tuple[int, int] = (256, 256),
) -> Tuple[RAFT, Dict[str, Any]]:
    """Build a RAFT model and (random or loaded) variables — the analogue of
    mmflow ``init_model`` (apis/inference.py). ``checkpoint`` is a ready
    variables dict (e.g. from ``flow.convert.convert_mmflow_raft``)."""
    model = RAFT(config or RAFTConfig())
    if checkpoint is not None:
        return model, checkpoint
    h, w = image_size
    dummy = jnp.zeros((1, h, w, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(seed), dummy, dummy, iters=1)
    return model, dict(variables)


def _pad_to_multiple(x: jnp.ndarray, div: int = 8) -> Tuple[jnp.ndarray, Tuple[int, int]]:
    h, w = x.shape[1:3]
    ph = (-h) % div
    pw = (-w) % div
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="edge")
    return x, (h, w)


@functools.partial(jax.jit, static_argnums=(0, 4))
def _forward(model, variables, img1, img2, iters):
    img1 = (img1.astype(jnp.float32) - _MEAN) / _STD
    img2 = (img2.astype(jnp.float32) - _MEAN) / _STD
    img1, orig = _pad_to_multiple(img1)
    img2, _ = _pad_to_multiple(img2)
    flow = model.apply(variables, img1, img2, iters=iters)
    return flow[:, : orig[0], : orig[1], :]


def inference_model(
    model: RAFT,
    variables: Dict[str, Any],
    img1: np.ndarray,
    img2: np.ndarray,
    iters: int = 32,
) -> np.ndarray:
    """Estimate flow for one image pair (HWC or BHWC uint8/float in [0,255]).
    Returns ``(H, W, 2)`` (or batched) float32 pixels — the analogue of
    mmflow ``inference_model``."""
    squeeze = img1.ndim == 3
    if squeeze:
        img1, img2 = img1[None], img2[None]
    flow = _forward(model, variables, jnp.asarray(img1), jnp.asarray(img2), iters)
    flow = np.asarray(flow)
    return flow[0] if squeeze else flow


@functools.partial(jax.jit, static_argnums=(0, 3))
def _clip_motion_score(model, variables, frames, iters):
    """frames: (F, H, W, 3) in [0, 255] → scalar mean flow magnitude."""
    x = (frames.astype(jnp.float32) - _MEAN) / _STD
    x, orig = _pad_to_multiple(x)
    img1 = x[:-1]
    img2 = x[1:]
    flow = model.apply(variables, img1, img2, iters=iters)
    flow = flow[:, : orig[0], : orig[1], :]
    mag = jnp.sqrt(jnp.sum(flow**2, axis=-1))
    return mag.mean()


def compute_motion_score(
    model: RAFT,
    variables: Dict[str, Any],
    frames: np.ndarray,
    iters: int = 12,
) -> float:
    """Per-clip motion score: mean optical-flow magnitude over all
    consecutive frame pairs, computed in ONE device call (pairs batched).
    This is the scalar fed to the UNet's zero-init motion embedding as
    ``flow_control`` / ``motion_score`` (reference unet.py:554-558)."""
    frames = jnp.asarray(frames)
    assert frames.ndim == 4 and frames.shape[0] >= 2
    return float(_clip_motion_score(model, variables, frames, iters))
