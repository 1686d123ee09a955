"""Flow ops: warp, correlation pyramid, correlation lookup.

Behavior spec: reference ``mmflow/mmflow/ops/warp.py:32`` (flow warp via
grid_sample), ``mmflow/mmflow/ops/corr_lookup.py`` (coords_grid :12,
bilinear_sample :32, CorrLookup), and the mmcv CUDA ``Correlation`` operator
registered at ``mmflow/mmflow/ops/builder.py:2``.

TPU-first: the all-pairs correlation volume is a single batched matmul on the
MXU (``correlation_pyramid``); bilinear lookups are vectorized gathers over a
flattened map (XLA gather, no scatter); everything is NHWC and static-shaped.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax.numpy as jnp


def coords_grid(batch: int, h: int, w: int, dtype=jnp.float32) -> jnp.ndarray:
    """Pixel-coordinate grid ``(batch, h, w, 2)`` holding (x, y) per pixel
    (reference corr_lookup.py:12-29, transposed to NHWC-last layout)."""
    yy, xx = jnp.meshgrid(
        jnp.arange(h, dtype=dtype), jnp.arange(w, dtype=dtype), indexing="ij"
    )
    grid = jnp.stack([xx, yy], axis=-1)  # (h, w, 2) with x first
    return jnp.broadcast_to(grid[None], (batch, h, w, 2))


def _gather_bilinear(
    feat: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray
) -> jnp.ndarray:
    """Bilinear interpolation of ``feat (B, H, W, C)`` at pixel coordinates
    ``x, y (B, ...)`` with zero padding outside — grid_sample(padding='zeros')
    semantics expressed as four XLA gathers.
    """
    B, H, W, C = feat.shape
    out_shape = x.shape[1:]
    x = x.reshape(B, -1)
    y = y.reshape(B, -1)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    flat = feat.reshape(B, H * W, C)

    def tap(xi, yi):
        inside = (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
        xi_c = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        idx = yi_c * W + xi_c  # (B, N)
        vals = jnp.take_along_axis(flat, idx[..., None], axis=1)
        return vals * inside[..., None].astype(feat.dtype)

    v00 = tap(x0, y0)
    v01 = tap(x0 + 1, y0)
    v10 = tap(x0, y0 + 1)
    v11 = tap(x0 + 1, y0 + 1)

    wx = wx[..., None].astype(feat.dtype)
    wy = wy[..., None].astype(feat.dtype)
    out = (
        v00 * (1 - wx) * (1 - wy)
        + v01 * wx * (1 - wy)
        + v10 * (1 - wx) * wy
        + v11 * wx * wy
    )
    return out.reshape((B,) + out_shape + (C,))


def bilinear_sample(
    feat: jnp.ndarray,
    grid: jnp.ndarray,
    align_corners: bool = False,
    scale: bool = True,
) -> jnp.ndarray:
    """Sample ``feat (B, H, W, C)`` at ``grid (B, ..., 2)``.

    When ``scale`` is True, grid holds absolute pixel coordinates and is
    normalised exactly as the reference does (corr_lookup.py:63-66:
    ``x*2/max(W-1,1) - 1``) before the grid_sample-style denormalisation —
    composing the two, align_corners=True round-trips to the input pixel
    coordinates and align_corners=False shifts by the half-pixel convention.
    """
    H, W = feat.shape[1:3]
    x = grid[..., 0]
    y = grid[..., 1]
    if scale:
        # normalise to [-1, 1] (reference always divides by size-1)
        x = x * 2.0 / max(W - 1, 1) - 1.0
        y = y * 2.0 / max(H - 1, 1) - 1.0
    if align_corners:
        x = (x + 1.0) / 2.0 * (W - 1)
        y = (y + 1.0) / 2.0 * (H - 1)
    else:
        x = ((x + 1.0) * W - 1.0) / 2.0
        y = ((y + 1.0) * H - 1.0) / 2.0
    return _gather_bilinear(feat, x, y)


def flow_warp(
    feat: jnp.ndarray, flow: jnp.ndarray, align_corners: bool = True,
    padding_mode: str = "zeros",
) -> jnp.ndarray:
    """Warp ``feat (B, H, W, C)`` backward by ``flow (B, H, W, 2)`` — the
    reference ``Warp`` op (mmflow/mmflow/ops/warp.py:32): output(p) =
    feat(p + flow(p)) with bilinear sampling and zero or border padding
    (the FlowNet2 estimator link warps with padding_mode='border',
    utils/estimators_link.py:39-40).

    Invariant (reference tests/test_op/test_warp.py): zero flow ⇒ identity.
    """
    B, H, W, _ = flow.shape
    grid = coords_grid(B, H, W, dtype=flow.dtype) + flow
    x = grid[..., 0]
    y = grid[..., 1]
    if not align_corners:
        # match grid_sample(align_corners=False) after [-1,1] normalisation
        x = ((x * 2.0 / max(W - 1, 1) - 1.0 + 1.0) * W - 1.0) / 2.0
        y = ((y * 2.0 / max(H - 1, 1) - 1.0 + 1.0) * H - 1.0) / 2.0
    if padding_mode == "border":
        x = jnp.clip(x, 0, W - 1)
        y = jnp.clip(y, 0, H - 1)
    return _gather_bilinear(feat, x, y)


def _avg_pool_2x2(x: jnp.ndarray) -> jnp.ndarray:
    """2x2/2 average pool over the trailing two spatial axes of
    ``(..., H, W)`` via reshape — cheaper than reduce_window for this case.
    Odd trailing rows/cols are dropped (torch F.avg_pool2d floor mode)."""
    *lead, H, W = x.shape
    x = x[..., : H - H % 2, : W - W % 2]
    x = x.reshape(*lead, H // 2, 2, W // 2, 2)
    return x.mean(axis=(-3, -1))


def correlation_pyramid(
    feat1: jnp.ndarray, feat2: jnp.ndarray, num_levels: int = 4
) -> Sequence[jnp.ndarray]:
    """All-pairs correlation pyramid (reference raft_decoder.py:17-56).

    feat1, feat2: ``(B, H, W, C)``. Returns ``num_levels`` tensors of shape
    ``(B, H, W, H/2^l, W/2^l)``: level 0 is ``<feat1[p], feat2[q]>/sqrt(C)``
    computed as ONE batched matmul (MXU-friendly); deeper levels average-pool
    the target axes.
    """
    B, H, W, C = feat1.shape
    corr = jnp.einsum(
        "bpc,bqc->bpq",
        feat1.reshape(B, H * W, C),
        feat2.reshape(B, H * W, C),
        preferred_element_type=jnp.float32,
    ) / math.sqrt(C)
    corr = corr.reshape(B, H, W, H, W)
    pyramid = [corr]
    for _ in range(num_levels - 1):
        pyramid.append(_avg_pool_2x2(pyramid[-1]))
    return pyramid


def corr_lookup(
    corr_pyramid: Sequence[jnp.ndarray],
    flow: jnp.ndarray,
    radius: int = 4,
) -> jnp.ndarray:
    """Correlation lookup (reference CorrLookup, corr_lookup.py:72-162,
    align_corners=True): for each pixel p and level l, bilinearly read the
    ``(2r+1)^2`` window of the level-l correlation map centred at
    ``(p + flow(p)) / 2^l``.

    flow: ``(B, H, W, 2)``. Returns ``(B, H, W, num_levels*(2r+1)^2)``.
    """
    B, H, W, _ = flow.shape
    centre = coords_grid(B, H, W, dtype=flow.dtype) + flow  # (B,H,W,2)
    d = jnp.arange(-radius, radius + 1, dtype=flow.dtype)
    # Reference quirk kept for channel-order weight compatibility
    # (corr_lookup.py:118-123): delta = stack(meshgrid(dy, dx)) is added
    # verbatim onto the (x, y) centroid — the first (slow) window axis
    # offsets x, the second (fast) offsets y. Symmetric window, so only the
    # enumeration order (hence corr-feature channel order) is affected.
    di, dj = jnp.meshgrid(d, d, indexing="ij")
    delta = jnp.stack([di, dj], axis=-1).reshape(-1, 2)

    out = []
    for lvl, corr in enumerate(corr_pyramid):
        Hl, Wl = corr.shape[3:5]
        # fold query pixels into batch: (B*H*W, Hl, Wl, 1)
        cmap = corr.reshape(B * H * W, Hl, Wl, 1)
        coords = centre.reshape(B * H * W, 1, 2) / (2.0 ** lvl) + delta[None]
        vals = bilinear_sample(cmap, coords, align_corners=True, scale=True)
        out.append(vals.reshape(B, H, W, -1))
    return jnp.concatenate(out, axis=-1)


def bilinear_resize(x: jnp.ndarray, H: int, W: int,
                    align_corners: bool = False) -> jnp.ndarray:
    """Bilinear resize of ``(B, h, w, C)`` with torch ``align_corners``
    semantics. align_corners=False delegates to ``jax.image.resize``
    (half-pixel centres, identical to torch); align_corners=True maps output
    corners onto input corners (scale = (in-1)/(out-1)) via a separable
    gather — ``jax.image.resize`` has no such mode."""
    import jax

    if not align_corners:
        return jax.image.resize(x, x.shape[:1] + (H, W) + x.shape[3:],
                                method="bilinear")
    B, h, w, C = x.shape

    def axis_weights(n_in: int, n_out: int):
        pos = (jnp.linspace(0.0, n_in - 1.0, n_out)
               if n_out > 1 else jnp.zeros((1,)))
        lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n_in - 1)
        hi = jnp.clip(lo + 1, 0, n_in - 1)
        frac = (pos - lo).astype(x.dtype)
        return lo, hi, frac

    y0, y1, wy = axis_weights(h, H)
    x0, x1, wx = axis_weights(w, W)
    rows = (x[:, y0] * (1.0 - wy)[None, :, None, None]
            + x[:, y1] * wy[None, :, None, None])            # (B, H, w, C)
    out = (rows[:, :, x0] * (1.0 - wx)[None, None, :, None]
           + rows[:, :, x1] * wx[None, None, :, None])       # (B, H, W, C)
    return out


def upflow8(flow: jnp.ndarray) -> jnp.ndarray:
    """Bilinear 8x upsampling of a flow field ``(B, h, w, 2)`` with values
    scaled by 8 (reference raft_decoder.py:393-399 mask=None branch,
    align_corners=True)."""
    B, h, w, _ = flow.shape
    return 8.0 * bilinear_resize(flow, 8 * h, 8 * w, align_corners=True)


def convex_upsample(
    flow: jnp.ndarray, mask: jnp.ndarray, scale: int = 8, grid_side: int = 3
) -> jnp.ndarray:
    """RAFT convex upsampling (reference raft_decoder.py:378-414): each output
    pixel is a learned convex combination over the 3x3 coarse neighbourhood.

    flow: ``(B, h, w, 2)``; mask: ``(B, h, w, 9*scale*scale)`` logits.
    Returns ``(B, scale*h, scale*w, 2)``.
    """
    B, h, w, _ = flow.shape
    K = grid_side * grid_side
    mask = mask.reshape(B, h, w, K, scale, scale)
    mask = jnp.exp(mask - mask.max(axis=3, keepdims=True))
    mask = mask / mask.sum(axis=3, keepdims=True)

    sflow = scale * flow
    pad = grid_side // 2
    padded = jnp.pad(sflow, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    # unfold: 9 shifted views, matching F.unfold's row-major (dy, dx) order
    taps = [
        padded[:, dy : dy + h, dx : dx + w, :]
        for dy in range(grid_side)
        for dx in range(grid_side)
    ]
    neigh = jnp.stack(taps, axis=3)  # (B, h, w, 9, 2)

    up = jnp.einsum("bhwkuv,bhwkc->bhwuvc", mask, neigh)
    up = up.transpose(0, 1, 3, 2, 4, 5)  # (B, h, u, w, v, 2)
    return up.reshape(B, scale * h, scale * w, 2)


def resize_flow(
    flow: jnp.ndarray, shape: Tuple[int, int], align_corners: bool = False
) -> jnp.ndarray:
    """Resize a flow map to ``shape=(H, W)``, rescaling the displacement
    components by the size ratio (mmflow BaseDecoder.get_flow semantics;
    the mmflow decoders commonly pass align_corners=True)."""
    B, h, w, _ = flow.shape
    H, W = shape
    out = bilinear_resize(flow, H, W, align_corners=align_corners)
    return out * jnp.asarray([W / w, H / h], dtype=flow.dtype)


def local_correlation(
    feat1: jnp.ndarray,
    feat2: jnp.ndarray,
    max_displacement: int = 4,
    scaled: bool = False,
    dilation_patch: int = 1,
    stride: int = 1,
) -> jnp.ndarray:
    """Local correlation volume (the mmcv CUDA ``Correlation`` op the
    reference registers at mmflow/mmflow/ops/builder.py:2, with kernel 1,
    stride 1, padding 0): out[b, h, w, (dy, dx)] = Σ_c f1[b,h,w,c] ·
    f2[b, h+dy, w+dx, c], zero padded, window (2d+1)² channels in row-major
    (dy, dx) order — matching the (N, 2d+1, 2d+1, H, W) view flatten.

    TPU-native: (2d+1)² shifted elementwise multiply-reduces, fused by XLA —
    no scatter/gather.
    """
    B, H, W, C = feat1.shape
    d = max_displacement
    p = d * dilation_patch
    padded = jnp.pad(feat2, ((0, 0), (p, p), (p, p), (0, 0)))
    f1 = feat1[:, ::stride, ::stride] if stride > 1 else feat1
    outs = []
    # displacement grid at step `dilation_patch` (mmcv dilation_patch):
    # FlowNetC uses d=10, dilation_patch=2 → 21x21 taps at even offsets;
    # `stride` subsamples the OUTPUT positions (LiteFlowNet levels 2-3)
    for dy in range(2 * d + 1):
        for dx in range(2 * d + 1):
            oy = dy * dilation_patch
            ox = dx * dilation_patch
            shifted = padded[:, oy : oy + H, ox : ox + W, :]
            if stride > 1:
                shifted = shifted[:, ::stride, ::stride]
            outs.append(jnp.sum(f1 * shifted, axis=-1))
    corr = jnp.stack(outs, axis=-1)
    if scaled:
        corr = corr / C
    return corr
