"""Fused Pallas TPU kernel for tiny-sequence (temporal/frame-axis) attention.

The motion module's temporal attention (reference
``animatediff/models/motion_module.py:328-464``) runs seq = F ≤ 32 over a huge
folded batch (B·H·W spatial positions, SURVEY.md §3.3). Per-head XLA attention
at this shape is dominated by layout overhead, not math: fp32 logits
``[b, h, s, s]`` put an s-wide (16) minor dim on 128 lanes (8× memory blowup),
and every head-split reshape ``(b, s, h·d) → (b, s·h, d)`` is a real
lane→sublane relayout copy under TPU tiling (~0.8 ms per projection output at
64² clip sizes — Mosaic cannot do that shape cast in-kernel either).

This kernel therefore never splits heads at all. q/k/v stay in the RAW
projection layout (B, S, C=H·D):

  k_rep[g, j, c] = k[g, j mod S, c]         tile-repeat along sublanes,
                                            rows j = h·S + s′ (h = j div S)
  k_rep, v_rep  ·= (head(c) == head(j))     head-block mask, so the full-C
                                            contraction yields PER-HEAD logits
  s[g, f, j]    = q · k_repᵀ                one (S × C)·(C × H·S) MXU dot
  segmented softmax over lane groups j div S = h
  o[g, f, c]    = p · v_rep                 back to (S, C) directly

Everything lives in VMEM; there are no XLA-side copies, pads, or transposes
around the call. Measured v5e (b=8192, s=16, h=8, d=40, the 64² motion-module
shape): 0.68 ms vs 5.0 ms batched-XLA — and it replaces ~4.9 ms of in-module
relayout copies of the previous packed formulation on top. At 32²
(b=2048, d=80): 0.05 ms vs 0.59 ms.

Backward runs the equivalent packed math in fp32 XLA (recompute — this path
only runs under grad, where the folded batch is training-sized).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NEG_INF = -1e30


def _attend(q, k, v, scale: float, heads: int):
    """Per-head attention on raw-layout (G, F, C) VMEM arrays (fp32 out)."""
    g, f, c = q.shape
    d = c // heads
    m = f * heads

    # tile-repeat frames `heads` times along sublanes: rows j = h·F + f'
    # (a plain self-concatenate — portable to interpret mode, and measured
    # faster than pltpu.repeat on v5e)
    k_rep = jnp.concatenate([k] * heads, axis=1)     # (G, H·F, C)
    v_rep = jnp.concatenate([v] * heads, axis=1)

    # zero out channels of other heads so the full-C contraction produces
    # per-head logits
    j_ids = jax.lax.broadcasted_iota(jnp.int32, (m, c), 0)
    c_ids = jax.lax.broadcasted_iota(jnp.int32, (m, c), 1)
    kv_mask = (j_ids // f) == (c_ids // d)
    k_rep = jnp.where(kv_mask[None], k_rep, jnp.zeros_like(k_rep))
    v_rep = jnp.where(kv_mask[None], v_rep, jnp.zeros_like(v_rep))

    s = jax.lax.dot_general(
        q, k_rep, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale  # (G, F, H·F) fp32

    # segmented softmax over lane groups of the same head (j // F == h)
    lane_head = jax.lax.broadcasted_iota(jnp.int32, (f, m), 1) // f
    neg = jnp.float32(NEG_INF)
    mfull = jnp.zeros((g, f, m), jnp.float32)
    for h in range(heads):
        sel = (lane_head == h)[None]
        mh = jnp.max(jnp.where(sel, s, neg), axis=2, keepdims=True)
        mfull = jnp.where(sel, mh, mfull)
    p = jnp.exp(s - mfull)
    dfull = jnp.zeros((g, f, m), jnp.float32)
    for h in range(heads):
        sel = (lane_head == h)[None]
        dh = jnp.sum(jnp.where(sel, p, 0.0), axis=2, keepdims=True)
        dfull = jnp.where(sel, dh, dfull)
    p = (p / dfull).astype(v.dtype)

    return jax.lax.dot_general(
        p, v_rep, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)          # (G, F, C)


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, heads: int):
    o = _attend(q_ref[:], k_ref[:], v_ref[:], scale, heads)
    o_ref[:] = o.astype(o_ref.dtype)


def _fwd_impl(qp, kp, vp, scale, heads, block_b, interpret):
    b, s, c = qp.shape
    m = s * heads
    pad = (-b) % block_b
    if pad:
        qp = jnp.pad(qp, ((0, pad), (0, 0), (0, 0)))
        kp = jnp.pad(kp, ((0, pad), (0, 0), (0, 0)))
        vp = jnp.pad(vp, ((0, pad), (0, 0), (0, 0)))
    bp = qp.shape[0]
    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale, heads=heads),
        grid=(bp // block_b,),
        in_specs=[pl.BlockSpec((block_b, s, c), lambda i: (i, 0, 0))] * 3,
        out_specs=pl.BlockSpec((block_b, s, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bp, s, c), qp.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * bp * s * m * c,
            bytes_accessed=4 * bp * s * c * qp.dtype.itemsize,
            transcendentals=bp * s * m,
        ),
        interpret=interpret,
    )(qp, kp, vp)
    return out[:b]


def _packed_ref_fp32(qp, kp, vp, scale, heads):
    """fp32 XLA reference of the per-head attention in packed (s·h) rows
    (used by the backward)."""
    s = jnp.einsum("bmd,bnd->bmn", qp.astype(jnp.float32),
                   kp.astype(jnp.float32)) * scale
    m = qp.shape[1]
    row = jax.lax.broadcasted_iota(jnp.int32, (m, m), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (m, m), 1)
    s = jnp.where(((row % heads) == (col % heads))[None], s, NEG_INF)
    return jax.nn.softmax(s, axis=-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _attn(qp, kp, vp, scale, heads, block_b, interpret):
    return _fwd_impl(qp, kp, vp, scale, heads, block_b, interpret)


def _attn_fwd(qp, kp, vp, scale, heads, block_b, interpret):
    return _fwd_impl(qp, kp, vp, scale, heads, block_b, interpret), (qp, kp, vp)


def _attn_bwd(scale, heads, block_b, interpret, res, g):
    qr, kr, vr = res                     # (B, S, H·D)
    b, s, c = qr.shape
    m, d = s * heads, c // heads
    qp, kp, vp = (t.reshape(b, m, d) for t in (qr, kr, vr))
    p = _packed_ref_fp32(qp, kp, vp, scale, heads)
    g32 = g.reshape(b, m, d).astype(jnp.float32)
    dv = jnp.einsum("bmn,bmd->bnd", p, g32)
    dp = jnp.einsum("bmd,bnd->bmn", g32, vp.astype(jnp.float32))
    rowsum = jnp.sum(dp * p, axis=-1, keepdims=True)
    ds = p * (dp - rowsum) * scale
    dq = jnp.einsum("bmn,bnd->bmd", ds, kp.astype(jnp.float32))
    dk = jnp.einsum("bnm,bnd->bmd", ds, qp.astype(jnp.float32))
    return (dq.astype(qr.dtype).reshape(b, s, c),
            dk.astype(kr.dtype).reshape(b, s, c),
            dv.astype(vr.dtype).reshape(b, s, c))


_attn.defvjp(_attn_fwd, _attn_bwd)


def temporal_attention(
    query: jnp.ndarray,  # (B, S, H, D), S tiny (frame axis)
    key: jnp.ndarray,
    value: jnp.ndarray,
    scale: float | None = None,
    block_b: int | None = None,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Fused per-head attention for tiny self-attention sequences.

    Inputs keep the raw projection layout: the (B, S, H, D) view is merged
    back to (B, S, H·D) — a free minor-dim merge that cancels with the
    caller's head split, so no relayout copies reach the device.
    """
    b, s, h, d = query.shape
    assert key.shape == query.shape and value.shape == query.shape
    if scale is None:
        scale = d ** -0.5
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if block_b is None:
        # keep k_rep/v_rep (G, S·H, C) tiles + fp32 logits well under VMEM
        block_b = max(1, min(32, 4 * 1024 * 1024 // (s * h * h * d * 2), b))
    qp = query.reshape(b, s, h * d)
    kp = key.reshape(b, s, h * d)
    vp = value.reshape(b, s, h * d)
    out = _attn(qp, kp, vp, scale, h, block_b, interpret)
    return out.reshape(b, s, h, d)


# ---------------------------------------------------------------------------
# Fully-fused motion-module attention: q/k/v/out projections + attention in
# ONE kernel. The projection weights (C×C, ≤3.3 MB at C=1280) live in VMEM,
# so the hidden states are read from HBM once and the attention output is
# written once — the four separate XLA GEMMs plus the layout copies between
# them (the projections' batch-minor outputs must be relayout-copied into the
# kernel's row-major blocks, ~10 ms/step at clip sizes) disappear. Measured
# v5e per attention call (F=16, h=8): 64² (b=8192, C=320) 2.33 → 1.73 ms;
# 32² (b=2048, C=640) 1.23 → 0.70 ms; ~parity at C=1280 where the unfused
# GEMMs are already large (routing in models/motion_module.py keeps those on
# the unfused path).
# ---------------------------------------------------------------------------


def _fused_kernel(x_ref, wq_ref, wk_ref, wv_ref, wo_ref, bo_ref, o_ref,
                  *, scale: float, heads: int):
    g, f, c = x_ref.shape
    x = x_ref[:]
    x2 = x.reshape(g * f, c)
    q = jnp.dot(x2, wq_ref[:],
                preferred_element_type=jnp.float32).astype(x.dtype)
    k = jnp.dot(x2, wk_ref[:],
                preferred_element_type=jnp.float32).astype(x.dtype)
    v = jnp.dot(x2, wv_ref[:],
                preferred_element_type=jnp.float32).astype(x.dtype)
    o = _attend(q.reshape(g, f, c), k.reshape(g, f, c), v.reshape(g, f, c),
                scale, heads)
    o2 = o.astype(x.dtype).reshape(g * f, c)
    out = jnp.dot(o2, wo_ref[:], preferred_element_type=jnp.float32)
    out = out + bo_ref[:].astype(jnp.float32)
    o_ref[:] = out.astype(o_ref.dtype).reshape(g, f, c)


def _fused_fwd_impl(x, wq, wk, wv, wo, bo, scale, heads, block_b, interpret):
    b, s, c = x.shape
    pad = (-b) % block_b
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0), (0, 0)))
    bp = x.shape[0]
    out = pl.pallas_call(
        functools.partial(_fused_kernel, scale=scale, heads=heads),
        grid=(bp // block_b,),
        in_specs=[
            pl.BlockSpec((block_b, s, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((c, c), lambda i: (0, 0)),
            pl.BlockSpec((c, c), lambda i: (0, 0)),
            pl.BlockSpec((c, c), lambda i: (0, 0)),
            pl.BlockSpec((c, c), lambda i: (0, 0)),
            pl.BlockSpec((c,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((block_b, s, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bp, s, c), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * bp * s * c * (4 * c + 2 * s * heads),
            bytes_accessed=2 * bp * s * c * x.dtype.itemsize,
            transcendentals=bp * s * s * heads,
        ),
        interpret=interpret,
    )(x, wq, wk, wv, wo, bo)
    return out[:b]


def _fused_ref_fp32(x, wq, wk, wv, wo, bo, scale, heads):
    """fp32 XLA reference of the fused block (backward recompute)."""
    b, s, c = x.shape
    d = c // heads
    xf = x.astype(jnp.float32)
    q = (xf @ wq.astype(jnp.float32)).reshape(b, s, heads, d)
    k = (xf @ wk.astype(jnp.float32)).reshape(b, s, heads, d)
    v = (xf @ wv.astype(jnp.float32)).reshape(b, s, heads, d)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    p = jax.nn.softmax(logits, axis=-1)
    o = jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(b, s, c)
    return o @ wo.astype(jnp.float32) + bo.astype(jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def _fused(x, wq, wk, wv, wo, bo, scale, heads, block_b, interpret):
    return _fused_fwd_impl(x, wq, wk, wv, wo, bo, scale, heads, block_b,
                           interpret)


def _fused_vjp_fwd(x, wq, wk, wv, wo, bo, scale, heads, block_b, interpret):
    out = _fused(x, wq, wk, wv, wo, bo, scale, heads, block_b, interpret)
    return out, (x, wq, wk, wv, wo, bo)


def _fused_vjp_bwd(scale, heads, block_b, interpret, res, g):
    x, wq, wk, wv, wo, bo = res
    _, vjp = jax.vjp(
        lambda *a: _fused_ref_fp32(*a, scale, heads), x, wq, wk, wv, wo, bo)
    grads = vjp(g.astype(jnp.float32))
    return tuple(gr.astype(r.dtype) for gr, r in zip(grads, res))


_fused.defvjp(_fused_vjp_fwd, _fused_vjp_bwd)


def fused_temporal_block(
    x: jnp.ndarray,      # (B, S, C) frames-minor rows, PE already added
    wq: jnp.ndarray,     # (C, C)
    wk: jnp.ndarray,
    wv: jnp.ndarray,
    wo: jnp.ndarray,
    bo: jnp.ndarray,     # (C,)
    scale: float | None = None,
    heads: int = 8,
    block_b: int | None = None,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """q/k/v/out projections + per-head frame attention, fused in VMEM."""
    b, s, c = x.shape
    if scale is None:
        scale = (c // heads) ** -0.5
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if block_b is None:
        # k_rep/v_rep (G, S·H, C) tiles + fp32 logits + 4 C×C weight panels
        block_b = max(1, min(64, 8 * 1024 * 1024 // (s * heads * c * 2), b))
    return _fused(x, wq, wk, wv, wo, bo, scale, heads, block_b, interpret)
