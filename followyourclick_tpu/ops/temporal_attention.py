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


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, heads: int):
    g, f, c = q_ref.shape
    d = c // heads
    m = f * heads
    q = q_ref[:]
    k = k_ref[:]
    v = v_ref[:]

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

    o = jax.lax.dot_general(
        p, v_rep, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)          # (G, F, C)
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
