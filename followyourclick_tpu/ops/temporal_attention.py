"""Fused Pallas TPU kernel for tiny-sequence (temporal/frame-axis) attention.

The motion module's temporal attention (reference
``animatediff/models/motion_module.py:328-464``) runs seq = F ≤ 32 over a huge
folded batch (B·H·W spatial positions, SURVEY.md §3.3). Per-head XLA attention
at this shape is dominated by layout overhead, not math: fp32 logits
``[b, h, s, s]`` put a 16-wide minor dim on 128 lanes (8× memory blowup) and
every q/k/v projection output gets a layout copy. Measured on v5e inside the
MotionModule at 64² (b=8192, s=16, h=8, d=40): ~9 ms per attention call.

This kernel instead uses the *packed* layout: rows are (s·h) — a FREE reshape
of the projection output ``(b, s, h·d) → (b, s·h, d)`` (s-major rows, head =
row % h) — and fuses QKᵀ → cross-head mask → softmax → ·V entirely in VMEM, so
the (s·h)² logits never touch HBM. The h× extra MXU work from the block-
diagonal mask is cheap at these sizes (s·h ≤ 256 rows). Measured v5e:
2.6 ms vs 5.0 ms isolated XLA, and it removes the in-module copies on top.

Backward runs the same packed math in fp32 XLA (recompute — this path only
runs under grad, where the folded batch is training-sized).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, heads: int):
    q = q_ref[:]                                     # (G, M, D)
    k = k_ref[:]
    v = v_ref[:]
    _, m, _ = q.shape
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale  # (G, M, M) fp32, in VMEM
    row = jax.lax.broadcasted_iota(jnp.int32, (m, m), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (m, m), 1)
    same_head = (row % heads) == (col % heads)
    s = jnp.where(same_head[None], s, NEG_INF)
    mx = jnp.max(s, axis=2, keepdims=True)
    p = jnp.exp(s - mx)
    denom = jnp.sum(p, axis=2, keepdims=True)
    p = (p / denom).astype(v.dtype)
    o = jax.lax.dot_general(
        p, v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    o_ref[:] = o.astype(o_ref.dtype)


def _fwd_impl(qp, kp, vp, scale, heads, block_b, interpret):
    b, m, d = qp.shape
    pad = (-b) % block_b
    if pad:
        qp = jnp.pad(qp, ((0, pad), (0, 0), (0, 0)))
        kp = jnp.pad(kp, ((0, pad), (0, 0), (0, 0)))
        vp = jnp.pad(vp, ((0, pad), (0, 0), (0, 0)))
    bp = qp.shape[0]
    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale, heads=heads),
        grid=(bp // block_b,),
        in_specs=[pl.BlockSpec((block_b, m, d), lambda i: (i, 0, 0))] * 3,
        out_specs=pl.BlockSpec((block_b, m, d), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bp, m, d), qp.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * bp * m * m * d,
            bytes_accessed=4 * bp * m * d * qp.dtype.itemsize,
            transcendentals=bp * m * m,
        ),
        interpret=interpret,
    )(qp, kp, vp)
    return out[:b]


def _packed_ref_fp32(qp, kp, vp, scale, heads):
    """fp32 XLA reference of the packed attention (used by the backward)."""
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
    qp, kp, vp = res
    p = _packed_ref_fp32(qp, kp, vp, scale, heads)
    g32 = g.astype(jnp.float32)
    dv = jnp.einsum("bmn,bmd->bnd", p, g32)
    dp = jnp.einsum("bmd,bnd->bmn", g32, vp.astype(jnp.float32))
    rowsum = jnp.sum(dp * p, axis=-1, keepdims=True)
    ds = p * (dp - rowsum) * scale
    dq = jnp.einsum("bmn,bnd->bmd", ds, kp.astype(jnp.float32))
    dk = jnp.einsum("bnm,bnd->bmd", ds, qp.astype(jnp.float32))
    return (dq.astype(qp.dtype), dk.astype(kp.dtype), dv.astype(vp.dtype))


_attn.defvjp(_attn_fwd, _attn_bwd)


def temporal_attention(
    query: jnp.ndarray,  # (B, S, H, D), S tiny (frame axis)
    key: jnp.ndarray,
    value: jnp.ndarray,
    scale: float | None = None,
    block_b: int | None = None,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Fused packed attention for tiny self-attention sequences.

    The (B, S, H, D) → (B, S·H, D) packing is a reshape of contiguous memory
    (S·H rows are s-major) — no transpose, unlike the per-head (B, H, S, D)
    layout XLA's batched path forces.
    """
    b, s, h, d = query.shape
    assert key.shape == query.shape and value.shape == query.shape
    m = s * h
    if scale is None:
        scale = d ** -0.5
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if block_b is None:
        # keep the fp32 (G, M, M) logits + 3×(G, M, D) tiles well under VMEM
        block_b = max(1, min(16, 2048 // m, b))
    qp = query.reshape(b, m, d)
    kp = key.reshape(b, m, d)
    vp = value.reshape(b, m, d)
    out = _attn(qp, kp, vp, scale, h, block_b, interpret)
    return out.reshape(b, s, h, d)
