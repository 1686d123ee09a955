"""Fully-fused motion-module transformer block — one Pallas TPU kernel.

Reference semantics: ``animatediff/models/motion_module.py:211-283``
(``TemporalTransformerBlock``): two pre-LN temporal self-attentions (each
adding the sinusoidal PE after the norm, motion_module.py:286-304,436-441)
with residuals, then pre-LN GEGLU feed-forward with residual.

Every op in the block is independent per spatial position (LN/FF per token,
attention along the frame axis of one position), so the WHOLE block runs as
one kernel over row blocks of the frames-minor ``(B·H·W, F, C)`` layout:
hidden states are read from HBM once and written once. This subsumes the
previously separate ``fused_temporal_block`` ×2 + LayerNorms ×2 +
``fused_ln_geglu`` calls and their 4 intermediate HBM round-trips. Measured
v5e (16-frame flagship): 64² (b=8192, C=320) 7.64 → 6.51 ms per block;
32² (b=2048, C=640) 5.36 → 4.63 ms.

The attention math reuses the head-block-masked full-C contraction of
``ops/temporal_attention._attend`` (no head splits, no relayouts); the FF
gating reuses ``ops/geglu._gate_mul`` (bf16 fast tanh-gelu at C ≤ 640,
exact erf otherwise — FYC_EXACT_GELU opts out).

Backward recomputes through an fp32 XLA reference, like ops/geglu.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from followyourclick_tpu.ops.geglu import _default_fast_gating, _gate_mul
from followyourclick_tpu.ops.temporal_attention import _attend


def _ln(h, s, b, eps):
    hf = h.astype(jnp.float32)
    mu = jnp.mean(hf, axis=-1, keepdims=True)
    ctr = hf - mu
    var = jnp.mean(ctr * ctr, axis=-1, keepdims=True)
    n = ctr * jax.lax.rsqrt(var + eps)
    return (n * s.astype(jnp.float32) + b.astype(jnp.float32)).astype(h.dtype)


def _kernel(x_ref, pe_ref,
            l0s, l0b, wq0, wk0, wv0, wo0, bo0,
            l1s, l1b, wq1, wk1, wv1, wo1, bo1,
            lfs, lfb, w1, b1, w2, b2,
            o_ref, *, scale: float, heads: int, inner: int, eps: float,
            fast: bool):
    g, f, c = x_ref.shape
    h = x_ref[:]
    pe = pe_ref[:].astype(h.dtype)

    def attn(h, ls, lb, wq, wk, wv, wo, bo):
        t = _ln(h, ls[:], lb[:], eps) + pe[None]
        t2 = t.reshape(g * f, c)
        q = jnp.dot(t2, wq[:],
                    preferred_element_type=jnp.float32).astype(h.dtype)
        k = jnp.dot(t2, wk[:],
                    preferred_element_type=jnp.float32).astype(h.dtype)
        v = jnp.dot(t2, wv[:],
                    preferred_element_type=jnp.float32).astype(h.dtype)
        o = _attend(q.reshape(g, f, c), k.reshape(g, f, c),
                    v.reshape(g, f, c), scale, heads)
        o2 = o.astype(h.dtype).reshape(g * f, c)
        out = jnp.dot(o2, wo[:], preferred_element_type=jnp.float32)
        out = out + bo[:].astype(jnp.float32)
        return out.astype(h.dtype).reshape(g, f, c)

    h = h + attn(h, l0s, l0b, wq0, wk0, wv0, wo0, bo0)
    h = h + attn(h, l1s, l1b, wq1, wk1, wv1, wo1, bo1)

    t = _ln(h, lfs[:], lfb[:], eps).reshape(g * f, c)
    h2 = jnp.dot(t, w1[:], preferred_element_type=jnp.float32)
    h2 = h2 + b1[:].astype(jnp.float32)
    y = _gate_mul(h2[:, :inner], h2[:, inner:], fast, h.dtype)
    ff = jnp.dot(y, w2[:], preferred_element_type=jnp.float32)
    ff = ff + b2[:].astype(jnp.float32)
    o_ref[:] = h + ff.astype(h.dtype).reshape(g, f, c)


def _fwd_impl(x, pe, params, scale, heads, eps, fast, block_b, interpret):
    b, f, c = x.shape
    inner = params[18].shape[0]        # w2 (inner, C)
    pad = (-b) % block_b
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0), (0, 0)))
    bp = x.shape[0]
    specs = [pl.BlockSpec((block_b, f, c), lambda i: (i, 0, 0)),
             pl.BlockSpec((f, c), lambda i: (0, 0))]
    for p in params:
        if p.ndim == 1:
            specs.append(pl.BlockSpec((p.shape[0],), lambda i: (0,)))
        else:
            specs.append(pl.BlockSpec(p.shape, lambda i: (0, 0)))
    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale, heads=heads, inner=inner,
                          eps=eps, fast=fast),
        grid=(bp // block_b,),
        in_specs=specs,
        out_specs=pl.BlockSpec((block_b, f, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bp, f, c), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=110 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * bp * f * c * (8 * c + 4 * f * heads + 12 * c),
            bytes_accessed=2 * bp * f * c * x.dtype.itemsize,
            transcendentals=bp * f * (inner + 2 * f * heads),
        ),
        interpret=interpret,
    )(x, pe, *params)
    return out[:b]


def _ref_fp32(x, pe, params, scale, heads, eps):
    """fp32 XLA reference of the whole block (backward recompute, tests)."""
    (l0s, l0b, wq0, wk0, wv0, wo0, bo0,
     l1s, l1b, wq1, wk1, wv1, wo1, bo1,
     lfs, lfb, w1, b1, w2, b2) = [p.astype(jnp.float32) for p in params]
    f32 = jnp.float32
    b, f, c = x.shape
    d = c // heads
    h = x.astype(f32)
    pef = pe.astype(f32)

    def ln(h, s, bb):
        mu = jnp.mean(h, axis=-1, keepdims=True)
        ctr = h - mu
        var = jnp.mean(ctr * ctr, axis=-1, keepdims=True)
        return ctr * jax.lax.rsqrt(var + eps) * s + bb

    def attn(h, ls, lb, wq, wk, wv, wo, bo):
        t = ln(h, ls, lb) + pef[None]
        q = (t @ wq).reshape(b, f, heads, d)
        k = (t @ wk).reshape(b, f, heads, d)
        v = (t @ wv).reshape(b, f, heads, d)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
        p = jax.nn.softmax(logits, axis=-1)
        o = jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(b, f, c)
        return o @ wo + bo

    h = h + attn(h, l0s, l0b, wq0, wk0, wv0, wo0, bo0)
    h = h + attn(h, l1s, l1b, wq1, wk1, wv1, wo1, bo1)
    t = ln(h, lfs, lfb)
    inner = w2.shape[0]
    h2 = t @ w1 + b1
    y = h2[..., :inner] * jax.nn.gelu(h2[..., inner:], approximate=False)
    return h + (y @ w2 + b2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def _block(x, pe, params, scale, heads, eps, fast, block_b, interpret):
    return _fwd_impl(x, pe, params, scale, heads, eps, fast, block_b,
                     interpret)


def _block_fwd(x, pe, params, scale, heads, eps, fast, block_b, interpret):
    out = _block(x, pe, params, scale, heads, eps, fast, block_b, interpret)
    return out, (x, pe, params)


def _block_bwd(scale, heads, eps, fast, block_b, interpret, res, g):
    x, pe, params = res
    _, vjp = jax.vjp(
        lambda x, pe, params: _ref_fp32(x, pe, params, scale, heads, eps),
        x, pe, params)
    gx, gpe, gparams = vjp(g.astype(jnp.float32))
    return (gx.astype(x.dtype), gpe.astype(pe.dtype),
            tuple(gp.astype(p.dtype) for gp, p in zip(gparams, params)))


_block.defvjp(_block_fwd, _block_bwd)


def fused_motion_block(
    x: jnp.ndarray,   # (B, F, C) frames-minor rows
    pe: jnp.ndarray,  # (F, C) positional table (zeros when PE disabled)
    params: tuple,    # (l0s,l0b,wq0,wk0,wv0,wo0,bo0, l1s,l1b,wq1,wk1,wv1,
                      #  wo1,bo1, lfs,lfb,w1,b1,w2,b2)
    scale: float,
    heads: int,
    eps: float = 1e-5,
    fast_gating: bool | None = None,
    block_b: int | None = None,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """LN→attn→res → LN→attn→res → LN→GEGLU-FF→res, one read / one write."""
    assert len(params) == 20, len(params)
    b, f, c = x.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if block_b is None:
        # v5e sweep: 64 wins at C=320 (6.35 ms; 32 gave 6.60), 128 at C=640
        # (4.48 ms), 32 at C=1280 (4.27 ms, where the weight panels alone
        # are ~65 MB); "parallel" vs "arbitrary" grid semantics measured
        # within noise. VMEM (weights + fp32 FF intermediate + k_rep/v_rep)
        # stays <110 MB at every width.
        block_b = 64 if c <= 320 else (128 if c <= 640 else 32)
    if fast_gating is None:
        fast_gating = _default_fast_gating(x.reshape(-1, c))
    return _block(x, pe, tuple(params), float(scale), heads, eps,
                  fast_gating, block_b, interpret)
