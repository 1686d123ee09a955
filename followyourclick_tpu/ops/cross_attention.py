"""Fused short-kv cross-attention Pallas TPU kernel (text conditioning).

Reference semantics: diffusers ``CrossAttention`` with a text context
(``diffusers/models/attention.py:510``; driven from
``animatediff/models/attention.py:330-564`` as ``attn2``): pre-LayerNorm →
q/k/v projections → softmax(q·kᵀ/√d)·v per head → out projection.

Why a kernel: the text cross-attention runs S_q up to 4096 query tokens
against only S_kv = 77 keys. XLA materializes q, the fp32 logits
``(B, H, Sq, 77→128)`` and the weights in HBM between every stage — at the
64² flagship shape that is ~4 HBM round-trips of Sq-sized tensors for an op
whose useful math is tiny. Here one kernel does LN → q-proj → attention →
out-proj with ONE read of the hidden rows and ONE write of the output.

The per-head structure is packed away from the d=40 lane tax
(docs/PERF.md): k/v are laid out block-diagonally with each head's keys in
its own 128-lane segment —

  kp[c, h·128 + j] = k_h[j, c - h·D]   (zero outside head h's D rows)
  vp[h·128 + j, c] = v_h[j, c - h·D]

so ``q2d @ kp`` yields the logits of ALL heads in one (rows, H·128) MXU dot
(the zero blocks make cross-head terms exactly zero), softmax runs segmented
over 128-lane groups, and ``weights @ vp`` re-scatters heads into the packed
(rows, H·D) output layout that feeds the out projection directly. No
relayouts, no per-head slicing at 40-lane offsets.

Numerics match the XLA path (ops/attention.py::_xla_attention): bf16 q/k/v,
fp32 logits and softmax, bf16 attention·v, fp32-accumulated projections.

NOT ROUTED — measured NEGATIVE result on v5e (docs/PERF.md): under the
denoise scan XLA runs the whole site at 2.46/1.42/0.96 ms (64²/32²/16²)
while this kernel lands at 3.69/2.05/1.50 ms. The block-diagonal packing
buys lane alignment but pays H× redundant MXU flops on the (rows, H·128)
logits/AV dots, and the in-kernel LN→dot→softmax→dot chain serializes
VPU and MXU where XLA overlaps its fused stages. Kept with tests as the
measured record; revisit only if the kv length or head layout changes.

Backward recomputes through an fp32 XLA reference (training path), like
ops/geglu.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_KV_SEG = 128  # lane segment per head (min MXU tile width)


def _kernel(x_ref, ls_ref, lb_ref, wq_ref, kp_ref, vp_ref, wo_ref, bo_ref,
            o_ref, *, heads: int, skv: int, scale: float, eps: float):
    x = x_ref[0]                                   # (R, C)
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=1, keepdims=True)
    ctr = xf - mean
    var = jnp.mean(ctr * ctr, axis=1, keepdims=True)
    normed = ctr * jax.lax.rsqrt(var + eps)
    normed = normed * ls_ref[:].astype(jnp.float32) \
        + lb_ref[:].astype(jnp.float32)
    normed = normed.astype(x.dtype)

    q = jnp.dot(normed, wq_ref[:],
                preferred_element_type=jnp.float32).astype(x.dtype)
    # all-head logits in one dot: kp is block-diagonal over heads
    logits = jnp.dot(q, kp_ref[0],
                     preferred_element_type=jnp.float32) * scale
    r, hp = logits.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (1, hp), 1)
    logits = jnp.where(col % _KV_SEG < skv, logits, -1e9)
    seg = logits.reshape(r, heads, _KV_SEG)
    m = jnp.max(seg, axis=-1, keepdims=True)
    e = jnp.exp(seg - m)
    w = e / jnp.sum(e, axis=-1, keepdims=True)
    w = w.reshape(r, hp).astype(x.dtype)
    out = jnp.dot(w, vp_ref[0],
                  preferred_element_type=jnp.float32).astype(x.dtype)
    proj = jnp.dot(out, wo_ref[:], preferred_element_type=jnp.float32)
    o_ref[0] = (proj + bo_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


def _pack_kv(k, v, heads: int, kv_seg: int = _KV_SEG):
    """Block-diagonal head packing (see module docstring).

    k, v: (B, Skv, H·D) projected keys/values, Skv ≤ kv_seg.
    Returns kp (B, H·D, H·kv_seg), vp (B, H·kv_seg, H·D).
    """
    b, skv, c = k.shape
    d = c // heads
    kh = k.reshape(b, skv, heads, d).transpose(0, 2, 3, 1)  # (B,H,D,Skv)
    kp = jnp.zeros((b, heads, c, kv_seg), k.dtype)
    vh = v.reshape(b, skv, heads, d)
    vp = jnp.zeros((b, heads, kv_seg, c), v.dtype)
    for h in range(heads):
        kp = kp.at[:, h, h * d:(h + 1) * d, :skv].set(kh[:, h])
        vp = vp.at[:, h, :skv, h * d:(h + 1) * d].set(vh[:, :, h])
    kp = kp.transpose(0, 2, 1, 3).reshape(b, c, heads * kv_seg)
    vp = vp.reshape(b, heads * kv_seg, c)
    return kp, vp


def _fwd_impl(x, context, ls, lb, wq, wk, wv, wo, bo, heads, scale, eps,
              block_s, interpret):
    b, s, c = x.shape
    c_inner = wq.shape[1]
    # k/v projections + packing in XLA: Skv·Ck-sized, negligible next to S
    k = jnp.einsum("bsk,kc->bsc", context, wk)
    v = jnp.einsum("bsk,kc->bsc", context, wv)
    kp, vp = _pack_kv(k, v, heads)
    hp = heads * _KV_SEG

    block_s = min(block_s, s)
    pad = (-s) % block_s
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    sp = x.shape[1]
    out = pl.pallas_call(
        functools.partial(_kernel, heads=heads, skv=context.shape[1],
                          scale=scale, eps=eps),
        grid=(b, sp // block_s),
        in_specs=[
            pl.BlockSpec((1, block_s, c), lambda i, j: (i, j, 0)),
            pl.BlockSpec((c,), lambda i, j: (0,)),
            pl.BlockSpec((c,), lambda i, j: (0,)),
            pl.BlockSpec((c, c_inner), lambda i, j: (0, 0)),
            pl.BlockSpec((1, c_inner, hp), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, hp, c_inner), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((c_inner, c), lambda i, j: (0, 0)),
            pl.BlockSpec((c,), lambda i, j: (0,)),
        ],
        out_specs=pl.BlockSpec((1, block_s, c), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, sp, c), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * sp * (2 * c * c_inner + 2 * c_inner * hp),
            bytes_accessed=2 * b * sp * c * x.dtype.itemsize,
            transcendentals=b * sp * hp,
        ),
        interpret=interpret,
    )(x, ls, lb, wq, kp, vp, wo, bo)
    return out[:, :s]


def _ref_fp32(x, context, ls, lb, wq, wk, wv, wo, bo, heads, scale, eps):
    f32 = jnp.float32
    xf = x.astype(f32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    ctr = xf - mean
    var = jnp.mean(ctr * ctr, axis=-1, keepdims=True)
    normed = ctr * jax.lax.rsqrt(var + eps)
    normed = normed * ls.astype(f32) + lb.astype(f32)
    b, s, c = x.shape
    d = wq.shape[1] // heads
    q = (normed @ wq.astype(f32)).reshape(b, s, heads, d)
    k = (context.astype(f32) @ wk.astype(f32)).reshape(
        b, -1, heads, d)
    v = (context.astype(f32) @ wv.astype(f32)).reshape(
        b, -1, heads, d)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    w = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", w, v).reshape(b, s, heads * d)
    return out @ wo.astype(f32) + bo.astype(f32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12, 13))
def _ln_cross_attn(x, context, ls, lb, wq, wk, wv, wo, bo, heads, scale, eps,
                   block_s, interpret):
    return _fwd_impl(x, context, ls, lb, wq, wk, wv, wo, bo, heads, scale,
                     eps, block_s, interpret)


def _ln_cross_attn_fwd(x, context, ls, lb, wq, wk, wv, wo, bo, heads, scale,
                       eps, block_s, interpret):
    out = _ln_cross_attn(x, context, ls, lb, wq, wk, wv, wo, bo, heads,
                         scale, eps, block_s, interpret)
    return out, (x, context, ls, lb, wq, wk, wv, wo, bo)


def _ln_cross_attn_bwd(heads, scale, eps, block_s, interpret, res, g):
    _, vjp = jax.vjp(lambda *a: _ref_fp32(*a, heads, scale, eps), *res)
    grads = vjp(g.astype(jnp.float32))
    return tuple(gr.astype(r.dtype) for gr, r in zip(grads, res))


_ln_cross_attn.defvjp(_ln_cross_attn_fwd, _ln_cross_attn_bwd)


def fused_ln_cross_attention(
    x: jnp.ndarray,        # (B, S, C) PRE-norm hidden rows
    context: jnp.ndarray,  # (B, Skv, Ck), Skv ≤ 128
    ln_scale: jnp.ndarray,  # (C,)
    ln_bias: jnp.ndarray,   # (C,)
    wq: jnp.ndarray,   # (C, H·D)
    wk: jnp.ndarray,   # (Ck, H·D)
    wv: jnp.ndarray,   # (Ck, H·D)
    wo: jnp.ndarray,   # (H·D, C)
    bo: jnp.ndarray,   # (C,)
    heads: int,
    scale: float | None = None,
    eps: float = 1e-5,
    block_s: int | None = None,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """LayerNorm → cross-attention → out projection, one read / one write.

    Returns the attention output (pre-residual; the caller adds ``x`` so PAB
    caching semantics stay identical to the modular path).
    """
    if context.shape[1] > _KV_SEG:
        raise ValueError(f"short-kv kernel requires Skv <= {_KV_SEG}, got "
                         f"{context.shape[1]}")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if block_s is None:
        block_s = 512
    if scale is None:
        scale = (wq.shape[1] // heads) ** -0.5
    return _ln_cross_attn(x, context, ln_scale, ln_bias, wq, wk, wv, wo, bo,
                          heads, float(scale), eps, block_s, interpret)
