"""Fused GEGLU feed-forward Pallas TPU kernel.

Reference semantics: diffusers ``FeedForward``/``GEGLU``
(``diffusers/models/attention.py:733,772``): ``x @ W1 + b1`` to ``2*inner``
channels, split, ``h * gelu(gate)`` (exact erf gelu), project back with
``W2 + b2``.

XLA materializes the ``(rows, 2*inner)`` intermediate in HBM — ~670 MB of
round-trip traffic per 64² clip FF. Both weight panels fit VMEM
(C=320: 1.6 MB + 0.8 MB; C=1280: 26 MB + 13 MB), so this kernel streams row
blocks and keeps the intermediate entirely in VMEM: one read of x, one write
of the output. Measured v5e (rows = tokens of one CFG clip step):
64²/C=320 4.23 → 2.95 ms, 32²/C=640 2.79 → 1.90 ms, 16²/C=1280
2.16 → 1.84 ms per FF.

gelu uses the Abramowitz–Stegun 7.1.26 erf approximation (|err| ≤ 1.5e-7 —
two orders below bf16 resolution; Mosaic has no erf primitive).

Backward recomputes through an fp32 XLA reference (training path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _erf(x):
    # Abramowitz & Stegun 7.1.26 (|err| <= 1.5e-7)
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


_INV_SQRT2 = np.float32(1.0 / np.sqrt(2.0))


def _gate_mul(h, gate, fast: bool, out_dtype):
    """``h * gelu(gate)``.

    fast=False: exact erf gelu, fp32 VPU math (A&S 7.1.26, |err| ≤ 1.5e-7).
    fast=True: tanh-gelu with the elementwise math in bf16 — measured v5e
    −0.65 ms/site at C=320 and −0.5 ms at C=640 (the fp32 erf poly's
    divide+exp dominate the VPU time between the two MXU dots). The
    tanh-vs-erf gap (≤1.1e-2 absolute on ℝ) is below bf16's own resolution
    of the fp32 result, and the reference serves under fp16 autocast
    (gelu in fp16) — see test_geglu.py::test_fast_gating_within_bf16_noise.
    Slower than exact at C=1280 (VMEM-resident fp32 is cheaper than the
    extra casts at that width), so callers route by width.
    """
    if not fast:
        g = 0.5 * gate * (1.0 + _erf(gate * _INV_SQRT2))
        return (h * g).astype(out_dtype)
    gb = gate.astype(jnp.bfloat16)
    hb = h.astype(jnp.bfloat16)
    inner = 0.7978845608 * (gb + 0.044715 * gb * gb * gb)
    g = 0.5 * gb * (1.0 + jnp.tanh(inner))
    return (hb * g).astype(out_dtype)


def _kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, *, inner: int,
            fast: bool):
    x = x_ref[:]                                  # (R, C)
    h2 = jnp.dot(x, w1_ref[:], preferred_element_type=jnp.float32)
    h2 = h2 + b1_ref[:].astype(jnp.float32)
    h = h2[:, :inner]
    gate = h2[:, inner:]
    y = _gate_mul(h, gate, fast, x.dtype)
    out = jnp.dot(y, w2_ref[:], preferred_element_type=jnp.float32)
    out = out + b2_ref[:].astype(jnp.float32)
    o_ref[:] = out.astype(o_ref.dtype)


def _ln_kernel(x_ref, ls_ref, lb_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
               *, inner: int, eps: float, residual: bool, fast: bool):
    """pre-LayerNorm -> GEGLU FF [-> +residual], one read / one write."""
    x = x_ref[:]                                  # (R, C)
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=1, keepdims=True)
    ctr = xf - mean
    var = jnp.mean(ctr * ctr, axis=1, keepdims=True)
    normed = ctr * jax.lax.rsqrt(var + eps)
    normed = normed * ls_ref[:].astype(jnp.float32) \
        + lb_ref[:].astype(jnp.float32)
    normed = normed.astype(x.dtype)

    h2 = jnp.dot(normed, w1_ref[:], preferred_element_type=jnp.float32)
    h2 = h2 + b1_ref[:].astype(jnp.float32)
    h = h2[:, :inner]
    gate = h2[:, inner:]
    y = _gate_mul(h, gate, fast, x.dtype)
    out = jnp.dot(y, w2_ref[:], preferred_element_type=jnp.float32)
    out = out + b2_ref[:].astype(jnp.float32)
    out = out.astype(o_ref.dtype)
    if residual:
        out = out + x
    o_ref[:] = out


def _fwd_impl(x, w1, b1, w2, b2, block_r, interpret, fast):
    r, c = x.shape
    inner = w2.shape[0]
    pad = (-r) % block_r
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    rp = x.shape[0]
    out = pl.pallas_call(
        functools.partial(_kernel, inner=inner, fast=fast),
        grid=(rp // block_r,),
        in_specs=[
            pl.BlockSpec((block_r, c), lambda i: (i, 0)),
            pl.BlockSpec((c, 2 * inner), lambda i: (0, 0)),
            pl.BlockSpec((2 * inner,), lambda i: (0,)),
            pl.BlockSpec((inner, c), lambda i: (0, 0)),
            pl.BlockSpec((c,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((block_r, c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rp, c), x.dtype),
        compiler_params=pltpu.CompilerParams(
            # row blocks are independent ("parallel" measured ~2% over
            # "arbitrary" on v5e at every UNet width)
            dimension_semantics=("parallel",),
            # the weight panels alone are ~39 MB at C=1280
            vmem_limit_bytes=110 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * rp * c * 4 * inner,
            bytes_accessed=2 * rp * c * x.dtype.itemsize,
            transcendentals=rp * inner,
        ),
        interpret=interpret,
    )(x, w1, b1, w2, b2)
    return out[:r]


def _ref_fp32(x, w1, b1, w2, b2):
    inner = w2.shape[0]
    xf = x.astype(jnp.float32)
    h2 = xf @ w1.astype(jnp.float32) + b1.astype(jnp.float32)
    h, gate = h2[:, :inner], h2[:, inner:]
    y = h * jax.nn.gelu(gate, approximate=False)
    return y @ w2.astype(jnp.float32) + b2.astype(jnp.float32)


def _ln_ref_fp32(x, ls, lb, w1, b1, w2, b2, eps, residual):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=1, keepdims=True)
    ctr = xf - mean
    var = jnp.mean(ctr * ctr, axis=1, keepdims=True)
    normed = ctr * jax.lax.rsqrt(var + eps)
    normed = normed * ls.astype(jnp.float32) + lb.astype(jnp.float32)
    out = _ref_fp32(normed, w1, b1, w2, b2)
    return out + xf if residual else out


def _ln_fwd_impl(x, ls, lb, w1, b1, w2, b2, eps, residual, block_r,
                 interpret, fast):
    r, c = x.shape
    inner = w2.shape[0]
    pad = (-r) % block_r
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    rp = x.shape[0]
    out = pl.pallas_call(
        functools.partial(_ln_kernel, inner=inner, eps=eps,
                          residual=residual, fast=fast),
        grid=(rp // block_r,),
        in_specs=[
            pl.BlockSpec((block_r, c), lambda i: (i, 0)),
            pl.BlockSpec((c,), lambda i: (0,)),
            pl.BlockSpec((c,), lambda i: (0,)),
            pl.BlockSpec((c, 2 * inner), lambda i: (0, 0)),
            pl.BlockSpec((2 * inner,), lambda i: (0,)),
            pl.BlockSpec((inner, c), lambda i: (0, 0)),
            pl.BlockSpec((c,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((block_r, c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rp, c), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=110 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * rp * c * 4 * inner,
            bytes_accessed=2 * rp * c * x.dtype.itemsize,
            transcendentals=rp * inner,
        ),
        interpret=interpret,
    )(x, ls, lb, w1, b1, w2, b2)
    return out[:r]


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11))
def _ln_geglu(x, ls, lb, w1, b1, w2, b2, eps, residual, block_r, interpret,
              fast):
    return _ln_fwd_impl(x, ls, lb, w1, b1, w2, b2, eps, residual, block_r,
                        interpret, fast)


def _ln_geglu_fwd(x, ls, lb, w1, b1, w2, b2, eps, residual, block_r,
                  interpret, fast):
    out = _ln_geglu(x, ls, lb, w1, b1, w2, b2, eps, residual, block_r,
                    interpret, fast)
    return out, (x, ls, lb, w1, b1, w2, b2)


def _ln_geglu_bwd(eps, residual, block_r, interpret, fast, res, g):
    _, vjp = jax.vjp(
        lambda *a: _ln_ref_fp32(*a, eps, residual), *res)
    grads = vjp(g.astype(jnp.float32))
    return tuple(gr.astype(r.dtype) for gr, r in zip(grads, res))


_ln_geglu.defvjp(_ln_geglu_fwd, _ln_geglu_bwd)


def fused_ln_geglu(
    x: jnp.ndarray,    # (R, C) PRE-norm token rows
    ln_scale: jnp.ndarray,   # (C,)
    ln_bias: jnp.ndarray,    # (C,)
    w1: jnp.ndarray,   # (C, 2*inner)
    b1: jnp.ndarray,
    w2: jnp.ndarray,   # (inner, C)
    b2: jnp.ndarray,
    eps: float = 1e-5,
    residual: bool = True,
    block_r: int | None = None,
    interpret: bool | None = None,
    fast_gating: bool | None = None,
) -> jnp.ndarray:
    """LayerNorm → GEGLU FF → (+x), one HBM read and one write."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if block_r is None:
        # 1024 rows won the v5e sweep at every UNet width in bf16; fp32
        # (training) needs smaller blocks — see _fp32_block_r
        block_r = 1024 if x.dtype.itemsize <= 2 else _fp32_block_r(
            x.shape[-1], w2.shape[0])
    if fast_gating is None:
        fast_gating = _default_fast_gating(x)
    return _ln_geglu(x, ln_scale, ln_bias, w1, b1, w2, b2, eps, residual,
                     block_r, interpret, fast_gating)


def _fp32_block_r(c: int, inner: int) -> int:
    """Row-block size that keeps the fp32 kernel under the scoped-VMEM
    budget. At fp32 the resident weight panels double vs bf16 (78.6 MB at
    C=1280), so the bf16-tuned 1024-row block overflows the 110 MB limit —
    the training-path compile OOM at 448×256 (jvp of this kernel)."""
    budget = 100 * 1024 * 1024
    weights = (c * 2 * inner + inner * c) * 4
    per_row = 2 * c * 4 + 3 * inner * 4  # x+out rows, h2/y intermediates
    if weights >= budget:
        return 128
    return int(min(1024, max(128, ((budget - weights) // per_row
                                   // 128) * 128)))


def _default_fast_gating(x) -> bool:
    """bf16 tanh gating for the half-precision serving path at C ≤ 640
    (slower at 1280 — see _gate_mul); FYC_EXACT_GELU=1 forces exact."""
    import os

    if os.environ.get("FYC_EXACT_GELU", "") not in ("", "0"):
        return False
    return x.dtype == jnp.bfloat16 and x.shape[-1] <= 640


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _geglu(x, w1, b1, w2, b2, block_r, interpret, fast):
    return _fwd_impl(x, w1, b1, w2, b2, block_r, interpret, fast)


def _geglu_fwd(x, w1, b1, w2, b2, block_r, interpret, fast):
    return (_geglu(x, w1, b1, w2, b2, block_r, interpret, fast),
            (x, w1, b1, w2, b2))


def _geglu_bwd(block_r, interpret, fast, res, g):
    _, vjp = jax.vjp(_ref_fp32, *res)
    grads = vjp(g.astype(jnp.float32))
    return tuple(gr.astype(r.dtype) for gr, r in zip(grads, res))


_geglu.defvjp(_geglu_fwd, _geglu_bwd)


def fused_geglu(
    x: jnp.ndarray,    # (R, C) token rows
    w1: jnp.ndarray,   # (C, 2*inner)
    b1: jnp.ndarray,   # (2*inner,)
    w2: jnp.ndarray,   # (inner, C)
    b2: jnp.ndarray,   # (C,)
    block_r: int | None = None,
    interpret: bool | None = None,
    fast_gating: bool | None = None,
) -> jnp.ndarray:
    """GEGLU feed-forward with the (R, 2*inner) intermediate kept in VMEM."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if block_r is None:
        # 1024 rows won the v5e sweep at every UNet width in bf16 (the fp32
        # h2 block, 42 MB at inner=5120, + bf16 weight panels stay under the
        # 110 MB budget); fp32 weights double — see _fp32_block_r
        block_r = 1024 if x.dtype.itemsize <= 2 else _fp32_block_r(
            x.shape[-1], w2.shape[0])
    if fast_gating is None:
        fast_gating = _default_fast_gating(x)
    return _geglu(x, w1, b1, w2, b2, block_r, interpret, fast_gating)
