"""Single-pass fused GroupNorm(+SiLU) Pallas TPU kernel.

Reference semantics: ``torch.nn.GroupNorm`` (NCHW) == GroupNorm over the
trailing channel axis here (NHWC), as used by every UNet/VAE block
(reference ``animatediff/models/resnet.py``, ``attention.py:141-308``).

XLA lowers GroupNorm as a stats pass (read x), then a normalize pass (read x
again, write y) — 3 HBM traversals plus fusion boundaries that break up the
surrounding elementwise chain (measured v5e: ~17 ms/step of convert_reduce
fusions across the UNet's 61 GroupNorms). This kernel keeps one batch-row
slab ``(N, C)`` resident in VMEM and does stats + normalize + affine
(+ optional SiLU) in ONE read and ONE write.

Group reductions never reshape channels into ``(G, C/G)`` (an unsupported
lane-granularity shape cast on TPU): per-channel sums ``(bb, C)`` are folded
to per-group sums ``(bb, G)`` with a 0/1 matmul ``M (C, G)`` on the MXU, and
broadcast back with ``Mᵀ`` — two tiny dots instead of any relayout.

Numerics match ``models/layers.GroupNorm``: fp32 statistics with a pilot
shift (first spatial element of each group) so E[x²]−E[x]² cannot
catastrophically cancel; affine folded into one multiply-add.

Backward recomputes through an fp32 XLA reference (GroupNorm backward is a
training-path concern; this kernel's caller gates on inference-sized slabs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, scale_ref, bias_ref, m_ref, mt_ref, o_ref,
            *, groups: int, eps: float, act: str | None):
    bb, n, c = x_ref.shape
    cg = c // groups
    x = x_ref[:]
    xf = x.astype(jnp.float32)
    m = m_ref[:].astype(jnp.float32)          # (C, G) 0/1 group membership
    mt = mt_ref[:].astype(jnp.float32)        # (G, C)

    # pilot shift: first spatial element, averaged per group
    pilot_c = xf[:, 0, :]                                     # (bb, C)
    pilot_g = jnp.dot(pilot_c, m, preferred_element_type=jnp.float32) / cg
    pilot = jnp.dot(pilot_g, mt, preferred_element_type=jnp.float32)

    shifted = xf - pilot[:, None, :]
    s1c = jnp.sum(shifted, axis=1)                            # (bb, C)
    s2c = jnp.sum(shifted * shifted, axis=1)
    cnt = n * cg
    s1g = jnp.dot(s1c, m, preferred_element_type=jnp.float32)   # (bb, G)
    s2g = jnp.dot(s2c, m, preferred_element_type=jnp.float32)
    mean_c = s1g / cnt
    var = jnp.maximum(s2g / cnt - mean_c * mean_c, 0.0)
    inv_g = jax.lax.rsqrt(var + eps)                            # (bb, G)
    mean_g = mean_c + pilot_g

    inv = jnp.dot(inv_g, mt, preferred_element_type=jnp.float32)   # (bb, C)
    mean = jnp.dot(mean_g, mt, preferred_element_type=jnp.float32)
    scale = scale_ref[:].astype(jnp.float32)                  # (C,)
    bias = bias_ref[:].astype(jnp.float32)
    a = inv * scale[None]                                     # (bb, C)
    b = bias[None] - mean * a

    y = xf * a[:, None, :] + b[:, None, :]
    if act == "silu":
        y = y * jax.nn.sigmoid(y)
    o_ref[:] = y.astype(o_ref.dtype)


def _fwd_impl(x, scale, bias, groups, eps, act, block_b, interpret):
    b, n, c = x.shape
    member = np.zeros((c, groups), np.float32)
    member[np.arange(c), np.arange(c) // (c // groups)] = 1.0
    m = jnp.asarray(member, x.dtype)
    mt = jnp.asarray(member.T, x.dtype)
    pad = (-b) % block_b
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0), (0, 0)))
    bp = x.shape[0]
    out = pl.pallas_call(
        functools.partial(_kernel, groups=groups, eps=eps, act=act),
        grid=(bp // block_b,),
        in_specs=[
            pl.BlockSpec((block_b, n, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((c,), lambda i: (0,)),
            pl.BlockSpec((c,), lambda i: (0,)),
            pl.BlockSpec((c, groups), lambda i: (0, 0)),
            pl.BlockSpec((groups, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_b, n, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bp, n, c), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            # the fp32 working slab (x, shifted, y) legitimately exceeds the
            # 16 MB default scoped-vmem budget at 64² clip shapes
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=10 * bp * n * c,
            bytes_accessed=2 * bp * n * c * x.dtype.itemsize,
            transcendentals=bp * n * c if act else 0,
        ),
        interpret=interpret,
    )(x, scale, bias, m, mt)
    return out[:b]


def _ref_fp32(x, scale, bias, groups, eps, act):
    b, n, c = x.shape
    cg = c // groups
    xf = x.astype(jnp.float32).reshape(b, n, groups, cg)
    mean = xf.mean(axis=(1, 3), keepdims=True)
    var = ((xf - mean) ** 2).mean(axis=(1, 3), keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y.reshape(b, n, c) * scale.astype(jnp.float32) \
        + bias.astype(jnp.float32)
    if act == "silu":
        y = y * jax.nn.sigmoid(y)
    return y


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _gn(x, scale, bias, groups, eps, act, block_b, interpret):
    return _fwd_impl(x, scale, bias, groups, eps, act, block_b, interpret)


def _gn_fwd(x, scale, bias, groups, eps, act, block_b, interpret):
    out = _gn(x, scale, bias, groups, eps, act, block_b, interpret)
    return out, (x, scale, bias)


def _gn_bwd(groups, eps, act, block_b, interpret, res, g):
    x, scale, bias = res
    _, vjp = jax.vjp(
        lambda xx, ss, bb: _ref_fp32(xx, ss, bb, groups, eps, act),
        x, scale, bias)
    gx, gs, gb = vjp(g.astype(jnp.float32))
    return gx.astype(x.dtype), gs.astype(scale.dtype), gb.astype(bias.dtype)


_gn.defvjp(_gn_fwd, _gn_bwd)


def fused_group_norm(
    x: jnp.ndarray,          # (B, N, C) — spatial flattened to one axis
    scale: jnp.ndarray,      # (C,)
    bias: jnp.ndarray,       # (C,)
    groups: int = 32,
    eps: float = 1e-5,
    act: str | None = None,  # None | "silu"
    block_b: int | None = None,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Single-pass GroupNorm(+SiLU) over VMEM-resident (N, C) slabs."""
    b, n, c = x.shape
    assert c % groups == 0, (c, groups)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if block_b is None:
        # keep the fp32 working slab comfortably inside VMEM
        block_b = max(1, min(8, 4 * 1024 * 1024 // (n * c * 4), b))
    return _gn(x, scale, bias, groups, eps, act, block_b, interpret)


def fits_vmem(n: int, c: int) -> bool:
    """Whether one (N, C) slab (fp32 working set ~6 bytes/elt) fits the
    per-block VMEM budget the kernel assumes."""
    return n * c * 6 <= 8 * 1024 * 1024
