"""Attention dispatch: Pallas flash-attention on TPU, fused XLA einsum fallback.

Replaces the reference's hard xformers dependency
(``animatediff/models/attention.py:461-487``, ``mm_attn_cross.py:222-229`` — the
reference *asserts* xformers is installed, ``scripts/inference.py:157-158``).
Here attention is a pure function over ``(B, S, H, D)`` arrays with automatic
kernel selection; no global mutable "enabled" flag.

Softmax always runs in fp32 (parity with the reference's ``upcast_softmax`` /
xformers behavior, and required for bf16 stability).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp

# global override for experiments/benchmarks: "auto" | "flash" | "xla"
_IMPL_OVERRIDE = os.environ.get("FYC_ATTN_IMPL", "")


def _packed_small_seq_attention(
    query: jnp.ndarray,  # (B, S, H, D), S tiny (the temporal/frame axis)
    key: jnp.ndarray,
    value: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    scale: float,
) -> jnp.ndarray:
    """Block-diagonal head packing for tiny sequences.

    The temporal attention runs seq = F ≤ 32 with a huge folded batch
    (B·H·W spatial positions, SURVEY.md §3.3) — as a per-head batched matmul
    that is a (16×16)·K=40 MXU op at ~1% utilisation. Packing (frame, head)
    into one M = N = S·H axis (e.g. 16·8 = 128) and masking cross-head
    entries to -inf turns it into full 128-wide MXU tiles; the H× extra
    FLOPs are negligible at these sizes. NOTE: measured on v5e inside the
    fused 16f/512px pipeline this loses to XLA's batched path (fp32 packed
    logits cost more HBM traffic than the tiling saves), so it is opt-in
    (impl="packed") for smaller folded batches, not the default.
    """
    b, s, h, d = query.shape
    m = s * h
    qp = query.reshape(b, m, d)
    kp = key.reshape(b, m, d)
    vp = value.reshape(b, m, d)
    logits = jnp.einsum(
        "bmd,bnd->bmn", qp, kp, preferred_element_type=jnp.float32
    ) * scale
    head = jnp.arange(m) % h
    same_head = head[:, None] == head[None, :]
    if bias is not None:
        f_idx = jnp.arange(m) // h
        packed_bias = bias[:, head[:, None], f_idx[:, None], f_idx[None, :]]
        logits = logits + packed_bias.astype(jnp.float32)
    logits = jnp.where(same_head, logits, -1e9)
    weights = jax.nn.softmax(logits, axis=-1).astype(query.dtype)
    out = jnp.einsum("bmn,bnd->bmd", weights, vp)
    return out.reshape(b, s, h, d)


def _xla_attention(
    query: jnp.ndarray,  # (B, Sq, H, D)
    key: jnp.ndarray,    # (B, Sk, H, D)
    value: jnp.ndarray,  # (B, Sk, H, D)
    bias: Optional[jnp.ndarray],
    scale: float,
) -> jnp.ndarray:
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", query, key,
        preferred_element_type=jnp.float32,
    ) * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    weights = jax.nn.softmax(logits, axis=-1).astype(query.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", weights, value)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _batch_chunked_attention(query, key, value, scale, chunk):
    """Exact attention computed ``chunk`` batch rows at a time.

    Training memory lever (``FYC_ATTN_BATCH_CHUNK``): in the remat'd
    backward of the level-0 spatial self-attention at the 24-frame
    reference recipe shape, XLA materializes the full score tensor as an
    HLO temp — f32[24,8,1792,1792] = 2.3 GB (+1.15 GB bf16), the single
    largest allocation in the OOM dump. Batch rows (clip × frame) are
    independent in spatial attention, so chunking the batch is bit-exact
    and divides the temp by (B / chunk); serialized chunks cost nothing
    at these sizes (the MXU is saturated per chunk).

    Implementation notes, each variant measured at the 24-frame shape:
    lax.map inside the nn.remat region → 66 % HBM fragmentation (loop
    buffers pin allocator regions); plain unrolled slices → the scheduler
    overlaps all chunks and their score temps coexist (4 × 588 MB);
    forward-only barrier chaining → the BACKWARD chunks still overlap.
    Hence custom_vjp: residuals are just (q, k, v) — scores are never
    saved — and both passes chain each chunk on the previous chunk's
    result via optimization_barrier to force sequential scheduling."""
    return _chunked_fwd(query, key, value, scale, chunk)[0]


def _chunked_fwd(query, key, value, scale, chunk):
    b = query.shape[0]
    outs = []
    for i in range(0, b, chunk):
        q_i = query[i:i + chunk]
        if outs:
            q_i, _ = jax.lax.optimization_barrier((q_i, outs[-1]))
        outs.append(_xla_attention(q_i, key[i:i + chunk],
                                   value[i:i + chunk], None, scale))
    return jnp.concatenate(outs, axis=0), (query, key, value)


def _chunked_bwd(scale, chunk, res, g):
    query, key, value = res
    b = query.shape[0]
    dqs, dks, dvs = [], [], []
    for i in range(0, b, chunk):
        q_i = query[i:i + chunk]
        if dqs:  # serialize: chunk i's recompute waits on chunk i-1's grads
            q_i, _ = jax.lax.optimization_barrier((q_i, dqs[-1]))
        _, vjp = jax.vjp(
            lambda a, b_, c: _xla_attention(a, b_, c, None, scale),
            q_i, key[i:i + chunk], value[i:i + chunk])
        dq, dk, dv = vjp(g[i:i + chunk])
        dqs.append(dq)
        dks.append(dk)
        dvs.append(dv)
    return (jnp.concatenate(dqs, axis=0), jnp.concatenate(dks, axis=0),
            jnp.concatenate(dvs, axis=0))


_batch_chunked_attention.defvjp(_chunked_fwd, _chunked_bwd)


@functools.partial(jax.named_call, name="dot_product_attention")
def dot_product_attention(
    query: jnp.ndarray,
    key: jnp.ndarray,
    value: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    impl: str = "auto",
) -> jnp.ndarray:
    """Multi-head attention over (batch, seq, heads, head_dim) arrays.

    impl: "auto" picks the Pallas flash kernel on TPU for long self-attention
    sequences and the XLA fused path otherwise (short kv like text cross-attn
    seq=77+N or temporal seq<=32, where a flash kernel has nothing to save).
    """
    if scale is None:
        scale = query.shape[-1] ** -0.5

    if _IMPL_OVERRIDE:
        impl = _IMPL_OVERRIDE
    # Opt-in tiny-sequence head packing (see _packed_small_seq_attention).
    # Measured on v5e in the fused 16f/512px pipeline: the fp32 packed-logit
    # traffic outweighs the MXU tiling win, so XLA's batched path stays the
    # default for the temporal axis; "packed" is kept for serving shapes
    # where the folded batch is smaller.
    if impl == "packed":
        return _packed_small_seq_attention(query, key, value, bias, scale)
    use_flash = False
    if impl == "flash":
        use_flash = bias is None
    elif impl == "auto":
        from followyourclick_tpu.ops.fused import fused_kernels_enabled

        # Pallas picks require the central gate: Mosaic custom calls
        # cannot be GSPMD-auto-partitioned (ops/fused.py)
        on_tpu = fused_kernels_enabled()
        b, sq, h, d = query.shape
        sk = key.shape[1]
        # Tiny-seq temporal attention with a huge folded batch (the motion
        # module at 64²: b=8192, s=16, d=40): the per-head layout makes XLA
        # materialize fp32 logits [b,h,s,s] whose 16-wide minor dim pads to
        # 128 lanes — an 8× memory blowup — plus layout copies after every
        # projection. The fused Pallas kernel runs the (s·h)-packed layout
        # (a FREE reshape of the projection output) entirely in VMEM:
        # measured v5e 2.6 ms vs 5.0 ms isolated, and it removes the
        # in-module layout copies on top (MotionModule 64² 30.8→22.4 ms
        # already with packed-XLA; the kernel goes further).
        if on_tpu and bias is None and sq == sk and sq <= 32 \
                and sq * h <= 256:
            from followyourclick_tpu.ops.fused import dp_wrap
            from followyourclick_tpu.ops.temporal_attention import (
                temporal_attention,
            )

            return dp_wrap(temporal_attention, n_row_args=3)(
                query, key, value, scale=scale)
        # Measured on v5e (unet fwd, 16f 512px): XLA's row-fused attention
        # beats the flash kernel even at the 64² hot shape (b·h=256,
        # s=4096, d=40) — 425.8 vs 462.9 ms/step whole-UNet — because XLA
        # never materializes the full score tensor and skips flash's
        # explicit d→128 pads and (b,s,h,d)→(b·h,s,d) transposes. Flash
        # takes over only when the score working set approaches HBM
        # capacity (long-seq / batched serving shapes).
        score_bytes = b * h * sq * sk * 2  # bf16
        use_flash = (on_tpu and bias is None and sk >= 1024
                     and score_bytes > 12 * 1024 ** 3)
    if use_flash:
        from followyourclick_tpu.ops.flash_attention import flash_attention
        from followyourclick_tpu.ops.fused import dp_wrap

        return dp_wrap(flash_attention, n_row_args=3)(
            query, key, value, scale=scale)
    # training memory lever (see _batch_chunked_attention): chunk the batch
    # axis of LARGE self-attention sites so the remat'd backward never
    # materializes the full score temp. Opt-in via env; inert for serving.
    chunk = int(os.environ.get("FYC_ATTN_BATCH_CHUNK", "0"))
    if (chunk > 0 and bias is None
            and query.shape[0] % chunk == 0 and query.shape[0] > chunk):
        b, sq, h, d = query.shape
        if b * h * sq * key.shape[1] * 4 > 256 * 1024 ** 2:  # fp32 scores
            return _batch_chunked_attention(query, key, value, scale, chunk)
    return _xla_attention(query, key, value, bias, scale)
