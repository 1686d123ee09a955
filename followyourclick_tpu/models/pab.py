"""Pyramid-Attention-Broadcast-style attention-output reuse.

OPT-IN serving approximation (NOT reference behavior; same family as
Pyramid Attention Broadcast, arXiv 2408.12588): attention sublayer outputs
drift slowly across adjacent diffusion timesteps, so on most steps the
previous step's output can be broadcast (reused) instead of recomputed.
Each attention *kind* gets its own refresh interval — cross-attention drifts
slowest, temporal next, spatial fastest.

Mechanics: every attention sublayer is wrapped in :func:`pab_site`.  A
``PabMode`` with all flags off (or ``pab=None`` on the module) is the exact
path.  On "record" steps the sublayer output is written into the ``"pab"``
flax variable collection; on "reuse" steps the collection value is returned
and the whole sublayer (pre-LN → q/k/v → attention → out-proj) is skipped.
The sampler threads the collection through the denoise loop as a scan carry
(`pipelines/animation.py`), choosing a statically-known ``PabMode`` per step
position so XLA compiles real skips — no dynamic control flow.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import flax.linen as nn
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class PabMode:
    """Static per-step attention reuse/record flags.

    ``reuse_*``: return the cached sublayer output instead of computing.
    ``record_*``: write freshly computed outputs into the ``"pab"``
    collection (kept on for every kind that is ever reused so the cache
    tree — a scan carry — has a step-independent structure).
    """

    reuse_spatial: bool = False
    reuse_cross: bool = False
    reuse_temporal: bool = False
    record_spatial: bool = False
    record_cross: bool = False
    record_temporal: bool = False
    # DeepCache-style trunk reuse (arXiv 2312.00858 family): cache the
    # output of the UNet "trunk" (down levels 1.., mid, up levels ..n-2) and
    # on reuse steps run only the outermost level (conv_in, down block 0,
    # the last up block, conv_out). The trunk output drifts slowly across
    # adjacent timesteps while the outermost level carries most of the
    # per-step detail — the same locality argument PAB makes per attention
    # site, applied to the whole low-resolution pyramid.
    reuse_deep: bool = False
    record_deep: bool = False
    # First-order trunk forecast (same TeaCache-style trick as the sampler's
    # cfg_cache_extrapolate, applied to the DeepCache trunk): keep the last
    # TWO recorded trunk outputs and on reuse steps return
    # ``cur + coeff·(cur − prev)`` instead of the stale ``cur``. In steady
    # state records are ``deep_interval`` steps apart, so the per-step slope
    # is (cur − prev)/interval and the coefficient for a step ``age`` steps
    # past the last refresh is the STATIC ratio age/interval — baked into
    # each period position's graph, no dynamic state beyond the extra cache
    # entry. During warmup (consecutive records, 1-step gap) the same ratio
    # under-extrapolates, which degrades toward plain reuse — conservative.
    deep_extrapolate: bool = False
    deep_ex_coeff: float = 0.0
    # The UNet is being applied to the COND half of the CFG batch only
    # (the sampler's static CFG-uncond caching, cfg_cache_interval, composed
    # with PAB): cached values are full-CFG-batch shaped, so reuse returns
    # their second half and record updates only that half. Works because
    # every attention site folds batch into the leading factor of dim 0.
    half: bool = False

    def reuse(self, kind: str) -> bool:
        return getattr(self, f"reuse_{kind}")

    def record(self, kind: str) -> bool:
        return getattr(self, f"record_{kind}")


def pab_site(
    mdl: nn.Module,
    kind: str,  # "spatial" | "cross" | "temporal" | "deep"
    name: str,
    pab: Optional[PabMode],
    compute: Callable[[], jnp.ndarray],
) -> jnp.ndarray:
    """One attention sublayer: compute-and-record, or reuse the cache.

    The cached value is the full sublayer output (post out-projection,
    pre-residual), so a reuse step skips the LN and every projection too.
    """
    if pab is None:
        return compute()
    if kind == "deep" and pab.deep_extrapolate:
        return _deep_ex_site(mdl, name, pab, compute)
    if pab.half:
        if not (pab.reuse(kind) or pab.record(kind)):
            # site's kind is not part of the reuse schedule (e.g. a PAB-less
            # DeepCache ∘ cfg-cache composition): no cache entry exists
            return compute()
        # cond-half application against a full-CFG-shaped cache
        assert mdl.has_variable("pab", name), (
            "half-batch PAB steps require a cache recorded by a full step")
        cached = mdl.get_variable("pab", name)
        n2 = cached.shape[0] // 2
        if pab.reuse(kind):
            if pab.record(kind):  # write-back: keep the collection tree
                var = mdl.variable("pab", name, lambda: cached)
                var.value = cached
            return cached[n2:]
        out = compute()
        if pab.record(kind):
            var = mdl.variable("pab", name, lambda: cached)
            var.value = jnp.concatenate([cached[:n2], out], axis=0)
        return out
    if pab.reuse(kind) and mdl.has_variable("pab", name):
        out = mdl.get_variable("pab", name)
    else:
        out = compute()
    if pab.record(kind):
        # written even on reuse steps so every step variant returns the same
        # "pab" collection tree (the sampler threads it as a scan carry)
        var = mdl.variable("pab", name, lambda: out)
        var.value = out
    return out


def _deep_ex_site(mdl, name: str, pab: PabMode,
                  compute: Callable[[], jnp.ndarray]) -> jnp.ndarray:
    """Trunk cache with the first-order forecast (``PabMode.deep_extrapolate``).

    Cache entries: ``name`` (last recorded trunk), ``name + "_prev"`` (the
    record before it), ``name + "_valid"`` (scalar: has a prior record been
    shifted into prev? — the very first record sets prev = cur so the first
    period extrapolates with slope 0, i.e. plain reuse). Reuse steps never
    write: the sampler's ``_merge_cache`` carries untouched entries forward,
    and writing the forecast back would corrupt the slope base.
    """
    pname, vname = name + "_prev", name + "_valid"
    has = mdl.has_variable("pab", name)
    if pab.reuse("deep") and has:
        cur = mdl.get_variable("pab", name)
        prev = mdl.get_variable("pab", pname)
        c32 = cur.astype(jnp.float32)
        out = (c32 + pab.deep_ex_coeff * (c32 - prev.astype(jnp.float32))
               ).astype(cur.dtype)
        return out[cur.shape[0] // 2:] if pab.half else out
    out = compute()
    if pab.record("deep"):
        if pab.half:
            # cond-half refresh against a full-CFG-shaped cache (deep
            # intervals shorter than the cfg-cache interval): the uncond
            # half stays at its last full-step value in BOTH cur and prev,
            # so its forecast slope is 0 there — conservative
            assert has, ("half-batch deep refresh requires a cache recorded "
                         "by a full step")
            cur = mdl.get_variable("pab", name)
            new_cur = jnp.concatenate([cur[: cur.shape[0] // 2], out], axis=0)
        else:
            cur = mdl.get_variable("pab", name) if has else out
            new_cur = out
        valid = (mdl.get_variable("pab", vname)
                 if mdl.has_variable("pab", vname)
                 else jnp.zeros((), jnp.float32))
        prev_new = jnp.where(valid > 0, cur, new_cur)
        one = jnp.ones((), jnp.float32)
        mdl.variable("pab", name, lambda: new_cur).value = new_cur
        mdl.variable("pab", pname, lambda: prev_new).value = prev_new
        mdl.variable("pab", vname, lambda: one).value = one
    return out
