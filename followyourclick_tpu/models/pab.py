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
    if pab.half:
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
