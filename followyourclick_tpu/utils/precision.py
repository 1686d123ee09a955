"""Parameter precision helpers.

The reference runs inference with half-precision weights (``unet.half()`` etc.,
implied by fp16 checkpoints in ``scripts/inference.py``). Keeping fp32 master
params while computing in bf16 makes every matmul fusion read 2× the weight
bytes and convert on the fly — measured on v5e this shows up as transposed-
layout fp32 weight operands inside the hot matmul fusions. For serving, cast
the whole tree once.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cast_floating(tree, dtype):
    """Cast every floating-point leaf of a pytree to ``dtype``
    (non-float leaves — e.g. int embedding ids — untouched)."""

    def _cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(_cast, tree)
