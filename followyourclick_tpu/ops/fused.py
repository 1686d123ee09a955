"""Central gate for the Pallas fused-kernel paths.

Mosaic (Pallas TPU) custom calls cannot be automatically partitioned by
GSPMD — lowering a TP-sharded program that contains one raises
``NotImplementedError: Mosaic kernels cannot be automatically
partitioned`` (jax ``tpu_custom_call``). The CPU-mesh dryruns never see
this because off-TPU the models dispatch to their XLA formulations.

Two ways to run the kernels multi-chip:

* **Data-parallel meshes** (serving; clips sharded, params replicated):
  trace the program inside :func:`data_parallel_kernels` — every fused
  kernel call is then wrapped in ``shard_map`` over the data axis (dim 0
  of the activation operands sharded, weight panels replicated), so GSPMD
  partitions AROUND the kernel and each chip runs the stock single-chip
  kernel on its local rows. All fused kernels are row-independent along
  their folded leading dimension (LN/FF per row; temporal attention and
  the motion block per (clip × spatial) position), so this is exact.
* **Tensor-parallel meshes** (training): the kernels hold full C×C weight
  panels in VMEM, incompatible with TP's sharded C — set
  ``FYC_DISABLE_FUSED_KERNELS=1`` (the multi-chip tools do this
  themselves) and run the XLA formulations (same math, ≈5 % slower
  single-chip — docs/PERF.md).

Single-chip TPU default: kernels on, no wrapping.
"""

from __future__ import annotations

import contextlib
import os
from typing import Callable, Optional, Tuple

import jax


def fused_kernels_enabled() -> bool:
    if os.environ.get("FYC_DISABLE_FUSED_KERNELS", "") not in ("", "0"):
        return False
    return jax.default_backend() == "tpu"


# (mesh, axis_name) while a data_parallel_kernels context is active.
# Trace-time state: dispatch sites consult it when the model is TRACED, so
# the context must surround the jit call that first traces the program.
_DP_CTX: Optional[Tuple[object, str]] = None


@contextlib.contextmanager
def data_parallel_kernels(mesh, axis: str = "data"):
    """Trace DP-sharded programs with the fused Pallas kernels kept on.

    Inside this context every fused-kernel dispatch routes through
    :func:`dp_wrap`, which runs the kernel under ``shard_map`` over
    ``axis``: activation operands sharded on dim 0, weights replicated,
    output sharded on dim 0. Requires each activation's dim 0 to be a
    multiple of the axis size (true for clip-sharded serving batches —
    every activation folds the clip batch outermost).
    """
    global _DP_CTX
    prev = _DP_CTX
    _DP_CTX = (mesh, axis)
    try:
        yield
    finally:
        _DP_CTX = prev


def dp_wrap(fn: Callable, n_row_args: int = 1) -> Callable:
    """Return ``fn``, shard_map-wrapped if data_parallel_kernels is active.

    The first ``n_row_args`` positional arguments are sharded on dim 0 over
    the context's data axis; the remaining positional arguments (weight
    panels, biases) are replicated; the single array result is sharded on
    dim 0. Keyword arguments pass through statically.
    """
    if _DP_CTX is None:
        return fn
    mesh, axis = _DP_CTX
    try:
        from jax import shard_map  # jax >= 0.7
    except ImportError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    def wrapped(*args, **kwargs):
        row, rep = P(axis), P()
        in_specs = tuple(row if i < n_row_args else rep
                         for i in range(len(args)))

        def call(*a):
            return fn(*a, **kwargs)

        # check_vma=False: pallas_call out_shapes carry no varying-mesh-axes
        # info, and these kernels are per-row pure (no collectives inside)
        return shard_map(call, mesh=mesh, in_specs=in_specs,
                         out_specs=row, check_vma=False)(*args)

    return wrapped
