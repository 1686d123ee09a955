"""Central gate for the Pallas fused-kernel paths.

Mosaic (Pallas TPU) custom calls cannot be automatically partitioned by
GSPMD — lowering a TP-sharded program that contains one raises
``NotImplementedError: Mosaic kernels cannot be automatically
partitioned`` (jax ``tpu_custom_call``). The CPU-mesh dryruns never see
this because off-TPU the models dispatch to their XLA formulations.

Until the kernels are shard_map-wrapped, multi-chip TP-sharded programs
must run the XLA paths: set ``FYC_DISABLE_FUSED_KERNELS=1`` (the
multi-chip tools do this themselves). Pure-DP sharding with REPLICATED
params also partitions fine without kernels disabled only if the kernel's
operands are fully replicated — batch-sharded activations flow through
the kernels' folded row dimension, so DP serving at >1 clip/chip should
disable them too. Single-chip TPU default: kernels on.
"""

from __future__ import annotations

import os

import jax


def fused_kernels_enabled() -> bool:
    if os.environ.get("FYC_DISABLE_FUSED_KERNELS", "") not in ("", "0"):
        return False
    return jax.default_backend() == "tpu"
