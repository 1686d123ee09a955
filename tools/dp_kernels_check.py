"""Prove the fused Pallas kernels run under GSPMD data-parallel programs.

Mosaic custom calls cannot be GSPMD-auto-partitioned (ops/fused.py), which
previously forced multi-chip DP serving to either replicate whole programs
per chip or disable the fused kernels. ``ops.fused.data_parallel_kernels``
now wraps every fused-kernel dispatch in ``shard_map`` over the data axis,
so GSPMD partitions AROUND the kernel. This tool produces the evidence:

1. (real chip) a 1-device data mesh: the dp-wrapped kernel program runs
   and matches the unwrapped single-chip kernel bit-for-bit;
2. (AOT, abstract v5e topology) a 2-device data mesh: the SAME program
   that fails GSPMD lowering with the bare kernel compiles successfully
   with the wrapper, with batch-sharded inputs.

  python tools/dp_kernels_check.py            # runs 1 + 2 on this box
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _example(dtype):
    import jax
    import jax.numpy as jnp

    c, inner = 64, 256
    rows = 8 * 16  # divisible by any small data-axis size
    k = jax.random.PRNGKey(0)
    ks = jax.random.split(k, 5)
    x = (jax.random.normal(ks[0], (rows, c)) * 0.1).astype(dtype)
    w1 = (jax.random.normal(ks[1], (c, inner * 2)) * 0.02).astype(dtype)
    b1 = jnp.zeros((inner * 2,), dtype)
    w2 = (jax.random.normal(ks[2], (inner, c)) * 0.02).astype(dtype)
    b2 = jnp.zeros((c,), dtype)
    return x, w1, b1, w2, b2


def check_single_chip():
    """1-device data mesh on the real chip: wrapped == unwrapped."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from followyourclick_tpu.ops.fused import (
        data_parallel_kernels,
        dp_wrap,
    )
    from followyourclick_tpu.ops.geglu import fused_geglu

    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    args = _example(dtype)
    mesh = Mesh(np.array(jax.devices()[:1]), ("data",))

    plain = jax.jit(fused_geglu)(*args)
    with data_parallel_kernels(mesh, "data"):
        wrapped = jax.jit(lambda *a: dp_wrap(fused_geglu)(*a))(*args)
    ok = bool(jnp.all(plain == wrapped))
    return {"single_chip_equal": ok,
            "backend": jax.default_backend()}


def check_aot_2chip():
    """AOT 2-device DP mesh: bare kernel fails to lower, wrapped compiles."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from followyourclick_tpu.ops.fused import (
        data_parallel_kernels,
        dp_wrap,
    )
    from followyourclick_tpu.ops.geglu import fused_geglu

    topo = topologies.get_topology_desc("v5e:2x2x1", "tpu")
    devices = np.array(topo.devices[:2])
    mesh = Mesh(devices, ("data",))
    args = _example(jnp.bfloat16)
    row_sh = NamedSharding(mesh, P("data"))
    rep_sh = NamedSharding(mesh, P())
    arg_shapes = [jax.ShapeDtypeStruct(
        a.shape, a.dtype, sharding=(row_sh if i == 0 else rep_sh))
        for i, a in enumerate(args)]

    out = {}
    # negative control: the bare Mosaic call cannot be GSPMD-partitioned
    try:
        jax.jit(fused_geglu).lower(*arg_shapes).compile()
        out["bare_kernel_partitions"] = True  # unexpected: caveat is gone
    except Exception as e:
        out["bare_kernel_partitions"] = False
        out["bare_kernel_error"] = f"{type(e).__name__}: {str(e)[:120]}"

    with data_parallel_kernels(mesh, "data"):
        lowered = jax.jit(
            lambda *a: dp_wrap(fused_geglu)(*a)).lower(*arg_shapes)
    compiled = lowered.compile()
    hlo = compiled.as_text()
    out["wrapped_compiles"] = True
    out["wrapped_collective_ops"] = sum(
        hlo.count(op) for op in ("all-reduce", "all-gather", "all-to-all",
                                 "collective-permute", "reduce-scatter"))
    return out


def main():
    result = {}
    import jax

    if jax.default_backend() == "tpu":
        result.update(check_single_chip())
    else:
        result["single_chip_equal"] = "skipped (no TPU backend)"
    result.update(check_aot_2chip())
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
