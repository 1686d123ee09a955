"""AOT per-chip HBM analysis of the sharded 24-frame training step.

VERDICT r04 ask #4: the 24-frame 448×256 reference recipe
(`/root/reference/configs/training/training_14M_448x256_part_img_embed_
mask_condition_zero_snr_sd1.5_img_as_vid_for_train_all_parameters.yaml`,
`sample_n_frames: 24`) misses single-chip HBM by ~200–450 MB across every
measured lever combination (docs/PERF.md "Training throughput"). This tool
proves the multi-chip fit AT THE REAL SHAPE without multi-chip hardware:
it AOT-compiles `train_step_partitioned` against an abstract v5e topology
(`jax.experimental.topologies`) under the framework's DP×TP shardings and
reports `compiled.memory_analysis()` — XLA's own per-chip HBM accounting.

  python tools/train_memory_analysis.py [--frames 24] [--data 2 --model 2]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Mosaic kernels cannot be GSPMD-auto-partitioned (ops/fused.py): the
# TP-sharded program must lower through the XLA formulations
os.environ["FYC_DISABLE_FUSED_KERNELS"] = "1"


def assign_specs(abstract_tree, param_specs, mesh, data_axes=()):
    """Build a NamedSharding tree for an arbitrary state pytree by matching
    each leaf's key-path suffix against the UNet param-spec tree; leaves
    with no param match are replicated (scalars, counts, clip state)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    def lookup(path):
        keys = [getattr(k, "key", getattr(k, "name", None)) for k in path]
        keys = [k for k in keys if isinstance(k, str)]
        # try every suffix of the path against the param specs tree
        for start in range(len(keys)):
            node = param_specs
            ok = True
            for k in keys[start:]:
                if isinstance(node, dict) and k in node:
                    node = node[k]
                else:
                    ok = False
                    break
            if ok and isinstance(node, P):
                return node
        return P()

    def one(path, leaf):
        spec = lookup(path)
        if len(spec) > leaf.ndim:  # None-partitioned dims trimmed
            spec = P(*spec[: leaf.ndim])
        return jax.ShapeDtypeStruct(leaf.shape, leaf.dtype,
                                    sharding=NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(one, abstract_tree)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--height", type=int, default=448)
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--data", type=int, default=2)
    ap.add_argument("--model", type=int, default=2)
    ap.add_argument("--topology", default="v5e:2x2x1")
    ap.add_argument("--mu-bf16", action="store_true")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from followyourclick_tpu.config import (
        CLIPTextConfig,
        NoiseScheduleConfig,
        UNet3DConfig,
    )
    from followyourclick_tpu.models.clip_text import CLIPTextModel
    from followyourclick_tpu.models.unet3d import (
        UNet3DConditionModel,
        UNetConditioning,
    )
    from followyourclick_tpu.parallel.sharding import param_sharding_rules
    from followyourclick_tpu.schedulers.ddim import DDIMSchedule
    import importlib

    ts = importlib.import_module("followyourclick_tpu.training.train_step")

    topo = topologies.get_topology_desc(args.topology, "tpu")
    n = args.data * args.model
    devices = np.array(topo.devices[:n]).reshape(args.data, args.model)
    mesh = Mesh(devices, ("data", "model"))

    b = args.data  # one clip per data shard
    f, h, w = args.frames, args.height // 8, args.width // 8

    ucfg = UNet3DConfig()
    tcfg = CLIPTextConfig()
    unet = UNet3DConditionModel(ucfg, dtype=jnp.bfloat16, remat_blocks=True)
    text = CLIPTextModel(tcfg)
    rng = jax.random.PRNGKey(0)

    sample = jax.ShapeDtypeStruct((b, f, h, w, 9), jnp.float32)
    cond = UNetConditioning(
        context=jax.ShapeDtypeStruct((b, 77, 768), jnp.float32),
        fps=jax.ShapeDtypeStruct((b,), jnp.float32),
        motion_score=jax.ShapeDtypeStruct((b,), jnp.float32))
    t_abs = jax.ShapeDtypeStruct((b,), jnp.int32)
    unet_shapes = jax.eval_shape(unet.init, rng, sample, t_abs, cond)["params"]
    text_shapes = jax.eval_shape(
        text.init, rng, jax.ShapeDtypeStruct((1, 77), jnp.int32))["params"]
    text_shapes = jax.tree_util.tree_map(
        lambda s: jax.ShapeDtypeStruct(
            s.shape, jnp.bfloat16 if jnp.issubdtype(s.dtype, jnp.floating)
            else s.dtype), text_shapes)

    tc = ts.TrainConfig(
        adam_mu_dtype="bfloat16" if args.mu_bf16 else None,
        gradient_checkpointing=False)  # remat_blocks is on instead
    state_abs = jax.eval_shape(
        functools.partial(ts.create_partitioned_train_state, cfg=tc),
        unet_shapes)

    specs = param_sharding_rules(unet_shapes)
    state_in = assign_specs(state_abs, specs, mesh)
    data_sharded = lambda s: jax.ShapeDtypeStruct(
        s.shape, s.dtype,
        sharding=NamedSharding(mesh, P("data", *([None] * (len(s.shape) - 1)))))
    batch_abs = ts.TrainBatch(
        latents=data_sharded(jax.ShapeDtypeStruct((b, f, h, w, 4),
                                                  jnp.float32)),
        input_ids=data_sharded(jax.ShapeDtypeStruct((b, 77), jnp.int32)),
        mask=data_sharded(jax.ShapeDtypeStruct((b, h, w, 1), jnp.float32)),
        fps=data_sharded(jax.ShapeDtypeStruct((b,), jnp.float32)),
        motion_score=data_sharded(jax.ShapeDtypeStruct((b,), jnp.float32)))
    text_in = assign_specs(text_shapes, {}, mesh)  # replicated
    rng_abs = jax.ShapeDtypeStruct((2,), jnp.uint32)

    sched = DDIMSchedule.create(NoiseScheduleConfig(), 25)
    step_fn = functools.partial(
        ts.train_step_partitioned, unet=unet, text_encoder=text,
        sched=sched, cfg=tc)

    with mesh:
        lowered = jax.jit(
            lambda st, ba, r, tp: step_fn(st, ba, r, text_params=tp),
            donate_argnums=0,
        ).lower(state_in, batch_abs, rng_abs, text_in)
        print("# lowered; compiling AOT ...", file=sys.stderr, flush=True)
        compiled = lowered.compile()
        ma = compiled.memory_analysis()

    gib = 1024 ** 3
    out = {
        "workload": f"{args.height}x{args.width}_{f}f_b{b}"
                    f"_mesh_data{args.data}_model{args.model}"
                    + ("_mubf16" if args.mu_bf16 else ""),
        "topology": args.topology,
        "per_chip_hbm": {
            "arguments_gib": round(ma.argument_size_in_bytes / gib, 3),
            "outputs_gib": round(ma.output_size_in_bytes / gib, 3),
            "temps_gib": round(ma.temp_size_in_bytes / gib, 3),
            "aliased_gib": round(ma.alias_size_in_bytes / gib, 3),
            "generated_code_gib": round(
                ma.generated_code_size_in_bytes / gib, 3),
        },
        "per_chip_total_gib": round(
            (ma.argument_size_in_bytes + ma.output_size_in_bytes
             + ma.temp_size_in_bytes + ma.generated_code_size_in_bytes
             - ma.alias_size_in_bytes) / gib, 3),
        "v5e_hbm_gib": 16.0,
    }
    out["fits"] = out["per_chip_total_gib"] < 15.75
    print(json.dumps(out))


if __name__ == "__main__":
    main()
