"""Flow tooling CLI: train / test / benchmark subcommands.

Behavior spec: reference ``mmflow/tools/train.py`` (config-driven training
with work-dir checkpoints and auto-resume), ``tools/test.py`` (dataset EPE
evaluation), ``tools/benchmark.py`` (FPS harness with warmup). Config files
are YAML dicts with the mmflow-style ``model: {type: ...}`` section consumed
by ``flow.registry.build_flow_estimator``.
"""

from __future__ import annotations

import argparse
import json
from typing import List, Optional


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("followyourclick-flow")
    sub = p.add_subparsers(dest="cmd", required=True)

    t = sub.add_parser("train")
    t.add_argument("--config", type=str, required=True)
    t.add_argument("--data-root", type=str, required=True)
    t.add_argument("--dataset", type=str, default="FlyingChairs",
                   choices=["FlyingChairs", "Sintel", "KITTI"])
    t.add_argument("--work-dir", type=str, default="work_dir")
    t.add_argument("--max-steps", type=int, default=None)
    t.add_argument("--batch-size", type=int, default=2)
    t.add_argument("--crop", type=int, nargs=2, default=[368, 496])
    t.add_argument("--no-resume", action="store_true")

    e = sub.add_parser("test")
    e.add_argument("--config", type=str, required=True)
    e.add_argument("--checkpoint", type=str, required=True)
    e.add_argument("--data-root", type=str, required=True)
    e.add_argument("--dataset", type=str, default="Sintel")
    e.add_argument("--metrics", type=str, nargs="+", default=["EPE"])
    e.add_argument("--iters", type=int, default=32)

    b = sub.add_parser("benchmark")
    b.add_argument("--config", type=str, required=True)
    b.add_argument("--size", type=int, nargs=2, default=[448, 1024])
    b.add_argument("--warmup", type=int, default=5)
    b.add_argument("--max-iter", type=int, default=50)

    # FLOPs/params counter (role of mmflow's get_flops analysis tool,
    # absent from the vendored tree): XLA's own cost model via
    # jax.jit(...).lower(...).cost_analysis() — exact for the compiled
    # graph, no per-layer hook bookkeeping needed.
    fl = sub.add_parser("flops")
    fl.add_argument("--config", type=str, default=None,
                    help="flow estimator YAML (mutually exclusive w/ --unet)")
    fl.add_argument("--unet", action="store_true",
                    help="count the flagship UNet3D forward instead")
    fl.add_argument("--size", type=int, nargs=2, default=[448, 1024],
                    help="input H W (flow: image size; unet: pixel size/8 "
                         "latent grid)")
    fl.add_argument("--frames", type=int, default=16,
                    help="video length for --unet")
    return p


def count_flops(fn, *example_args) -> dict:
    """FLOPs / bytes-accessed of one jitted call, from XLA's cost model."""
    import jax

    lowered = jax.jit(fn).lower(*example_args)
    try:
        # HLO-level estimate — no device memory allocated (the flagship
        # UNet at fp32 would OOM a 16 GB chip if we compiled for real)
        cost = lowered.cost_analysis()
    except Exception:
        cost = None
    if cost is None:  # some backends only cost post-compile
        cost = lowered.compile().cost_analysis()
    if isinstance(cost, (list, tuple)):  # older jax returns [dict]
        cost = cost[0]
    return {"gflops": round(float(cost.get("flops", 0.0)) / 1e9, 3),
            "bytes_accessed_gb": round(
                float(cost.get("bytes accessed", 0.0)) / 2**30, 3)}


def _param_count(variables) -> int:
    import jax

    return sum(int(x.size) for x in jax.tree_util.tree_leaves(variables)
               if hasattr(x, "size"))


def _build_model(config_path: str):
    import yaml

    from followyourclick_tpu.flow.registry import build_flow_estimator

    with open(config_path) as f:
        cfg = yaml.safe_load(f)
    return build_flow_estimator(cfg["model"]), cfg


def _load_dataset(name: str, root: str):
    from followyourclick_tpu.flow import datasets

    return {"FlyingChairs": datasets.FlyingChairs,
            "Sintel": datasets.Sintel,
            "KITTI": datasets.KITTI}[name](root)


def main(argv: Optional[List[str]] = None) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    args = build_parser().parse_args(argv)

    if args.cmd == "flops":
        if args.unet:
            from followyourclick_tpu.config import InferenceConfig
            from followyourclick_tpu.models.unet3d import (
                UNet3DConditionModel,
                UNetConditioning,
            )

            ucfg = InferenceConfig().unet
            unet = UNet3DConditionModel(ucfg, dtype=jnp.bfloat16)
            h, w = args.size[0] // 8, args.size[1] // 8
            b, f = 2, args.frames  # CFG batch
            sample = jnp.zeros((b, f, h, w, 9), jnp.bfloat16)
            tsteps = jnp.zeros((b,), jnp.int32)
            cond = UNetConditioning(
                context=jnp.zeros((b, 77, ucfg.cross_attention_dim),
                                  jnp.bfloat16),
                fps=jnp.full((b,), 8.0), motion_score=jnp.full((b,), 20.0))
            variables = jax.eval_shape(unet.init, jax.random.PRNGKey(0),
                                       sample, tsteps, cond)
            params = jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, jnp.bfloat16
                                    if jnp.issubdtype(s.dtype, jnp.floating)
                                    else s.dtype), variables)["params"]
            out = count_flops(
                lambda p, x, t: unet.apply({"params": p}, x, t, cond),
                params, sample, tsteps)
            out.update(model="UNet3DConditionModel",
                       params_m=round(_param_count(params) / 1e6, 2),
                       input=f"{b}x{f}x{h}x{w}x9 (latent, CFG batch)")
        else:
            if args.config is None:
                raise SystemExit("flops: pass --config or --unet")
            model, _ = _build_model(args.config)
            h, w = args.size
            img = jnp.zeros((1, h, w, 3), jnp.float32)
            variables = model.init(jax.random.PRNGKey(0), img, img)
            out = count_flops(
                lambda v, a, b_: model.apply(v, a, b_), variables, img, img)
            out.update(model=type(model).__name__,
                       params_m=round(_param_count(variables) / 1e6, 2),
                       input=f"1x{h}x{w}x3 pair")
        print(json.dumps(out))
        return

    model, cfg = _build_model(args.config)

    if args.cmd == "train":
        from followyourclick_tpu.flow.datasets import training_batches
        from followyourclick_tpu.flow.train import (
            FlowTrainConfig,
            train_model,
        )

        ds = _load_dataset(args.dataset, args.data_root)
        tcfg = FlowTrainConfig(**cfg.get("train", {}))
        h, w = args.crop
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3)),
            jnp.zeros((1, h, w, 3)),
        )
        it = training_batches(ds, args.batch_size, crop_size=(h, w))
        train_model(model, dict(variables), it, tcfg,
                    work_dir=args.work_dir, max_steps=args.max_steps,
                    resume=not args.no_resume,
                    log_fn=lambda s, m: print(f"iter {s}: {m}"))

    elif args.cmd == "test":
        import pickle

        from followyourclick_tpu.flow.api import inference_model
        from followyourclick_tpu.flow.metrics import eval_metrics

        with open(args.checkpoint, "rb") as f:
            saved = pickle.load(f)
        variables = saved["state"][0] if "state" in saved else saved
        ds = _load_dataset(args.dataset, args.data_root)
        preds, gts, valids = [], [], []
        for i in range(len(ds)):
            s = ds[i]
            flow = inference_model(model, variables, s.img1, s.img2,
                                   iters=args.iters)
            preds.append(np.asarray(flow))
            gts.append(s.flow_gt)
            valids.append(s.valid)
        print(json.dumps(eval_metrics(preds, gts, valids, args.metrics)))

    elif args.cmd == "benchmark":
        from followyourclick_tpu.utils.profiling import fps_benchmark

        h, w = args.size
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3)),
            jnp.zeros((1, h, w, 3)),
        )

        import functools

        @functools.partial(jax.jit, static_argnums=())
        def step(pair):
            return model.apply(variables, pair[0], pair[1])

        rs = np.random.RandomState(0)
        pair = (jnp.asarray(rs.rand(1, h, w, 3), jnp.float32),
                jnp.asarray(rs.rand(1, h, w, 3), jnp.float32))
        fps = fps_benchmark(step, iter(lambda: pair, None),
                            warmup=args.warmup, max_iter=args.max_iter)
        print(json.dumps({"fps": round(fps, 2), "size": [h, w]}))


if __name__ == "__main__":
    main()
