"""Training-step throughput at the reference recipe shape, single chip.

The reference trains 24-frame 448×256 clips at batch 3/GPU
(configs/training/training_14M_448x256_part_img_embed_mask_condition_
zero_snr_sd1.5_img_as_vid_for_train_all_parameters.yaml). Round 3's
full-tree TrainState OOMed at this shape on one 16 GB v5e (fp32 params +
full-tree grads + AdamW moments ≈ 14 GB before activations). This bench
measures the partitioned layout (grads over motion_modules/conv_in/embeds
only, frozen params bf16, donated state) that is designed to fit.

Usage (on the TPU chip):
  python tools/train_bench.py --height 448 --width 256 --frames 16
  python tools/train_bench.py --height 448 --width 256 --frames 24
Prints one JSON line per run; results recorded in docs/PERF.md.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=448)
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--full-tree", action="store_true",
                    help="use the fp32 full-tree TrainState instead "
                         "(expected to OOM at the reference shape)")
    ap.add_argument("--mu-bf16", action="store_true",
                    help="store AdamW's first moment in bf16 "
                         "(TrainConfig.adam_mu_dtype) — frees ~0.8 GB; the "
                         "lever that fits the 24-frame reference shape")
    ap.add_argument("--fp32-compute", action="store_true",
                    help="fp32 activations/weights in the forward (default "
                         "is bf16 mixed precision: bf16 compute, fp32 "
                         "master copies — the reference trains under AMP)")
    ap.add_argument("--attn-chunk", type=int, default=0,
                    help="chunk the batch axis of large self-attention "
                         "sites (FYC_ATTN_BATCH_CHUNK): caps the remat'd "
                         "backward's score temp at chunk/B of full size — "
                         "with --remat-blocks, the second lever for the "
                         "24-frame reference shape")
    ap.add_argument("--remat-blocks", action="store_true",
                    help="per-UNet-block gradient checkpointing instead of "
                         "the whole-apply policy: the backward keeps only "
                         "block boundaries + one block's internals live — "
                         "the lever for the 24-frame reference shape "
                         "(models/unet3d.py UNet3DConditionModel."
                         "remat_blocks)")
    args = ap.parse_args(argv)

    if args.attn_chunk:
        os.environ["FYC_ATTN_BATCH_CHUNK"] = str(args.attn_chunk)

    import jax
    import jax.numpy as jnp

    from followyourclick_tpu.utils.compile_cache import enable as enable_cache

    enable_cache()

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
    from followyourclick_tpu.schedulers.ddim import DDIMSchedule
    import importlib

    # the package re-exports the train_step FUNCTION, which shadows the
    # submodule in the ``import … as`` form — resolve the module directly
    ts = importlib.import_module("followyourclick_tpu.training.train_step")

    b, f = args.batch, args.frames
    h, w = args.height // 8, args.width // 8

    ucfg = UNet3DConfig()
    tcfg = CLIPTextConfig()
    compute_dtype = jnp.float32 if args.fp32_compute else jnp.bfloat16
    unet = UNet3DConditionModel(ucfg, dtype=compute_dtype,
                                remat_blocks=args.remat_blocks)
    text = CLIPTextModel(tcfg)
    rng = jax.random.PRNGKey(0)

    sample = jnp.zeros((b, f, h, w, 9))
    cond = UNetConditioning(context=jnp.zeros((b, 77, 768)),
                            fps=jnp.zeros((b,)),
                            motion_score=jnp.zeros((b,)))
    shapes = jax.eval_shape(unet.init, rng, sample,
                            jnp.zeros((b,), jnp.int32), cond)
    unet_params = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), shapes)["params"]
    text_shapes = jax.eval_shape(text.init, rng,
                                 jnp.zeros((1, 77), jnp.int32))
    text_params = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, jnp.bfloat16
                            if jnp.issubdtype(s.dtype, jnp.floating)
                            else s.dtype), text_shapes)["params"]

    # with per-block remat the outer whole-apply checkpoint is redundant
    # recompute with no memory win — turn it off
    tc = ts.TrainConfig(adam_mu_dtype="bfloat16" if args.mu_bf16 else None,
                        gradient_checkpointing=not args.remat_blocks)
    if args.full_tree:
        state = ts.create_train_state(unet_params, tc)
        step = ts.train_step
    else:
        state = ts.create_partitioned_train_state(unet_params, tc)
        step = ts.train_step_partitioned
        n_train = sum(int(x.size) for x in
                      jax.tree_util.tree_leaves(state.trainable))
        n_frozen = sum(int(x.size) for x in
                       jax.tree_util.tree_leaves(state.frozen))
        print(f"# trainable {n_train / 1e6:.1f}M params (fp32), "
              f"frozen {n_frozen / 1e6:.1f}M (bf16)", file=sys.stderr)
    del unet_params, shapes

    sched = DDIMSchedule.create(NoiseScheduleConfig(), 25)
    batch = ts.TrainBatch(
        latents=jax.random.normal(jax.random.PRNGKey(2), (b, f, h, w, 4),
                                  jnp.float32) * 0.2,
        input_ids=jnp.zeros((b, 77), jnp.int32),
        mask=jnp.ones((b, h, w, 1)),
        fps=jnp.full((b,), 8.0),
        motion_score=jnp.full((b,), 20.0))

    step_fn = jax.jit(
        functools.partial(step, unet=unet, text_encoder=text,
                          text_params=text_params, sched=sched, cfg=tc),
        donate_argnums=0)

    state, metrics = step_fn(state, batch, jax.random.PRNGKey(1))
    loss = float(metrics["loss"])  # blocks; compile + step 0
    assert jnp.isfinite(loss), loss

    times = []
    for i in range(args.iters):
        t0 = time.perf_counter()
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(i + 2))
        _ = float(metrics["loss"])  # force full execution through the relay
        times.append(time.perf_counter() - t0)
    times.sort()
    p50 = times[len(times) // 2]
    print(json.dumps({
        "metric": "train_step_ms",
        "value": round(p50 * 1e3, 1),
        "steps_per_s": round(1.0 / p50, 3),
        "frames_per_s_per_chip": round(b * f / p50, 2),
        "workload": f"{args.height}x{args.width}_{f}f_b{b}"
                    + ("_fulltree" if args.full_tree else "_partitioned")
                    + ("_mubf16" if args.mu_bf16 else "")
                    + ("_rematblocks" if args.remat_blocks else "")
                    + (f"_attnchunk{args.attn_chunk}"
                       if args.attn_chunk else ""),
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
