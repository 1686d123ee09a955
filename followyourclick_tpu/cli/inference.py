"""Main inference CLI — image + click mask + motion prompt → video.

Behavior spec: reference ``scripts/inference.py`` — the argparse flag surface
(:433-481), txt/xlsx prompt manifests (:53-101), positive/negative prompt
suffixes (:106-109), per-model prompt YAML (``configs/prompts/*.yaml``), host
preprocessing (:314-365), gif output + config snapshot (:416-427).

TPU replacements: DDP flags become host-level prompt sharding over
``jax.process_index`` (``parallel.mesh.process_shard``); ``--gpu_id`` is gone;
everything on-device runs through one jitted pipeline program.
"""

from __future__ import annotations

import argparse
import datetime
import os
from typing import List, Optional, Tuple

POS_PROMPT = (", ultra quality, film grain, 8K UHD, masterpiece,  high "
              "detailed, extremely detailed, photorealistic, dramatic and "
              "cinematic lighting")
NEG_PROMPT = ("low resolution, low quality, lowres, worst quality,  noisy, "
              "duplicate, repeat, double, ugly, obese, deformed, render, "
              "rendered, bad anatomy,  text, watermark, bad anatomy, bad "
              "hands, text, missing finger,extra fingers")


def load_prompt_manifest(path: str) -> List[dict]:
    """txt (one prompt/line) or xlsx (prompt,image[,mask] columns) manifests
    (reference PromptDataset / PromptAndImgDataset, inference.py:53-101)."""
    items = []
    if path.endswith((".xlsx", ".xls", ".csv")):
        import pandas as pd

        if path.endswith(".csv"):
            df = pd.read_csv(path)
        else:
            try:
                df = pd.read_excel(path)
            except ImportError as e:
                raise ImportError(
                    f"reading {path} needs openpyxl; convert the manifest to "
                    f".csv with the same columns (prompt,image[,mask])") from e
        for i, row in df.iterrows():
            image = row.get("image")
            if image and not os.path.exists(str(image)):
                continue
            mask = row.get("mask")
            if (mask is None or str(mask) == "nan") and image:
                p = str(image)
                stem, ext = os.path.splitext(os.path.basename(p))
                cand = os.path.join(os.path.dirname(p) + "_mask", stem + ext)
                mask = cand if os.path.exists(cand) else None
            items.append({"prompt": str(row["prompt"]), "idx": int(i),
                          "image": image, "mask": mask})
    else:
        with open(path) as f:
            for i, line in enumerate(f):
                line = line.strip("\n")
                if line:
                    items.append({"prompt": line, "idx": i,
                                  "image": None, "mask": None})
    return items


def build_arg_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Follow-Your-Click TPU inference")
    p.add_argument("--output_path", type=str, default="output_path")
    p.add_argument("--pretrained_model_path", type=str,
                   default="stable-diffusion-v1-5")
    p.add_argument("--image_pretrained_model_path", type=str, default="")
    p.add_argument("--inference_config", type=str,
                   default="configs/inference/inference.yaml")
    p.add_argument("--config", type=str, required=True,
                   help="per-model prompt yaml")
    p.add_argument("--file", type=str, required=True,
                   help="txt or xlsx prompt manifest")
    p.add_argument("--n_samples", type=int, default=1)
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--seed", type=int, default=-1)
    p.add_argument("--L", type=int, default=16)
    p.add_argument("--W", type=int, default=512)
    p.add_argument("--H", type=int, default=512)
    p.add_argument("--video_scale", type=float, default=0.0)
    p.add_argument("--use_fps_condition", action="store_true", default=False)
    p.add_argument("--fps", type=int, default=2)
    p.add_argument("--flw_ctrl", type=int, default=4,
                   help="motion score (optical-flow magnitude) conditioning")
    p.add_argument("--use_ip", type=str, default="",
                   choices=["", "raw", "vanilla", "plus"])
    p.add_argument("--ip_ckpt", type=str, default="",
                   help="released ip-adapter ckpt ({'image_proj','ip_adapter'}); "
                        "normally the ip weights ride in the motion module ckpt")
    p.add_argument("--manually_input_image", action="store_true",
                   default=False)
    p.add_argument("--crop_method", type=str,
                   choices=["resize_and_crop", "crop"], default="crop")
    p.add_argument("--use_first_image_as_init_latents", action="store_true",
                   default=False)
    p.add_argument("--mask_first_frame", action="store_true", default=False)
    p.add_argument("--use_interpolate_noise", action="store_true",
                   default=False)
    p.add_argument("--dtype", type=str, default="auto",
                   choices=["auto", "bfloat16", "float32"])
    # camera-motion LoRA over personalized checkpoints (reference
    # scripts/inference_w_camera_lora.py:232-234)
    p.add_argument("--camera_motion_lora", type=str, default="",
                   help="motion-module LoRA ckpt merged at load")
    p.add_argument("--camera_motion_lora_alpha", type=float, default=1.0)
    # OPT-IN serving approximations (NOT reference behavior; 1 = exact).
    # See SampleSpec.cfg_cache_interval / pab_*_interval.
    p.add_argument("--cfg_cache_interval", type=int, default=1,
                   help="recompute the CFG uncond branch every k-th step")
    p.add_argument("--pab_interval", type=int, default=1,
                   help="PAB-style attention reuse: refresh attention "
                        "outputs every k-th step (composes with "
                        "--cfg_cache_interval)")
    p.add_argument("--pab_warmup_steps", type=int, default=0,
                   help="exact full-compute steps before PAB reuse starts")
    p.add_argument("--serving_schedule", type=str, default="",
                   help="named composed schedule from pipelines/"
                        "serving_schedules.py (e.g. pab488_deep4_cfg4_ex, "
                        "the quality-bounded headline); applied on top of "
                        "the individual interval flags")
    p.add_argument("--scheduler", type=str, default="ddim",
                   help="solver for the denoise scan (ddim | pndm | "
                        "pndm_prk | euler | euler_a | lms | dpm++ | dpm++3 "
                        "| dpm) — the reference pipeline's accepted "
                        "scheduler union, pipeline_animation.py:50-57")
    return p


def main(argv: Optional[List[str]] = None) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np
    import yaml

    from followyourclick_tpu.config import InferenceConfig
    from followyourclick_tpu.parallel.mesh import (
        initialize_distributed,
        process_shard,
    )
    from followyourclick_tpu.pipelines.animation import SampleSpec
    from followyourclick_tpu.utils.loaders import (
        assemble_pipeline_from_pretrained,
    )
    from followyourclick_tpu.utils.video_io import (
        clip_preprocess_image,
        downsample_mask_to_latent,
        load_image_and_mask,
        save_videos_grid,
    )

    args = build_arg_parser().parse_args(argv)
    initialize_distributed()

    time_str = datetime.datetime.now().strftime("%Y-%m-%dT%H-%M-%S")
    savedir = os.path.join(args.output_path,
                           f"{os.path.splitext(os.path.basename(args.config))[0]}-{time_str}")
    os.makedirs(savedir, exist_ok=True)

    inference_config = InferenceConfig.from_yaml(args.inference_config)
    with open(args.config) as f:
        model_config = yaml.safe_load(f)

    items = load_prompt_manifest(args.file)
    shard = list(process_shard(len(items)))

    dtype = {"auto": None, "bfloat16": jnp.bfloat16,
             "float32": jnp.float32}[args.dtype]

    ip_mode = {"vanilla": "raw"}.get(args.use_ip, args.use_ip)

    for model_name, mc in model_config.items():
        motion_modules = mc.get("motion_module") or [None]
        if isinstance(motion_modules, str):
            motion_modules = [motion_modules]
        for mm_path in motion_modules:
            pipe = assemble_pipeline_from_pretrained(
                args.pretrained_model_path, inference_config,
                motion_module_path=mm_path,
                personalized_ckpt_path=mc.get("path") or None,
                lora_path=mc.get("lora") or None,
                lora_alpha=mc.get("lora_alpha", 0.6),
                motion_lora_path=args.camera_motion_lora or None,
                motion_lora_alpha=args.camera_motion_lora_alpha,
                dtype=dtype,
                ip_mode=ip_mode,
                image_encoder_path=args.image_pretrained_model_path or None,
                ip_ckpt_path=args.ip_ckpt or None,
                t5_path=mc.get("t5_path") or None)

            # base T2I pipeline generates the first frame for manifest rows
            # without an image (reference scripts/inference.py:194-204,
            # 299-309) — same weights, motion modules off
            t2i = None
            if not args.manually_input_image or any(
                    not it.get("image") for it in items):
                from followyourclick_tpu.pipelines.text_to_image import (
                    TextToImagePipeline,
                )

                t2i = TextToImagePipeline(
                    inference_config, pipe.params["unet"],
                    pipe.params["vae"], pipe.params["text_encoder"],
                    tokenizer=pipe.tokenizer, dtype=pipe.dtype)

            steps = int(mc.get("steps", 25))
            guidance = float(mc.get("guidance_scale", 8.0))
            spec = SampleSpec(
                video_length=args.L, height=args.H, width=args.W,
                num_inference_steps=steps, guidance_scale=guidance,
                video_scale=args.video_scale,
                use_interpolate_noise=args.use_interpolate_noise,
                use_first_image_as_init_latents=(
                    args.use_first_image_as_init_latents),
                cfg_cache_interval=args.cfg_cache_interval,
                pab_spatial_interval=args.pab_interval,
                pab_cross_interval=args.pab_interval,
                pab_temporal_interval=args.pab_interval,
                pab_warmup_steps=args.pab_warmup_steps,
                scheduler=args.scheduler)
            if args.serving_schedule:
                from followyourclick_tpu.pipelines.serving_schedules import (
                    apply_schedule,
                )

                spec = apply_schedule(spec, args.serving_schedule)

            seeds = mc.get("seed", [args.seed])
            if not isinstance(seeds, list):
                seeds = [seeds]

            def prep_item(item, seed):
                """One manifest row → (image[-1,1], mask or None).
                Rows without an image get a generated first frame
                (reference inference.py:299-309, 512², 50 steps, cfg 8)."""
                if item.get("image"):
                    return load_image_and_mask(
                        item["image"], item.get("mask"), args.H, args.W,
                        crop_method=args.crop_method)
                assert t2i is not None
                img01 = t2i(item["prompt"] + POS_PROMPT,
                            negative_prompt=NEG_PROMPT,
                            height=args.H, width=args.W, steps=50,
                            guidance_scale=8.0, seed=seed)[0]
                return img01 * 2.0 - 1.0, None

            # --batch_size clips sampled per pipeline call (the fused
            # sampler takes B>1); --n_samples repeats per prompt with
            # fresh seeds (reference flags inference.py:441-442)
            work = [(idx, s) for idx in shard for s in range(args.n_samples)]
            for start in range(0, len(work), args.batch_size):
                group = work[start:start + args.batch_size]
                prompts, negs, imgs, masks, grp_seeds = [], [], [], [], []
                for idx, s in group:
                    item = items[idx]
                    prompts.append(item["prompt"] + POS_PROMPT)
                    neg = mc.get("n_prompt", [NEG_PROMPT])
                    negs.append(neg[0] if isinstance(neg, list) else neg)
                    seed = seeds[s % len(seeds)] if seeds else -1
                    if seed is None or int(seed) < 0:
                        seed = np.random.randint(0, 2 ** 31 - 1)
                    seed = int(seed) + s
                    grp_seeds.append(seed)
                    img, mask = prep_item(item, seed)
                    imgs.append(img)
                    masks.append(mask)

                first_latents = pipe.encode_image(
                    pipe.params, jnp.asarray(np.stack(imgs)))
                mask_latent = None
                if any(m is not None for m in masks):
                    lat = [downsample_mask_to_latent(
                        m if m is not None
                        else np.ones((args.H, args.W, 1), np.float32),
                        args.H // 8, args.W // 8) for m in masks]
                    mask_latent = jnp.asarray(np.stack(lat))

                partial_mask = None
                if args.mask_first_frame:
                    # conditioning-corruption replica (inference.py:370-372):
                    # one 0.5-threshold spatial mask broadcast over batch and
                    # channels (rand_like(...)[:1,:1] upstream)
                    rng = np.random.RandomState(grp_seeds[0])
                    h8, w8 = args.H // 8, args.W // 8
                    partial_mask = jnp.asarray(
                        (rng.rand(1, h8, w8, 1) > 0.5).astype(np.float32))

                ip_image = None
                if ip_mode:
                    # condition image = the first frame (inference.py:321-322)
                    ip_image = np.concatenate(
                        [clip_preprocess_image(im) for im in imgs])

                video = pipe(
                    prompts, negative_prompt=negs, spec=spec,
                    first_image_latents=first_latents, mask=mask_latent,
                    fps=float(args.fps), motion_score=float(args.flw_ctrl),
                    seed=int(grp_seeds[0]), ip_image=ip_image,
                    partial_mask=partial_mask)
                for bi, (idx, s) in enumerate(group):
                    prompt = prompts[bi]
                    name = (f"{items[idx]['idx']}-{s}-"
                            f"{prompt[:60].replace('/', '')}.gif")
                    save_videos_grid(video[bi:bi + 1],
                                     os.path.join(savedir, name), fps=8)
                    print(f"[{model_name}] saved {name} "
                          f"(seed {grp_seeds[bi]})")

    with open(os.path.join(savedir, "config_snapshot.yaml"), "w") as f:
        yaml.safe_dump({"args": vars(args), "models": model_config}, f)


if __name__ == "__main__":
    main()
