"""Minimal gallery sampler: prompt-yaml → gif grid.

Behavior spec: reference ``scripts/animate.py`` — per-model prompt yaml with
``motion_module``/``path``/``lora_alpha``/``seed``/``steps``/
``guidance_scale``/``prompt``/``n_prompt`` entries, samples every prompt,
saves per-sample gifs plus a combined grid and a config snapshot."""

from __future__ import annotations

import argparse
import datetime
import os
from pathlib import Path
from typing import List, Optional


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("followyourclick-animate")
    p.add_argument("--pretrained_model_path", type=str,
                   default="models/StableDiffusion/stable-diffusion-v1-5")
    p.add_argument("--inference_config", type=str,
                   default="configs/inference/inference.yaml")
    p.add_argument("--config", type=str, required=True)
    p.add_argument("--L", type=int, default=16)
    p.add_argument("--W", type=int, default=512)
    p.add_argument("--H", type=int, default=512)
    p.add_argument("--savedir", type=str, default="samples")
    return p


def main(argv: Optional[List[str]] = None) -> None:
    import numpy as np
    import yaml

    from followyourclick_tpu.config import InferenceConfig
    from followyourclick_tpu.pipelines.animation import SampleSpec
    from followyourclick_tpu.utils.loaders import (
        assemble_pipeline_from_pretrained,
    )
    from followyourclick_tpu.utils.video_io import save_videos_grid

    args = build_parser().parse_args(argv)
    time_str = datetime.datetime.now().strftime("%Y-%m-%dT%H-%M-%S")
    savedir = os.path.join(args.savedir,
                           f"{Path(args.config).stem}-{time_str}")
    os.makedirs(savedir, exist_ok=True)

    inference_config = InferenceConfig.from_yaml(args.inference_config)
    with open(args.config) as f:
        model_config = yaml.safe_load(f)

    samples = []
    sample_idx = 0
    for name, mc in model_config.items():
        motion_modules = mc.get("motion_module") or [None]
        if isinstance(motion_modules, str):
            motion_modules = [motion_modules]
        for mm in motion_modules:
            pipe = assemble_pipeline_from_pretrained(
                args.pretrained_model_path, inference_config,
                motion_module_path=mm,
                personalized_ckpt_path=mc.get("path") or None,
                lora_path=mc.get("lora") or None,
                lora_alpha=mc.get("lora_alpha", 0.8))
            prompts = mc.get("prompt", [])
            n_prompts = mc.get("n_prompt", [""])
            if len(n_prompts) == 1:
                n_prompts = n_prompts * len(prompts)
            seeds = mc.get("seed", [-1])
            if not isinstance(seeds, list):
                seeds = [seeds] * len(prompts)
            spec = SampleSpec(
                video_length=args.L, height=args.H, width=args.W,
                num_inference_steps=int(mc.get("steps", 25)),
                guidance_scale=float(mc.get("guidance_scale", 7.5)))
            for prompt, neg, seed in zip(prompts, n_prompts, seeds):
                if seed is None or int(seed) < 0:
                    seed = int(np.random.randint(0, 2**31 - 1))
                print(f"sampling: {prompt} (seed {seed})")
                video = pipe([prompt], negative_prompt=[neg], spec=spec,
                             seed=int(seed))
                samples.append(video)
                fname = f"{sample_idx}-{prompt[:60].replace('/', '')}.gif"
                save_videos_grid(video, os.path.join(savedir, fname), fps=8)
                sample_idx += 1

    if samples:
        grid = np.concatenate(samples, axis=0)
        save_videos_grid(grid, os.path.join(savedir, "sample.gif"), fps=8,
                         n_rows=len(samples))
    with open(os.path.join(savedir, "config.yaml"), "w") as f:
        yaml.safe_dump(model_config, f)


if __name__ == "__main__":
    main()
