"""Inpaint-Anything CLI: click → remove / fill / replace, end-to-end.

Behavior spec: the reference's four runnable scripts —
``Inpaint-Anything/remove_anything.py:1-126`` (SAM click mask → dilate →
LaMa-inpaint each candidate), ``fill_anything.py`` (mask → 512-crop →
SD-inpaint with the text prompt → paste back), ``replace_anything.py``
(inverted mask → background replacement) — with their flag surface
(``--input_img --point_coords --point_labels --dilate_kernel_size
--output_dir --sam_model_type --sam_ckpt --lama_ckpt``; fill/replace add
``--text_prompt``). The compositions live in ``inpaint/remove.py`` and
``inpaint/fill.py``; this module is the shell entry the reference users had
and round 2 lacked (VERDICT.md missing #1).

Without checkpoints the models are randomly initialized (useful only for
smoke-testing the plumbing; outputs are noise) — same convention as
``cli/click_mask.py``.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def _add_common(p: argparse.ArgumentParser) -> None:
    p.add_argument("--input_img", type=str, required=True)
    p.add_argument("--point_coords", type=float, nargs="+", required=True,
                   help="x y of the click (w h order, like the reference)")
    p.add_argument("--point_labels", type=int, nargs="+", default=[1])
    p.add_argument("--output_dir", type=str, required=True)
    p.add_argument("--sam_model_type", type=str, default="vit_h",
                   choices=["vit_h", "vit_l", "vit_b", "vit_t"])
    p.add_argument("--sam_ckpt", type=str, default=None,
                   help="official SAM .pth checkpoint (converted on load)")
    p.add_argument("--seed", type=int, default=0)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("followyourclick-inpaint")
    sub = p.add_subparsers(dest="command", required=True)

    rm = sub.add_parser("remove", help="click → SAM mask → LaMa removal")
    _add_common(rm)
    rm.add_argument("--dilate_kernel_size", type=int, default=15)
    rm.add_argument("--lama_ckpt", type=str, default=None,
                    help="big-lama torch checkpoint (converted on load)")

    fl = sub.add_parser("fill", help="click → SAM mask → SD-inpaint fill")
    _add_common(fl)
    fl.add_argument("--dilate_kernel_size", type=int, default=15)
    fl.add_argument("--text_prompt", type=str, required=True)
    fl.add_argument("--sd_model_path", type=str, default=None,
                    help="HF SD directory for the inpaint pipeline")
    fl.add_argument("--steps", type=int, default=25)

    rp = sub.add_parser("replace",
                        help="click → SAM mask → SD background replacement")
    _add_common(rp)
    rp.add_argument("--text_prompt", type=str, required=True)
    rp.add_argument("--sd_model_path", type=str, default=None)
    rp.add_argument("--steps", type=int, default=25)
    rp.add_argument("--target_size", type=int, default=512,
                    help="pad-to-square size for the repaint pass "
                         "(reference resize_and_pad uses 512)")
    return p


def _build_sam_predictor(args):
    import jax

    from followyourclick_tpu.sam import Sam, SamPredictor, sam_model_registry
    from followyourclick_tpu.sam.convert import load_sam_checkpoint

    cfg = sam_model_registry[args.sam_model_type]
    model = Sam(cfg)
    if args.sam_ckpt:
        variables = load_sam_checkpoint(args.sam_ckpt, depth=cfg.depth)
    else:
        dummy_img = np.zeros((1, cfg.img_size, cfg.img_size, 3), np.float32)
        variables = model.init(
            jax.random.PRNGKey(args.seed), dummy_img,
            np.zeros((1, 1, 2), np.float32), np.ones((1, 1), np.int32),
        )
    return SamPredictor(model, variables)


def _build_lama(args):
    from followyourclick_tpu.inpaint.convert import load_lama_checkpoint
    from followyourclick_tpu.inpaint.lama import (
        FFCResNetGenerator,
        LamaConfig,
        LamaInpainter,
    )

    if args.lama_ckpt:
        cfg = LamaConfig()
        return LamaInpainter(FFCResNetGenerator(cfg),
                             load_lama_checkpoint(args.lama_ckpt, cfg))
    return LamaInpainter.init_random(seed=args.seed)


class _HashTokenizer:
    """Deterministic stand-in when no SD directory (and thus no tokenizer
    vocab) is given — smoke-test plumbing only."""

    model_max_length = 77

    def __call__(self, texts, padding=None, max_length=None, truncation=False,
                 return_tensors="np"):
        import types

        ids = np.zeros((len(texts), 77), dtype=np.int64)
        for i, t in enumerate(texts):
            rs = np.random.RandomState(abs(hash(t)) % (2 ** 31))
            ids[i] = rs.randint(0, 1000, size=77)
        return types.SimpleNamespace(input_ids=ids)


def _build_sd_pipeline(args):
    import jax
    import jax.numpy as jnp

    from followyourclick_tpu.pipelines.inpaint import InpaintPipeline

    if args.sd_model_path:
        from transformers import CLIPTokenizer

        from followyourclick_tpu.config import InferenceConfig
        from followyourclick_tpu.models.unet3d import UNetConditioning
        from followyourclick_tpu.utils.convert import (
            convert_clip_text_state_dict,
            convert_vae_state_dict,
        )
        from followyourclick_tpu.utils.loaders import (
            load_hf_subfolder,
            load_unet3d_params,
        )

        cfg = InferenceConfig()
        pipe = InpaintPipeline(
            cfg, None, None, None,
            tokenizer=CLIPTokenizer.from_pretrained(
                args.sd_model_path, subfolder="tokenizer"))
        # the pipeline's UNet runs at F=1 with concat conditioning off (4ch)
        example = (
            jnp.zeros((2, 1, 8, 8, 4)),
            jnp.zeros((2,), jnp.int32),
            UNetConditioning(context=jnp.zeros((2, 77, 768))),
        )
        pipe.params = {
            "unet": load_unet3d_params(
                pipe.unet, load_hf_subfolder(args.sd_model_path, "unet"),
                example_inputs=example),
            "vae": convert_vae_state_dict(
                load_hf_subfolder(args.sd_model_path, "vae")),
            "text_encoder": convert_clip_text_state_dict(
                load_hf_subfolder(args.sd_model_path, "text_encoder")),
        }
        return pipe

    # random-init tiny pipeline: plumbing smoke test only
    from followyourclick_tpu.config import (
        CLIPTextConfig,
        InferenceConfig,
        MotionModuleConfig,
        UNet3DConfig,
        VAEConfig,
    )
    from followyourclick_tpu.models.unet3d import UNetConditioning

    cfg = InferenceConfig(
        unet=UNet3DConfig(
            cross_attention_dim=64, attention_head_dim=4,
            block_out_channels=(32, 32, 32, 32), layers_per_block=1,
            norm_num_groups=8,
            motion_module=MotionModuleConfig(num_attention_heads=4)),
        vae=VAEConfig(block_out_channels=(32, 32, 32, 32),
                      layers_per_block=1, norm_num_groups=8),
        clip_text=CLIPTextConfig(vocab_size=1000, hidden_size=64,
                                 intermediate_size=128, num_hidden_layers=2,
                                 num_attention_heads=4))
    pipe = InpaintPipeline(cfg, None, None, None, tokenizer=_HashTokenizer())
    rng = jax.random.PRNGKey(args.seed)
    ids = jnp.zeros((1, 77), jnp.int32)
    sample = jnp.zeros((2, 1, 8, 8, 4))
    from followyourclick_tpu.models.unet3d import UNetConditioning as UC

    cond = UC(context=jnp.zeros((2, 77, 64)))
    pipe.params = {
        "unet": pipe.unet.init(rng, sample, jnp.zeros((2,), jnp.int32),
                               cond)["params"],
        "vae": pipe.vae.init(rng, jnp.zeros((1, 64, 64, 3)), rng)["params"],
        "text_encoder": pipe.text_encoder.init(rng, ids)["params"],
    }
    return pipe


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)

    import cv2

    img = cv2.cvtColor(cv2.imread(args.input_img), cv2.COLOR_BGR2RGB)
    point_wh = (args.point_coords[0], args.point_coords[1])
    out_dir = Path(args.output_dir) / Path(args.input_img).stem
    out_dir.mkdir(parents=True, exist_ok=True)

    predictor = _build_sam_predictor(args)

    def save(name: str, rgb: np.ndarray) -> None:
        cv2.imwrite(str(out_dir / name),
                    cv2.cvtColor(rgb, cv2.COLOR_RGB2BGR))

    if args.command == "remove":
        from followyourclick_tpu.inpaint.remove import remove_anything

        results = remove_anything(
            img, point_wh, predictor, _build_lama(args),
            dilate_kernel_size=args.dilate_kernel_size)
        for i, r in enumerate(results):
            cv2.imwrite(str(out_dir / f"mask_{i}.png"), r["mask"])
            save(f"inpainted_with_mask_{i}.png", r["inpainted"])
            print(f"mask_{i}.png  iou={r['score']:.4f}")
    elif args.command == "fill":
        from followyourclick_tpu.inpaint.fill import fill_anything

        results = fill_anything(
            img, point_wh, args.text_prompt, predictor,
            _build_sd_pipeline(args),
            dilate_kernel_size=args.dilate_kernel_size,
            seed=args.seed, steps=args.steps)
        for i, r in enumerate(results):
            cv2.imwrite(str(out_dir / f"mask_{i}.png"), r["mask"])
            save(f"filled_with_mask_{i}.png", r["filled"])
            print(f"mask_{i}.png  iou={r['score']:.4f}")
    else:  # replace
        from followyourclick_tpu.inpaint.fill import replace_anything

        results = replace_anything(
            img, point_wh, args.text_prompt, predictor,
            _build_sd_pipeline(args), seed=args.seed, steps=args.steps,
            target_size=args.target_size)
        for i, r in enumerate(results):
            cv2.imwrite(str(out_dir / f"mask_{i}.png"), r["mask"])
            save(f"replaced_with_mask_{i}.png", r["replaced"])
            print(f"mask_{i}.png  iou={r['score']:.4f}")
    print(f"saved {len(results)} results to {out_dir}")


if __name__ == "__main__":
    main()
