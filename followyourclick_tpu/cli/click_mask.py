"""Click→mask CLI: point a coordinate at an image, get candidate masks.

Behavior spec: reference ``Inpaint-Anything/sam_segment.py`` (flag surface
:40-80: --input_img, --point_coords, --point_labels, --dilate_kernel_size,
--output_dir, --sam_model_type, --sam_ckpt) and the gradio app's
get_masked_img flow (app.py:53-96). Saves one PNG per candidate mask plus a
``*_with_points``-style overlay-free manifest (no matplotlib dependency).
"""

from __future__ import annotations

import argparse
import os
from pathlib import Path

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("followyourclick-click-mask")
    p.add_argument("--input_img", type=str, required=True)
    p.add_argument("--point_coords", type=float, nargs="+", required=True,
                   help="x y of the click (w h order, like the reference)")
    p.add_argument("--point_labels", type=int, nargs="+", default=[1])
    p.add_argument("--dilate_kernel_size", type=int, default=None)
    p.add_argument("--output_dir", type=str, required=True)
    p.add_argument("--sam_model_type", type=str, default="vit_h",
                   choices=["vit_h", "vit_l", "vit_b", "vit_t"])
    p.add_argument("--sam_ckpt", type=str, default=None,
                   help="official SAM .pth checkpoint (converted on load)")
    p.add_argument("--seed", type=int, default=0)
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)

    import cv2
    import jax

    from followyourclick_tpu.masking.brush import dilate_mask
    from followyourclick_tpu.masking.click import predict_masks_with_sam
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
    predictor = SamPredictor(model, variables)

    img = cv2.cvtColor(cv2.imread(args.input_img), cv2.COLOR_BGR2RGB)
    coords = np.asarray(args.point_coords, np.float32).reshape(-1, 2)
    labels = np.asarray(args.point_labels, np.int32)
    masks, scores, _ = predict_masks_with_sam(img, coords, labels, predictor)
    masks = masks.astype(np.uint8) * 255
    if args.dilate_kernel_size is not None:
        masks = [dilate_mask(m, args.dilate_kernel_size) for m in masks]

    out_dir = Path(args.output_dir) / Path(args.input_img).stem
    out_dir.mkdir(parents=True, exist_ok=True)
    for idx, mask in enumerate(masks):
        cv2.imwrite(str(out_dir / f"mask_{idx}.png"), mask)
        print(f"mask_{idx}.png  iou={float(scores[idx]):.4f}")
    print(f"saved {len(masks)} masks to {out_dir}")


if __name__ == "__main__":
    main()
