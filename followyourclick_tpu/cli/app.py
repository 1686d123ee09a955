"""Interactive click→mask→remove browser app (optional; requires gradio).

Behavior spec: reference ``Inpaint-Anything/app.py`` — upload image → SAM
features cached once (:42-50) → click produces 3 candidate masks with
dilation (:53-96) → optional LaMa removal per mask (:98-108). This image
ships without gradio; the headless equivalent is
``followyourclick_tpu.cli.click_mask`` + ``inpaint.remove_anything``.
"""

from __future__ import annotations

import argparse


def build_app(predictor, inpainter, dilate_kernel_size: int = 15):
    import gradio as gr
    import numpy as np

    from followyourclick_tpu.masking.brush import dilate_mask
    from followyourclick_tpu.masking.click import predict_masks_with_sam

    state = {"image": None, "masks": None}

    def on_upload(img):
        state["image"] = img
        predictor.set_image(img)  # ViT runs ONCE per image (app.py:42-50)
        return "features cached — click a point"

    def on_click(evt: "gr.SelectData"):
        w, h = evt.index
        masks, scores, _ = predict_masks_with_sam(
            state["image"], [[w, h]], [1], predictor)
        masks = [dilate_mask(m.astype(np.uint8) * 255, dilate_kernel_size)
                 for m in masks]
        state["masks"] = masks
        overlays = []
        for m in masks:
            o = state["image"].copy()
            o[m > 0] = (0.5 * o[m > 0] + [127, 0, 0]).astype(np.uint8)
            overlays.append(o)
        return overlays

    def on_remove():
        return [inpainter(state["image"], m) for m in state["masks"]]

    with gr.Blocks() as demo:
        img_in = gr.Image(label="input")
        status = gr.Textbox()
        gallery = gr.Gallery(label="candidate masks")
        removed = gr.Gallery(label="removed")
        btn = gr.Button("remove")
        img_in.upload(on_upload, img_in, status)
        img_in.select(on_click, None, gallery)
        btn.click(on_remove, None, removed)
    return demo


def main(argv=None):
    p = argparse.ArgumentParser("followyourclick-app")
    p.add_argument("--sam_ckpt", type=str, required=True)
    p.add_argument("--sam_model_type", type=str, default="vit_h")
    p.add_argument("--lama_ckpt", type=str, default=None)
    args = p.parse_args(argv)

    from followyourclick_tpu.inpaint import FFCResNetGenerator, LamaConfig, LamaInpainter
    from followyourclick_tpu.inpaint.convert import load_lama_checkpoint
    from followyourclick_tpu.sam import Sam, SamPredictor, sam_model_registry
    from followyourclick_tpu.sam.convert import load_sam_checkpoint

    cfg = sam_model_registry[args.sam_model_type]
    predictor = SamPredictor(
        Sam(cfg), load_sam_checkpoint(args.sam_ckpt, depth=cfg.depth))
    if args.lama_ckpt:
        inpainter = LamaInpainter(
            FFCResNetGenerator(LamaConfig()),
            load_lama_checkpoint(args.lama_ckpt))
    else:
        inpainter = LamaInpainter.init_random()
    build_app(predictor, inpainter).launch()


if __name__ == "__main__":
    main()
