"""Headless smoke tests for the Inpaint-Anything CLI entry points
(cli/inpaint.py): click → remove / fill / replace run end-to-end from the
shell surface and produce output files. Mirrors the reference scripts'
flag surface (Inpaint-Anything/remove_anything.py:1-126 et al.) with
random-init tiny models (no checkpoints needed)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy (deselect via -m 'not slow')


@pytest.fixture(scope="module")
def test_img(tmp_path_factory):
    import cv2

    p = tmp_path_factory.mktemp("inpaint_cli") / "img.png"
    rs = np.random.RandomState(0)
    img = (rs.rand(96, 96, 3) * 255).astype(np.uint8)
    cv2.imwrite(str(p), img)
    return p


def _common(test_img, out_dir):
    return ["--input_img", str(test_img),
            "--point_coords", "48", "48",
            "--output_dir", str(out_dir),
            "--sam_model_type", "vit_t",
            "--seed", "0"]


def test_remove_subcommand(test_img, tmp_path):
    from followyourclick_tpu.cli.inpaint import main

    main(["remove", *_common(test_img, tmp_path),
          "--dilate_kernel_size", "5"])
    out = tmp_path / "img"
    masks = sorted(out.glob("mask_*.png"))
    inpainted = sorted(out.glob("inpainted_with_mask_*.png"))
    assert len(masks) >= 1 and len(masks) == len(inpainted)
    import cv2

    m = cv2.imread(str(masks[0]), cv2.IMREAD_GRAYSCALE)
    assert m.shape == (96, 96)
    r = cv2.imread(str(inpainted[0]))
    assert r.shape == (96, 96, 3)


def test_fill_subcommand(test_img, tmp_path):
    from followyourclick_tpu.cli.inpaint import main

    main(["fill", *_common(test_img, tmp_path),
          "--dilate_kernel_size", "5",
          "--text_prompt", "a red ball", "--steps", "2"])
    out = tmp_path / "img"
    assert len(list(out.glob("filled_with_mask_*.png"))) >= 1


def test_replace_subcommand(test_img, tmp_path):
    from followyourclick_tpu.cli.inpaint import main

    main(["replace", *_common(test_img, tmp_path),
          "--text_prompt", "beach", "--steps", "2",
          "--target_size", "64"])
    out = tmp_path / "img"
    assert len(list(out.glob("replaced_with_mask_*.png"))) >= 1
