"""Functional tests for the SAM predictor, automatic mask generator, and the
masking (brush_utils) toolchain — tiny 'vit_t' config, hermetic."""

import numpy as np
import jax
import pytest

pytestmark = pytest.mark.slow  # oracle/compile-heavy (deselect via -m 'not slow')

from followyourclick_tpu.masking import (
    crop_for_filling_post,
    crop_for_filling_pre,
    dilate_mask,
    paste_object,
    recover_size,
    resize_and_pad,
)
from followyourclick_tpu.masking.click import click_to_masks
from followyourclick_tpu.sam import (
    Sam,
    SamAutomaticMaskGenerator,
    SamPredictor,
    sam_model_registry,
)
from followyourclick_tpu.sam.amg import (
    batched_mask_to_box,
    box_nms,
    build_point_grid,
    calculate_stability_score,
)
from followyourclick_tpu.sam.predictor import ResizeLongestSide


@pytest.fixture(scope="module")
def predictor():
    cfg = sam_model_registry["vit_t"]
    model = Sam(cfg)
    img = np.zeros((1, cfg.img_size, cfg.img_size, 3), np.float32)
    pts = np.zeros((1, 1, 2), np.float32)
    lbl = np.ones((1, 1), np.int32)
    variables = model.init(jax.random.PRNGKey(0), img, pts, lbl)
    return SamPredictor(model, variables)


class TestPredictor:
    def test_predict_multimask(self, predictor):
        img = (np.random.RandomState(0).rand(96, 80, 3) * 255).astype(np.uint8)
        predictor.set_image(img)
        masks, iou, low_res = predictor.predict(
            point_coords=np.array([[40.0, 50.0]]),
            point_labels=np.array([1]),
            multimask_output=True,
        )
        assert masks.shape == (3, 96, 80) and masks.dtype == bool
        assert iou.shape == (3,)
        assert low_res.shape[0] == 3

    def test_predict_single_and_box(self, predictor):
        img = (np.random.RandomState(1).rand(64, 64, 3) * 255).astype(np.uint8)
        predictor.set_image(img)
        masks, iou, _ = predictor.predict(
            point_coords=np.array([[10.0, 10.0]]),
            point_labels=np.array([1]),
            box=np.array([5.0, 5.0, 40.0, 40.0]),
            multimask_output=False,
        )
        assert masks.shape == (1, 64, 64)
        assert iou.shape == (1,)

    def test_embedding_cached_across_predicts(self, predictor):
        img = (np.random.RandomState(2).rand(64, 64, 3) * 255).astype(np.uint8)
        predictor.set_image(img)
        emb1 = predictor.get_image_embedding()
        predictor.predict(
            point_coords=np.array([[1.0, 1.0]]), point_labels=np.array([1])
        )
        assert predictor.get_image_embedding() is emb1

    def test_resize_longest_side(self):
        t = ResizeLongestSide(128)
        assert t.get_preprocess_shape(200, 100, 128) == (128, 64)
        coords = t.apply_coords(
            np.array([[100.0, 200.0]]), original_size=(200, 100)
        )
        np.testing.assert_allclose(coords, [[64.0, 128.0]])

    def test_click_to_masks(self, predictor):
        img = (np.random.RandomState(3).rand(64, 64, 3) * 255).astype(np.uint8)
        masks = click_to_masks(img, (32, 32), predictor, dilate_kernel_size=5)
        assert len(masks) == 3
        for m in masks:
            assert m.shape == (64, 64) and set(np.unique(m)) <= {0, 255}


class TestAMG:
    def test_point_grid(self):
        grid = build_point_grid(4)
        assert grid.shape == (16, 2)
        assert grid.min() > 0 and grid.max() < 1

    def test_stability_score(self):
        logits = np.full((1, 8, 8), -10.0)
        logits[0, 2:6, 2:6] = 10.0  # far beyond both thresholds
        s = calculate_stability_score(logits, 0.0, 1.0)
        np.testing.assert_allclose(s, 1.0)
        # borderline region is counted at -offset but not +offset
        logits[0, 0, 0] = 0.5
        s = calculate_stability_score(logits, 0.0, 1.0)
        np.testing.assert_allclose(s, 16.0 / 17.0)

    def test_mask_to_box(self):
        m = np.zeros((2, 8, 8), bool)
        m[0, 2:5, 3:7] = True
        boxes = batched_mask_to_box(m)
        np.testing.assert_array_equal(boxes[0], [3, 2, 7, 5])
        np.testing.assert_array_equal(boxes[1], [0, 0, 0, 0])

    def test_box_nms(self):
        boxes = np.array(
            [[0, 0, 10, 10], [1, 1, 11, 11], [20, 20, 30, 30]], np.float32
        )
        keep = box_nms(boxes, np.array([0.9, 0.8, 0.7]), 0.5)
        assert list(keep) == [0, 2]

    def test_generate_runs(self, predictor):
        img = (np.random.RandomState(4).rand(64, 64, 3) * 255).astype(np.uint8)
        amg = SamAutomaticMaskGenerator(
            predictor, points_per_side=2, pred_iou_thresh=-1e9,
            stability_score_thresh=0.0,
        )
        records = amg.generate(img)
        assert isinstance(records, list)
        for r in records:
            assert r["segmentation"].shape == (64, 64)
            assert r["area"] == int(r["segmentation"].sum())


class TestBrush:
    def test_dilate_grows_mask(self):
        m = np.zeros((32, 32), np.uint8)
        m[15, 15] = 255
        d = dilate_mask(m, 5)
        assert d.sum() > m.sum()
        assert d[13, 13] == 255

    def test_crop_for_filling_roundtrip(self):
        rs = np.random.RandomState(0)
        image = (rs.rand(600, 800, 3) * 255).astype(np.uint8)
        mask = np.zeros((600, 800), np.uint8)
        mask[100:200, 150:280] = 255
        crop_img, crop_mask = crop_for_filling_pre(image, mask)
        assert crop_img.shape == (512, 512, 3)
        assert crop_mask.shape == (512, 512)
        assert crop_mask.max() == 255
        filled = np.zeros_like(crop_img)
        out = crop_for_filling_post(image, mask, filled)
        assert out.shape == image.shape
        # filled region replaced, outside untouched
        assert (out[mask == 255] == 0).all()
        np.testing.assert_array_equal(out[mask == 0], image[mask == 0])

    def test_crop_for_filling_large_mask(self):
        """Mask bbox wider than 512 exercises the pad+scale branch."""
        image = np.zeros((600, 900, 3), np.uint8)
        mask = np.zeros((600, 900), np.uint8)
        mask[50:550, 100:800] = 255
        crop_img, crop_mask = crop_for_filling_pre(image, mask)
        assert crop_img.shape == (512, 512, 3)

    def test_resize_and_pad_recover(self):
        image = (np.random.RandomState(1).rand(300, 400, 3) * 255).astype(
            np.uint8
        )
        mask = np.zeros((300, 400), np.uint8)
        mask[50:100, 60:120] = 255
        padded_img, padded_mask, pads = resize_and_pad(image, mask, 256)
        assert padded_img.shape == (256, 256, 3)
        assert padded_mask.shape == (256, 256)
        rec_img, rec_mask = recover_size(
            padded_img, padded_mask, (300, 400), pads
        )
        assert rec_img.shape == (300, 400, 3)
        assert rec_mask.shape == (300, 400)

    def test_paste_object(self):
        source = np.full((50, 50, 3), 200, np.uint8)
        source_mask = np.zeros((50, 50), np.uint8)
        source_mask[10:20, 10:30] = 255
        target = np.zeros((80, 80, 3), np.uint8)
        out, out_mask = paste_object(source, source_mask, target, (40, 40))
        assert out.shape == target.shape
        assert out_mask.sum() > 0
        assert (out[out_mask == 255] == 200).all()
        assert (out[out_mask == 0] == 0).all()
