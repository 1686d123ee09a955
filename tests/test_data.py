"""Data-layer tests with tiny synthetic fixtures (hermetic, like mmflow's
pseudo-dataset tests — SURVEY.md §4)."""

import csv
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def video_dir(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("videos")
    # a 60-frame video with a moving square on static background
    h, w = 64, 64
    path = os.path.join(root, "vid1.mp4")
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10,
                             (w, h))
    for i in range(60):
        frame = np.full((h, w, 3), 40, np.uint8)
        x = 5 + i // 3
        frame[20:36, x:x + 10] = 220
        writer.write(frame)
    writer.release()

    csv_path = os.path.join(root, "meta.csv")
    with open(csv_path, "w", newline="") as f:
        wr = csv.DictWriter(f, fieldnames=["videoid", "name"])
        wr.writeheader()
        wr.writerow({"videoid": "vid1", "name": "a moving square"})
        wr.writerow({"videoid": "missing", "name": "broken entry"})
    return str(root), csv_path


def test_webvid_dataset_contract(video_dir):
    from followyourclick_tpu.data.dataset import WebVidDataset

    root, csv_path = video_dir
    ds = WebVidDataset(csv_path, root, sample_size=32, sample_n_frames=8,
                       dynamic_fps=True, seed=0)
    assert len(ds) == 2
    sample = ds[0]
    pv = sample["pixel_values"]
    assert pv.shape == (8, 32, 32, 3)
    assert pv.min() >= -1.0 and pv.max() <= 1.0
    assert sample["text"] == "a moving square"
    assert 2 <= sample["fps"] <= 24  # dynamic stride as conditioning value
    assert sample["mask"].shape == (32, 32, 1)
    assert set(np.unique(sample["mask"])) <= {0.0, 1.0}
    # the moving square must be inside the motion mask region
    assert sample["mask"].sum() > 0


def test_webvid_retry_on_corrupt(video_dir):
    """Index 1 points at a missing file → resamples to the good video
    (reference dataset.py:231-234 behavior, bounded here)."""
    from followyourclick_tpu.data.dataset import WebVidDataset

    root, csv_path = video_dir
    ds = WebVidDataset(csv_path, root, sample_size=32, sample_n_frames=8,
                       seed=0)
    sample = ds[1]
    assert sample["text"] == "a moving square"


def test_moved_area_mask_static_is_empty():
    from followyourclick_tpu.data.dataset import get_moved_area_mask

    frames = np.full((4, 64, 64, 3), 128, np.uint8)
    mask = get_moved_area_mask(frames)
    assert mask.sum() == 0


def test_camera_motion_augmentation():
    from followyourclick_tpu.data.camera_motion import (
        MOTION_TYPES,
        CameraMotionAugmentation,
    )

    img = np.zeros((128, 128, 3), np.uint8)
    img[40:90, 40:90] = 255
    aug = CameraMotionAugmentation(num_frames=6, out_size=64, seed=0)
    for mt in MOTION_TYPES:
        frames, idx = aug(img, mt)
        assert frames.shape == (6, 64, 64, 3)
        assert idx == MOTION_TYPES.index(mt)
        # motion actually changes frames
        assert np.abs(frames[0].astype(int) - frames[-1].astype(int)).max() > 0


def test_image_folder_dataset(tmp_path):
    import cv2

    from followyourclick_tpu.data.image_dataset import ImageFolderDataset

    for i in range(3):
        img = np.random.randint(0, 255, (48, 64, 3), np.uint8)
        cv2.imwrite(str(tmp_path / f"img_{i}.png"), img)
    ds = ImageFolderDataset(str(tmp_path), sample_size=32)
    assert len(ds) == 3
    s = ds[0]
    assert s["pixel_values"].shape == (1, 32, 32, 3)  # 1-frame video
    assert isinstance(s["text"], str)
