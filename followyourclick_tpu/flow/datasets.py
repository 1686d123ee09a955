"""Flow dataset readers + training transforms.

Behavior spec: reference ``mmflow/mmflow/datasets/`` — FlyingChairs
(``NNNNN_img1.ppm / _img2.ppm / _flow.flo`` triplets + the official
train/val split file), Sintel (``clean|final/scene/frame_NNNN.png`` pairs
with ``flow/scene/frame_NNNN.flo``), KITTI 2012/2015 (``image_2`` pairs +
16-bit ``flow_occ`` PNGs), and the pipeline transforms (random crop, flips,
photometric jitter) used by the RAFT configs.

Host-side numpy only (the JAX analogue of the reference's CPU data
pipelines); tests use tiny synthesized fixtures (SURVEY.md §4)."""

from __future__ import annotations

import dataclasses
import os
from pathlib import Path
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from followyourclick_tpu.flow.flow_io import read_flow, read_kitti_flow


def _imread(path) -> np.ndarray:
    import cv2

    img = cv2.imread(str(path), cv2.IMREAD_UNCHANGED)
    if img is None:
        raise FileNotFoundError(path)
    if img.ndim == 3:
        img = cv2.cvtColor(
            img, cv2.COLOR_BGR2RGB if img.shape[2] == 3 else cv2.COLOR_BGRA2RGB
        )
    return img


@dataclasses.dataclass
class FlowSample:
    img1: np.ndarray       # (H, W, 3) uint8
    img2: np.ndarray
    flow_gt: np.ndarray    # (H, W, 2) float32
    valid: np.ndarray      # (H, W) float32


class FlyingChairs:
    """data_root/NNNNN_img1.ppm, _img2.ppm, _flow.flo (+ optional split file
    of 1/2 per line: 1=train, 2=val — mmflow FlyingChairs dataset)."""

    def __init__(self, data_root: str, split_file: Optional[str] = None,
                 test_mode: bool = False):
        root = Path(data_root)
        flows = sorted(root.glob("*_flow.flo"))
        keep = None
        if split_file and os.path.exists(split_file):
            marks = np.loadtxt(split_file, dtype=int)
            want = 2 if test_mode else 1
            keep = {i for i, m in enumerate(marks) if m == want}
        self.records = [
            (str(f)[: -len("_flow.flo")] + "_img1.ppm",
             str(f)[: -len("_flow.flo")] + "_img2.ppm", str(f))
            for i, f in enumerate(flows)
            if keep is None or i in keep
        ]

    def __len__(self):
        return len(self.records)

    def __getitem__(self, i) -> FlowSample:
        p1, p2, pf = self.records[i]
        flow = read_flow(pf)
        return FlowSample(
            _imread(p1), _imread(p2), flow,
            np.ones(flow.shape[:2], np.float32),
        )


class Sintel:
    """data_root/{clean|final}/scene/frame_NNNN.png consecutive pairs with
    data_root/flow/scene/frame_NNNN.flo (mmflow Sintel dataset)."""

    def __init__(self, data_root: str, pass_name: str = "clean"):
        root = Path(data_root)
        self.records = []
        img_root = root / pass_name
        for scene in sorted(p for p in img_root.iterdir() if p.is_dir()):
            frames = sorted(scene.glob("*.png"))
            for a, b in zip(frames[:-1], frames[1:]):
                flo = root / "flow" / scene.name / (a.stem + ".flo")
                if flo.exists():
                    self.records.append((a, b, flo))

    def __len__(self):
        return len(self.records)

    def __getitem__(self, i) -> FlowSample:
        a, b, flo = self.records[i]
        flow = read_flow(flo)
        return FlowSample(
            _imread(a), _imread(b), flow,
            np.ones(flow.shape[:2], np.float32),
        )


class KITTI:
    """data_root/image_2/NNNNNN_1{0,1}.png pairs + flow_occ 16-bit PNGs
    (mmflow KITTI2012/2015 datasets)."""

    def __init__(self, data_root: str):
        root = Path(data_root)
        self.records = []
        for f in sorted((root / "flow_occ").glob("*_10.png")):
            stem = f.name[: -len("_10.png")]
            a = root / "image_2" / f"{stem}_10.png"
            b = root / "image_2" / f"{stem}_11.png"
            if a.exists() and b.exists():
                self.records.append((a, b, f))

    def __len__(self):
        return len(self.records)

    def __getitem__(self, i) -> FlowSample:
        a, b, f = self.records[i]
        import cv2

        png = cv2.imread(str(f), cv2.IMREAD_UNCHANGED)
        # cv2 reads BGR: KITTI stores (u, v, valid) in (R, G, B)
        png = png[..., ::-1]
        flow, valid = read_kitti_flow(png)
        return FlowSample(
            _imread(a), _imread(b), flow.astype(np.float32),
            valid.astype(np.float32),
        )


# ------------------------------------------------------------ transforms --


def random_crop(sample: FlowSample, size, rng: np.random.RandomState
                ) -> FlowSample:
    ch, cw = size
    h, w = sample.img1.shape[:2]
    y = rng.randint(0, max(h - ch, 0) + 1)
    x = rng.randint(0, max(w - cw, 0) + 1)
    return FlowSample(
        sample.img1[y : y + ch, x : x + cw],
        sample.img2[y : y + ch, x : x + cw],
        sample.flow_gt[y : y + ch, x : x + cw],
        sample.valid[y : y + ch, x : x + cw],
    )


def random_flip(sample: FlowSample, rng: np.random.RandomState,
                p_h: float = 0.5, p_v: float = 0.1) -> FlowSample:
    img1, img2, flow, valid = (sample.img1, sample.img2, sample.flow_gt,
                               sample.valid)
    if rng.rand() < p_h:
        img1 = img1[:, ::-1]
        img2 = img2[:, ::-1]
        flow = flow[:, ::-1] * np.asarray([-1.0, 1.0], np.float32)
        valid = valid[:, ::-1]
    if rng.rand() < p_v:
        img1 = img1[::-1]
        img2 = img2[::-1]
        flow = flow[::-1] * np.asarray([1.0, -1.0], np.float32)
        valid = valid[::-1]
    return FlowSample(np.ascontiguousarray(img1), np.ascontiguousarray(img2),
                      np.ascontiguousarray(flow), np.ascontiguousarray(valid))


def photometric_jitter(sample: FlowSample, rng: np.random.RandomState,
                       strength: float = 0.2) -> FlowSample:
    def jit(img):
        img = img.astype(np.float32)
        img = img * (1 + (rng.rand() - 0.5) * 2 * strength)  # brightness
        img = img + (rng.rand(3) - 0.5) * 20 * strength      # per-channel
        return np.clip(img, 0, 255).astype(np.uint8)

    return FlowSample(jit(sample.img1), jit(sample.img2), sample.flow_gt,
                      sample.valid)


def training_batches(
    dataset,
    batch_size: int,
    crop_size=(368, 496),
    seed: int = 0,
    augment: bool = True,
) -> Iterator[Dict[str, np.ndarray]]:
    """Infinite shuffled batch iterator feeding ``flow.train.train_step``
    (the DataLoader+DistributedSampler role, host-side)."""
    rng = np.random.RandomState(seed)
    n = len(dataset)
    order = rng.permutation(n)
    pos = 0
    while True:
        batch: List[FlowSample] = []
        while len(batch) < batch_size:
            if pos >= n:
                order = rng.permutation(n)
                pos = 0
            s = dataset[int(order[pos])]
            pos += 1
            s = random_crop(s, crop_size, rng)
            if augment:
                s = random_flip(s, rng)
                s = photometric_jitter(s, rng)
            batch.append(s)
        yield {
            "img1": np.stack([s.img1 for s in batch]).astype(np.float32),
            "img2": np.stack([s.img2 for s in batch]).astype(np.float32),
            "flow_gt": np.stack([s.flow_gt for s in batch]),
            "valid": np.stack([s.valid for s in batch]),
        }
