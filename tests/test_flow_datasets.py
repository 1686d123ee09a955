"""Hermetic tests for the flow dataset readers using tiny synthesized
fixtures, mmflow's test style (reference ``mmflow/tests/data/pseudo_*``
miniature datasets; SURVEY.md §4). Covers the full RAFT C+T+S+K+H recipe's
dataset set: FlyingChairs(+Occ), FlyingThings3D(+subset), ChairsSDHom,
Sintel, KITTI, HD1K.
"""

import numpy as np
import pytest

from followyourclick_tpu.flow.datasets import (
    ChairsSDHom,
    FlowSample,
    FlyingChairs,
    FlyingChairsOcc,
    FlyingThings3D,
    FlyingThings3DSubset,
    HD1K,
    mixed_dataset,
)
from followyourclick_tpu.flow.flow_io import write_flow, write_pfm

H, W = 16, 24


def _png(path, seed=0):
    import cv2

    rs = np.random.RandomState(seed)
    img = rs.randint(0, 255, (H, W, 3), np.uint8)
    path.parent.mkdir(parents=True, exist_ok=True)
    cv2.imwrite(str(path), img)
    return img


def _flo(path, value=(1.0, -2.0)):
    flow = np.zeros((H, W, 2), np.float32)
    flow[..., 0], flow[..., 1] = value
    path.parent.mkdir(parents=True, exist_ok=True)
    write_flow(flow, path)
    return flow


def _pfm_flow(path, value=(0.5, 1.5)):
    data = np.zeros((H, W, 3), np.float32)
    data[..., 0], data[..., 1] = value
    path.parent.mkdir(parents=True, exist_ok=True)
    write_pfm(data, path)
    return data[..., :2]


def _kitti_png(path, u=1.0, v=-1.0):
    import cv2

    png = np.zeros((H, W, 3), np.uint16)
    png[..., 0] = np.uint16(u * 64.0 + 2 ** 15)   # R: u
    png[..., 1] = np.uint16(v * 64.0 + 2 ** 15)   # G: v
    png[..., 2] = 1                               # B: valid
    path.parent.mkdir(parents=True, exist_ok=True)
    cv2.imwrite(str(path), png[..., ::-1])  # cv2 writes BGR


def _check(sample: FlowSample, flow_value):
    assert sample.img1.shape == (H, W, 3)
    assert sample.img2.shape == (H, W, 3)
    assert sample.flow_gt.shape == (H, W, 2)
    assert sample.valid.shape == (H, W)
    np.testing.assert_allclose(sample.flow_gt[0, 0], flow_value, atol=0.05)


def test_flyingthings3d(tmp_path):
    root = tmp_path / "ft3d"
    seq = root / "frames_cleanpass" / "TRAIN" / "A" / "0000" / "left"
    for i in range(3):
        _png(seq / f"{i:04d}.png", seed=i)
    fdir = root / "optical_flow" / "TRAIN" / "A" / "0000"
    for i in range(3):
        _pfm_flow(fdir / "into_future" / "left" / f"f{i:04d}.pfm", (0.5, 1.5))
        _pfm_flow(fdir / "into_past" / "left" / f"b{i:04d}.pfm", (-0.5, 2.0))

    ds = FlyingThings3D(str(root), direction="forward")
    assert len(ds) == 2
    _check(ds[0], (0.5, 1.5))

    both = FlyingThings3D(str(root))
    assert len(both) == 4  # 2 forward + 2 backward
    _check(both[2], (-0.5, 2.0))
    assert FlyingThings3D(str(root), test_mode=True).records == []


def test_flyingthings3d_subset(tmp_path):
    root = tmp_path / "ft3ds"
    img = root / "train" / "image_clean" / "left"
    for i in range(3):
        _png(img / f"{i:07d}.png", seed=i)
    _flo(root / "train" / "flow" / "left" / "into_future" / "0000000.flo",
         (1.0, 0.0))
    _flo(root / "train" / "flow" / "left" / "into_past" / "0000001.flo",
         (0.0, 1.0))
    # excluded-by-name NaN file must be skipped
    _flo(root / "train" / "flow" / "left" / "into_future" / "0004573.flo")

    ds = FlyingThings3DSubset(str(root))
    assert len(ds) == 2
    _check(ds[0], (1.0, 0.0))
    fw = FlyingThings3DSubset(str(root), direction="forward")
    assert len(fw) == 1


def test_chairssdhom(tmp_path):
    root = tmp_path / "csdh"
    d = root / "data" / "train"
    for i in range(2):
        _png(d / "t0" / f"{i:05d}.png", seed=i)
        _png(d / "t1" / f"{i:05d}.png", seed=10 + i)
        _pfm_flow(d / "flow" / f"{i:05d}.pfm", (0.25, -0.75))
    # upstream NaN exclusion
    _png(d / "t0" / "08755.png")
    _png(d / "t1" / "08755.png")
    _pfm_flow(d / "flow" / "08755.pfm")

    ds = ChairsSDHom(str(root))
    assert len(ds) == 2
    _check(ds[0], (0.25, -0.75))
    assert len(ChairsSDHom(str(root), test_mode=True)) == 0


def test_hd1k(tmp_path):
    root = tmp_path / "hd1k"
    for seq in range(2):
        for i in range(3):
            _png(root / "hd1k_input" / "image_2" / f"{seq:06d}_{i:04d}.png",
                 seed=seq * 10 + i)
            _kitti_png(root / "hd1k_flow_gt" / "flow_occ"
                       / f"{seq:06d}_{i:04d}.png", u=2.0, v=-3.0)

    ds = HD1K(str(root))
    assert len(ds) == 4  # 2 sequences × (3−1) pairs
    s = ds[0]
    _check(s, (2.0, -3.0))
    assert s.valid.min() == 1.0


def test_flyingchairsocc(tmp_path):
    import cv2

    root = tmp_path / "fco"
    d = root / "data"
    d.mkdir(parents=True)
    # indices 0..7: index 5 is in the official VALIDATE_INDICES list
    for i in range(8):
        _png(d / f"{i:05d}_img1.png", seed=i)
        _png(d / f"{i:05d}_img2.png", seed=100 + i)
        _flo(d / f"{i:05d}_flow.flo", (3.0, 4.0))
        occ = np.zeros((H, W), np.uint8)
        occ[: H // 2] = 255
        cv2.imwrite(str(d / f"{i:05d}_occ1.png"), occ)

    train = FlyingChairsOcc(str(root))
    val = FlyingChairsOcc(str(root), test_mode=True)
    assert len(train) == 7 and len(val) == 1  # split index 5 → val
    _check(train[0], (3.0, 4.0))
    occ = train.occlusion(0)
    assert occ.shape == (H, W)
    assert occ[0, 0] == 1.0 and occ[-1, -1] == 0.0


def test_mixed_raft_recipe(tmp_path):
    """The RAFT C+T+S+K+H mixed stage is constructible: a weighted mix over
    the five dataset families yields batches from each (reference
    MixedBatchDistributedSampler semantics, mmflow samplers)."""
    root = tmp_path / "csdh"
    d = root / "data" / "train"
    for i in range(2):
        _png(d / "t0" / f"{i:05d}.png", seed=i)
        _png(d / "t1" / f"{i:05d}.png", seed=10 + i)
        _pfm_flow(d / "flow" / f"{i:05d}.pfm", (1.0, 1.0))
    a = ChairsSDHom(str(root))

    root2 = tmp_path / "fco"
    d2 = root2 / "data"
    d2.mkdir(parents=True)
    for i in range(2):
        _png(d2 / f"{i:05d}_img1.png", seed=i)
        _png(d2 / f"{i:05d}_img2.png", seed=5 + i)
        _flo(d2 / f"{i:05d}_flow.flo", (2.0, 2.0))
    b = FlyingChairsOcc(str(root2))

    mix = mixed_dataset([a, b], weights=[1, 3])
    assert len(mix) == 2 + 2
    seen = {tuple(mix[i].flow_gt[0, 0]) for i in range(len(mix))}
    assert (1.0, 1.0) in seen and (2.0, 2.0) in seen
