"""Optical-flow file IO: Middlebury ``.flo`` and ``.pfm`` formats.

Behavior spec: reference ``mmflow/mmflow/datasets/utils/flow_io.py``
(read_flow/write_flow with the 202021.25 magic; PFM reader used for
FlyingThings3D), plus KITTI's 16-bit PNG encoding
((value*64)+2^15, third channel = valid).
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import Optional, Tuple, Union

import numpy as np

_FLO_MAGIC = 202021.25


def read_flow(path: Union[str, Path]) -> np.ndarray:
    """Read a ``.flo`` file → ``(H, W, 2)`` float32."""
    with open(path, "rb") as f:
        magic = np.fromfile(f, np.float32, count=1)
        if magic.size == 0 or magic[0] != _FLO_MAGIC:
            raise IOError(f"{path}: invalid .flo magic {magic}")
        w = int(np.fromfile(f, np.int32, count=1)[0])
        h = int(np.fromfile(f, np.int32, count=1)[0])
        data = np.fromfile(f, np.float32, count=2 * w * h)
    return data.reshape(h, w, 2)


def write_flow(flow: np.ndarray, path: Union[str, Path]) -> None:
    """Write ``(H, W, 2)`` float32 flow as ``.flo``."""
    flow = np.asarray(flow, dtype=np.float32)
    assert flow.ndim == 3 and flow.shape[2] == 2
    h, w = flow.shape[:2]
    with open(path, "wb") as f:
        np.float32(_FLO_MAGIC).tofile(f)
        np.int32(w).tofile(f)
        np.int32(h).tofile(f)
        flow.tofile(f)


def read_pfm(path: Union[str, Path]) -> Tuple[np.ndarray, float]:
    """Read a PFM image → (data, scale). Rows are stored bottom-up and are
    flipped to top-down on return (reference flow_io.py PFM reader)."""
    with open(path, "rb") as f:
        header = f.readline().rstrip()
        if header == b"PF":
            color = True
        elif header == b"Pf":
            color = False
        else:
            raise IOError(f"{path}: not a PFM file (header {header!r})")
        dims = f.readline()
        m = re.match(rb"^(\d+)\s(\d+)\s$", dims)
        if not m:
            raise IOError(f"{path}: malformed PFM header")
        w, h = int(m.group(1)), int(m.group(2))
        scale = float(f.readline().rstrip())
        endian = "<" if scale < 0 else ">"
        data = np.fromfile(f, endian + "f")
    shape = (h, w, 3) if color else (h, w)
    return np.flipud(data.reshape(shape)), abs(scale)


def write_pfm(
    data: np.ndarray, path: Union[str, Path], scale: float = 1.0
) -> None:
    data = np.asarray(data, dtype=np.float32)
    color = data.ndim == 3 and data.shape[2] == 3
    with open(path, "wb") as f:
        f.write(b"PF\n" if color else b"Pf\n")
        f.write(f"{data.shape[1]} {data.shape[0]}\n".encode())
        f.write(f"{-abs(scale)}\n".encode())  # little-endian
        np.flipud(data).astype("<f").tofile(f)


def read_kitti_flow(
    png: np.ndarray,
) -> Tuple[np.ndarray, np.ndarray]:
    """Decode a KITTI 16-bit flow PNG array ``(H, W, 3)`` (already read BGR or
    RGB with channels [u16*64+2^15, v16*64+2^15, valid]) into
    (flow (H,W,2) float32, valid (H,W) float32)."""
    png = png.astype(np.float32)
    flow = (png[..., :2] - 2**15) / 64.0
    valid = png[..., 2]
    flow[valid < 0.5] = 0.0
    return flow, valid


def flow_to_kitti_png(
    flow: np.ndarray, valid: Optional[np.ndarray] = None
) -> np.ndarray:
    """Encode flow as the KITTI uint16 PNG triplet."""
    h, w = flow.shape[:2]
    out = np.zeros((h, w, 3), dtype=np.uint16)
    out[..., :2] = np.clip(flow * 64.0 + 2**15, 0, 2**16 - 1).astype(np.uint16)
    out[..., 2] = 1 if valid is None else valid.astype(np.uint16)
    return out
