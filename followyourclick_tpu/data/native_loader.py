"""Python front-end for the native prefetching clip loader
(``native/frame_loader.cpp``).

Role: the reference's decord + torch DataLoader worker pool
(``animatediff/data/dataset.py:4,86-234``) — decode video clips / images on
background C++ threads while the TPU is busy, hand back contiguous RGB uint8
arrays ready for ``jax.device_put``.
"""

from __future__ import annotations

import ctypes
import itertools
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

from followyourclick_tpu.native import load_library


class NativeClipLoader:
    """Submit (path, frame_indices, out_hw) requests; pop finished clips.

    crop_mode 0 = short-side resize + centre crop (WebVid semantics,
    dataset.py:168-178); 1 = plain resize.
    """

    def __init__(self, num_workers: int = 4, capacity: int = 8):
        self._lib = load_library("loader")
        if self._lib is None:
            raise RuntimeError(
                "native loader unavailable (toolchain/OpenCV missing); use "
                "the Python dataset path instead"
            )
        lib = self._lib
        lib.fyc_loader_create.restype = ctypes.c_void_p
        lib.fyc_loader_create.argtypes = [ctypes.c_int, ctypes.c_int]
        lib.fyc_loader_destroy.argtypes = [ctypes.c_void_p]
        lib.fyc_loader_submit.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
        ]
        lib.fyc_loader_next.restype = ctypes.c_int
        lib.fyc_loader_next.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64,
        ]
        self._handle = lib.fyc_loader_create(num_workers, capacity)
        self._ids = itertools.count()
        self._shapes: Dict[int, Tuple[int, int, int]] = {}

    def submit(
        self,
        path: str,
        frame_indices: Optional[Sequence[int]],
        out_hw: Tuple[int, int],
        crop_mode: int = 0,
    ) -> int:
        """Enqueue one clip (video) or image (frame_indices=None); returns a
        request id."""
        rid = next(self._ids)
        n = 0
        idx_arr = None
        if frame_indices is not None:
            idx = sorted(int(i) for i in frame_indices)
            n = len(idx)
            idx_arr = (ctypes.c_int * n)(*idx)
        self._shapes[rid] = (max(n, 1), out_hw[0], out_hw[1])
        self._lib.fyc_loader_submit(
            self._handle, rid, path.encode(), idx_arr, n, out_hw[0],
            out_hw[1], crop_mode,
        )
        return rid

    def next(self, timeout_ms: int = 30000):
        """Blocking pop → (request_id, frames (N, H, W, 3) uint8) or raises
        on decode error / timeout."""
        # allocate for the largest outstanding request
        max_bytes = max(
            (f * h * w * 3 for f, h, w in self._shapes.values()), default=0
        )
        buf = np.empty(max_bytes, dtype=np.uint8)
        rid = ctypes.c_int64()
        frames = ctypes.c_int()
        status = self._lib.fyc_loader_next(
            self._handle, timeout_ms, ctypes.byref(rid), ctypes.byref(frames),
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), max_bytes,
        )
        if status == 1:
            raise TimeoutError("native loader: no clip ready")
        shape = self._shapes.pop(int(rid.value), None)
        if status != 0:
            raise IOError(
                f"native loader: decode failed (status {status}) for request "
                f"{rid.value}"
            )
        f, h, w = frames.value, shape[1], shape[2]
        return int(rid.value), buf[: f * h * w * 3].reshape(f, h, w, 3).copy()

    def close(self):
        if self._handle:
            self._lib.fyc_loader_destroy(self._handle)
            self._handle = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass
