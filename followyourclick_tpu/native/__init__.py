"""ctypes bindings for the native (C++) host runtime components in
``native/``: the prefetching clip loader (replaces the reference's decord +
DataLoader workers) and the CLIP BPE tokenizer.

Libraries are built on demand with the in-repo Makefile and cached under
``native/build``; import of this module never fails — ``load_library``
returns None when the toolchain or OpenCV headers are unavailable, and
callers fall back to the pure-Python paths.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)

_SOURCES = {
    "loader": ("libfycloader.so", "frame_loader.cpp"),
    "tokenizer": ("libfyctokenizer.so", "clip_tokenizer.cpp"),
}


def load_library(name: str) -> Optional[ctypes.CDLL]:
    """name: 'loader' | 'tokenizer'. Builds (make) if stale, loads via
    ctypes; returns None on any failure."""
    target, src = _SOURCES[name]
    path = os.path.join(_NATIVE_DIR, "build", target)
    src_path = os.path.join(_NATIVE_DIR, src)
    stale = not os.path.exists(path) or (
        os.path.exists(src_path)
        and os.path.getmtime(path) < os.path.getmtime(src_path)
    )
    if stale:
        try:
            subprocess.run(["make", f"build/{target}"], cwd=_NATIVE_DIR,
                           check=True, capture_output=True)
        except Exception:
            pass
    if not os.path.exists(path):
        return None
    try:
        return ctypes.CDLL(path)
    except OSError:
        return None
