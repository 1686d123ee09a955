"""Python wrapper for the native CLIP BPE tokenizer
(``native/clip_tokenizer.cpp``), drop-in for the minimal tokenizer surface
the pipelines use (``__call__ → .input_ids`` numpy int array).

The vocabulary is derived from ``merges.txt`` alone (the published CLIP
vocab.json is exactly the derived table), so it loads from the same SD
checkpoint ``tokenizer/`` directory the reference uses
(scripts/inference.py:152).
"""

from __future__ import annotations

import ctypes
import os
import types
from typing import List, Sequence, Union

import numpy as np

from followyourclick_tpu.native import load_library


class NativeCLIPTokenizer:
    model_max_length = 77

    def __init__(self, merges_file: str):
        if os.path.isdir(merges_file):
            merges_file = os.path.join(merges_file, "merges.txt")
        lib = load_library("tokenizer")
        if lib is None:
            raise RuntimeError(
                "native tokenizer unavailable; use transformers CLIPTokenizer"
            )
        lib.fyc_tokenizer_create.restype = ctypes.c_void_p
        lib.fyc_tokenizer_create.argtypes = [ctypes.c_char_p]
        lib.fyc_tokenizer_destroy.argtypes = [ctypes.c_void_p]
        lib.fyc_tokenizer_encode.restype = ctypes.c_int
        lib.fyc_tokenizer_encode.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
            ctypes.c_int,
        ]
        self._lib = lib
        self._handle = lib.fyc_tokenizer_create(merges_file.encode())
        if not self._handle:
            raise RuntimeError(f"failed to load merges from {merges_file}")

    def encode(self, text: str, max_length: int = 77) -> np.ndarray:
        out = (ctypes.c_int * max_length)()
        self._lib.fyc_tokenizer_encode(
            self._handle, text.encode("utf-8"), out, max_length
        )
        return np.ctypeslib.as_array(out).copy()

    def __call__(
        self,
        texts: Union[str, Sequence[str]],
        padding=None,
        max_length: int = 77,
        truncation: bool = True,
        return_tensors: str = "np",
    ):
        if isinstance(texts, str):
            texts = [texts]
        ids = np.stack([self.encode(t, max_length) for t in texts]).astype(
            np.int64
        )
        return types.SimpleNamespace(input_ids=ids)

    def __del__(self):  # pragma: no cover
        try:
            if getattr(self, "_handle", None):
                self._lib.fyc_tokenizer_destroy(self._handle)
                self._handle = None
        except Exception:
            pass
