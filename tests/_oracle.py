"""Import shims for using the PyTorch reference at /root/reference as a
numerical oracle in parity tests.

The reference targets old huggingface_hub / missing CUDA-only deps; we stub
exactly what its import graph touches. Nothing from the reference is vendored —
it is imported read-only to generate golden outputs.
"""

import importlib.machinery
import logging
import os
import sys
import types

_REFERENCE = "/root/reference"
_initialized = False


def _stub_module(name: str) -> types.ModuleType:
    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    mod.__path__ = []
    sys.modules[name] = mod
    return mod


def setup_reference_path() -> None:
    """Make ``import animatediff`` / vendored ``diffusers`` work on CPU."""
    global _initialized
    if _initialized:
        return
    os.environ.setdefault("USE_FLAX", "0")  # keep vendored diffusers torch-only

    import huggingface_hub

    if not hasattr(huggingface_hub, "cached_download"):
        huggingface_hub.cached_download = huggingface_hub.hf_hub_download
    if not hasattr(huggingface_hub, "HfFolder"):
        class HfFolder:
            @staticmethod
            def get_token():
                return None

        huggingface_hub.HfFolder = HfFolder

    for name in ("torchvision", "torchvision.transforms", "torchvision.utils",
                 "loguru", "decord", "imageio.v3"):
        if name not in sys.modules:
            try:
                __import__(name)
            except ImportError:
                _stub_module(name)
    if isinstance(sys.modules.get("loguru"), types.ModuleType) and not hasattr(
            sys.modules["loguru"], "logger"):
        sys.modules["loguru"].logger = logging.getLogger("loguru")

    if _REFERENCE not in sys.path:
        sys.path.insert(0, _REFERENCE)
    _initialized = True


def tiny_unet3d_kwargs():
    """A small UNet3D config shared by parity tests (reference arg names)."""
    return dict(
        sample_size=32,
        in_channels=4,
        out_channels=4,
        cross_attention_dim=768,
        attention_head_dim=8,
        block_out_channels=(32, 64, 64, 64),
        layers_per_block=1,
        norm_num_groups=8,
        use_inflated_groupnorm=False,
        use_motion_module=True,
        motion_module_resolutions=(1, 2, 4, 8),
        motion_module_type="Vanilla",
        motion_module_kwargs=dict(
            num_attention_heads=4,
            num_transformer_block=1,
            attention_block_types=["Temporal_Self", "Temporal_Self"],
            temporal_position_encoding=True,
            temporal_position_encoding_max_len=24,
            temporal_attention_dim_div=1,
            zero_initialize=True,
        ),
        unet_use_cross_frame_attention=False,
        unet_use_temporal_attention=False,
        use_fps_condition=True,
        use_first_frame_mask_condition_concat=True,
    )
