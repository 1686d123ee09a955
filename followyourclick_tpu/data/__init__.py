from followyourclick_tpu.data.dataset import (  # noqa: F401
    WebVidDataset,
    get_moved_area_mask,
)
