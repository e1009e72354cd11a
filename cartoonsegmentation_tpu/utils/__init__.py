from .logger import LOGGER, set_logging  # noqa: F401
from .constants import (  # noqa: F401
    CATEGORIES, PALETTE, get_color,
    DEFAULT_DETECTOR_CKPT, DEFAULT_DEPTHREFINE_CKPT,
    DEFAULT_INPAINTNET_CKPT, DEPTH_ZOE_CKPT,
)
from .image import (  # noqa: F401
    scaledown_size, scaledown_maxsize, resize_pad, square_pad_resize,
    pad2divisor, resize_bilinear, resize_bilinear_ac, crop_center_resize,
    to_float_chw,
)
