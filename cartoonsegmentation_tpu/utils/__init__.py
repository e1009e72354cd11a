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
from .io import (  # noqa: F401
    find_all_imgs, json2dict, dict2json, img2b64, b64_2img,
    imglist2grid, save_encoded_image,
)
from .env import set_multi_processing  # noqa: F401
from .checkpoint import save_params, load_params  # noqa: F401
