"""I/O helpers (parity: reference utils/io_utils.py misc surface —
file listing, json/pickle round-trips, base64 image codecs, image
grids; the resize family lives in utils/image.py and RLE in
data/rle.py)."""
from __future__ import annotations

import base64
import io
import json
import os
import os.path as osp
import pickle
from typing import Dict, List, Optional, Union

import numpy as np

IMG_EXT = {'.bmp', '.jpg', '.jpeg', '.png', '.webp'}


def find_all_imgs(img_dir: str, abs_path: bool = False) -> List[str]:
    out = []
    for f in sorted(os.listdir(img_dir)):
        if osp.splitext(f)[1].lower() in IMG_EXT:
            out.append(osp.join(img_dir, f) if abs_path else f)
    return out


def json2dict(path: str) -> Dict:
    with open(path, 'r', encoding='utf8') as f:
        return json.load(f)


def dict2json(obj: Dict, path: str) -> None:
    with open(path, 'w', encoding='utf8') as f:
        json.dump(obj, f, ensure_ascii=False)


def load_pickle(path: str):
    with open(path, 'rb') as f:
        return pickle.load(f)


def save_pickle(obj, path: str) -> None:
    with open(path, 'wb') as f:
        pickle.dump(obj, f)


def img2b64(img: np.ndarray) -> str:
    from PIL import Image
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format='PNG')
    return base64.b64encode(buf.getvalue()).decode('utf-8')


def b64_2img(b64: str) -> np.ndarray:
    from PIL import Image
    return np.array(Image.open(io.BytesIO(base64.b64decode(b64))))


def save_encoded_image(b64_image: str, output_path: str) -> None:
    with open(output_path, 'wb') as f:
        f.write(base64.b64decode(b64_image))


def imglist2grid(imgs: List[np.ndarray], grid_size: int = 416,
                 ncols: Optional[int] = None) -> Optional[np.ndarray]:
    """Tile images into a grid (training-viz hook helper; parity:
    utils/io_utils.py imglist2grid)."""
    import cv2
    if not imgs:
        return None
    n = len(imgs)
    if ncols is None:
        ncols = int(np.ceil(np.sqrt(n)))
    nrows = int(np.ceil(n / ncols))
    cell = grid_size
    canvas = np.zeros((nrows * cell, ncols * cell, 3), np.uint8)
    for i, im in enumerate(imgs):
        h, w = im.shape[:2]
        s = cell / max(h, w)
        nh, nw = int(h * s), int(w * s)
        r = cv2.resize(im, (nw, nh))
        y, x = (i // ncols) * cell, (i % ncols) * cell
        canvas[y:y + nh, x:x + nw] = r if r.ndim == 3 \
            else r[..., None].repeat(3, -1)
    return canvas
