"""COCO-format export helpers (RLE masks, annotation records).

Parity: reference utils/io_utils.py:327-352 (mask2rle) and the
annotation-export path animeinsseg/__init__.py:586-621."""
from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np


def mask2rle(mask: np.ndarray, decode_for_json: bool = True) -> Dict:
    """Binary mask → COCO compressed RLE (pure-numpy codec in
    data/rle.py; pycocotools-format compatible)."""
    from . import rle as rle_codec
    return rle_codec.encode(mask > 0)


def rle2mask(rle: Dict) -> np.ndarray:
    from . import rle as rle_codec
    return rle_codec.decode(rle)


def instances_to_coco(instances, image_id: int, file_name: str,
                      hw: Tuple[int, int], obj_id_start: int = 0,
                      tags: List[str] = None
                      ) -> Tuple[Dict, List[Dict]]:
    """Instances pytree → (image meta, annotation list)."""
    import jax
    masks = np.asarray(jax.device_get(instances.masks))
    bboxes = np.asarray(jax.device_get(instances.bboxes))
    scores = np.asarray(jax.device_get(instances.scores))
    valid = np.asarray(jax.device_get(instances.valid))

    h, w = hw
    image_meta = {'id': image_id, 'height': h, 'width': w,
                  'file_name': file_name}
    anns = []
    oid = obj_id_start
    for i in range(len(valid)):
        if not valid[i]:
            continue
        m = masks[i]
        anns.append({
            'id': oid, 'category_id': 0, 'iscrowd': 0,
            'score': float(scores[i]),
            'segmentation': mask2rle(m),
            'image_id': image_id,
            'area': int(m.sum()),
            'tag_string': (tags[i] if tags and i < len(tags) else ''),
            'tag_string_character': '',
            'bbox': [float(x) for x in bboxes[i]],
        })
        oid += 1
    return image_meta, anns
