"""`detector: maskrcnn` — the reference's COCO Mask R-CNN option.

Parity: anime_3dkenburns/kenburns_effect.py:843-886
(`maskrcnn_forward`: torchvision `maskrcnn_resnet50_fpn`, every
class kept above score 0.3, mask probability > 0.5) and the
`detector: maskrcnn` line advertised in configs/3dkenburns_sam.yaml.
The network is the native fixed-shape Flax implementation
(models/maskrcnn.py); torchvision's GeneralizedRCNNTransform is
reproduced host-side (min-side 800 / max-side 1333 resize, /32
padded canvas — one jitted program per canvas bucket).

Reference quirk, transcribed deliberately: `maskrcnn_forward` feeds
`img_tensor[0, [2, 0, 1]]` — channel order (R, B, G) of the BGR
frame, not RGB (kenburns_effect.py:877). We reproduce it so masks
match the reference's behavior with real weights.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..instances import Instances
from ..models.maskrcnn import (MRCNN_MEAN, MRCNN_STD, MaskRCNN,
                               convert_maskrcnn, paste_masks)
from ..utils import LOGGER


def normalize_pad(canvas_u8: jnp.ndarray, image_hw: jnp.ndarray
                  ) -> jnp.ndarray:
    """uint8 /32-canvas → normalized f32 with a ZERO pad band.

    torchvision's GeneralizedRCNNTransform normalizes FIRST
    (transform.normalize) and batch_images zero-pads AFTER, so the
    pad band the backbone sees is 0.0 — not (0 - mean)/std. Includes
    the reference's (R, B, G) channel quirk (kenburns_effect.py:877:
    ``img_tensor[0, [2, 0, 1]]`` of the BGR frame)."""
    x = canvas_u8.astype(jnp.float32) / 255.0
    x = x[..., jnp.asarray([2, 0, 1])]
    x = (x - jnp.asarray(MRCNN_MEAN)) / jnp.asarray(MRCNN_STD)
    yy = jnp.arange(canvas_u8.shape[0])[:, None] < image_hw[0]
    xx = jnp.arange(canvas_u8.shape[1])[None, :] < image_hw[1]
    return jnp.where((yy & xx)[..., None], x, 0.0)


class MaskRCNNDetector:
    """img → Instances, pluggable into KenBurnsPipeline."""

    def __init__(self, capacity: int = 16, min_size: int = 800,
                 max_size: int = 1333, score_thr: float = 0.3,
                 model: Optional[MaskRCNN] = None, seed: int = 0):
        self.model = model if model is not None else MaskRCNN()
        self.capacity = capacity
        self.min_size = min_size
        self.max_size = max_size
        self.score_thr = score_thr
        self._seed = seed
        self._variables = None
        self._jit: Dict[Tuple[int, int], object] = {}

    # ------------------------------------------------------------------
    def _ensure_variables(self, ch: int, cw: int):
        if self._variables is None:
            LOGGER.warning('MaskRCNNDetector: initializing RANDOM '
                           'weights (no checkpoint loaded)')
            from ..utils.env import jit_init
            self._variables = jit_init(
                self.model, jax.random.PRNGKey(self._seed),
                jnp.zeros((1, ch, cw, 3), jnp.float32))
        return self._variables

    def load_torch_checkpoint(self, path: str) -> None:
        import torch
        sd = torch.load(path, map_location='cpu')
        if isinstance(sd, dict) and 'model' in sd:
            sd = sd['model']
        self._variables = convert_maskrcnn(sd)

    # ------------------------------------------------------------------
    def _program(self, ch: int, cw: int):
        if (ch, cw) not in self._jit:
            model = self.model

            @jax.jit
            def fn(variables, canvas_u8, image_hw):
                x = normalize_pad(canvas_u8, image_hw)
                return model.apply(variables, x[None], image_hw)
            self._jit[(ch, cw)] = fn
        return self._jit[(ch, cw)]

    def infer(self, img, pred_score_thr: Optional[float] = None,
              **kw) -> Instances:
        import cv2
        if isinstance(img, str):
            img = cv2.imread(img)
        thr = self.score_thr if pred_score_thr is None \
            else pred_score_thr
        h, w = img.shape[:2]
        scale = min(self.min_size / min(h, w),
                    self.max_size / max(h, w))
        nh, nw = int(round(h * scale)), int(round(w * scale))
        ch, cw = -(-nh // 32) * 32, -(-nw // 32) * 32
        resized = cv2.resize(img, (nw, nh),
                             interpolation=cv2.INTER_LINEAR)
        canvas = np.zeros((ch, cw, 3), np.uint8)
        canvas[:nh, :nw] = resized

        variables = self._ensure_variables(ch, cw)
        out = self._program(ch, cw)(
            variables, jnp.asarray(canvas),
            jnp.asarray([nh, nw], jnp.float32))
        boxes = np.asarray(out['boxes']) / scale
        scores = np.asarray(out['scores'])
        valid = np.asarray(out['valid']) & (scores > thr)
        mlog = np.asarray(out['masks'])

        order = np.argsort(-np.where(valid, scores, -1.0)
                           )[:self.capacity]
        order = order[valid[order]]
        boxes = np.clip(boxes[order],
                        0, [w, h, w, h]).astype(np.float32)
        masks = paste_masks(mlog[order], boxes, h, w)

        cap = Instances.empty(self.capacity, h, w)
        n = len(order)
        xywh = np.concatenate([boxes[:, :2],
                               boxes[:, 2:] - boxes[:, :2]], 1)
        return Instances(
            masks=cap.masks.at[:n].set(jnp.asarray(masks)),
            bboxes=cap.bboxes.at[:n].set(jnp.asarray(np.round(xywh))),
            scores=cap.scores.at[:n].set(
                jnp.asarray(scores[order])),
            valid=cap.valid.at[:n].set(True))

    __call__ = infer
