"""Box-prompted SAM segmentation for the `detector: sam` pipeline
option.

Parity: anime_3dkenburns/kenburns_effect.py:848-860 (`forward_sam`:
AnimeInsSeg proposes boxes, `sam.apply_sam(img, boxes)` replaces the
masks) and configs/3dkenburns_sam.yaml:6. The reference imports the
external `segment_anything` package; here the model is the native
Flax implementation (models/sam.py), so the SAM config runs
in-process on the TPU.

TPU-native shape discipline: one encoder program per image bucket
and ONE decoder program for a fixed box capacity — ragged box sets
are padded and masked by `valid`, so interactive use never
recompiles. The host ships the letterboxed canvas as uint8
(normalization on device, as the detector does) and receives the
quarter-resolution mask logits (K x S/4 x S/4 f32 — the official
predictor's native decoder output) rather than full-frame masks:
~4 MB instead of ~64 MB over the link per image.

Deviation from the official postprocess chain, documented: the
official predictor upsamples logits to S, crops the letterbox, then
resizes to the input size; we crop at S/4 and resize once. The two
differ only inside a 4-pixel band at the padded bottom/right edge.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.sam import (SAM, SAM_MEAN, SAM_STD, convert_sam,
                          sam_vit_b, sam_vit_h, sam_vit_l)
from ..utils import LOGGER

_BUILDERS = {'vit_b': sam_vit_b, 'vit_l': sam_vit_l, 'vit_h': sam_vit_h}


def normalize_pad(canvas_u8: jnp.ndarray, image_hw: jnp.ndarray
                  ) -> jnp.ndarray:
    """uint8 letterbox canvas → normalized f32 with a ZERO pad band.

    The official predictor normalizes FIRST and zero-pads after
    (segment_anything Sam.preprocess: ``x = (x - mean) / std`` then
    ``F.pad``), so the letterbox band the ViT's global-attention
    blocks see is 0.0 — not ``-mean/std``. Normalizing the whole
    canvas and masking rows/cols beyond ``image_hw`` reproduces that
    order exactly."""
    x = (canvas_u8.astype(jnp.float32)
         - jnp.asarray(SAM_MEAN)) / jnp.asarray(SAM_STD)
    yy = jnp.arange(canvas_u8.shape[0])[:, None] < image_hw[0]
    xx = jnp.arange(canvas_u8.shape[1])[None, :] < image_hw[1]
    return jnp.where((yy & xx)[..., None], x, 0.0)


class NativeSAM:
    """segment_anything-predictor equivalent, boxes only."""

    def __init__(self, model_type: str = 'vit_b', img_size: int = 1024,
                 capacity: int = 16, seed: int = 0,
                 model: Optional[SAM] = None):
        if model is not None:
            self.model = model
            img_size = model.img_size
        elif model_type in _BUILDERS:
            self.model = _BUILDERS[model_type](img_size)
        else:
            raise ValueError(f'unknown SAM variant {model_type!r}')
        self.img_size = img_size
        self.capacity = capacity
        self._seed = seed
        self._variables = None
        self._encode_fn = None
        self._decode_fn = None
        self._emb = None          # (embedding, image key) cache
        self._emb_key = None

    # ------------------------------------------------------------------
    def _ensure_variables(self):
        if self._variables is None:
            LOGGER.warning('NativeSAM: initializing RANDOM weights '
                           '(no checkpoint loaded)')
            S = self.img_size
            from ..utils.env import jit_init
            self._variables = jit_init(
                self.model, jax.random.PRNGKey(self._seed),
                jnp.zeros((1, S, S, 3), jnp.float32),
                jnp.zeros((1, 4), jnp.float32))
        return self._variables

    def load_torch_checkpoint(self, path: str) -> None:
        """Official sam_vit_*.pth state dict."""
        import torch
        sd = torch.load(path, map_location='cpu')
        self._variables = convert_sam(sd, self.model)
        self._emb_key = None

    # ------------------------------------------------------------------
    def _programs(self):
        if self._encode_fn is None:
            model = self.model

            @jax.jit
            def enc(variables, canvas_u8, image_hw):
                x = normalize_pad(canvas_u8, image_hw)
                return model.apply(variables, x[None],
                                   method=lambda m, v: m.encode(v))[0]

            @jax.jit
            def dec(variables, emb, boxes):
                return model.apply(
                    variables, emb, boxes, False,
                    method=lambda m, e, b, mm: m.decode(e, b,
                                                        multimask=mm))
            self._encode_fn, self._decode_fn = enc, dec
        return self._encode_fn, self._decode_fn

    def _prepare(self, img_bgr: np.ndarray
                 ) -> Tuple[np.ndarray, float, int, int]:
        import cv2
        h, w = img_bgr.shape[:2]
        scale = self.img_size / max(h, w)
        nh, nw = int(round(h * scale)), int(round(w * scale))
        resized = cv2.resize(img_bgr, (nw, nh),
                             interpolation=cv2.INTER_LINEAR)
        canvas = np.zeros((self.img_size, self.img_size, 3), np.uint8)
        canvas[:nh, :nw] = resized[..., ::-1]      # model wants RGB
        return canvas, scale, nh, nw

    # ------------------------------------------------------------------
    def segment_boxes(self, img_bgr: np.ndarray, boxes_xyxy: np.ndarray
                      ) -> Tuple[np.ndarray, np.ndarray]:
        """BGR image + (N,4) xyxy pixel boxes → ((N,H,W) bool masks,
        (N,) predicted IoU). N may exceed the capacity only by
        slicing; fewer boxes are padded (and their outputs zeroed)."""
        import cv2
        h, w = img_bgr.shape[:2]
        boxes_xyxy = np.asarray(boxes_xyxy, np.float32).reshape(-1, 4)
        n = min(len(boxes_xyxy), self.capacity)

        variables = self._ensure_variables()
        enc, dec = self._programs()
        canvas, scale, nh, nw = self._prepare(img_bgr)
        # content key, never id(): CPython reuses freed addresses, so
        # an id()-keyed cache can serve image i's embedding for image
        # i+1. Hashing the CANVAS is exact w.r.t. the encoder input
        # and bounded at img_size^2*3 bytes regardless of source size.
        key = (img_bgr.shape, hash(canvas.tobytes()))
        if self._emb_key != key:
            self._emb = enc(variables, jnp.asarray(canvas),
                            jnp.asarray([nh, nw], jnp.int32))
            self._emb_key = key

        kb = np.zeros((self.capacity, 4), np.float32)
        kb[:, 2:] = 1.0
        kb[:n] = boxes_xyxy[:n] * scale
        logits, iou = dec(variables, self._emb, jnp.asarray(kb))
        logits = np.asarray(logits)               # (K, S/4, S/4)
        iou = np.asarray(iou)

        q = self.model.patch // 4                 # logits stride
        ch, cw = -(-nh // q), -(-nw // q)
        masks = np.zeros((len(boxes_xyxy), h, w), bool)
        ious = np.zeros((len(boxes_xyxy),), np.float32)
        for i in range(n):
            m = cv2.resize(logits[i][:ch, :cw], (w, h),
                           interpolation=cv2.INTER_LINEAR)
            masks[i] = m > 0.0
        ious[:n] = iou[:n]
        return masks, ious


class SamDetector:
    """`detector: sam` — AnimeInsSeg boxes re-masked by SAM
    (kenburns_effect.py:848-860 forward_sam)."""

    def __init__(self, box_detector, sam: Optional[NativeSAM] = None):
        self.box_detector = box_detector
        self.sam = sam if sam is not None else NativeSAM(
            capacity=box_detector.max_instances)

    def load_torch_checkpoints(self, det_ckpt: Optional[str] = None,
                               sam_ckpt: Optional[str] = None) -> None:
        if det_ckpt:
            self.box_detector.load_torch_checkpoint(det_ckpt)
        if sam_ckpt:
            self.sam.load_torch_checkpoint(sam_ckpt)

    def infer(self, img, pred_score_thr: float = 0.3, **kw):
        import cv2
        if isinstance(img, str):
            img = cv2.imread(img)
        ins = self.box_detector.infer(img, pred_score_thr, **kw)
        xywh = np.asarray(ins.bboxes)
        # reference converts to int32 xyxy before prompting (:853-856)
        xyxy = np.stack([xywh[:, 0], xywh[:, 1],
                         xywh[:, 0] + xywh[:, 2],
                         xywh[:, 1] + xywh[:, 3]], 1).astype(np.int32)
        masks, _ = self.sam.segment_boxes(img, xyxy.astype(np.float32))
        valid = np.asarray(ins.valid)
        return ins.replace(
            masks=jnp.asarray(masks & valid[:, None, None]))

    __call__ = infer
