"""Fixed-capacity instance container (pytree).

TPU-native redesign of the reference ``AnimeInstances``
(animeinsseg/anime_instances.py:31-298): instead of a ragged,
host-mutable bag of tensors, instances live in a **static-capacity**
pytree — masks (N,H,W), bboxes (N,4) xywh, scores (N,), valid (N,) —
so every consumer (depth adjustment, dedup, mask union, rendering) is
a single jitted graph with no shape dynamism. Invalid slots are
all-zero and masked out by ``valid``.

Tags are host-side strings and deliberately *not* part of the pytree.
"""
from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from .utils.constants import get_color


@struct.dataclass
class Instances:
    """Instance set with static capacity N over an (H, W) image."""
    masks: jnp.ndarray    # (N, H, W) bool
    bboxes: jnp.ndarray   # (N, 4) float32, xywh (x, y, w, h)
    scores: jnp.ndarray   # (N,) float32
    valid: jnp.ndarray    # (N,) bool

    # ------------------------------------------------------------------
    @staticmethod
    def empty(capacity: int, h: int, w: int) -> 'Instances':
        return Instances(
            masks=jnp.zeros((capacity, h, w), jnp.bool_),
            bboxes=jnp.zeros((capacity, 4), jnp.float32),
            scores=jnp.zeros((capacity,), jnp.float32),
            valid=jnp.zeros((capacity,), jnp.bool_),
        )

    @staticmethod
    def from_numpy(masks: np.ndarray, bboxes: np.ndarray,
                   scores: Optional[np.ndarray] = None,
                   capacity: Optional[int] = None) -> 'Instances':
        """Build from ragged host arrays, padding to ``capacity``."""
        n = 0 if masks is None else len(masks)
        if capacity is None:
            capacity = max(n, 1)
        if n == 0:
            h, w = (1, 1) if masks is None else masks.shape[1:3]
            return Instances.empty(capacity, h, w)
        h, w = masks.shape[1:3]
        if scores is None:
            scores = np.ones((n,), np.float32)
        out = Instances.empty(capacity, h, w)
        k = min(n, capacity)
        return Instances(
            masks=out.masks.at[:k].set(jnp.asarray(masks[:k], jnp.bool_)),
            bboxes=out.bboxes.at[:k].set(jnp.asarray(bboxes[:k], jnp.float32)),
            scores=out.scores.at[:k].set(jnp.asarray(scores[:k], jnp.float32)),
            valid=out.valid.at[:k].set(True),
        )

    # ------------------------------------------------------------------
    @property
    def capacity(self) -> int:
        return self.masks.shape[0]

    @property
    def shape_hw(self):
        return self.masks.shape[1], self.masks.shape[2]

    def count(self) -> jnp.ndarray:
        return jnp.sum(self.valid.astype(jnp.int32))

    def is_empty_host(self) -> bool:
        """Host-side emptiness check (pulls one scalar)."""
        return int(jax.device_get(self.count())) == 0

    # ------------------------------------------------------------------
    def compose_masks(self) -> jnp.ndarray:
        """Union of all valid masks, (H, W) bool.

        Parity: anime_instances.py:282-298 (compose_masks).
        """
        m = self.masks & self.valid[:, None, None]
        return jnp.any(m, axis=0)

    def masked_areas(self) -> jnp.ndarray:
        return jnp.sum(self.masks, axis=(1, 2)).astype(jnp.float32) \
            * self.valid.astype(jnp.float32)

    # ------------------------------------------------------------------
    def remove_duplicated(self, overlap_thr: float = 0.8) -> 'Instances':
        """Drop masks mostly covered by the union of larger ones.

        Parity: anime_instances.py:84-127 — sort by area descending,
        walk the list keeping a running union canvas; a mask whose
        intersection with the canvas exceeds ``overlap_thr`` of its own
        area is invalidated; kept masks are OR-ed into the canvas.
        Implemented as a `lax.scan` (static capacity), returned in the
        sorted order like the reference.
        """
        areas = self.masked_areas()
        order = jnp.argsort(-areas)  # invalid (area 0) sink to the end
        masks = self.masks[order]
        valid = self.valid[order]

        def step(canvas, xs):
            mask, v, area, is_first = xs
            inter = jnp.sum(canvas & mask).astype(jnp.float32)
            dup = (inter / jnp.maximum(area, 1.0)) > overlap_thr
            keep = v & (is_first | ~dup)
            canvas = canvas | (mask & keep)
            return canvas, keep

        n = self.capacity
        is_first = jnp.arange(n) == 0
        canvas0 = jnp.zeros(self.shape_hw, jnp.bool_)
        _, keep = jax.lax.scan(
            step, canvas0, (masks, valid, areas[order], is_first))
        return Instances(
            masks=masks & keep[:, None, None],
            bboxes=self.bboxes[order] * keep[:, None],
            scores=self.scores[order] * keep,
            valid=keep,
        )

    # ------------------------------------------------------------------
    def resize(self, h: int, w: int, mask_thr: float = 0.3) -> 'Instances':
        """Resize masks to (h, w) and rescale bboxes.

        Parity: anime_instances.py:268-280 — the reference resizes
        with F.interpolate(mode='area') (its default), which on the
        kenburns upscale path behaves nearest-like with hard edges;
        'linear' here dilated boundaries by 1-2 px. Upscales use
        nearest to match; downscales use linear (closest jax analog
        of area averaging) with the 0.3 threshold. (The reference's
        axis mix-up in bbox scaling is fixed here — it was harmless
        upstream because aspect ratio is always preserved.)
        """
        oh, ow = self.shape_hw
        if (oh, ow) == (h, w):
            return self
        method = 'nearest' if (h >= oh and w >= ow) else 'linear'
        m = jax.image.resize(self.masks.astype(jnp.float32),
                             (self.capacity, h, w), method=method)
        sx, sy = w / ow, h / oh
        scale = jnp.array([sx, sy, sx, sy], jnp.float32)
        return self.replace(
            masks=(m > mask_thr) & self.valid[:, None, None],
            bboxes=jnp.round(self.bboxes * scale),
        )

    # ------------------------------------------------------------------
    def draw(self, img: np.ndarray, draw_bbox: bool = True,
             draw_ins_mask: bool = True, tags: Optional[List[str]] = None,
             mask_alpha: float = 0.75,
             draw_contour: bool = False) -> np.ndarray:
        """Host-side visualization (numpy/cv2). Parity:
        anime_instances.py:131-194 (draw_instances; the reference
        accepts draw_ins_contour but never renders it — here the
        contour option actually draws the mask outlines)."""
        import cv2
        masks = np.asarray(jax.device_get(self.masks))
        bboxes = np.asarray(jax.device_get(self.bboxes))
        valid = np.asarray(jax.device_get(self.valid))

        drawed = img.copy()
        im_h, im_w = img.shape[:2]
        mh, mw = masks.shape[1:3]
        if (mh, mw) != (im_h, im_w):
            drawed = cv2.resize(drawed, (mw, mh), interpolation=cv2.INTER_AREA)
            im_h, im_w = mh, mw

        idxs = [i for i in range(len(valid)) if valid[i]]
        if draw_bbox:
            lw = max(round(sum(drawed.shape) / 2 * 0.003), 2)
            for i in idxs:
                x, y, w, h = bboxes[i]
                p1, p2 = (int(x), int(y)), (int(x + w), int(y + h))
                cv2.rectangle(drawed, p1, p2, get_color(i), thickness=lw,
                              lineType=cv2.LINE_AA)
        if draw_ins_mask:
            drawed = drawed.astype(np.float32)
            for i in idxs:
                color = np.array(get_color(i), np.float32)
                a = (mask_alpha * masks[i].astype(np.float32))[..., None]
                drawed = drawed * (1 - a) + a * color
            drawed = drawed.astype(np.uint8)
        if draw_contour:
            lw = max(round(sum(drawed.shape) / 2 * 0.002), 2)
            for i in idxs:
                cs, _ = cv2.findContours(
                    masks[i].astype(np.uint8), cv2.RETR_EXTERNAL,
                    cv2.CHAIN_APPROX_SIMPLE)
                cv2.drawContours(drawed, cs, -1, get_color(i),
                                 thickness=lw, lineType=cv2.LINE_AA)
        if tags:
            lw = max(round(sum(drawed.shape) / 2 * 0.002), 2)
            for i in idxs:
                if i < len(tags) and tags[i]:
                    x, y = int(bboxes[i][0]), int(bboxes[i][1]) + 14
                    cv2.putText(drawed, tags[i][:60], (x, y), 0, lw / 3,
                                get_color(i), thickness=max(lw - 1, 1),
                                lineType=cv2.LINE_AA)
        return drawed
