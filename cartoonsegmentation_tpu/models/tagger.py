"""Danbooru tagger adapter (SwinV2 WD tagger).

Parity: reference utils/booru_tagger.py (Tagger.label_cv2_bgr: runs
wd-v1-4-swinv2-tagger-v2 in onnxruntime, thresholds general tags at
0.5 and returns character tags separately).

This environment has no onnxruntime and no network access, so the
adapter has three backends:
- 'onnx':  the original model.onnx via onnxruntime when available
- 'flax':  reserved for the SwinV2 Flax port (round 2)
- 'stub':  deterministic pseudo-tags for pipeline integration tests

The tag CSV (selected_tags.csv next to the onnx file) follows the WD
tagger format: columns name, category (0 general / 4 character).
"""
from __future__ import annotations

import csv
import os.path as osp
from typing import List, Optional, Tuple

import numpy as np

from ..utils import LOGGER


def _load_tags(csv_path: str) -> Tuple[List[str], List[int]]:
    names, cats = [], []
    with open(csv_path, newline='', encoding='utf8') as f:
        for row in csv.DictReader(f):
            names.append(row['name'])
            cats.append(int(row.get('category', 0)))
    return names, cats


class Tagger:
    """label_cv2_bgr(img) → (general_tags, character_tags)."""

    def __init__(self, model_path: str = '', backend: str = 'auto',
                 general_thr: float = 0.5, character_thr: float = 0.5):
        self.general_thr = general_thr
        self.character_thr = character_thr
        self.names: List[str] = []
        self.cats: List[int] = []
        self._sess = None
        self.backend = backend

        if backend in ('auto', 'onnx') and model_path \
                and osp.exists(model_path):
            try:
                import onnxruntime as ort
                self._sess = ort.InferenceSession(
                    model_path, providers=['CPUExecutionProvider'])
                csv_path = osp.join(osp.dirname(model_path),
                                    'selected_tags.csv')
                if osp.exists(csv_path):
                    self.names, self.cats = _load_tags(csv_path)
                self.backend = 'onnx'
                return
            except ImportError:
                LOGGER.warning('onnxruntime unavailable')
        if backend == 'onnx':
            raise RuntimeError('onnx backend requested but unavailable')
        self.backend = 'stub'
        LOGGER.warning('Tagger: using deterministic stub backend '
                       '(no onnxruntime / model available)')

    # ------------------------------------------------------------------
    def _prep(self, img_bgr: np.ndarray, size: int = 448) -> np.ndarray:
        import cv2
        h, w = img_bgr.shape[:2]
        s = size / max(h, w)
        nh, nw = int(h * s), int(w * s)
        canvas = np.full((size, size, 3), 255, np.uint8)
        canvas[(size - nh) // 2:(size - nh) // 2 + nh,
               (size - nw) // 2:(size - nw) // 2 + nw] = cv2.resize(
            img_bgr, (nw, nh))
        return canvas[None].astype(np.float32)

    def label_cv2_bgr(self, img_bgr: np.ndarray
                      ) -> Tuple[List[str], List[str]]:
        if self.backend == 'onnx' and self._sess is not None:
            x = self._prep(img_bgr)
            inp = self._sess.get_inputs()[0].name
            probs = self._sess.run(None, {inp: x})[0][0]
            general, character = [], []
            for p, name, cat in zip(probs, self.names, self.cats):
                if cat == 4 and p > self.character_thr:
                    character.append(name)
                elif cat == 0 and p > self.general_thr:
                    general.append(name)
            return general, character

        # stub: deterministic tags from image statistics, so prompts
        # and caching behave end-to-end without the onnx model
        mean = img_bgr.reshape(-1, img_bgr.shape[-1]).mean(0)
        tone = ['dark', 'muted', 'bright'][int(mean.mean() // 86)]
        hue = ['blue_theme', 'green_theme', 'red_theme'][
            int(np.argmax(mean))]
        return [f'{tone}', f'{hue}', 'solo'], []
