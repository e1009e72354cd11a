"""Danbooru tagger adapter (SwinV2 WD tagger).

Parity: reference utils/booru_tagger.py (Tagger.label_cv2_bgr: runs
wd-v1-4-swinv2-tagger-v2 in onnxruntime, thresholds tags at 0.5 and
returns the character subset separately; make_square pads to a white
square at the original resolution, smart_resize then goes AREA when
shrinking / CUBIC when growing — booru_tagger.py:15-38).

Backends:
- 'flax':  the native SwinV2 port (models/swinv2.py) — the TPU path.
           Loads timm-format torch checkpoints (wd-swinv2-tagger-v3);
           random-init with a warning when no checkpoint is given.
- 'onnx':  the original model.onnx via onnxruntime when available.
- 'stub':  deterministic pseudo-tags — TEST-ONLY. Reached only with
           an explicit ``strict=False``: by default a Tagger with no
           usable backend raises instead of fabricating tags (a
           mis-pathed checkpoint in production must fail loudly).

The tag CSV (selected_tags.csv next to the model) follows the WD
tagger format: columns name, category (0 general / 4 character /
9 rating)."""
from __future__ import annotations

import csv
import os.path as osp
from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..utils import LOGGER


def _load_tags(csv_path: str) -> Tuple[List[str], List[int]]:
    names, cats = [], []
    with open(csv_path, newline='', encoding='utf8') as f:
        for row in csv.DictReader(f):
            names.append(row['name'])
            cats.append(int(row.get('category', 0)))
    return names, cats


def make_square(img_bgr: np.ndarray, target_size: int) -> np.ndarray:
    """White-pad to a square of max(longest side, target_size)
    (booru_tagger.py:15-29)."""
    h, w = img_bgr.shape[:2]
    size = max(h, w, target_size)
    top = (size - h) // 2
    left = (size - w) // 2
    out = np.full((size, size, 3), 255, img_bgr.dtype)
    out[top:top + h, left:left + w] = img_bgr
    return out


def smart_resize(img: np.ndarray, size: int) -> np.ndarray:
    """AREA when shrinking, CUBIC when growing (booru_tagger.py:32-38)."""
    import cv2
    if img.shape[0] > size:
        return cv2.resize(img, (size, size), interpolation=cv2.INTER_AREA)
    if img.shape[0] < size:
        return cv2.resize(img, (size, size), interpolation=cv2.INTER_CUBIC)
    return img


class Tagger:
    """label_cv2_bgr(img) → (tags, character_tags); like the
    reference, the first list includes the character tags too."""

    def __init__(self, model_path: str = '', backend: str = 'auto',
                 general_thr: float = 0.5, character_thr: float = 0.5,
                 input_size: int = 448,
                 swin_kwargs: Optional[dict] = None, seed: int = 0,
                 strict: bool = True):
        self.strict = strict
        self.general_thr = general_thr
        self.character_thr = character_thr
        self.input_size = input_size
        self.names: List[str] = []
        self.cats: List[int] = []
        self._sess = None
        self._net = None
        self._variables = None
        self._fwd = None
        self.backend = backend

        if model_path:
            csv_path = osp.join(osp.dirname(model_path),
                                'selected_tags.csv')
            if osp.exists(csv_path):
                self.names, self.cats = _load_tags(csv_path)

        if backend in ('auto', 'onnx') and model_path \
                and model_path.endswith('.onnx') \
                and osp.exists(model_path):
            try:
                import onnxruntime as ort
                self._sess = ort.InferenceSession(
                    model_path, providers=['CPUExecutionProvider'])
                self.backend = 'onnx'
                return
            except ImportError:
                LOGGER.warning('onnxruntime unavailable')
        if backend == 'onnx' and self._sess is None:
            raise RuntimeError('onnx backend requested but unavailable')

        if backend == 'flax' or (backend == 'auto' and model_path
                                 and not model_path.endswith('.onnx')
                                 and osp.exists(model_path)):
            from .swinv2 import SwinV2, convert_swinv2
            kw = dict(swin_kwargs or {})
            if self.names and 'num_classes' not in kw:
                kw['num_classes'] = len(self.names)
            self._net = SwinV2(**kw)
            if model_path and osp.exists(model_path) \
                    and not model_path.endswith('.onnx'):
                from .convert import load_torch_ckpt
                self._variables = convert_swinv2(
                    load_torch_ckpt(model_path),
                    depths=self._net.depths)
            else:
                if self.strict:
                    raise RuntimeError(
                        'Tagger(strict=True): flax backend has no '
                        'checkpoint to load — random weights would '
                        'fabricate tags.')
                LOGGER.warning('Tagger: RANDOM SwinV2 init '
                               '(no checkpoint)')
                import jax
                import jax.numpy as jnp
                s = self.input_size
                from ..utils.env import jit_init
                self._variables = jit_init(
                    self._net, jax.random.PRNGKey(seed),
                    jnp.zeros((1, s, s, 3), jnp.float32))
            import jax
            self._fwd = jax.jit(
                lambda v, x: jax.nn.sigmoid(self._net.apply(v, x)))
            self.backend = 'flax'
            return

        if self.strict:
            raise RuntimeError(
                'Tagger(strict=True): no usable model backend — '
                f'model_path={model_path!r}, backend={backend!r}. '
                'The deterministic stub would fabricate tags; pass '
                'strict=False only for plumbing tests.')
        self.backend = 'stub'
        LOGGER.warning('Tagger: using deterministic stub backend '
                       '(no model available)')

    # ------------------------------------------------------------------
    def _prep(self, img_bgr: np.ndarray) -> np.ndarray:
        img = make_square(img_bgr, self.input_size)
        img = smart_resize(img, self.input_size)
        return img[None].astype(np.float32)

    def _split(self, probs: Sequence[float]
               ) -> Tuple[List[str], List[str]]:
        tags, character = [], []
        for p, name, cat in zip(probs, self.names, self.cats):
            if cat == 9:          # rating rows are never tag output
                continue
            if p > self.general_thr:
                tags.append(name)
                if cat == 4 and p > self.character_thr:
                    character.append(name)
        return tags, character

    def label_cv2_bgr(self, img_bgr: np.ndarray
                      ) -> Tuple[List[str], List[str]]:
        if self.backend == 'onnx' and self._sess is not None:
            x = self._prep(img_bgr)
            inp = self._sess.get_inputs()[0].name
            probs = self._sess.run(None, {inp: x})[0][0]
            return self._split(probs)

        if self.backend == 'flax':
            x = self._prep(img_bgr)
            probs = np.asarray(self._fwd(self._variables, x))[0]
            if not self.names:
                self.names = [f'tag_{i}' for i in range(len(probs))]
                self.cats = [0] * len(probs)
            return self._split(probs)

        # stub: deterministic tags from image statistics, so prompts
        # and caching behave end-to-end without any model
        mean = img_bgr.reshape(-1, img_bgr.shape[-1]).mean(0)
        tone = ['dark', 'muted', 'bright'][int(mean.mean() // 86)]
        hue = ['blue_theme', 'green_theme', 'red_theme'][
            int(np.argmax(mean))]
        return [f'{tone}', f'{hue}', 'solo'], []
