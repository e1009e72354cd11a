"""Mono-depth training data pipeline + evaluation metrics (ZoeDepth).

Parity: reference depth_modules/zoedepth/data/data_mono.py
(DataLoadPreprocess: kb-crop, random rotate, random crop, flip,
gamma/brightness/color jitter, random translate) and
depth_modules/zoedepth/utils/misc.py:159-245 (compute_errors /
compute_metrics with garg/eigen eval crops).

TPU-first split: all augmentation is host-side numpy (cheap, ragged)
producing fixed-shape batches; validity is a mask channel so the
device loss/metrics never see dynamic shapes. The split-file format is
the reference's: ``image_rel depth_rel focal`` per line."""
from __future__ import annotations

import os.path as osp
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

EVAL_METRIC_KEYS = ('a1', 'a2', 'a3', 'abs_rel', 'rmse', 'log_10',
                    'rmse_log', 'silog', 'sq_rel')


# ---------------------------------------------------------------------------
# metrics (numpy, masked — zoedepth/utils/misc.py:159-199)
# ---------------------------------------------------------------------------

def compute_depth_errors(gt: np.ndarray, pred: np.ndarray
                         ) -> Dict[str, float]:
    """Nine standard mono-depth metrics over pre-masked 1-D values."""
    gt = np.asarray(gt, np.float64)
    pred = np.asarray(pred, np.float64)
    thresh = np.maximum(gt / pred, pred / gt)
    d = {}
    d['a1'] = float((thresh < 1.25).mean())
    d['a2'] = float((thresh < 1.25 ** 2).mean())
    d['a3'] = float((thresh < 1.25 ** 3).mean())
    d['abs_rel'] = float(np.mean(np.abs(gt - pred) / gt))
    d['sq_rel'] = float(np.mean((gt - pred) ** 2 / gt))
    d['rmse'] = float(np.sqrt(np.mean((gt - pred) ** 2)))
    err_log = np.log(gt) - np.log(pred)
    d['rmse_log'] = float(np.sqrt(np.mean(err_log ** 2)))
    err = np.log(pred) - np.log(gt)
    d['silog'] = float(np.sqrt(np.mean(err ** 2) - np.mean(err) ** 2)
                       * 100.0)
    d['log_10'] = float(np.mean(np.abs(np.log10(gt) - np.log10(pred))))
    return d


def eval_mask(h: int, w: int, garg_crop: bool = False,
              eigen_crop: bool = True, dataset: str = 'nyu'
              ) -> np.ndarray:
    """Evaluation crop mask (misc.py:226-243)."""
    m = np.zeros((h, w), bool)
    if garg_crop:
        m[int(0.40810811 * h):int(0.99189189 * h),
          int(0.03594771 * w):int(0.96405229 * w)] = True
    elif eigen_crop:
        if dataset == 'kitti':
            m[int(0.3324324 * h):int(0.91351351 * h),
              int(0.0359477 * w):int(0.96405229 * w)] = True
        else:
            m[45:471, 41:601] = True
    else:
        m[:] = True
    return m


def compute_depth_metrics(gt: np.ndarray, pred: np.ndarray,
                          garg_crop: bool = False,
                          eigen_crop: bool = True,
                          dataset: str = 'nyu',
                          min_depth_eval: float = 0.1,
                          max_depth_eval: float = 10.0
                          ) -> Dict[str, float]:
    """gt, pred (H, W) metric depth; pred is resized (align-corners
    bilinear) to gt's shape when needed, clamped, then masked by
    validity ∧ eval crop (misc.py:202-245)."""
    gt = np.asarray(gt, np.float32)
    pred = np.asarray(pred, np.float32)
    if pred.shape != gt.shape:
        import jax.numpy as jnp

        from ..utils import resize_bilinear_ac
        pred = np.asarray(resize_bilinear_ac(
            jnp.asarray(pred)[None, ..., None], *gt.shape)[0, ..., 0])
    pred = np.where(np.isnan(pred), min_depth_eval, pred)
    pred = np.where(np.isinf(pred), max_depth_eval, pred)
    pred = np.clip(pred, min_depth_eval, max_depth_eval)
    valid = (gt > min_depth_eval) & (gt < max_depth_eval)
    valid &= eval_mask(*gt.shape, garg_crop=garg_crop,
                       eigen_crop=eigen_crop, dataset=dataset)
    if not valid.any():
        return {k: float('nan') for k in EVAL_METRIC_KEYS}
    return compute_depth_errors(gt[valid], pred[valid])


# ---------------------------------------------------------------------------
# split-file source + augmentations (data_mono.py DataLoadPreprocess)
# ---------------------------------------------------------------------------

class MonoDepthSource:
    """Reads the reference's split-file format: each line
    ``image_rel depth_rel focal``. Depth pngs are 16-bit, scaled by
    1/1000 (nyu) or 1/256 (kitti)."""

    def __init__(self, data_path: str, gt_path: str, split_file: str,
                 dataset: str = 'nyu', do_kb_crop: bool = False):
        self.data_path = data_path
        self.gt_path = gt_path
        self.dataset = dataset
        self.do_kb_crop = do_kb_crop
        with open(split_file) as f:
            self.lines: List[str] = [ln.strip() for ln in f
                                     if ln.strip()]

    def __len__(self) -> int:
        return len(self.lines)

    def load(self, idx: int) -> Tuple[np.ndarray, np.ndarray, float]:
        """→ (rgb01 (H, W, 3) f32, depth (H, W, 1) f32 metric,
        focal)."""
        import cv2
        parts = self.lines[idx].split()
        focal = float(parts[2]) if len(parts) > 2 else 0.0
        img = cv2.imread(osp.join(self.data_path, parts[0].lstrip('/')),
                         cv2.IMREAD_COLOR)[..., ::-1]
        depth = cv2.imread(osp.join(self.gt_path, parts[1].lstrip('/')),
                           cv2.IMREAD_UNCHANGED)
        if depth.ndim == 3:
            depth = depth[..., 0]
        if self.do_kb_crop:                      # kitti benchmark crop
            h, w = img.shape[:2]
            top, left = h - 352, (w - 1216) // 2
            img = img[top:top + 352, left:left + 1216]
            depth = depth[top:top + 352, left:left + 1216]
        scale = 1000.0 if self.dataset == 'nyu' else 256.0
        return (img.astype(np.float32) / 255.0,
                depth.astype(np.float32)[..., None] / scale, focal)


def rotate_pair(img: np.ndarray, depth: np.ndarray, angle_deg: float
                ) -> Tuple[np.ndarray, np.ndarray]:
    """Image bilinear / depth nearest, like PIL Image.rotate
    (data_mono.py:440-442)."""
    import cv2
    h, w = img.shape[:2]
    M = cv2.getRotationMatrix2D((w / 2 - 0.5, h / 2 - 0.5), angle_deg, 1)
    img_r = cv2.warpAffine(img, M, (w, h), flags=cv2.INTER_LINEAR)
    dep_r = cv2.warpAffine(depth, M, (w, h), flags=cv2.INTER_NEAREST)
    if dep_r.ndim == 2:
        dep_r = dep_r[..., None]
    return img_r, dep_r


def augment_image(img: np.ndarray, rng: np.random.RandomState,
                  dataset: str = 'nyu') -> np.ndarray:
    """Gamma / brightness / per-channel color jitter
    (data_mono.py:496-515)."""
    out = img ** rng.uniform(0.9, 1.1)
    out = out * (rng.uniform(0.75, 1.25) if dataset == 'nyu'
                 else rng.uniform(0.9, 1.1))
    out = out * rng.uniform(0.9, 1.1, size=3)[None, None]
    return np.clip(out, 0, 1).astype(np.float32)


class MonoDepthTrainLoader:
    """Deterministic (seeded) batched train loader with the
    reference's augmentation chain; yields fixed-shape batches:
    images (B, h, w, 3), depth (B, h, w, 1), mask (B, h, w, 1)."""

    def __init__(self, source: MonoDepthSource, batch_size: int,
                 input_hw: Tuple[int, int], seed: int = 0,
                 do_random_rotate: bool = True, degree: float = 2.5,
                 do_flip: bool = True, do_jitter: bool = True,
                 translate_prob: float = 0.0, max_translate: int = 20,
                 min_depth: float = 1e-3, max_depth: float = 10.0):
        self.src = source
        self.bs = batch_size
        self.hw = input_hw
        self.seed = seed
        self.rot = do_random_rotate
        self.degree = degree
        self.flip = do_flip
        self.jitter = do_jitter
        self.translate_prob = translate_prob
        self.max_translate = max_translate
        self.min_depth = min_depth
        self.max_depth = max_depth

    def _sample(self, idx: int, rng: np.random.RandomState
                ) -> Tuple[np.ndarray, np.ndarray]:
        img, depth, _ = self.src.load(idx)
        if self.rot:
            img, depth = rotate_pair(
                img, depth, (rng.rand() - 0.5) * 2 * self.degree)
        h, w = self.hw
        ih, iw = img.shape[:2]
        if ih < h or iw < w:                     # pad small inputs
            img = np.pad(img, ((0, max(h - ih, 0)),
                               (0, max(w - iw, 0)), (0, 0)))
            depth = np.pad(depth, ((0, max(h - ih, 0)),
                                   (0, max(w - iw, 0)), (0, 0)))
            ih, iw = img.shape[:2]
        y = rng.randint(0, ih - h + 1)
        x = rng.randint(0, iw - w + 1)
        img, depth = img[y:y + h, x:x + w], depth[y:y + h, x:x + w]
        if self.translate_prob > 0 \
                and rng.rand() <= self.translate_prob:
            import cv2
            tx = rng.randint(-self.max_translate, self.max_translate + 1)
            ty = rng.randint(-self.max_translate, self.max_translate + 1)
            M = np.float32([[1, 0, tx], [0, 1, ty]])
            img = cv2.warpAffine(img, M, (w, h))
            depth = cv2.warpAffine(depth, M, (w, h),
                                   flags=cv2.INTER_NEAREST)[..., None]
        if self.flip and rng.rand() > 0.5:
            img, depth = img[:, ::-1].copy(), depth[:, ::-1].copy()
        if self.jitter and rng.rand() > 0.5:
            img = augment_image(img, rng, self.src.dataset)
        return img, depth

    def epoch(self, epoch: int = 0) -> Iterator[Dict[str, np.ndarray]]:
        rng = np.random.RandomState(self.seed + epoch)
        order = rng.permutation(len(self.src))
        n_full = len(order) // self.bs
        for b in range(n_full):
            imgs, deps = [], []
            for idx in order[b * self.bs:(b + 1) * self.bs]:
                img, dep = self._sample(int(idx), rng)
                imgs.append(img)
                deps.append(dep)
            depth = np.stack(deps)
            yield {
                'images': np.stack(imgs),
                'depth': depth.astype(np.float32),
                'mask': ((depth > self.min_depth) &
                         (depth < self.max_depth)),
            }


class MixedNYUKITTILoader:
    """Repetitive round-robin over a nyu loader and a kitti loader
    (reference data_mono.py:190-238 RepetitiveRoundRobinDataLoader +
    MixedNYUKITTI): batches alternate nyu/kitti, the shorter stream
    restarts until the longer finishes, and every batch carries a
    scalar 'domain' label (0=nyu, 1=kitti) for the NK router loss."""

    def __init__(self, nyu_loader: 'MonoDepthTrainLoader',
                 kitti_loader: 'MonoDepthTrainLoader'):
        self.loaders = (nyu_loader, kitti_loader)

    def epoch(self, epoch: int = 0) -> Iterator[Dict[str, np.ndarray]]:
        iters = [ld.epoch(epoch) for ld in self.loaders]
        lengths = [len(ld.src) // ld.bs for ld in self.loaders]
        n_rounds = max(lengths)
        restarts = [0, 0]
        for _ in range(n_rounds):
            for d in range(2):
                try:
                    batch = next(iters[d])
                except StopIteration:
                    restarts[d] += 1
                    iters[d] = self.loaders[d].epoch(
                        epoch * 1000 + restarts[d])
                    batch = next(iters[d])
                batch['domain'] = np.int32(d)
                yield batch


def evaluate_depth(predict_fn, source: MonoDepthSource,
                   indices: Optional[Sequence[int]] = None,
                   **metric_kwargs) -> Dict[str, float]:
    """Average compute_depth_metrics over a source split.
    predict_fn(rgb01 (H, W, 3)) → depth (h, w)."""
    idxs = range(len(source)) if indices is None else indices
    acc: Dict[str, float] = {k: 0.0 for k in EVAL_METRIC_KEYS}
    n = 0
    for i in idxs:
        img, depth, _ = source.load(i)
        m = compute_depth_metrics(depth[..., 0],
                                  np.asarray(predict_fn(img)),
                                  dataset=source.dataset,
                                  **metric_kwargs)
        if np.isnan(m['rmse']):
            continue
        for k in EVAL_METRIC_KEYS:
            acc[k] += m[k]
        n += 1
    return {k: v / max(n, 1) for k, v in acc.items()}
