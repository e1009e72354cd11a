"""Zero-shot depth-evaluation dataset zoo (ZoeDepth benchmark suite).

Parity: reference depth_modules/zoedepth/data/{ibims,sun_rgbd_loader,
diml_indoor_test,diml_outdoor_test,diode,hypersim,vkitti,vkitti2,
ddad}.py — one lightweight source per dataset with the reference's
file-discovery globs and depth-decode semantics, plus the per-dataset
evaluation protocol (crop + depth caps) from
depth_modules/zoedepth/utils/config.py:120-229 (DATASETS_CONFIG).

All sources share one protocol: ``len(src)`` and
``src.load(i) -> (rgb01 (H, W, 3) f32, depth (H, W, 1) f32 metric,
focal)``, invalid pixels encoded as depth <= 0 — the convention
``compute_depth_metrics``'s validity mask already applies (the
reference marks invalid depth -1, e.g. ibims.py:68,
sun_rgbd_loader.py:96). This makes every source drop-in for
``evaluate_depth``.
"""
from __future__ import annotations

import glob
import os
import os.path as osp
from typing import Dict, List, Optional, Tuple

import numpy as np

# per-dataset evaluation protocol (reference utils/config.py
# DATASETS_CONFIG): (garg_crop, eigen_crop, do_kb_crop,
# min_depth_eval, max_depth_eval)
EVAL_PROTOCOL: Dict[str, Dict] = {
    'ibims': dict(garg_crop=False, eigen_crop=True, do_kb_crop=False,
                  min_depth_eval=0.0, max_depth_eval=10.0),
    'sunrgbd': dict(garg_crop=False, eigen_crop=True, do_kb_crop=False,
                    min_depth_eval=0.0, max_depth_eval=8.0),
    'diml_indoor': dict(garg_crop=False, eigen_crop=True,
                        do_kb_crop=False, min_depth_eval=0.0,
                        max_depth_eval=10.0),
    'diml_outdoor': dict(garg_crop=True, eigen_crop=False,
                         do_kb_crop=False, min_depth_eval=2.0,
                         max_depth_eval=80.0),
    'diode_indoor': dict(garg_crop=False, eigen_crop=True,
                         do_kb_crop=False, min_depth_eval=1e-3,
                         max_depth_eval=10.0),
    'diode_outdoor': dict(garg_crop=True, eigen_crop=False,
                          do_kb_crop=False, min_depth_eval=1e-3,
                          max_depth_eval=80.0),
    'hypersim_test': dict(garg_crop=False, eigen_crop=True,
                          do_kb_crop=False, min_depth_eval=1e-3,
                          max_depth_eval=80.0),
    'vkitti': dict(garg_crop=True, eigen_crop=False, do_kb_crop=True,
                   min_depth_eval=1e-3, max_depth_eval=80.0),
    'vkitti2': dict(garg_crop=True, eigen_crop=False, do_kb_crop=True,
                    min_depth_eval=1e-3, max_depth_eval=80.0),
    'ddad': dict(garg_crop=True, eigen_crop=False, do_kb_crop=True,
                 min_depth_eval=1e-3, max_depth_eval=80.0),
}


def _imread_rgb01(path: str) -> np.ndarray:
    import cv2
    img = cv2.imread(path, cv2.IMREAD_COLOR)
    if img is None:
        raise FileNotFoundError(path)
    return img[..., ::-1].astype(np.float32) / 255.0


def _imread_raw(path: str) -> np.ndarray:
    import cv2
    d = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    if d is None:
        raise FileNotFoundError(path)
    if d.ndim == 3:
        d = d[..., 0]
    return d


def kb_crop(*arrays: np.ndarray) -> Tuple[np.ndarray, ...]:
    """KITTI-benchmark crop to 352x1216 anchored at the bottom center
    (vkitti2.py:137-148, data_mono.py kb-crop convention)."""
    out = []
    for a in arrays:
        h, w = a.shape[:2]
        top, left = h - 352, (w - 1216) // 2
        out.append(a[top:top + 352, left:left + 1216])
    return tuple(out)


class _PairSource:
    """Base: parallel (image, depth) file lists + a decode hook."""
    dataset = 'generic'
    do_kb_crop = False

    def __init__(self, image_files: List[str]):
        self.image_files = sorted(image_files)
        self.depth_files = [self._depth_path(p) for p in self.image_files]

    def _depth_path(self, image_path: str) -> str:
        raise NotImplementedError

    def _decode_depth(self, depth_path: str) -> np.ndarray:
        raise NotImplementedError

    def __len__(self) -> int:
        return len(self.image_files)

    def load(self, idx: int) -> Tuple[np.ndarray, np.ndarray, float]:
        img = _imread_rgb01(self.image_files[idx])
        depth = self._decode_depth(self.depth_files[idx])
        if depth.ndim == 2:
            depth = depth[..., None]
        depth = depth.astype(np.float32)
        if self.do_kb_crop:
            img, depth = kb_crop(img, depth)
        return img, depth, 0.0


class IBimsSource(_PairSource):
    """iBims-1 (ibims.py:31-73): rgb/ + depth/ + mask_invalid/ +
    mask_transp/ per basename list file; depth uint16 * 50 / 65535,
    pixels failing either mask set invalid (-1)."""
    dataset = 'ibims'

    def __init__(self, root: str, split_file: Optional[str] = None):
        split = split_file or osp.join(root, 'imagelist.txt')
        if osp.exists(split):
            with open(split) as f:
                names = [ln.strip() for ln in f if ln.strip()]
        else:
            names = [osp.splitext(osp.basename(p))[0] for p in
                     sorted(glob.glob(osp.join(root, 'rgb', '*.png')))]
        self.root = root
        self.image_files = [osp.join(root, 'rgb', n + '.png')
                            for n in names]
        self.depth_files = [osp.join(root, 'depth', n + '.png')
                            for n in names]
        self.names = names

    def load(self, idx: int):
        img = _imread_rgb01(self.image_files[idx])
        depth = _imread_raw(self.depth_files[idx]).astype(
            np.float32) * 50.0 / 65535.0
        n = self.names[idx]
        valid = np.ones(depth.shape, bool)
        for sub in ('mask_invalid', 'mask_transp'):
            p = osp.join(self.root, sub, n + '.png')
            if osp.exists(p):
                valid &= _imread_raw(p).astype(bool)
        depth = np.where(valid, depth, -1.0)
        return img, depth[..., None], 0.0


class SunRGBDSource(_PairSource):
    """SUN RGB-D (sun_rgbd_loader.py:84-97): rgb/rgb/*.jpg paired with
    gt/gt/*.png; uint16 / 1000, depth > 8 m invalidated (-1)."""
    dataset = 'sunrgbd'

    def __init__(self, root: str):
        imgs = glob.glob(osp.join(root, 'rgb', 'rgb', '*'))
        super().__init__(imgs)

    def _depth_path(self, p: str) -> str:
        return p.replace(osp.join('rgb', 'rgb'),
                         osp.join('gt', 'gt')).replace('jpg', 'png')

    def _decode_depth(self, p: str) -> np.ndarray:
        d = _imread_raw(p).astype(np.float32) / 1000.0
        return np.where(d > 8.0, -1.0, d)


class DimlIndoorSource(_PairSource):
    """DIML indoor (diml_indoor_test.py:83-98): LR/color/*_c.png →
    LR/depth_filled/*_depth_filled.png; uint16 mm → meters."""
    dataset = 'diml_indoor'

    def __init__(self, root: str):
        imgs = glob.glob(osp.join(root, 'LR', '*', 'color', '*.png'))
        super().__init__(imgs)

    def _depth_path(self, p: str) -> str:
        return p.replace('color', 'depth_filled').replace(
            '_c.png', '_depth_filled.png')

    def _decode_depth(self, p: str) -> np.ndarray:
        return _imread_raw(p).astype(np.float32) / 1000.0


class DimlOutdoorSource(_PairSource):
    """DIML outdoor (diml_outdoor_test.py:80-95): outleft → depthmap;
    uint16 mm → meters."""
    dataset = 'diml_outdoor'

    def __init__(self, root: str):
        imgs = glob.glob(osp.join(root, 'LR', '*', 'outleft', '*.png'))
        super().__init__(imgs)

    def _depth_path(self, p: str) -> str:
        return p.replace('outleft', 'depthmap')

    def _decode_depth(self, p: str) -> np.ndarray:
        return _imread_raw(p).astype(np.float32) / 1000.0


class DiodeSource(_PairSource):
    """DIODE (diode.py:84-108): scene globs */*.png with sibling
    *_depth.npy (meters) + *_depth_mask.npy validity; masked-out
    pixels invalid (-1)."""

    def __init__(self, root: str, indoor: bool = True):
        self.dataset = 'diode_indoor' if indoor else 'diode_outdoor'
        imgs = glob.glob(osp.join(root, '*', '*', '*.png'))
        imgs = [p for p in imgs if not p.endswith('_normal.png')]
        super().__init__(imgs)

    def _depth_path(self, p: str) -> str:
        return p.replace('.png', '_depth.npy')

    def load(self, idx: int):
        img = _imread_rgb01(self.image_files[idx])
        depth = np.load(self.depth_files[idx]).astype(np.float32)
        depth = np.squeeze(depth)
        mask_path = self.depth_files[idx].replace('_depth.npy',
                                                  '_depth_mask.npy')
        if osp.exists(mask_path):
            valid = np.load(mask_path).astype(bool)
            depth = np.where(np.squeeze(valid), depth, -1.0)
        return img, depth[..., None], 0.0


class HypersimSource(_PairSource):
    """Hypersim (hypersim.py:36-122): *_final_preview tonemap jpgs
    paired with *_geometry_hdf5 distance npys; planar distance →
    depth conversion with the fixed 1024x768 f=886.81 image plane
    (hypersim_distance_to_depth, hypersim.py:36-49)."""
    dataset = 'hypersim_test'

    def __init__(self, root: str):
        imgs = glob.glob(osp.join(root, '*', 'images',
                                  'scene_cam_*_final_preview', '*',
                                  'frame.*.tonemap.jpg'))
        if not imgs:
            imgs = glob.glob(osp.join(root, '**', '*.tonemap.jpg'),
                             recursive=True)
        super().__init__(imgs)

    def _depth_path(self, p: str) -> str:
        base = p.replace('_final_preview', '_geometry_hdf5').replace(
            '.tonemap.jpg', '.depth_meters')
        # the shipped dataset stores hdf5 (hypersim.py:105); .npy is
        # the synthetic test layout's fallback
        return base + ('.hdf5' if osp.exists(base + '.hdf5')
                       else '.npy')

    def load(self, idx: int):
        img = _imread_rgb01(self.image_files[idx])
        dp = self.depth_files[idx]
        if dp.endswith('.hdf5'):
            import h5py
            with h5py.File(dp, 'r') as f:
                dist = np.asarray(f['dataset'], np.float32)
        else:
            dist = np.load(dp).astype(np.float32)
        depth = hypersim_distance_to_depth(dist)
        return img, depth[..., None], 0.0


def hypersim_distance_to_depth(dist: np.ndarray) -> np.ndarray:
    """Hypersim stores euclidean distance-to-camera; convert to planar
    depth (hypersim.py:36-49). The image-plane geometry is fixed at
    the dataset's native 1024x768 with focal 886.81."""
    W, H, focal = 1024, 768, 886.81
    h, w = dist.shape[:2]
    px = np.linspace(-0.5 * W + 0.5, 0.5 * W - 0.5, w,
                     dtype=np.float32)[None, :]
    py = np.linspace(-0.5 * H + 0.5, 0.5 * H - 0.5, h,
                     dtype=np.float32)[:, None]
    norm = np.sqrt(px ** 2 + py ** 2 + focal ** 2)
    return dist / norm * focal


class VKitti2Source(_PairSource):
    """Virtual KITTI 2 (vkitti2.py:85-157): rgb jpgs → depth pngs via
    /rgb/→/depth/ + rgb_→depth_ renames; 16-bit cm → meters; kb-crop
    applied per the eval protocol (config.py:208-218)."""
    dataset = 'vkitti2'
    do_kb_crop = True

    def __init__(self, root: str):
        imgs = glob.glob(osp.join(root, 'test', '**', 'rgb', '**',
                                  'rgb_*.jpg'), recursive=True)
        if not imgs:
            imgs = glob.glob(osp.join(root, '**', 'rgb_*.jpg'),
                             recursive=True)
        super().__init__(imgs)

    def _depth_path(self, p: str) -> str:
        return p.replace(f'{os.sep}rgb{os.sep}',
                         f'{os.sep}depth{os.sep}').replace(
            'rgb_', 'depth_').replace('.jpg', '.png')

    def _decode_depth(self, p: str) -> np.ndarray:
        return _imread_raw(p).astype(np.float32) / 100.0


class VKittiSource(_PairSource):
    """Virtual KITTI 1 (vkitti.py:80-126): test_color pngs →
    test_depth via directory rename; 16-bit depth in centimeters →
    meters. (The reference loader leaves the raw cm values unscaled —
    an apparent bug in an otherwise-unused path; vkitti2.py:131-132
    scales /100 for the same encoding, so we scale here too.) kb-crop
    per the eval protocol (config.py:197-206)."""
    dataset = 'vkitti'
    do_kb_crop = True

    def __init__(self, root: str):
        imgs = glob.glob(osp.join(root, 'test_color', '**', '*.png'),
                         recursive=True)
        super().__init__(imgs)

    def _depth_path(self, p: str) -> str:
        return p.replace('test_color', 'test_depth')

    def _decode_depth(self, p: str) -> np.ndarray:
        return _imread_raw(p).astype(np.float32) / 100.0


class DdadSource(_PairSource):
    """DDAD val (ddad.py:84-104): flat dir of *_rgb.png with sibling
    *_depth.npy in meters; kb-crop per the eval protocol."""
    dataset = 'ddad'
    do_kb_crop = True

    def __init__(self, root: str):
        imgs = glob.glob(osp.join(root, '*_rgb.png'))
        super().__init__(imgs)

    def _depth_path(self, p: str) -> str:
        return p.replace('_rgb.png', '_depth.npy')

    def _decode_depth(self, p: str) -> np.ndarray:
        return np.load(p).astype(np.float32)


_REGISTRY = {
    'ibims': IBimsSource,
    'sunrgbd': SunRGBDSource,
    'diml_indoor': DimlIndoorSource,
    'diml_outdoor': DimlOutdoorSource,
    'diode_indoor': lambda root: DiodeSource(root, indoor=True),
    'diode_outdoor': lambda root: DiodeSource(root, indoor=False),
    'hypersim_test': HypersimSource,
    'vkitti': VKittiSource,
    'vkitti2': VKitti2Source,
    'ddad': DdadSource,
}


def make_eval_source(dataset: str, root: str):
    """Build the eval source for a benchmark dataset name (the
    reference's DepthDataLoader dispatch, data_mono.py:84-127)."""
    if dataset not in _REGISTRY:
        raise ValueError(f'unknown eval dataset {dataset!r}; '
                         f'choose from {sorted(_REGISTRY)}')
    return _REGISTRY[dataset](root)


def evaluate_benchmark(predict_fn, dataset: str, root: str,
                       indices=None) -> Dict[str, float]:
    """Run the 9-metric protocol on one benchmark with its reference
    crop/cap settings (EVAL_PROTOCOL). predict_fn(rgb01) → depth."""
    from .depth_mono import compute_depth_metrics, EVAL_METRIC_KEYS
    src = make_eval_source(dataset, root)
    proto = EVAL_PROTOCOL[dataset]
    idxs = range(len(src)) if indices is None else indices
    acc = {k: 0.0 for k in EVAL_METRIC_KEYS}
    n = 0
    for i in idxs:
        img, depth, _ = src.load(i)
        m = compute_depth_metrics(
            depth[..., 0], np.asarray(predict_fn(img)),
            garg_crop=proto['garg_crop'], eigen_crop=proto['eigen_crop'],
            dataset='kitti' if proto['garg_crop'] else 'nyu',
            min_depth_eval=proto['min_depth_eval'],
            max_depth_eval=proto['max_depth_eval'])
        if np.isnan(m['rmse']):
            continue
        for k in EVAL_METRIC_KEYS:
            acc[k] += m[k]
        n += 1
    if n == 0:
        # no sample evaluated (empty source / all-NaN metrics) —
        # all-zero "perfect" scores would be silently wrong
        return {k: float('nan') for k in EVAL_METRIC_KEYS}
    return {k: v / n for k, v in acc.items()}
