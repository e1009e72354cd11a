"""BoostingMonoDepth for LeReS — high-resolution depth via patch
merging (the reference's `estimateboost`).

Parity: depth_modules/leres/leres/depthmap.py
- calculateprocessingres (:70-126): find R_x, the largest whole-image
  inference size keeping >=20% of pixels within a receptive field of
  a contextual edge
- doubleestimate (:129-150): fuse a 448px (consistent) and an R_x
  (detailed) LeReS run with the pix2pix merge net at 1024px
- generatepatchs / adaptiveselection (:176-264): gradient-dense
  patches, grown until their edge density matches the whole image
- estimateboost (:377-545): per-patch double estimation merged into
  the base with a Gaussian-feathered blend and a deg-1 polyfit match

TPU-first re-design: the patch *selection* and the sequential
Gaussian blending stay on host (small numpy/cv2 config logic, as in
the reference), while all network math runs as THREE fixed-shape
jitted programs (LeReS at 448 and at the patch size 896 / whole-image
R_x, pix2pix at 1024). Because every patch's merge input depends only
on the BASE estimate (depthmap.py:506 feeds
patch_whole_estimate_base), the per-patch LeReS+merge chain is
batched through `jax.lax.map` instead of the reference's python loop
— one device program for all patches.

Interpolation note: device-side upsampling uses jax 'cubic'
(Keys a=-0.5) where the reference uses cv2.INTER_CUBIC (a=-0.75);
boundary-free interiors agree to ~1e-3 of the value range.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

WHOLE_SIZE_THRESHOLD = 1600   # R_max (depthmap.py:13)
PIX2PIX_SIZE = 1024
RECEPTIVE_FIELD = 448         # LeReS receptive field (:507)
PATCH_NETSIZE = 2 * RECEPTIVE_FIELD
R_THRESHOLD = 0.2             # x of R_x (:425)
SCALE_THRESHOLD = 3           # max upscaling (:437)


def generatemask(size: Tuple[int, int]) -> np.ndarray:
    """Gaussian blend mask (depthmap.py:48-57)."""
    import cv2
    mask = np.zeros(size, dtype=np.float32)
    sigma = int(size[0] / 16)
    k_size = int(2 * np.ceil(2 * int(size[0] / 16)) + 1)
    mask[int(0.15 * size[0]):size[0] - int(0.15 * size[0]),
         int(0.15 * size[1]):size[1] - int(0.15 * size[1])] = 1
    mask = cv2.GaussianBlur(mask, (k_size, k_size), sigma)
    mask = (mask - mask.min()) / (mask.max() - mask.min())
    return mask.astype(np.float32)


def _rgb2gray(img: np.ndarray) -> np.ndarray:
    # reference applies RGB luma weights to whatever order it is
    # given (the pipeline hands it BGR) — kept verbatim for parity
    return np.dot(img[..., :3], [0.2989, 0.5870, 0.1140])


def _resizewithpool(img: np.ndarray, size: int) -> np.ndarray:
    """block_reduce(img, (n, n), max) without the skimage dependency
    (depthmap.py:59-64)."""
    n = int(np.floor(img.shape[0] / size))
    h, w = img.shape
    ph, pw = (-h) % n, (-w) % n
    if ph or pw:
        img = np.pad(img, ((0, ph), (0, pw)),
                     constant_values=-np.inf)
    H, W = img.shape
    return img.reshape(H // n, n, W // n, n).max(axis=(1, 3))


def calculateprocessingres(img: np.ndarray, basesize: int,
                           confidence: float = 0.1,
                           scale_threshold: int = 3,
                           whole_size_threshold: int = 3000
                           ) -> Tuple[int, float]:
    """R_x search (depthmap.py:70-126). Returns (R_x, patch_scale K)."""
    import cv2
    speed_scale = 32
    image_dim = int(min(img.shape[0:2]))

    gray = _rgb2gray(img)
    grad = np.abs(cv2.Sobel(gray, cv2.CV_64F, 0, 1, ksize=3)) + \
        np.abs(cv2.Sobel(gray, cv2.CV_64F, 1, 0, ksize=3))
    grad = cv2.resize(grad, (image_dim, image_dim), cv2.INTER_AREA)

    m, M = grad.min(), grad.max()
    middle = m + (0.4 * (M - m))
    grad[grad < middle] = 0
    grad[grad >= middle] = 1

    kernel = np.ones((int(basesize / speed_scale),) * 2, float)
    kernel2 = np.ones((int(basesize / (4 * speed_scale)),) * 2, float)

    threshold = min(whole_size_threshold,
                    scale_threshold * max(img.shape[:2]))
    outputsize_scale = basesize / speed_scale
    for p_size in range(int(basesize / speed_scale),
                        int(threshold / speed_scale),
                        int(basesize / (2 * speed_scale))):
        grad_resized = _resizewithpool(grad, p_size)
        grad_resized = cv2.resize(grad_resized, (p_size, p_size),
                                  cv2.INTER_NEAREST)
        grad_resized = (grad_resized >= 0.5).astype(np.float64)
        dilated = cv2.dilate(grad_resized, kernel, iterations=1)
        if (1 - dilated).mean() > confidence:
            break
        outputsize_scale = p_size

    grad_region = cv2.dilate(grad_resized, kernel2, iterations=1)
    return int(outputsize_scale * speed_scale), float(grad_region.mean())


def _apply_grid_patch(blsize, stride, img, box):
    """Initial grid (depthmap.py:159-172)."""
    bounds = []
    for k in range(blsize, img.shape[1] - blsize, stride):
        for j in range(blsize, img.shape[0] - blsize, stride):
            rect = [box[0] + k - blsize, box[1] + j - blsize,
                    2 * blsize, 2 * blsize]
            bounds.append({'rect': rect, 'size': rect[2]})
    return bounds


def _get_gf(integral, rect):
    x1, y1, w, h = rect
    return (integral[y1 + h, x1 + w] - integral[y1, x1 + w]
            - integral[y1 + h, x1] + integral[y1, x1])


def _adaptiveselection(integral_grad, patch_bounds, gf, factor):
    """Keep gradient-dense patches, grow each until density matches
    the whole image (depthmap.py:221-264)."""
    patchlist = []
    height, width = integral_grad.shape
    search_step = int(32 / factor)
    for p in patch_bounds:
        bbox = list(p['rect'])
        cgf = _get_gf(integral_grad, bbox) / (bbox[2] * bbox[3])
        if cgf >= gf:
            bbox_test = bbox.copy()
            while True:
                bbox_test[0] -= int(search_step / 2)
                bbox_test[1] -= int(search_step / 2)
                bbox_test[2] += search_step
                bbox_test[3] += search_step
                if bbox_test[0] < 0 or bbox_test[1] < 0 or \
                        bbox_test[1] + bbox_test[3] >= height or \
                        bbox_test[0] + bbox_test[2] >= width:
                    break
                cgf = _get_gf(integral_grad, bbox_test) / \
                    (bbox_test[2] * bbox_test[3])
                if cgf < gf:
                    break
                bbox = bbox_test.copy()
            patchlist.append({'rect': bbox, 'size': bbox[2]})
    return patchlist


def generatepatchs(img: np.ndarray, base_size: int, factor: float):
    """Gradient-guided patch set, biggest first (depthmap.py:176-207)."""
    import cv2
    gray = _rgb2gray(img)
    whole_grad = np.abs(cv2.Sobel(gray, cv2.CV_64F, 0, 1, ksize=3)) + \
        np.abs(cv2.Sobel(gray, cv2.CV_64F, 1, 0, ksize=3))
    threshold = whole_grad[whole_grad > 0].mean()
    whole_grad[whole_grad < threshold] = 0
    gf = whole_grad.sum() / len(whole_grad.reshape(-1))
    grad_integral = cv2.integral(whole_grad)

    blsize = int(round(base_size / 2))
    stride = int(round(blsize * 0.75))
    bounds = _apply_grid_patch(blsize, stride, img, [0, 0, 0, 0])
    patchlist = _adaptiveselection(grad_integral, bounds, gf, factor)
    return sorted(patchlist, key=lambda x: x['size'], reverse=True)


class LeReSBoost:
    """estimateboost driver over the Flax LeReS + pix2pix nets.

    leres_apply(square_bgr01 (S,S,3)) must return raw depth (S,S);
    merge_apply(outer (1024,1024), inner (1024,1024)) must return the
    fused [0,1] map — both jit-compatible."""

    def __init__(self, leres_net, leres_vars, p2p_net, p2p_vars,
                 max_res: Optional[int] = None):
        """max_res=None reproduces the reference call
        (depth_modules/leres/__init__.py:113: estimateboost gets
        max(width, height) of the input), so local boosting is
        skipped whenever the chosen whole_size already exceeds the
        input resolution."""
        self.leres_net = leres_net
        self.leres_vars = leres_vars
        self.p2p_net = p2p_net
        self.p2p_vars = p2p_vars
        self.max_res = max_res
        self._jit: Dict = {}

    # -- fixed-shape device programs -----------------------------------
    def _leres_fn(self, size: int):
        key = ('leres', size)
        if key not in self._jit:
            import jax
            import jax.numpy as jnp
            net = self.leres_net

            @jax.jit
            def fn(variables, bgr01):
                rgb = bgr01[..., ::-1]
                return net.apply(variables, rgb[None])[0, ..., 0]
            self._jit[key] = fn
        return self._jit[key]

    def _double_fn(self, size2: int):
        """doubleestimate: leres@448 + leres@size2 → pix2pix@1024."""
        key = ('double', size2)
        if key not in self._jit:
            import jax
            import jax.numpy as jnp
            from ..models.pix2pix4depth import merge_depths
            net, p2p = self.leres_net, self.p2p_net
            S = PIX2PIX_SIZE

            @jax.jit
            def fn(lvars, pvars, bgr448, bgr_s2):
                e1 = net.apply(lvars, bgr448[None, ..., ::-1])[0, ..., 0]
                e2 = net.apply(lvars, bgr_s2[None, ..., ::-1])[0, ..., 0]
                e1 = jax.image.resize(e1, (S, S), method='cubic')
                e2 = jax.image.resize(e2, (S, S), method='cubic')
                m = merge_depths(p2p, pvars, e1, e2)
                mn, mx = jnp.min(m), jnp.max(m)
                return (m - mn) / jnp.maximum(mx - mn, 1e-12)
            self._jit[key] = fn
        return self._jit[key]

    def _patch_batch_fn(self):
        """Per-patch chain batched with lax.map: LeReS 448 + 896 →
        merge@1024 against the (pre-extracted) base patch. Unlike the
        whole-image double estimate the reference does NOT re-min-max
        the patch result (depthmap.py:512-517)."""
        key = ('patches',)
        if key not in self._jit:
            import jax
            import jax.numpy as jnp
            from ..models.pix2pix4depth import merge_depths
            net, p2p = self.leres_net, self.p2p_net
            S = PIX2PIX_SIZE

            @jax.jit
            def fn(lvars, pvars, p448, p896, base1024):
                def one(args):
                    a, b, base = args
                    e1 = net.apply(lvars, a[None, ..., ::-1])[0, ..., 0]
                    e2 = net.apply(lvars, b[None, ..., ::-1])[0, ..., 0]
                    e1 = jax.image.resize(e1, (S, S), method='cubic')
                    e2 = jax.image.resize(e2, (S, S), method='cubic')
                    inner = merge_depths(p2p, pvars, e1, e2)
                    return merge_depths(p2p, pvars, base, inner)
                return jax.lax.map(one, (p448, p896, base1024))
            self._jit[key] = fn
        return self._jit[key]

    # -- host orchestration ---------------------------------------------
    def _double(self, img_bgr01: np.ndarray, size2: int) -> np.ndarray:
        import cv2
        import jax.numpy as jnp
        a = cv2.resize(img_bgr01, (RECEPTIVE_FIELD, RECEPTIVE_FIELD),
                       interpolation=cv2.INTER_CUBIC)
        b = cv2.resize(img_bgr01, (size2, size2),
                       interpolation=cv2.INTER_CUBIC)
        out = self._double_fn(size2)(self.leres_vars, self.p2p_vars,
                                     jnp.asarray(a), jnp.asarray(b))
        return np.asarray(out)

    def __call__(self, img_bgr: np.ndarray) -> np.ndarray:
        """img_bgr: uint8 (H, W, 3). Returns the boosted raw depth map
        (H, W) float32 in [0, 1] (estimateboost return value;
        apply_leres-style normalization happens downstream)."""
        import cv2
        import jax.numpy as jnp

        img01 = img_bgr.astype(np.float32) / 255.0
        input_res = img_bgr.shape

        whole_size, patch_scale = calculateprocessingres(
            img_bgr, RECEPTIVE_FIELD, R_THRESHOLD, SCALE_THRESHOLD,
            WHOLE_SIZE_THRESHOLD)
        # keep the whole-image pass a /32 multiple for the conv trunk
        whole_size = max(32, (whole_size // 32) * 32)

        whole_estimate = self._double(img01, whole_size)

        factor = max(min(1.0, 4 * patch_scale * whole_size
                         / WHOLE_SIZE_THRESHOLD), 0.2)

        max_res = self.max_res if self.max_res is not None \
            else max(input_res[0], input_res[1])
        if max_res < whole_size:
            return cv2.resize(whole_estimate,
                              (input_res[1], input_res[0]),
                              interpolation=cv2.INTER_CUBIC)

        # target resolution for patching (depthmap.py:431-439)
        if img_bgr.shape[0] > img_bgr.shape[1]:
            a = 2 * whole_size
            b = round(2 * whole_size * img_bgr.shape[1]
                      / img_bgr.shape[0])
        else:
            a = round(2 * whole_size * img_bgr.shape[0]
                      / img_bgr.shape[1])
            b = 2 * whole_size
        a, b = int(round(a / factor)), int(round(b / factor))

        img_big = cv2.resize(img_bgr, (b, a),
                             interpolation=cv2.INTER_CUBIC)
        patchset = generatepatchs(img_big, RECEPTIVE_FIELD * 2, factor)

        mergein_scale = input_res[0] / img_big.shape[0]
        rgb_scaled = cv2.resize(
            img_big, (round(img_big.shape[1] * mergein_scale),
                      round(img_big.shape[0] * mergein_scale)),
            interpolation=cv2.INTER_CUBIC).astype(np.float32) / 255.0
        updated = cv2.resize(
            whole_estimate, (rgb_scaled.shape[1], rgb_scaled.shape[0]),
            interpolation=cv2.INTER_CUBIC)
        base = updated.copy()

        # ---- extract fixed-shape patch batches (host) ----------------
        rects = []
        p448, p896, base1024 = [], [], []
        for p in patchset:
            rect = np.round(np.array(p['rect']) * mergein_scale
                            ).astype(int)
            x1, y1, w, h = rect
            x2, y2 = x1 + w, y1 + h
            if w <= 0 or h <= 0 or x1 < 0 or y1 < 0 or \
                    x2 > rgb_scaled.shape[1] or y2 > rgb_scaled.shape[0]:
                continue
            patch_rgb = rgb_scaled[y1:y2, x1:x2]
            p448.append(cv2.resize(patch_rgb,
                                   (RECEPTIVE_FIELD, RECEPTIVE_FIELD),
                                   interpolation=cv2.INTER_CUBIC))
            p896.append(cv2.resize(patch_rgb,
                                   (PATCH_NETSIZE, PATCH_NETSIZE),
                                   interpolation=cv2.INTER_CUBIC))
            base1024.append(cv2.resize(base[y1:y2, x1:x2],
                                       (PIX2PIX_SIZE, PIX2PIX_SIZE),
                                       interpolation=cv2.INTER_CUBIC))
            rects.append((x1, y1, x2, y2))

        if not rects:
            return cv2.resize(updated, (input_res[1], input_res[0]),
                              interpolation=cv2.INTER_CUBIC)

        merged_all = np.asarray(self._patch_batch_fn()(
            self.leres_vars, self.p2p_vars,
            jnp.asarray(np.stack(p448)), jnp.asarray(np.stack(p896)),
            jnp.asarray(np.stack(base1024))))

        mask_org = generatemask((3000, 3000))
        mask = mask_org
        # ---- sequential Gaussian blend, biggest patch first -----------
        for (x1, y1, x2, y2), mapped, b1024 in zip(rects, merged_all,
                                                   base1024):
            org_size = (y2 - y1, x2 - x1)
            # deg-1 polyfit match to the base patch (depthmap.py:522-524)
            p_coef = np.polyfit(mapped.reshape(-1), b1024.reshape(-1),
                                deg=1)
            merged = np.polyval(p_coef, mapped.reshape(-1)
                                ).reshape(mapped.shape)
            merged = cv2.resize(merged, (org_size[1], org_size[0]),
                                interpolation=cv2.INTER_CUBIC)
            if mask.shape != org_size:
                mask = cv2.resize(mask_org, (org_size[1], org_size[0]),
                                  interpolation=cv2.INTER_LINEAR)
            updated[y1:y2, x1:x2] = \
                updated[y1:y2, x1:x2] * (1 - mask) + merged * mask

        return cv2.resize(updated, (input_res[1], input_res[0]),
                          interpolation=cv2.INTER_CUBIC)
