"""3D-Ken-Burns networks in Flax (NHWC, TPU-native).

Re-implementations (same topology, torch-convertible weights) of:
- ``Semantics`` / ``Disparity`` — VGG19-bn features + 6-row grid U-net
  (reference anime_3dkenburns/models/disparity_estimation.py:80-193)
- ``Refine`` — image-guided disparity upsampler
  (disparity_refinement.py:81-127)
- ``Inpaint`` — point-cloud inpainting U-net whose forward *contains*
  a point-cloud render (pointcloud_inpainting.py:81-204); here the
  render is our deterministic scatter splat, so the whole net is one
  jittable graph.

Images follow the reference convention: BGR, float in [0, 1]
(cv2-loaded), shape (H, W, 3).
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.filters import median_filter, valid_depth_mask
from ..ops.pointcloud import depth_to_points, render_pointcloud
from .layers import (Basic, Downsample, PReLU, Upsample, conv, crop_like,
                     normalize_mean_std, resize_to)

# ---------------------------------------------------------------------------
# VGG19-bn semantics encoder
# ---------------------------------------------------------------------------

_VGG_MEAN = (0.485, 0.456, 0.406)
_VGG_STD = (0.229, 0.224, 0.225)


class ConvBNRelu(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        x = conv(self.features, name='conv')(x)
        x = nn.BatchNorm(use_running_average=True, momentum=0.9,
                         epsilon=1e-5, name='bn')(x)
        return nn.relu(x)


def _maxpool_ceil(x):
    """2x2/2 max-pool with ceil_mode=True (pad odd H/W with -inf)."""
    H, W = x.shape[-3], x.shape[-2]
    ph, pw = H % 2, W % 2
    if ph or pw:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 3) + [(0, ph), (0, pw), (0, 0)],
                    constant_values=-jnp.inf)
    return nn.max_pool(x, (2, 2), strides=(2, 2))


class Semantics(nn.Module):
    """VGG19-bn features through the 4th pool (512ch @ /16).

    Parity: disparity_estimation.py:80-113 (incl. the BGR→RGB flip and
    ImageNet normalization in forward).
    """

    @nn.compact
    def __call__(self, bgr):
        x = bgr[..., ::-1]  # BGR -> RGB (torch .flip([1]))
        mean = jnp.asarray(_VGG_MEAN, x.dtype)
        std = jnp.asarray(_VGG_STD, x.dtype)
        x = (x - mean) / std
        widths = [64, 64, 'M', 128, 128, 'M', 256, 256, 256, 256, 'M',
                  512, 512, 512, 512, 'M']
        i = 0
        for w in widths:
            if w == 'M':
                x = _maxpool_ceil(x)
            else:
                x = ConvBNRelu(w, name=f'unit{i}')(x)
                i += 1
        return x


# ---------------------------------------------------------------------------
# grid U-net column machinery (shared by Disparity and Inpaint)
# ---------------------------------------------------------------------------

def _col_down(cols: List, basics: Sequence, downs: Sequence) -> List:
    """Column pass with downsample lateral adds (top-down)."""
    out = []
    for r in range(len(cols)):
        h = basics[r](cols[r])
        if r != 0:
            h = h + downs[r - 1](out[r - 1])
        out.append(h)
    return out


def _col_up(cols: List, basics: Sequence, ups: Sequence) -> List:
    """Column pass with upsample lateral adds (bottom-up, crop to fit)."""
    n = len(cols)
    out: List = [None] * n
    for r in range(n - 1, -1, -1):
        h = basics[r](cols[r])
        if r != n - 1:
            up = crop_like(ups[r](out[r + 1]), h)
            h = h + up
        out[r] = h
    return out


class Disparity(nn.Module):
    """6-row grid U-net conditioned on VGG semantics.

    Parity: disparity_estimation.py:115-193. Row features
    (32,48,64,512,512,512); semantics injected at row 3 of column 0.
    """
    feats: Tuple[int, ...] = (32, 48, 64, 512, 512, 512)

    def setup(self):
        f = self.feats
        self.net_image = conv(32, kernel=7, stride=2, pad=3,
                              name='net_image')
        self.net_semantics = conv(512, kernel=3, name='net_semantics')
        self.basics = [
            [Basic('relu-conv-relu-conv', (f[r], f[r], f[r]),
                   name=f'basic_r{r}c{c}') for c in range(3)]
            for r in range(len(f))]
        self.downs = [
            [Downsample((f[r], f[r + 1], f[r + 1]), name=f'down_c{c}r{r}')
             for r in range(len(f) - 1)] for c in range(2)]
        self.ups = [
            [Upsample((f[r + 1], f[r], f[r]), name=f'up_c{c}r{r}')
             for r in range(len(f) - 1)] for c in range(2)]
        self.net_disparity = Basic('conv-relu-conv', (32, 32, 1),
                                   name='net_disparity')

    def __call__(self, image_bgr, semantics):
        # column 0 built sequentially; semantics injected at row 3
        # before rows 4-5 are derived (reference :150-155)
        cols = [self.net_image(image_bgr)]
        cols.append(self.downs[0][0](cols[0]))
        cols.append(self.downs[0][1](cols[1]))
        cols.append(self.downs[0][2](cols[2])
                    + self.net_semantics(semantics))
        cols.append(self.downs[0][3](cols[3]))
        cols.append(self.downs[0][4](cols[4]))

        cols = _col_down(cols, [b[0] for b in self.basics], self.downs[1])
        cols = _col_up(cols, [b[1] for b in self.basics], self.ups[0])
        cols = _col_up(cols, [b[2] for b in self.basics], self.ups[1])
        return jnp.maximum(self.net_disparity(cols[0]), 0.0)


class DisparityEstimator(nn.Module):
    """Semantics + Disparity, with the <=512 aspect-kept resize of the
    reference wrapper (models/__init__.py:31-51)."""

    def setup(self):
        self.semantics = Semantics(name='semantics')
        self.disparity = Disparity(name='disparity')

    def __call__(self, image_bgr):
        H, W = image_bgr.shape[-3], image_bgr.shape[-2]
        ratio = W / H
        w = min(int(512 * ratio), 512)
        h = min(int(512 / ratio), 512)
        x = resize_to(image_bgr, h, w)
        return self.disparity(x, self.semantics(x))


class Refine(nn.Module):
    """Image-guided disparity upsampler (disparity_refinement.py:81-126)."""

    @nn.compact
    def __call__(self, image_bgr, disparity):
        imgN, _, _ = normalize_mean_std(image_bgr)
        dispN, dmean, dstd = normalize_mean_std(disparity)

        img1 = Basic('conv-relu-conv', (3, 24, 24), name='img_one')(imgN)
        img2 = Downsample((24, 48, 48), name='img_two')(img1)
        img3 = Downsample((48, 96, 96), name='img_thr')(img2)

        up = Basic('conv-relu-conv', (1, 96, 96), name='disp_one')(dispN)
        if up.shape[-3:-1] != img3.shape[-3:-1]:
            up = resize_to(up, img3.shape[-3], img3.shape[-2])
        up = Upsample((192, 96, 96), name='disp_two')(
            jnp.concatenate([img3, up], -1))
        if up.shape[-3:-1] != img2.shape[-3:-1]:
            up = resize_to(up, img2.shape[-3], img2.shape[-2])
        up = Upsample((144, 48, 48), name='disp_thr')(
            jnp.concatenate([img2, up], -1))
        if up.shape[-3:-1] != img1.shape[-3:-1]:
            up = resize_to(up, img1.shape[-3], img1.shape[-2])
        up = Basic('conv-relu-conv', (72, 24, 24), name='disp_fou')(
            jnp.concatenate([img1, up], -1))

        refined = Basic('conv-relu-conv', (24, 24, 1), name='refine')(up)
        refined = refined * (dstd + 1e-7) + dmean
        return jnp.maximum(refined, 0.0)


class Inpaint(nn.Module):
    """Point-cloud inpainting net (pointcloud_inpainting.py:81-204).

    The forward renders the shifted point cloud of
    (imageN, disparityN, 64-ch context) with the scatter splat, then a
    4-row grid U-net hallucinates color + disparity where ``existing``
    is 0. Whole thing is one jittable graph.
    """
    feats: Tuple[int, ...] = (32, 64, 128, 256)
    # compute dtype for the conv stack only (context + grid U-net);
    # geometry (depth→points, splat, normalize stats, de-normalize)
    # stays f32, heads are cast back to f32. Params are stored f32
    # either way, so converters/twins are unaffected.
    dtype: Optional[str] = None

    def setup(self):
        f = self.feats
        dt = self.dtype
        self.context0 = conv(64, name='context0', dtype=dt)
        self.context_prelu0 = PReLU(64, name='context_prelu0')
        self.context1 = conv(64, name='context1', dtype=dt)
        self.context_prelu1 = PReLU(64, name='context_prelu1')
        self.net_input = Basic('conv-relu-conv', (69, 32, 32),
                               name='net_input', dtype=dt)
        self.basics = [
            [Basic('relu-conv-relu-conv', (f[r], f[r], f[r]),
                   name=f'basic_r{r}c{c}', dtype=dt) for c in range(3)]
            for r in range(len(f))]
        self.downs = [
            [Downsample((f[r], f[r + 1], f[r + 1]),
                        name=f'down_c{c}r{r}', dtype=dt)
             for r in range(len(f) - 1)] for c in range(2)]
        self.ups = [
            [Upsample((f[r + 1], f[r], f[r]), name=f'up_c{c}r{r}',
                      dtype=dt)
             for r in range(len(f) - 1)] for c in range(2)]
        self.net_image = Basic('conv-relu-conv', (32, 32, 3),
                               name='net_image', dtype=dt)
        self.net_disparity = Basic('conv-relu-conv', (32, 32, 1),
                                   name='net_disparity', dtype=dt)

    def context(self, imgN, dispN):
        """Context feature convs (netContext, :86-92)."""
        ctx = self.context_prelu0(self.context0(
            jnp.concatenate([imgN, dispN], -1)))
        return self.context_prelu1(self.context1(ctx))

    def unet(self, render, existing):
        """Grid U-net over the (gated) render; returns raw
        (image, disparity) heads BEFORE de-normalization
        (pointcloud_inpainting.py:141-188)."""
        col0 = self.net_input(jnp.concatenate([render, existing], -1))
        cols = [col0]
        for r in range(3):
            cols.append(self.downs[0][r](cols[r]))

        cols = _col_down(cols, [b[0] for b in self.basics], self.downs[1])
        cols = _col_up(cols, [b[1] for b in self.basics], self.ups[0])
        cols = _col_up(cols, [b[2] for b in self.basics], self.ups[1])
        return self.net_image(cols[0]), self.net_disparity(cols[0])

    def __call__(self, image_bgr, disparity, shift, focal, baseline,
                 segmasks: Optional[jnp.ndarray] = None,
                 deterministic: bool = True):
        H, W = image_bgr.shape[-3], image_bgr.shape[-2]
        depth = (focal * baseline) / (disparity + 1e-7)
        valid = valid_depth_mask(disparity)
        points = depth_to_points((depth * valid)[..., 0], focal)
        points = points.reshape(-1, 3)

        imgN, imean, istd = normalize_mean_std(image_bgr)
        dispN, dmean, dstd = normalize_mean_std(disparity)

        ctx = self.context(imgN, dispN)

        payload = jnp.concatenate([imgN, dispN, ctx], -1)  # 68ch
        render, existing = render_pointcloud(
            points + shift[None, :], payload.reshape(-1, 68), H, W,
            focal, baseline)

        seg_render = None
        if segmasks is not None:
            segp = jnp.concatenate([segmasks, dispN], -1)
            seg_render, _ = render_pointcloud(
                points + shift[None, :],
                segp.reshape(-1, segp.shape[-1]), H, W, focal, baseline)
            seg_render = seg_render[..., :segmasks.shape[-1]]

        existing = (existing > 0.0).astype(render.dtype)
        existing = existing * median_filter(existing, 5)
        render = render * existing

        image_raw, disp_raw = self.unet(render, existing)
        image_raw = image_raw.astype(jnp.float32)
        disp_raw = disp_raw.astype(jnp.float32)

        image = image_raw * (istd + 1e-7) + imean
        disp_out = disp_raw * (dstd + 1e-7) + dmean
        if deterministic:
            image = jnp.clip(image, 0.0, 1.0)
        return {
            'existing': existing,
            'image': image,
            'disparity': jnp.maximum(disp_out, 0.0),
            'segmasks': seg_render,
        }
