"""MODNet trimap-free matting net (Flax, NHWC).

Parity: reference animeinsseg/models/animeseg_refine/modnet.py —
MobileNetV2 backbone (α=1, expansion 6) + low-resolution semantic
branch (SE attention), high-resolution detail branch and fusion
branch, with the IBNorm (half BatchNorm / half InstanceNorm) conv
blocks. Selectable as the 'modnet' refine variant.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import resize_to


def _up2(x):
    return resize_to(x, x.shape[-3] * 2, x.shape[-2] * 2)


def _down(x, factor):
    return resize_to(x, x.shape[-3] // factor, x.shape[-2] // factor)


class IBNorm(nn.Module):
    """First half of channels batch-normed, second half instance-
    normed (modnet.py:410-427)."""
    features: int

    @nn.compact
    def __call__(self, x):
        half = self.features // 2
        bn = nn.BatchNorm(use_running_average=True, momentum=0.9,
                          epsilon=1e-5, name='bnorm')(x[..., :half])
        inorm_in = x[..., half:]
        mean = inorm_in.mean(axis=(-3, -2), keepdims=True)
        var = inorm_in.var(axis=(-3, -2), keepdims=True)
        inorm = (inorm_in - mean) * jax.lax.rsqrt(var + 1e-5)
        return jnp.concatenate([bn, inorm], -1)


class ConvIBNRelu(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    with_ibn: bool = True
    with_relu: bool = True

    @nn.compact
    def __call__(self, x):
        p = self.kernel // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=[(p, p), (p, p)], use_bias=True,
                    name='conv')(x)
        if self.with_ibn:
            x = IBNorm(self.features, name='ibn')(x)
        if self.with_relu:
            x = nn.relu(x)
        return x


class InvertedResidual(nn.Module):
    out_ch: int
    stride: int = 1
    expansion: int = 6

    @nn.compact
    def __call__(self, x):
        inp = x.shape[-1]
        hidden = round(inp * self.expansion)
        h = x
        if self.expansion != 1:
            h = nn.Conv(hidden, (1, 1), use_bias=False, name='pw')(h)
            h = nn.BatchNorm(use_running_average=True, momentum=0.9,
                             epsilon=1e-5, name='pw_bn')(h)
            h = jnp.clip(h, 0, 6)
        h = nn.Conv(hidden, (3, 3), strides=(self.stride, self.stride),
                    padding=[(1, 1), (1, 1)], feature_group_count=hidden,
                    use_bias=False, name='dw')(h)
        h = nn.BatchNorm(use_running_average=True, momentum=0.9,
                         epsilon=1e-5, name='dw_bn')(h)
        h = jnp.clip(h, 0, 6)
        h = nn.Conv(self.out_ch, (1, 1), use_bias=False, name='pw_lin')(h)
        h = nn.BatchNorm(use_running_average=True, momentum=0.9,
                         epsilon=1e-5, name='pw_lin_bn')(h)
        if self.stride == 1 and inp == self.out_ch:
            return x + h
        return h


_MBV2 = [  # (expansion, out, blocks, stride)
    (1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
    (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1),
]


class MobileNetV2Backbone(nn.Module):
    """Returns (enc2x 16, enc4x 24, enc8x 32, enc16x 96, enc32x 1280)."""

    @nn.compact
    def __call__(self, x) -> Sequence[jnp.ndarray]:
        h = nn.Conv(32, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                    use_bias=False, name='stem')(x)
        h = nn.BatchNorm(use_running_average=True, momentum=0.9,
                         epsilon=1e-5, name='stem_bn')(h)
        h = jnp.clip(h, 0, 6)
        feats = []
        idx = 0
        # feature indices 1..17; taps after blocks 1, 3, 6, 13, 17
        taps = {1, 3, 6, 13, 17}
        for t, c, n, s in _MBV2:
            for i in range(n):
                idx += 1
                h = InvertedResidual(c, s if i == 0 else 1, t,
                                     name=f'block{idx}')(h)
                if idx in taps:
                    feats.append(h)
        h = nn.Conv(1280, (1, 1), use_bias=False, name='head')(h)
        h = nn.BatchNorm(use_running_average=True, momentum=0.9,
                         epsilon=1e-5, name='head_bn')(h)
        h = jnp.clip(h, 0, 6)
        feats[-1] = h  # enc32x is the 1280-ch head output
        return feats


class SEBlock(nn.Module):
    reduction: int = 4

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        w = x.mean(axis=(-3, -2))
        w = nn.Dense(c // self.reduction, use_bias=False, name='fc0')(w)
        w = nn.relu(w)
        w = nn.Dense(c, use_bias=False, name='fc1')(w)
        w = jax.nn.sigmoid(w)
        return x * w[:, None, None, :]


class MODNet(nn.Module):
    """Returns (pred_semantic, pred_detail, pred_matte); the first two
    are None at inference like the reference (modnet.py:630-636)."""
    hr_channels: int = 32

    @nn.compact
    def __call__(self, img, inference: bool = True):
        enc2x, enc4x, enc8x, enc16x, enc32x = \
            MobileNetV2Backbone(name='backbone')(img)

        # LR branch
        e32 = SEBlock(name='se_block')(enc32x)
        lr16x = ConvIBNRelu(96, 5, name='conv_lr16x')(_up2(e32))
        lr8x = ConvIBNRelu(32, 5, name='conv_lr8x')(_up2(lr16x))
        pred_semantic = None
        if not inference:
            lr = ConvIBNRelu(1, 3, stride=2, with_ibn=False,
                             with_relu=False, name='conv_lr')(lr8x)
            pred_semantic = jax.nn.sigmoid(lr)

        # HR branch
        hr = self.hr_channels
        img2x = _down(img, 2)
        img4x = _down(img, 4)
        e2 = ConvIBNRelu(hr, 1, name='tohr_enc2x')(enc2x)
        hr4x = ConvIBNRelu(hr, 3, stride=2, name='conv_enc2x')(
            jnp.concatenate([img2x, e2], -1))
        e4 = ConvIBNRelu(hr, 1, name='tohr_enc4x')(enc4x)
        hr4x = ConvIBNRelu(2 * hr, 3, name='conv_enc4x')(
            jnp.concatenate([hr4x, e4], -1))
        lr4x = _up2(lr8x)
        h = jnp.concatenate([hr4x, lr4x, img4x], -1)
        for i, cc in enumerate((2 * hr, 2 * hr, hr)):
            h = ConvIBNRelu(cc, 3, name=f'conv_hr4x_{i}')(h)
        hr2x = _up2(h)
        h = jnp.concatenate([hr2x, e2], -1)
        for i, cc in enumerate((2 * hr, hr, hr, hr)):
            h = ConvIBNRelu(cc, 3, name=f'conv_hr2x_{i}')(h)
        hr2x = h
        pred_detail = None
        if not inference:
            d = _up2(hr2x)
            d = ConvIBNRelu(hr, 3, name='conv_hr_0')(
                jnp.concatenate([d, img], -1))
            d = ConvIBNRelu(1, 1, with_ibn=False, with_relu=False,
                            name='conv_hr_1')(d)
            pred_detail = jax.nn.sigmoid(d)

        # fusion
        lr4x = ConvIBNRelu(hr, 5, name='conv_lr4x')(_up2(lr8x))
        lr2x = _up2(lr4x)
        f2x = ConvIBNRelu(hr, 3, name='conv_f2x')(
            jnp.concatenate([lr2x, hr2x], -1))
        f = _up2(f2x)
        f = ConvIBNRelu(hr // 2, 3, name='conv_f_0')(
            jnp.concatenate([f, img], -1))
        f = ConvIBNRelu(1, 1, with_ibn=False, with_relu=False,
                        name='conv_f_1')(f)
        pred_matte = jax.nn.sigmoid(f)
        return pred_semantic, pred_detail, pred_matte
