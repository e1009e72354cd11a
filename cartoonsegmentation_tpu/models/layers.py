"""Shared NN building blocks (Flax linen, NHWC).

TPU re-implementations of the residual conv blocks used by the
3D-Ken-Burns nets (reference anime_3dkenburns/models/
disparity_estimation.py:4-78, disparity_refinement.py:5-79,
pointcloud_inpainting.py:5-79 — all three define identical
Basic/Downsample/Upsample blocks with per-channel PReLU).

Conventions:
- channel-last (NHWC) — the TPU-native layout
- explicit torch-equivalent padding (XLA 'SAME' pads differently for
  stride 2, so we always pass symmetric pads)
- float32 by default; pass dtype=bfloat16 for MXU-friendly halves
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


class PReLU(nn.Module):
    """Per-channel PReLU, init 0.25 (torch nn.PReLU(num_parameters=C))."""
    features: int
    init: float = 0.25

    @nn.compact
    def __call__(self, x):
        alpha = self.param(
            'alpha', lambda k, s: jnp.full(s, self.init, jnp.float32),
            (self.features,))
        alpha = alpha.astype(x.dtype)
        return jnp.where(x >= 0, x, alpha * x)


def conv(features: int, kernel: int = 3, stride: int = 1,
         pad: int | None = None, name: str | None = None,
         use_bias: bool = True, dtype=None) -> nn.Conv:
    if pad is None:
        pad = kernel // 2
    return nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                   padding=[(pad, pad), (pad, pad)], use_bias=use_bias,
                   name=name, dtype=dtype)


def upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    """Bilinear x2, align_corners=False (== jax 'linear' resize)."""
    B = x.shape[:-3]
    H, W, C = x.shape[-3:]
    return jax.image.resize(x, B + (2 * H, 2 * W, C), method='linear')


def resize_to(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Torch-twin bilinear resize: antialias=False matches
    F.interpolate(bilinear, align_corners=False) on minification too
    (the reference nets downscale with plain bilinear taps)."""
    B = x.shape[:-3]
    return jax.image.resize(x, B + (h, w, x.shape[-1]), method='linear',
                            antialias=False)


class Basic(nn.Module):
    """Residual block: [PReLU?] conv3 PReLU conv3 (+ shortcut).

    kind: 'relu-conv-relu-conv' or 'conv-relu-conv'.
    channels: (in, mid, out). Shortcut is identity when in == out,
    else a 1x1 conv.
    """
    kind: str
    channels: Sequence[int]
    dtype: str | None = None

    @nn.compact
    def __call__(self, x):
        cin, cmid, cout = self.channels
        h = x
        if self.kind == 'relu-conv-relu-conv':
            h = PReLU(cin, name='prelu_in')(h)
        elif self.kind != 'conv-relu-conv':
            raise ValueError(self.kind)
        h = conv(cmid, name='conv0', dtype=self.dtype)(h)
        h = PReLU(cmid, name='prelu_mid')(h)
        h = conv(cout, name='conv1', dtype=self.dtype)(h)
        if cin == cout:
            return h + x
        return h + conv(cout, kernel=1, name='shortcut',
                        dtype=self.dtype)(x)


class Downsample(nn.Module):
    """PReLU conv3/s2 PReLU conv3."""
    channels: Sequence[int]
    dtype: str | None = None

    @nn.compact
    def __call__(self, x):
        cin, cmid, cout = self.channels
        h = PReLU(cin, name='prelu0')(x)
        h = conv(cmid, stride=2, name='conv0', dtype=self.dtype)(h)
        h = PReLU(cmid, name='prelu1')(h)
        h = conv(cout, name='conv1', dtype=self.dtype)(h)
        return h


class Upsample(nn.Module):
    """bilinear x2, PReLU conv3 PReLU conv3."""
    channels: Sequence[int]
    dtype: str | None = None

    @nn.compact
    def __call__(self, x):
        cin, cmid, cout = self.channels
        h = upsample2x(x)
        h = PReLU(cin, name='prelu0')(h)
        h = conv(cmid, name='conv0', dtype=self.dtype)(h)
        h = PReLU(cmid, name='prelu1')(h)
        h = conv(cout, name='conv1', dtype=self.dtype)(h)
        return h


def crop_like(up: jnp.ndarray, ref: jnp.ndarray) -> jnp.ndarray:
    """Crop trailing row/col of an upsampled tensor to match ``ref``
    (the reference pads by -1: e.g. pointcloud_inpainting.py:165-166)."""
    return up[..., :ref.shape[-3], :ref.shape[-2], :]


def normalize_mean_std(x: jnp.ndarray, eps: float = 1e-7):
    """Whiten over all non-batch axes; returns (x_norm, mean, std).

    Matches torch ``x.std([1,2,3], unbiased=False)`` used by the
    Refine/Inpaint nets (disparity_refinement.py:98-107)."""
    axes = tuple(range(x.ndim - 3, x.ndim))
    mean = jnp.mean(x, axis=axes, keepdims=True)
    std = jnp.std(x, axis=axes, keepdims=True)
    return (x - mean) / (std + eps), mean, std
