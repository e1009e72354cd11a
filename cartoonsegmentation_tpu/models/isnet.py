"""ISNet (DIS) — second-stage mask refinement net (Flax, NHWC).

Re-implementation of the reference's refinement model
(animeinsseg/models/animeseg_refine/isnet.py): U²-Net-style nested
RSU blocks with side outputs. Used as "refinenet_isnet" with 4 input
channels (BGR + coarse instance mask) at refine_size 720
(animeinsseg/__init__.py:638-665) and as the whole-image "animeseg"
variant with 3 channels.

The five RSU variants collapse to one parametric block here:
RSU(height L) = input conv + (L-1) encoder convs with ceil-mode
pools + a dilated bottom conv + (L-1) decoder convs with bilinear
upsampling; RSU4F is the fully-dilated variant.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class REBNConv(nn.Module):
    features: int
    dirate: int = 1
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        p = self.dirate
        x = nn.Conv(self.features, (3, 3),
                    strides=(self.stride, self.stride),
                    padding=[(p, p), (p, p)],
                    kernel_dilation=(self.dirate, self.dirate),
                    use_bias=True, name='conv')(x)
        x = nn.BatchNorm(use_running_average=True, momentum=0.9,
                         epsilon=1e-5, name='bn')(x)
        return nn.relu(x)


def _pool_ceil(x):
    H, W = x.shape[-3], x.shape[-2]
    ph, pw = H % 2, W % 2
    if ph or pw:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 3) + [(0, ph), (0, pw), (0, 0)],
                    constant_values=-jnp.inf)
    return nn.max_pool(x, (2, 2), strides=(2, 2))


def _up_like(src, tar):
    return jax.image.resize(
        src, src.shape[:-3] + (tar.shape[-3], tar.shape[-2],
                               src.shape[-1]), method='linear')


class RSU(nn.Module):
    """Residual U-block of the given height (RSU7..RSU4).

    ``dilated=True`` is the u2net_refactor generalization
    (animeseg_refine/u2net.py:40-82): no pooling/upsampling, encoder
    level i uses dilation 2^(i-1), the bottom 2^(L-1), decoder levels
    mirror the encoder dilations. RSU4F == RSU(height=4, dilated)."""
    height: int
    mid_ch: int
    out_ch: int
    dilated: bool = False

    @nn.compact
    def __call__(self, x):
        L = self.height

        def rate(i):
            return 2 ** (i - 1) if self.dilated else 1

        hxin = REBNConv(self.out_ch, name='rebnconvin')(x)
        enc = [REBNConv(self.mid_ch, name='rebnconv1')(hxin)]
        h = enc[0]
        for i in range(2, L):
            if not self.dilated:
                h = _pool_ceil(h)
            h = REBNConv(self.mid_ch, dirate=rate(i),
                         name=f'rebnconv{i}')(h)
            enc.append(h)
        bottom_rate = 2 ** (L - 1) if self.dilated else 2
        bottom = REBNConv(self.mid_ch, dirate=bottom_rate,
                          name=f'rebnconv{L}')(h)

        d = bottom
        for i in range(L - 1, 0, -1):
            skip = enc[i - 1]
            if d.shape[-3:-1] != skip.shape[-3:-1]:
                d = _up_like(d, skip)
            feats = self.out_ch if i == 1 else self.mid_ch
            d = REBNConv(feats, dirate=rate(i), name=f'rebnconv{i}d')(
                jnp.concatenate([d, skip], -1))
        return d + hxin


class RSU4F(nn.Module):
    """Fully dilated RSU (no pooling)."""
    mid_ch: int
    out_ch: int

    @nn.compact
    def __call__(self, x):
        hxin = REBNConv(self.out_ch, name='rebnconvin')(x)
        h1 = REBNConv(self.mid_ch, dirate=1, name='rebnconv1')(hxin)
        h2 = REBNConv(self.mid_ch, dirate=2, name='rebnconv2')(h1)
        h3 = REBNConv(self.mid_ch, dirate=4, name='rebnconv3')(h2)
        h4 = REBNConv(self.mid_ch, dirate=8, name='rebnconv4')(h3)
        d3 = REBNConv(self.mid_ch, dirate=4, name='rebnconv3d')(
            jnp.concatenate([h4, h3], -1))
        d2 = REBNConv(self.mid_ch, dirate=2, name='rebnconv2d')(
            jnp.concatenate([d3, h2], -1))
        d1 = REBNConv(self.out_ch, dirate=1, name='rebnconv1d')(
            jnp.concatenate([d2, h1], -1))
        return d1 + hxin


class ISNetDIS(nn.Module):
    """Full ISNet; returns side-output logits d1..d6 (d1 is the
    prediction) each at input resolution, plus decoder features."""
    in_ch: int = 3
    out_ch: int = 1

    @nn.compact
    def __call__(self, x):
        hxin = nn.Conv(64, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                       use_bias=True, name='conv_in')(x)
        # (the reference computes pool_in but never uses it — isnet.py:581)
        hx1 = RSU(7, 32, 64, name='stage1')(hxin)
        hx = _pool_ceil(hx1)
        hx2 = RSU(6, 32, 128, name='stage2')(hx)
        hx = _pool_ceil(hx2)
        hx3 = RSU(5, 64, 256, name='stage3')(hx)
        hx = _pool_ceil(hx3)
        hx4 = RSU(4, 128, 512, name='stage4')(hx)
        hx = _pool_ceil(hx4)
        hx5 = RSU4F(256, 512, name='stage5')(hx)
        hx = _pool_ceil(hx5)
        hx6 = RSU4F(256, 512, name='stage6')(hx)
        hx6up = _up_like(hx6, hx5)

        hx5d = RSU4F(256, 512, name='stage5d')(
            jnp.concatenate([hx6up, hx5], -1))
        hx4d = RSU(4, 128, 256, name='stage4d')(
            jnp.concatenate([_up_like(hx5d, hx4), hx4], -1))
        hx3d = RSU(5, 64, 128, name='stage3d')(
            jnp.concatenate([_up_like(hx4d, hx3), hx3], -1))
        hx2d = RSU(6, 32, 64, name='stage2d')(
            jnp.concatenate([_up_like(hx3d, hx2), hx2], -1))
        hx1d = RSU(7, 16, 64, name='stage1d')(
            jnp.concatenate([_up_like(hx2d, hx1), hx1], -1))

        sides = []
        for i, (feat, name) in enumerate(
                [(hx1d, 'side1'), (hx2d, 'side2'), (hx3d, 'side3'),
                 (hx4d, 'side4'), (hx5d, 'side5'), (hx6, 'side6')]):
            d = nn.Conv(self.out_ch, (3, 3), padding=[(1, 1), (1, 1)],
                        use_bias=True, name=name)(feat)
            sides.append(_up_like(d, x))
        return tuple(sides), (hx1d, hx2d, hx3d, hx4d, hx5d, hx6)


def convert_isnet(sd) -> dict:
    """torch ISNetDIS state dict → flax {'params', 'batch_stats'}.

    Handles the lightning 'net.' prefix used by AnimeSegmentation
    checkpoints (animeseg_refine/__init__.py:74-85)."""
    from .convert import _np

    sd = {k[4:] if k.startswith('net.') else k: v for k, v in sd.items()}
    params: dict = {}
    stats: dict = {}

    def put(tree, path, leaf):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = leaf

    for k, v in sd.items():
        if 'num_batches_tracked' in k:
            continue
        parts = k.split('.')
        # {stage}.{rebnconvX}.{conv_s1|bn_s1}.{weight|bias|running_*}
        # or conv_in.weight / sideN.weight
        if parts[0] == 'conv_in' or parts[0].startswith('side'):
            name, attr = parts[0], parts[1]
            if attr == 'weight':
                put(params, (name, 'kernel'), _np(v).transpose(2, 3, 1, 0))
            else:
                put(params, (name, 'bias'), _np(v))
            continue
        stage, block, layer, attr = parts[0], parts[1], parts[2], parts[3]
        if layer == 'conv_s1':
            key = 'kernel' if attr == 'weight' else 'bias'
            leaf = _np(v).transpose(2, 3, 1, 0) if attr == 'weight' \
                else _np(v)
            put(params, (stage, block, 'conv', key), leaf)
        elif layer == 'bn_s1':
            if attr in ('weight', 'bias'):
                key = 'scale' if attr == 'weight' else 'bias'
                put(params, (stage, block, 'bn', key), _np(v))
            else:
                key = 'mean' if attr == 'running_mean' else 'var'
                put(stats, (stage, block, 'bn', key), _np(v))
    return {'params': params, 'batch_stats': stats}
