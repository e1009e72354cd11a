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


# torch Conv2dIBNormRelu -> (flax ConvIBNRelu name) per branch, in the
# reference checkpoint schema (modnet.py:485-607; branches are flat
# submodules of the flax MODNet, Sequential indices become suffixes)
_MODNET_CONVS = {
    'lr_branch.conv_lr16x': 'conv_lr16x',
    'lr_branch.conv_lr8x': 'conv_lr8x',
    'lr_branch.conv_lr': 'conv_lr',
    'hr_branch.tohr_enc2x': 'tohr_enc2x',
    'hr_branch.conv_enc2x': 'conv_enc2x',
    'hr_branch.tohr_enc4x': 'tohr_enc4x',
    'hr_branch.conv_enc4x': 'conv_enc4x',
    'hr_branch.conv_hr4x.0': 'conv_hr4x_0',
    'hr_branch.conv_hr4x.1': 'conv_hr4x_1',
    'hr_branch.conv_hr4x.2': 'conv_hr4x_2',
    'hr_branch.conv_hr2x.0': 'conv_hr2x_0',
    'hr_branch.conv_hr2x.1': 'conv_hr2x_1',
    'hr_branch.conv_hr2x.2': 'conv_hr2x_2',
    'hr_branch.conv_hr2x.3': 'conv_hr2x_3',
    'hr_branch.conv_hr.0': 'conv_hr_0',
    'hr_branch.conv_hr.1': 'conv_hr_1',
    'f_branch.conv_lr4x': 'conv_lr4x',
    'f_branch.conv_f2x': 'conv_f2x',
    'f_branch.conv_f.0': 'conv_f_0',
    'f_branch.conv_f.1': 'conv_f_1',
}


def convert_modnet(sd) -> dict:
    """torch MODNet state dict -> flax {'params', 'batch_stats'}.

    Accepts the AnimeSegmentation lightning prefix ('net.',
    animeseg_refine/__init__.py:74-85) and the duplicated backbone
    paths ('backbone.model.*' and 'lr_branch.backbone.model.*' name
    the SAME shared module in the reference; identical tensors, last
    write wins)."""
    from .convert import _np

    sd = {k[4:] if k.startswith('net.') else k: v for k, v in sd.items()}
    params: dict = {}
    stats: dict = {}

    def put(tree, path, leaf):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = leaf

    def put_conv(flax_path, v, attr):
        key = 'kernel' if attr == 'weight' else 'bias'
        leaf = _np(v).transpose(2, 3, 1, 0) if attr == 'weight' else _np(v)
        put(params, flax_path + (key,), leaf)

    def put_bn(flax_path, v, attr):
        if attr in ('weight', 'bias'):
            put(params, flax_path +
                ('scale' if attr == 'weight' else 'bias',), _np(v))
        else:
            put(stats, flax_path +
                ('mean' if attr == 'running_mean' else 'var',), _np(v))

    # torch InvertedResidual .conv Sequential indices -> flax child
    # names (modnet.py:178-201): expansion==1 has no pw expand
    _IR_EXP1 = {0: ('dw', 'conv'), 1: ('dw_bn', 'bn'),
                3: ('pw_lin', 'conv'), 4: ('pw_lin_bn', 'bn')}
    _IR_EXP6 = {0: ('pw', 'conv'), 1: ('pw_bn', 'bn'),
                3: ('dw', 'conv'), 4: ('dw_bn', 'bn'),
                6: ('pw_lin', 'conv'), 7: ('pw_lin_bn', 'bn')}

    for k, v in sd.items():
        if 'num_batches_tracked' in k:
            continue
        if '.backbone.model.' in k or k.startswith('backbone.model.'):
            rest = k.split('.model.features.', 1)
            if len(rest) != 2:
                continue
            parts = rest[1].split('.')
            n = int(parts[0])
            if n == 0:      # stem conv_bn
                name = 'stem' if parts[1] == '0' else 'stem_bn'
                (put_conv if parts[1] == '0' else put_bn)(
                    ('backbone', name), v, parts[2])
            elif n == 18:   # 1x1 head
                name = 'head' if parts[1] == '0' else 'head_bn'
                (put_conv if parts[1] == '0' else put_bn)(
                    ('backbone', name), v, parts[2])
            else:           # InvertedResidual block n (1..17)
                table = _IR_EXP1 if n == 1 else _IR_EXP6
                child, kind = table[int(parts[2])]
                path = ('backbone', f'block{n}', child)
                (put_conv if kind == 'conv' else put_bn)(
                    path, v, parts[3])
            continue
        if k.startswith('lr_branch.se_block.fc.'):
            idx, attr = k.split('.')[-2:]
            # torch Linear weight (out, in) -> flax Dense (in, out)
            put(params, ('se_block', 'fc0' if idx == '0' else 'fc1',
                         'kernel'), _np(v).T)
            continue
        for tname, fname in _MODNET_CONVS.items():
            pre = tname + '.layers.'
            if not k.startswith(pre):
                continue
            parts = k[len(pre):].split('.')
            if parts[0] == '0':                       # the conv
                put_conv((fname, 'conv'), v, parts[1])
            elif parts[0] == '1' and parts[1] == 'bnorm':   # IBNorm bn
                put_bn((fname, 'ibn', 'bnorm'), v, parts[2])
            break
    return {'params': params, 'batch_stats': stats}
