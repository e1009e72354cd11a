"""LeReS relative-depth estimator (Flax, NHWC) — the Ken Burns
pipeline's shipped default depth model (configs/3dkenburns.yaml:39).

Re-implementation of reference depth_modules/leres/leres/: ResNeXt101
-32x8d encoder (Resnext_torch.py — torchvision-schema resnet with
grouped bottlenecks) + the FTB/FFM/AO decoder (network_auxi.py) whose
upsamples are bilinear align_corners=True. Output is a relative depth
logit map at input resolution; ``apply_leres`` post-processing
(normalize → uint8 → invert, leres/__init__.py:110-147) turns it into
the disparity-like map the pipeline consumes.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..utils.image import resize_bilinear_ac


class ConvBN(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        p = self.kernel // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=[(p, p), (p, p)],
                    feature_group_count=self.groups,
                    use_bias=self.use_bias, name='conv')(x)
        return nn.BatchNorm(use_running_average=True, momentum=0.9,
                            epsilon=1e-5, name='bn')(x)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    groups: int = 32
    base_width: int = 8
    downsample: bool = False
    expansion: int = 4

    @nn.compact
    def __call__(self, x):
        width = int(self.planes * (self.base_width / 64.0)) * self.groups
        out = nn.relu(ConvBN(width, 1, name='conv1')(x))
        out = nn.relu(ConvBN(width, 3, self.stride, self.groups,
                             name='conv2')(out))
        out = ConvBN(self.planes * self.expansion, 1, name='conv3')(out)
        if self.downsample:
            x = ConvBN(self.planes * self.expansion, 1, self.stride,
                       name='downsample')(x)
        return nn.relu(out + x)


class ResNeXt101(nn.Module):
    """torchvision-schema resnext101_32x8d trunk → 4 pyramid feats."""
    layers: Tuple[int, ...] = (3, 4, 23, 3)

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, name='conv1')(x)
        x = nn.BatchNorm(use_running_average=True, momentum=0.9,
                         epsilon=1e-5, name='bn1')(x)
        x = nn.relu(x)
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 3) + [(1, 1), (1, 1), (0, 0)],
                    constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))

        feats = []
        for li, (planes, blocks) in enumerate(
                zip((64, 128, 256, 512), self.layers)):
            stride = 1 if li == 0 else 2
            for b in range(blocks):
                x = Bottleneck(planes, stride if b == 0 else 1,
                               downsample=(b == 0),
                               name=f'layer{li + 1}_{b}')(x)
            feats.append(x)
        return feats


class FTB(nn.Module):
    """Feature transform block (network_auxi.py:100-125).

    The reference's ``conv_branch`` STARTS with ``nn.ReLU(inplace=
    True)`` whose in-place mutation rewrites the conv1 output before
    the residual add — so the real skip connection is
    ``relu(conv1(x))``, not ``conv1(x)``. Pinned by
    tests/test_reference_source_parity.py::test_reference_leres,
    which caught this (both our model and the twin originally used
    the pre-relu skip)."""
    mid: int

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.mid, (3, 3), padding=1, use_bias=True,
                    name='conv1')(x)
        x = nn.relu(x)
        b = nn.Conv(self.mid, (3, 3), padding=1, use_bias=True,
                    name='branch_conv0')(x)
        b = nn.BatchNorm(use_running_average=True, momentum=0.9,
                         epsilon=1e-5, name='branch_bn')(b)
        b = nn.relu(b)
        b = nn.Conv(self.mid, (3, 3), padding=1, use_bias=True,
                    name='branch_conv1')(b)
        return nn.relu(x + b)


class FFM(nn.Module):
    """Feature fusion: FTB(low) + high → FTB → up2 (align_corners)."""
    mid: int
    out: int

    @nn.compact
    def __call__(self, low, high):
        x = FTB(self.mid, name='ftb1')(low)
        x = x + high
        x = FTB(self.out, name='ftb2')(x)
        return resize_bilinear_ac(x, x.shape[-3] * 2, x.shape[-2] * 2)


class LeReSDecoder(nn.Module):
    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        x = FTB(512, name='conv')(feats[3])
        x = nn.Conv(256, (3, 3), padding=1, use_bias=True,
                    name='conv1')(x)
        x = resize_bilinear_ac(x, x.shape[-3] * 2, x.shape[-2] * 2)
        x = FFM(256, 256, name='ffm2')(feats[2], x)
        x = FFM(256, 256, name='ffm1')(feats[1], x)
        x = FFM(256, 256, name='ffm0')(feats[0], x)
        # AO head
        x = nn.Conv(128, (3, 3), padding=1, use_bias=True,
                    name='ao_conv0')(x)
        x = nn.BatchNorm(use_running_average=True, momentum=0.9,
                         epsilon=1e-5, name='ao_bn')(x)
        x = nn.relu(x)
        x = nn.Conv(1, (3, 3), padding=1, use_bias=True,
                    name='ao_conv1')(x)
        return resize_bilinear_ac(x, x.shape[-3] * 2, x.shape[-2] * 2)


_IMAGENET_MEAN = (0.485, 0.456, 0.406)
_IMAGENET_STD = (0.229, 0.224, 0.225)


class LeReS(nn.Module):
    """Full RelDepthModel forward. Input: RGB float in [0,1]
    (estimateleres converts BGR→RGB and ImageNet-normalizes —
    depthmap.py:16-46; normalization is applied here).

    ``encoder_layers`` shrinks the ResNeXt trunk for twin tests;
    the default is the shipped resnext101_32x8d."""
    encoder_layers: Tuple[int, ...] = (3, 4, 23, 3)

    @nn.compact
    def __call__(self, rgb01):
        x = (rgb01 - jnp.asarray(_IMAGENET_MEAN, rgb01.dtype)) \
            / jnp.asarray(_IMAGENET_STD, rgb01.dtype)
        feats = ResNeXt101(self.encoder_layers, name='encoder')(x)
        return LeReSDecoder(name='decoder')(feats)


def leres_postprocess(depth: jnp.ndarray) -> jnp.ndarray:
    """normalize → 16-bit → uint8 → invert (apply_leres semantics,
    leres/__init__.py:117-141). Returns float in [0, 255] acting as
    the pipeline's disparity map."""
    lo, hi = jnp.min(depth), jnp.max(depth)
    out = jnp.where(hi - lo > 1e-7,
                    65535.0 * (depth - lo) / (hi - lo),
                    jnp.zeros_like(depth))
    u8 = jnp.round(jnp.round(out) * (255.0 / 65535.0))
    return 255.0 - u8


# ---------------------------------------------------------------------------
# torch checkpoint conversion (res101.pth: ckpt['depth_model'] with
# 'module.' prefixes; encoder = resnext101_32x8d schema)
# ---------------------------------------------------------------------------

def _normalize_leres_keys(sd) -> dict:
    """res101.pth stores the RelDepthModel state dict: every tensor
    lives under ``depth_model.encoder_modules.encoder.*`` (DepthNet
    wraps the ResNeXt as ``.encoder`` — network_auxi.py:89-93) or
    ``depth_model.decoder_modules.*`` (multi_depth_model_woauxi.py:
    23-28), optionally behind a DataParallel ``module.`` prefix.
    Collapse those to the bare ``encoder.`` / ``decoder.`` schema the
    converter walks. Verified against the reference's own modules in
    tests/test_reference_source_parity.py::test_reference_leres."""
    out = {}
    for k, v in sd.items():
        if k.startswith('module.'):
            k = k[len('module.'):]
        if k.startswith('depth_model.'):
            k = k[len('depth_model.'):]
        if k.startswith('encoder_modules.encoder.'):
            k = 'encoder.' + k[len('encoder_modules.encoder.'):]
        elif k.startswith('decoder_modules.'):
            k = 'decoder.' + k[len('decoder_modules.'):]
        out[k] = v
    return out


def convert_leres(sd) -> dict:
    from .convert import _np

    sd = _normalize_leres_keys(sd)
    params: dict = {}
    stats: dict = {}

    def put(tree, path, leaf):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = leaf

    def conv_w(v):
        return _np(v).transpose(2, 3, 1, 0)

    def handle_bn(prefix_flax, tname, v):
        attr = tname.split('.')[-1]
        if attr == 'weight':
            put(params, prefix_flax + ('scale',), _np(v))
        elif attr == 'bias':
            put(params, prefix_flax + ('bias',), _np(v))
        elif attr == 'running_mean':
            put(stats, prefix_flax + ('mean',), _np(v))
        elif attr == 'running_var':
            put(stats, prefix_flax + ('var',), _np(v))

    for k, v in sd.items():
        if 'num_batches_tracked' in k:
            continue
        parts = k.split('.')
        # encoder.*
        if parts[0] == 'encoder':
            rest = parts[1:]
            if rest[0] == 'conv1':
                put(params, ('encoder', 'conv1', 'kernel'), conv_w(v))
            elif rest[0] == 'bn1':
                handle_bn(('encoder', 'bn1'), k, v)
            elif rest[0].startswith('layer'):
                layer, block = rest[0], rest[1]
                name = f'{layer}_{block}'
                sub = rest[2]
                if sub.startswith('conv'):
                    put(params, ('encoder', name, sub, 'conv', 'kernel'),
                        conv_w(v))
                elif sub.startswith('bn'):
                    # bn1/bn2/bn3 pair with conv1/conv2/conv3
                    cname = 'conv' + sub[-1]
                    handle_bn(('encoder', name, cname, 'bn'), k, v)
                elif sub == 'downsample':
                    if rest[3] == '0':
                        put(params, ('encoder', name, 'downsample',
                                     'conv', 'kernel'), conv_w(v))
                    else:
                        handle_bn(('encoder', name, 'downsample', 'bn'),
                                  k, v)
            continue
        # decoder.*
        if parts[0] != 'decoder':
            continue
        rest = parts[1:]

        def ftb(prefix_t, prefix_f):
            """map one FTB subtree key."""
            sub = rest[len(prefix_t):]
            if sub[0] == 'conv1':
                put(params, prefix_f + ('conv1', 'kernel' if sub[1] ==
                                        'weight' else 'bias'),
                    conv_w(v) if sub[1] == 'weight' else _np(v))
            elif sub[0] == 'conv_branch':
                idx = sub[1]
                if idx == '1':
                    put(params, prefix_f + ('branch_conv0',
                                            'kernel' if sub[2] == 'weight'
                                            else 'bias'),
                        conv_w(v) if sub[2] == 'weight' else _np(v))
                elif idx == '2':
                    handle_bn(prefix_f + ('branch_bn',), k, v)
                elif idx == '4':
                    put(params, prefix_f + ('branch_conv1',
                                            'kernel' if sub[2] == 'weight'
                                            else 'bias'),
                        conv_w(v) if sub[2] == 'weight' else _np(v))

        if rest[0] == 'conv':         # decoder.conv = FTB
            ftb(['conv'], ('decoder', 'conv'))
        elif rest[0] == 'conv1':
            put(params, ('decoder', 'conv1',
                         'kernel' if rest[1] == 'weight' else 'bias'),
                conv_w(v) if rest[1] == 'weight' else _np(v))
        elif rest[0] in ('ffm2', 'ffm1', 'ffm0'):
            ftb([rest[0], rest[1]], ('decoder', rest[0], rest[1]))
        elif rest[0] == 'outconv':
            idx = rest[2]
            if idx == '0':
                put(params, ('decoder', 'ao_conv0',
                             'kernel' if rest[3] == 'weight' else 'bias'),
                    conv_w(v) if rest[3] == 'weight' else _np(v))
            elif idx == '1':
                handle_bn(('decoder', 'ao_bn'), k, v)
            elif idx == '3':
                put(params, ('decoder', 'ao_conv1',
                             'kernel' if rest[3] == 'weight' else 'bias'),
                    conv_w(v) if rest[3] == 'weight' else _np(v))
    return {'params': params, 'batch_stats': stats}
