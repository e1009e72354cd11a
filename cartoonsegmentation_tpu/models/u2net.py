"""U²-Net (the refactored full2/lite2 variants) and the ISNet GT
encoder.

Parity: reference animeinsseg/models/animeseg_refine/u2net.py:28-228.
The refine registry's 'u2net'/'u2netl' are U2NET_full2 / U2NET_lite2
(animeseg_refine/__init__.py:28-41): six encoder stages of heights
(8,7,6,5,5,5) where stages 5/6/5d are *dilated* height-5 RSUs (not
RSU4F — that is the plain full/lite config), plus side heads and a
1x1 fuse conv. ISNetGTEncoder is isnet.py:434-521, used to supervise
the refine net's intermediate features.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .isnet import RSU, RSU4F, REBNConv, _pool_ceil, _up_like

# (height, mid, out, dilated) per stage — u2net.py:175-192 (full2)
_FULL2_ENC = ((8, 32, 64, False), (7, 32, 128, False),
              (6, 64, 256, False), (5, 128, 512, False),
              (5, 256, 512, True), (5, 256, 512, True))
_FULL2_DEC = ((5, 256, 512, True), (5, 128, 256, False),
              (6, 64, 128, False), (7, 32, 64, False),
              (8, 16, 64, False))

# u2net.py:214-228 (lite2)
_LITE2_ENC = ((8, 16, 64, False), (7, 16, 64, False),
              (6, 16, 64, False), (5, 16, 64, False),
              (5, 16, 64, True), (5, 16, 64, True))
_LITE2_DEC = ((5, 16, 64, True), (5, 16, 64, False),
              (6, 16, 64, False), (7, 16, 64, False),
              (8, 16, 64, False))


class U2Net(nn.Module):
    """Returns (fused d0 + side logits d1..d6, decoder feats)."""
    out_ch: int = 1
    lite: bool = False

    @nn.compact
    def __call__(self, x):
        enc_cfg = _LITE2_ENC if self.lite else _FULL2_ENC
        dec_cfg = _LITE2_DEC if self.lite else _FULL2_DEC

        feats = []
        h = x
        for i, (hh, mid, out, dil) in enumerate(enc_cfg):
            h = RSU(hh, mid, out, dilated=dil, name=f'stage{i + 1}')(h)
            feats.append(h)
            if i < len(enc_cfg) - 1:
                h = _pool_ceil(h)

        d = feats[-1]
        dec_feats = [d]
        for i, (hh, mid, out, dil) in enumerate(dec_cfg):
            skip = feats[len(enc_cfg) - 2 - i]
            d = _up_like(d, skip)
            d = RSU(hh, mid, out, dilated=dil,
                    name=f'stage{len(dec_cfg) - i}d')(
                jnp.concatenate([d, skip], -1))
            dec_feats.insert(0, d)

        sides = []
        for i, f in enumerate(dec_feats):
            s = nn.Conv(self.out_ch, (3, 3), padding=[(1, 1), (1, 1)],
                        name=f'side{i + 1}')(f)
            sides.append(_up_like(s, x))
        fused = nn.Conv(self.out_ch, (1, 1), name='outconv')(
            jnp.concatenate(sides, -1))
        return (fused, *sides), tuple(dec_feats)


def convert_u2net(sd) -> dict:
    """torch U2NET (u2net_refactor schema: stage{N}[d].rebnconvX.
    {conv_s1,bn_s1}.*, sideN, outconv) → flax variables. The inner
    block schema is identical to ISNet's, so this shares
    convert_isnet's mapping plus the 1x1 fuse conv."""
    from .isnet import convert_isnet
    out = convert_isnet({k: v for k, v in sd.items()
                         if not k.startswith('outconv.')})
    from .convert import _np
    if 'outconv.weight' in sd:
        out['params']['outconv'] = {
            'kernel': _np(sd['outconv.weight']).transpose(2, 3, 1, 0),
            'bias': _np(sd['outconv.bias']),
        }
    return out


class ISNetGTEncoder(nn.Module):
    """Ground-truth mask encoder (isnet.py:434-521): light conv stem
    + 6 RSU stages, side outputs, used for feature-space supervision
    when training the refine net."""
    out_ch: int = 1

    @nn.compact
    def __call__(self, x):
        h = REBNConv(16, stride=2, name='conv_in')(x)
        cfgs = ((7, 16, 64), (6, 16, 64), (5, 32, 128), (4, 32, 256),
                ('f', 64, 512), ('f', 64, 512))
        feats = []
        for i, (hh, mid, out) in enumerate(cfgs):
            if hh == 'f':
                h = RSU4F(mid, out, name=f'stage{i + 1}')(h)
            else:
                h = RSU(hh, mid, out, name=f'stage{i + 1}')(h)
            feats.append(h)
            if i < len(cfgs) - 1:
                h = _pool_ceil(h)
        sides = []
        for i, f in enumerate(feats):
            s = nn.Conv(self.out_ch, (3, 3), padding=[(1, 1), (1, 1)],
                        name=f'side{i + 1}')(f)
            sides.append(_up_like(s, x))
        return tuple(sides), tuple(feats)


def convert_isnet_gt(sd) -> dict:
    """torch ISNetGTEncoder state dict -> flax variables. Differs from
    ISNetDIS only in the stem: conv_in is a myrebnconv ('conv_in.conv'
    / 'conv_in.bn', isnet.py:410-439) instead of a bare conv; stages
    and side heads share convert_isnet's mapping."""
    from .convert import _np
    from .isnet import convert_isnet

    sd = {k[4:] if k.startswith('net.') else k: v for k, v in sd.items()}
    out = convert_isnet({k: v for k, v in sd.items()
                         if not k.startswith('conv_in.')})
    conv_p, bn_p, bn_s = {}, {}, {}
    for k, v in sd.items():
        if not k.startswith('conv_in.') or 'num_batches_tracked' in k:
            continue
        _, layer, attr = k.split('.')
        if layer == 'conv':
            conv_p['kernel' if attr == 'weight' else 'bias'] = \
                _np(v).transpose(2, 3, 1, 0) if attr == 'weight' \
                else _np(v)
        else:
            if attr in ('weight', 'bias'):
                bn_p['scale' if attr == 'weight' else 'bias'] = _np(v)
            else:
                bn_s['mean' if attr == 'running_mean' else 'var'] = _np(v)
    out['params']['conv_in'] = {'conv': conv_p, 'bn': bn_p}
    out['batch_stats']['conv_in'] = {'bn': bn_s}
    return out
