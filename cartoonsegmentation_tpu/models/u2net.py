"""U²-Net (full + lite) and the ISNet GT encoder.

Parity: reference animeinsseg/models/animeseg_refine/u2net.py:84-228
(U2NET / U2NET_full / U2NET_lite via the same RSU blocks) and
isnet.py:434-521 (ISNetGTEncoder used to supervise the refine net's
intermediate features). Selectable through get_net (refine
__init__.py:28-41) as the 'u2net' / 'u2netl' refine variants.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .isnet import RSU, RSU4F, REBNConv, _pool_ceil, _up_like

# (block kind, height, mid, out) per stage — full config
_FULL_ENC = (('rsu', 7, 32, 64), ('rsu', 6, 32, 128), ('rsu', 5, 64, 256),
             ('rsu', 4, 128, 512), ('rsu4f', 0, 256, 512),
             ('rsu4f', 0, 256, 512))
_FULL_DEC = (('rsu4f', 0, 256, 512), ('rsu', 4, 128, 256),
             ('rsu', 5, 64, 128), ('rsu', 6, 32, 64), ('rsu', 7, 16, 64))

_LITE_ENC = (('rsu', 7, 16, 64), ('rsu', 6, 16, 64), ('rsu', 5, 16, 64),
             ('rsu', 4, 16, 64), ('rsu4f', 0, 16, 64),
             ('rsu4f', 0, 16, 64))
_LITE_DEC = (('rsu4f', 0, 16, 64), ('rsu', 4, 16, 64), ('rsu', 5, 16, 64),
             ('rsu', 6, 16, 64), ('rsu', 7, 16, 64))


def _block(kind, height, mid, out, name):
    if kind == 'rsu4f':
        return RSU4F(mid, out, name=name)
    return RSU(height, mid, out, name=name)


class U2Net(nn.Module):
    """Returns (side logits d1..d6 + fused d0, decoder feats)."""
    out_ch: int = 1
    lite: bool = False

    @nn.compact
    def __call__(self, x):
        enc_cfg = _LITE_ENC if self.lite else _FULL_ENC
        dec_cfg = _LITE_DEC if self.lite else _FULL_DEC

        feats = []
        h = x
        for i, (kind, hh, mid, out) in enumerate(enc_cfg):
            h = _block(kind, hh, mid, out, f'stage{i + 1}')(h)
            feats.append(h)
            if i < len(enc_cfg) - 1:
                h = _pool_ceil(h)

        d = feats[-1]
        dec_feats = [d]
        for i, (kind, hh, mid, out) in enumerate(dec_cfg):
            skip = feats[len(enc_cfg) - 2 - i]
            d = _up_like(d, skip)
            d = _block(kind, hh, mid, out,
                       f'stage{len(dec_cfg) - i}d')(
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
