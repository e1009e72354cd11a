"""DPT (dense prediction transformer) decoder on the BEiT backbone —
the MiDaS DPT_BEiT_L_384 graph, returning both relative depth and the
hooked features ZoeDepth consumes.

Parity: MiDaS v3.1 dpt head as driven by the reference's MidasCore
(depth_modules/zoedepth/models/base_models/midas.py:189-327); the
hook set ('out_conv', 'l4_rn', 'r4', 'r3', 'r2', 'r1') is returned
explicitly instead of via forward hooks.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..utils.image import resize_bilinear_ac
from .beit import BeitBackbone


class ReadoutProject(nn.Module):
    """'project' readout: concat cls token to every patch token,
    Linear(2C→C) + GELU."""
    dim: int

    @nn.compact
    def __call__(self, tokens):
        cls, patches = tokens[:, :1], tokens[:, 1:]
        cls = jnp.broadcast_to(cls, patches.shape)
        x = jnp.concatenate([patches, cls], -1)
        x = nn.Dense(self.dim, name='project')(x)
        return nn.gelu(x, approximate=False)


class ResidualConvUnit(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        h = nn.relu(x)
        h = nn.Conv(self.features, (3, 3), padding=1, name='conv1')(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), padding=1, name='conv2')(h)
        return x + h


class FeatureFusion(nn.Module):
    """MiDaS FeatureFusionBlock_custom (align_corners=True)."""
    features: int

    @nn.compact
    def __call__(self, x, skip=None):
        if skip is not None:
            x = x + ResidualConvUnit(self.features, name='rcu1')(skip)
        x = ResidualConvUnit(self.features, name='rcu2')(x)
        x = resize_bilinear_ac(x, x.shape[-3] * 2, x.shape[-2] * 2)
        return nn.Conv(self.features, (1, 1), name='out_conv')(x)


class DPTBeit(nn.Module):
    """Full MiDaS DPT-BEiT-L graph → (rel_depth, hook feature dict).

    dim/depth/num_heads/hooks parameterize the BEiT core so reduced-
    geometry torch-twin tests can run the complete graph; defaults are
    the shipped DPT_BEiT_L_384."""
    img_size: Tuple[int, int] = (384, 384)
    features: int = 256
    out_channels: Tuple[int, ...] = (256, 512, 1024, 1024)
    dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    hooks: Tuple[int, ...] = (5, 11, 17, 23)

    @nn.compact
    def __call__(self, x):
        B, H, W, _ = x.shape
        gh, gw = H // 16, W // 16
        tokens = BeitBackbone(img_size=self.img_size, dim=self.dim,
                              depth=self.depth,
                              num_heads=self.num_heads,
                              hooks=self.hooks, name='backbone')(x)

        # readout + reshape to grids + per-level resampling
        levels = []
        for i, t in enumerate(tokens):
            h = ReadoutProject(self.dim, name=f'readout{i}')(t)
            h = h.reshape(B, gh, gw, self.dim)
            h = nn.Conv(self.out_channels[i], (1, 1),
                        name=f'proj{i}')(h)
            if i == 0:
                h = nn.ConvTranspose(self.out_channels[i], (4, 4),
                                     strides=(4, 4), padding='VALID',
                                     name='resample0')(h)
            elif i == 1:
                h = nn.ConvTranspose(self.out_channels[i], (2, 2),
                                     strides=(2, 2), padding='VALID',
                                     name='resample1')(h)
            elif i == 3:
                h = nn.Conv(self.out_channels[i], (3, 3), strides=(2, 2),
                            padding=1, name='resample3')(h)
            levels.append(h)

        rn = [nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                      name=f'layer{i + 1}_rn')(lv)
              for i, lv in enumerate(levels)]

        r4 = FeatureFusion(self.features, name='refinenet4')(rn[3])
        r4c = r4[:, :rn[2].shape[1], :rn[2].shape[2]]
        r3 = FeatureFusion(self.features, name='refinenet3')(r4c, rn[2])
        r2 = FeatureFusion(self.features, name='refinenet2')(r3, rn[1])
        r1 = FeatureFusion(self.features, name='refinenet1')(r2, rn[0])

        h = nn.Conv(self.features // 2, (3, 3), padding=1,
                    name='head_conv0')(r1)
        h = resize_bilinear_ac(h, h.shape[-3] * 2, h.shape[-2] * 2)
        h = nn.Conv(32, (3, 3), padding=1, name='head_conv1')(h)
        out_conv_act = nn.relu(h)                      # 'out_conv' hook
        h = nn.Conv(1, (1, 1), name='head_conv2')(out_conv_act)
        rel_depth = nn.relu(h)[..., 0]

        hooks: Dict[str, jnp.ndarray] = {
            'out_conv': out_conv_act,
            'l4_rn': rn[3],
            # MiDaS's r4 hook fires AFTER interpolation to layer_3's
            # grid — export the cropped tensor so odd backbone grids
            # keep the hook aligned with the torch reference
            'r4': r4c,
            'r3': r3,
            'r2': r2,
            'r1': r1,
        }
        return rel_depth, hooks
