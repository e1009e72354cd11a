"""Pix2pix depth-merge generator (BoostingMonoDepth's merge net).

Flax port of the reference's Pix2Pix4DepthModel generator — a
10-down 'unet_1024' UnetGenerator with norm='none'
(depth_modules/leres/pix2pix/models/pix2pix4depth_model.py:62-64,
networks.py UnetGenerator/UnetSkipConnectionBlock). Used by
estimateboost to fuse a low-res (consistent) and a high-res
(detailed) depth estimate into one map.

Input: (B, S, S, 2) — channel 0 = outer (low-res/base) estimate,
channel 1 = inner (high-res/patch) estimate, both min-max normalized
to [-1, 1] (pix2pix4depth_model.py:99-110). Output: (B, S, S, 1) in
[-1, 1] (tanh).

With norm='none' every conv is bias-free except the outermost
up-convolution (networks.py:686-712: use_bias=False since the norm
layer is Identity, and the outermost ConvTranspose keeps its default
bias).
"""
from __future__ import annotations

from typing import Dict, Mapping

import jax.numpy as jnp
from flax import linen as nn

from .convert import _np

def _inner_widths(num_downs: int, ngf: int):
    """inner_nc per level: ngf, 2ngf, 4ngf, then 8ngf for the rest
    (networks.py UnetGenerator: num_downs-5 intermediates + innermost
    all at ngf*8). unet_1024 = (64,128,256,512,512,512,512,512,512,512)."""
    return (ngf, 2 * ngf, 4 * ngf) + (8 * ngf,) * (num_downs - 3)


class Pix2Pix4Depth(nn.Module):
    """UnetGenerator(input_nc=2, output_nc=1, num_downs=10, ngf=64,
    norm='none') — iterative (non-recursive) formulation of the
    nested UnetSkipConnectionBlocks."""
    num_downs: int = 10
    ngf: int = 64

    @nn.compact
    def __call__(self, x):
        _INNER = _inner_widths(self.num_downs, self.ngf)
        n = len(_INNER)
        # --- down path (skip = each block's input) -------------------
        xs = []  # x_l: input of level l's block
        h = x
        for lv in range(n):
            xs.append(h)
            if lv > 0:
                h = nn.leaky_relu(h, 0.2)
            h = nn.Conv(_INNER[lv], (4, 4), strides=(2, 2),
                        padding=[(1, 1), (1, 1)], use_bias=False,
                        name=f'down{lv}')(h)
        # --- up path --------------------------------------------------
        # innermost: up from the bottleneck, concat with x_9
        u = nn.ConvTranspose(_INNER[n - 2], (4, 4), strides=(2, 2),
                             padding='SAME', use_bias=False,
                             name=f'up{n - 1}')(nn.relu(h))
        y = jnp.concatenate([xs[n - 1], u], -1)
        for lv in range(n - 2, 0, -1):
            u = nn.ConvTranspose(_INNER[lv - 1], (4, 4), strides=(2, 2),
                                 padding='SAME', use_bias=False,
                                 name=f'up{lv}')(nn.relu(y))
            y = jnp.concatenate([xs[lv], u], -1)
        out = nn.ConvTranspose(1, (4, 4), strides=(2, 2),
                               padding='SAME', use_bias=True,
                               name='up0')(nn.relu(y))
        return jnp.tanh(out)


def convert_pix2pix4depth(sd: Mapping, num_downs: int = 10,
                          ngf: int = 64) -> Dict:
    """latest_net_G.pth state dict → Flax params.

    Torch module nesting (networks.py UnetSkipConnectionBlock):
    outermost Sequential = [downconv, submodule, uprelu, upconv, tanh]
    → keys .0/.1/.3; mid = [leaky, downconv, norm, submodule, relu,
    upconv, norm] → .1/.3/.5; innermost = [leaky, downconv, relu,
    upconv, norm] → .1/.3."""
    from .convert import conv_w, deconv_w, strip_prefix
    sd = strip_prefix(sd)
    n = num_downs
    P: Dict = {}

    # UnetGenerator.model = outermost UnetSkipConnectionBlock, whose
    # Sequential is .model → checkpoint keys start 'model.model.'
    prefix = 'model.model'
    for lv in range(n):
        if lv == 0:
            down_t, up_t, sub = (f'{prefix}.0', f'{prefix}.3',
                                 f'{prefix}.1.model')
        elif lv == n - 1:
            down_t, up_t, sub = f'{prefix}.1', f'{prefix}.3', None
        else:
            down_t, up_t, sub = (f'{prefix}.1', f'{prefix}.5',
                                 f'{prefix}.3.model')
        P[f'down{lv}'] = {'kernel': conv_w(sd[f'{down_t}.weight'])}
        up = {'kernel': deconv_w(sd[f'{up_t}.weight'])}
        if f'{up_t}.bias' in sd:
            up['bias'] = _np(sd[f'{up_t}.bias'])
        P[f'up{lv}'] = up
        prefix = sub
    return {'params': P}


def minmax_normalize(x: jnp.ndarray) -> jnp.ndarray:
    """Min-max to [0,1] then scale to [-1,1]
    (pix2pix4depth_model.py:99-113)."""
    lo = jnp.min(x)
    hi = jnp.max(x)
    x = (x - lo) / jnp.maximum(hi - lo, 1e-12)
    return x * 2.0 - 1.0


def merge_depths(model: Pix2Pix4Depth, variables, outer: jnp.ndarray,
                 inner: jnp.ndarray) -> jnp.ndarray:
    """pix2pixmodel.set_input + test: normalize both (S, S) estimates,
    run the generator, map tanh output back to [0, 1]
    (depthmap.py:141-150)."""
    a = jnp.stack([minmax_normalize(outer), minmax_normalize(inner)], -1)
    fake = model.apply(variables, a[None])[0, ..., 0]
    return (fake + 1.0) / 2.0
