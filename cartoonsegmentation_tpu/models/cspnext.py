"""CSPNeXt backbone + CSPNeXt-PAFPN neck (Flax, NHWC).

TPU-native implementation of the RTMDet-Ins-L trunk. The reference
builds these from the mmdet registry using the config string embedded
in the checkpoint (animeinsseg/__init__.py:196-209, SURVEY.md #4);
topology follows the RTMDet paper / mmdet cspnext family:
stem(3 convs) → 4 stages of [conv s2, (SPP), CSPLayer] with SiLU+BN,
channel attention; PAFPN with top-down + bottom-up CSP fusion.

All convs are bias-free + BatchNorm + SiLU, so the whole trunk is
MXU-friendly; run it in bfloat16 via ``dtype``. Inference
(``train=False``, the default) uses running stats; training uses
batch statistics computed over the GLOBAL jit batch — on a sharded
mesh XLA inserts the cross-chip reductions, which is the reference's
SyncBN (mmdet ``norm_cfg=dict(type='SyncBN')``) riding ICI for free.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn


class ConvBNAct(nn.Module):
    """conv → BN → SiLU (mmcv ConvModule equivalent)."""
    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    act: bool = True
    dtype: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.kernel // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=[(p, p), (p, p)], feature_group_count=self.groups,
                    use_bias=False, dtype=self.dtype, name='conv')(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name='bn')(x)
        return nn.silu(x) if self.act else x


class DWSepConv(nn.Module):
    """Depthwise 5x5 + pointwise 1x1, each with BN+SiLU."""
    features: int
    kernel: int = 5
    dtype: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBNAct(x.shape[-1], self.kernel, groups=x.shape[-1],
                      dtype=self.dtype, name='dw')(x, train)
        x = ConvBNAct(self.features, 1, dtype=self.dtype, name='pw')(x, train)
        return x


class CSPNeXtBlock(nn.Module):
    features: int
    add_identity: bool = True
    dtype: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = ConvBNAct(self.features, 3, dtype=self.dtype,
                      name='conv1')(x, train)
        h = DWSepConv(self.features, 5, dtype=self.dtype,
                      name='conv2')(h, train)
        if self.add_identity and x.shape[-1] == self.features:
            return h + x
        return h


class ChannelAttention(nn.Module):
    """global-avg-pool → 1x1 conv (bias) → hardsigmoid gate."""

    @nn.compact
    def __call__(self, x):
        g = jnp.mean(x, axis=(-3, -2), keepdims=True)
        g = nn.Conv(x.shape[-1], (1, 1), use_bias=True, name='fc')(g)
        return x * nn.hard_sigmoid(g)


class CSPLayer(nn.Module):
    out_channels: int
    num_blocks: int
    add_identity: bool = True
    expand_ratio: float = 0.5
    channel_attention: bool = False
    dtype: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = int(self.out_channels * self.expand_ratio)
        main = ConvBNAct(mid, 1, dtype=self.dtype, name='main_conv')(x, train)
        short = ConvBNAct(mid, 1, dtype=self.dtype,
                          name='short_conv')(x, train)
        for i in range(self.num_blocks):
            main = CSPNeXtBlock(mid, self.add_identity, dtype=self.dtype,
                                name=f'block{i}')(main, train)
        h = jnp.concatenate([main, short], -1)
        if self.channel_attention:
            h = ChannelAttention(name='attention')(h)
        return ConvBNAct(self.out_channels, 1, dtype=self.dtype,
                         name='final_conv')(h, train)


class SPPBottleneck(nn.Module):
    out_channels: int
    pool_sizes: Tuple[int, ...] = (5, 9, 13)
    dtype: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = x.shape[-1] // 2
        h = ConvBNAct(mid, 1, dtype=self.dtype, name='conv1')(x, train)
        pools = [h]
        for k in self.pool_sizes:
            p = k // 2
            pools.append(nn.max_pool(h, (k, k), strides=(1, 1),
                                     padding=[(p, p), (p, p)]))
        h = jnp.concatenate(pools, -1)
        return ConvBNAct(self.out_channels, 1, dtype=self.dtype,
                         name='conv2')(h, train)


# stage table: (out_channels, num_blocks, add_identity, use_spp)
_ARCH_P5 = ((128, 3, True, False), (256, 6, True, False),
            (512, 6, True, False), (1024, 3, False, True))


class CSPNeXt(nn.Module):
    """Backbone. L = deepen 1.0 / widen 1.0. Returns strides 8/16/32."""
    deepen: float = 1.0
    widen: float = 1.0
    out_indices: Tuple[int, ...] = (2, 3, 4)
    dtype: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        w = self.widen
        # mmdet CSPNeXt stem: 3 → int(64*w//2) → int(64*w//2) →
        # int(64*w)  (64 = stage-1 in_channels of the P5 arch table)
        stem0 = int(64 * w // 2)
        x = ConvBNAct(stem0, 3, 2, dtype=self.dtype, name='stem0')(x, train)
        x = ConvBNAct(stem0, 3, 1, dtype=self.dtype, name='stem1')(x, train)
        x = ConvBNAct(int(64 * w), 3, 1, dtype=self.dtype,
                      name='stem2')(x, train)
        outs = []
        if 0 in self.out_indices:
            outs.append(x)
        for si, (c, n, add_id, use_spp) in enumerate(_ARCH_P5):
            c = int(c * w)
            n = max(round(n * self.deepen), 1)
            x = ConvBNAct(c, 3, 2, dtype=self.dtype,
                          name=f'stage{si}_conv')(x, train)
            if use_spp:
                x = SPPBottleneck(c, dtype=self.dtype,
                                  name=f'stage{si}_spp')(x, train)
            x = CSPLayer(c, n, add_identity=add_id, channel_attention=True,
                         dtype=self.dtype, name=f'stage{si}_csp')(x, train)
            if si + 1 in self.out_indices:
                outs.append(x)
        return tuple(outs)


class CSPNeXtPAFPN(nn.Module):
    """Neck: top-down + bottom-up CSP fusion, 3x3 out convs."""
    in_channels: Tuple[int, ...] = (256, 512, 1024)
    out_channels: int = 256
    num_csp_blocks: int = 3
    dtype: str | None = None

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        ch = self.in_channels
        n = len(ch)
        # top-down
        inner = [feats[-1]]
        for k, idx in enumerate(range(n - 1, 0, -1)):
            high = ConvBNAct(ch[idx - 1], 1, dtype=self.dtype,
                             name=f'reduce{k}')(inner[0], train)
            inner[0] = high
            # nearest x2 upsample (matches torch Upsample(mode='nearest'))
            up = jnp.repeat(jnp.repeat(high, 2, axis=-3), 2, axis=-2)
            up = up[..., :feats[idx - 1].shape[-3],
                    :feats[idx - 1].shape[-2], :]
            merged = jnp.concatenate([up, feats[idx - 1]], -1)
            td = CSPLayer(ch[idx - 1], self.num_csp_blocks,
                          add_identity=False, dtype=self.dtype,
                          name=f'top_down{k}')(merged, train)
            inner.insert(0, td)
        # bottom-up
        outs = [inner[0]]
        for idx in range(n - 1):
            down = ConvBNAct(ch[idx], 3, 2, dtype=self.dtype,
                             name=f'downsample{idx}')(outs[-1], train)
            merged = jnp.concatenate([down, inner[idx + 1]], -1)
            bu = CSPLayer(ch[idx + 1], self.num_csp_blocks,
                          add_identity=False, dtype=self.dtype,
                          name=f'bottom_up{idx}')(merged, train)
            outs.append(bu)
        return tuple(
            ConvBNAct(self.out_channels, 3, dtype=self.dtype,
                      name=f'out{i}')(o, train)
            for i, o in enumerate(outs))
