"""CSPNeXt backbone + CSPNeXt-PAFPN neck (Flax, NHWC).

TPU-native implementation of the RTMDet-Ins-L trunk. The reference
builds these from the mmdet registry using the config string embedded
in the checkpoint (animeinsseg/__init__.py:196-209, SURVEY.md #4);
topology follows the RTMDet paper / mmdet cspnext family:
stem(3 convs) → 4 stages of [conv s2, (SPP), CSPLayer] with SiLU+BN,
channel attention; PAFPN with top-down + bottom-up CSP fusion.

All convs are bias-free + BatchNorm(inference: running stats) + SiLU,
so the whole trunk is MXU-friendly; run it in bfloat16 via ``dtype``.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn


class ConvBNAct(nn.Module):
    """conv → BN(running stats) → SiLU (mmcv ConvModule equivalent)."""
    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    act: bool = True
    dtype: str | None = None

    @nn.compact
    def __call__(self, x):
        p = self.kernel // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=[(p, p), (p, p)], feature_group_count=self.groups,
                    use_bias=False, dtype=self.dtype, name='conv')(x)
        x = nn.BatchNorm(use_running_average=True, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name='bn')(x)
        return nn.silu(x) if self.act else x


class DWSepConv(nn.Module):
    """Depthwise 5x5 + pointwise 1x1, each with BN+SiLU."""
    features: int
    kernel: int = 5
    dtype: str | None = None

    @nn.compact
    def __call__(self, x):
        x = ConvBNAct(x.shape[-1], self.kernel, groups=x.shape[-1],
                      dtype=self.dtype, name='dw')(x)
        x = ConvBNAct(self.features, 1, dtype=self.dtype, name='pw')(x)
        return x


class CSPNeXtBlock(nn.Module):
    features: int
    add_identity: bool = True
    dtype: str | None = None

    @nn.compact
    def __call__(self, x):
        h = ConvBNAct(self.features, 3, dtype=self.dtype, name='conv1')(x)
        h = DWSepConv(self.features, 5, dtype=self.dtype, name='conv2')(h)
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
    def __call__(self, x):
        mid = int(self.out_channels * self.expand_ratio)
        main = ConvBNAct(mid, 1, dtype=self.dtype, name='main_conv')(x)
        short = ConvBNAct(mid, 1, dtype=self.dtype, name='short_conv')(x)
        for i in range(self.num_blocks):
            main = CSPNeXtBlock(mid, self.add_identity, dtype=self.dtype,
                                name=f'block{i}')(main)
        h = jnp.concatenate([main, short], -1)
        if self.channel_attention:
            h = ChannelAttention(name='attention')(h)
        return ConvBNAct(self.out_channels, 1, dtype=self.dtype,
                         name='final_conv')(h)


class SPPBottleneck(nn.Module):
    out_channels: int
    pool_sizes: Tuple[int, ...] = (5, 9, 13)
    dtype: str | None = None

    @nn.compact
    def __call__(self, x):
        mid = x.shape[-1] // 2
        h = ConvBNAct(mid, 1, dtype=self.dtype, name='conv1')(x)
        pools = [h]
        for k in self.pool_sizes:
            p = k // 2
            pools.append(nn.max_pool(h, (k, k), strides=(1, 1),
                                     padding=[(p, p), (p, p)]))
        h = jnp.concatenate(pools, -1)
        return ConvBNAct(self.out_channels, 1, dtype=self.dtype,
                         name='conv2')(h)


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
    def __call__(self, x):
        w = self.widen
        # mmdet CSPNeXt stem: 3 → int(64*w//2) → int(64*w//2) →
        # int(64*w)  (64 = stage-1 in_channels of the P5 arch table)
        stem0 = int(64 * w // 2)
        x = ConvBNAct(stem0, 3, 2, dtype=self.dtype, name='stem0')(x)
        x = ConvBNAct(stem0, 3, 1, dtype=self.dtype, name='stem1')(x)
        x = ConvBNAct(int(64 * w), 3, 1, dtype=self.dtype, name='stem2')(x)
        outs = []
        if 0 in self.out_indices:
            outs.append(x)
        for si, (c, n, add_id, use_spp) in enumerate(_ARCH_P5):
            c = int(c * w)
            n = max(round(n * self.deepen), 1)
            x = ConvBNAct(c, 3, 2, dtype=self.dtype,
                          name=f'stage{si}_conv')(x)
            if use_spp:
                x = SPPBottleneck(c, dtype=self.dtype,
                                  name=f'stage{si}_spp')(x)
            x = CSPLayer(c, n, add_identity=add_id, channel_attention=True,
                         dtype=self.dtype, name=f'stage{si}_csp')(x)
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
    def __call__(self, feats: Sequence[jnp.ndarray]):
        ch = self.in_channels
        n = len(ch)
        # top-down
        inner = [feats[-1]]
        for k, idx in enumerate(range(n - 1, 0, -1)):
            high = ConvBNAct(ch[idx - 1], 1, dtype=self.dtype,
                             name=f'reduce{k}')(inner[0])
            inner[0] = high
            # nearest x2 upsample (matches torch Upsample(mode='nearest'))
            up = jnp.repeat(jnp.repeat(high, 2, axis=-3), 2, axis=-2)
            up = up[..., :feats[idx - 1].shape[-3],
                    :feats[idx - 1].shape[-2], :]
            merged = jnp.concatenate([up, feats[idx - 1]], -1)
            td = CSPLayer(ch[idx - 1], self.num_csp_blocks,
                          add_identity=False, dtype=self.dtype,
                          name=f'top_down{k}')(merged)
            inner.insert(0, td)
        # bottom-up
        outs = [inner[0]]
        for idx in range(n - 1):
            down = ConvBNAct(ch[idx], 3, 2, dtype=self.dtype,
                             name=f'downsample{idx}')(outs[-1])
            merged = jnp.concatenate([down, inner[idx + 1]], -1)
            bu = CSPLayer(ch[idx + 1], self.num_csp_blocks,
                          add_identity=False, dtype=self.dtype,
                          name=f'bottom_up{idx}')(merged)
            outs.append(bu)
        return tuple(
            ConvBNAct(self.out_channels, 3, dtype=self.dtype,
                      name=f'out{i}')(o) for i, o in enumerate(outs))
