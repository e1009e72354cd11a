"""BEiT-Large vision transformer backbone (Flax) for MiDaS DPT.

The reference fetches DPT_BEiT_L_384 from torch.hub
(depth_modules/zoedepth/models/base_models/midas.py:333-346); this is
the TPU-native equivalent: timm-schema BEiT (patch16, 1024 dim, 24
blocks, 16 heads, per-block relative position bias, layer-scale
gammas, q/v-only biases), with feature hooks at blocks (5, 11, 17,
23) like the MiDaS backbone.

The relative-position bias index is precomputed for the model's
static patch grid; checkpoint tables trained at 24x24 are bicubic-
resized to the target grid at conversion time (models/zoedepth.py),
mirroring MiDaS's variable-resolution handling.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def rel_pos_index(wh: int, ww: int) -> np.ndarray:
    """(N+1, N+1) int index into the (2wh-1)(2ww-1)+3 bias table
    (timm BEiT layout: 3 trailing rows are token↔cls entries)."""
    coords = np.stack(np.meshgrid(np.arange(wh), np.arange(ww),
                                  indexing='ij'))        # 2, wh, ww
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]            # 2, N, N
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    num_rel = (2 * wh - 1) * (2 * ww - 1)
    n = wh * ww
    idx = np.zeros((n + 1, n + 1), np.int64)
    idx[1:, 1:] = rel.sum(-1)
    # timm beit gen_relative_position_index trailing-row order:
    # cls-as-query rows get num-3, cls-as-key cols num-2, cls-to-cls
    # num-1 (table size num_rel+3) — assignment order matters, the
    # later writes overwrite the earlier ones at row/col 0
    idx[0, 0:] = num_rel          # num_relative_distance - 3
    idx[0:, 0] = num_rel + 1      # num_relative_distance - 2
    idx[0, 0] = num_rel + 2       # num_relative_distance - 1
    return idx


class BeitAttention(nn.Module):
    dim: int
    num_heads: int
    grid: Tuple[int, int]

    @nn.compact
    def __call__(self, x):
        B, N, C = x.shape
        hd = self.dim // self.num_heads
        qkv_w = self.param('qkv_kernel', nn.initializers.xavier_uniform(),
                           (C, 3 * self.dim))
        q_bias = self.param('q_bias', nn.initializers.zeros, (self.dim,))
        v_bias = self.param('v_bias', nn.initializers.zeros, (self.dim,))
        qkv = x @ qkv_w
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q + q_bias
        v = v + v_bias

        def heads(t):
            return t.reshape(B, N, self.num_heads, hd).transpose(0, 2, 1, 3)
        q, k, v = heads(q), heads(k), heads(v)

        wh, ww = self.grid
        num_rel = (2 * wh - 1) * (2 * ww - 1) + 3
        table = self.param('rel_pos_table', nn.initializers.zeros,
                           (num_rel, self.num_heads))
        idx = jnp.asarray(rel_pos_index(wh, ww))
        bias = table[idx]                                # (N+1, N+1, H)
        bias = bias.transpose(2, 0, 1)[None]

        attn = (q * (hd ** -0.5)) @ k.transpose(0, 1, 3, 2) + bias
        attn = jax.nn.softmax(attn, axis=-1)
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(B, N, self.dim)
        out = nn.Dense(self.dim, name='proj')(out)
        return out


class BeitBlock(nn.Module):
    dim: int
    num_heads: int
    grid: Tuple[int, int]
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x):
        g1 = self.param('gamma_1', nn.initializers.ones, (self.dim,))
        g2 = self.param('gamma_2', nn.initializers.ones, (self.dim,))
        h = nn.LayerNorm(epsilon=1e-6, name='norm1')(x)
        x = x + g1 * BeitAttention(self.dim, self.num_heads, self.grid,
                                   name='attn')(h)
        h = nn.LayerNorm(epsilon=1e-6, name='norm2')(x)
        h = nn.Dense(int(self.dim * self.mlp_ratio), name='mlp_fc1')(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, name='mlp_fc2')(h)
        return x + g2 * h


class BeitBackbone(nn.Module):
    """Returns token sequences (incl. cls) at the hook blocks."""
    img_size: Tuple[int, int] = (384, 384)
    patch: int = 16
    dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    hooks: Tuple[int, ...] = (5, 11, 17, 23)

    @nn.compact
    def __call__(self, x) -> Sequence[jnp.ndarray]:
        B, H, W, _ = x.shape
        gh, gw = H // self.patch, W // self.patch
        x = nn.Conv(self.dim, (self.patch, self.patch),
                    strides=(self.patch, self.patch), padding='VALID',
                    name='patch_embed')(x)
        x = x.reshape(B, gh * gw, self.dim)
        cls = self.param('cls_token', nn.initializers.zeros,
                         (1, 1, self.dim))
        x = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, self.dim)), x],
                            axis=1)
        feats = []
        for i in range(self.depth):
            x = BeitBlock(self.dim, self.num_heads, (gh, gw),
                          name=f'block{i}')(x)
            if i in self.hooks:
                feats.append(x)
        return feats
