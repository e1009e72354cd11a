"""SwinV2 image classifier — the WD (waifu-diffusion) Danbooru tagger
backbone, ported TPU-native.

Parity: the reference runs ``wd-v1-4-swinv2-tagger-v2/model.onnx``
through onnxruntime (utils/booru_tagger.py:40-45); the network inside
that onnx is a SwinV2 classifier.  This module implements the SwinV2
architecture natively in Flax (NHWC, static shapes, window partition
via reshapes so XLA keeps everything fused) and `convert_swinv2`
imports timm-format torch checkpoints (e.g. the published
``wd-swinv2-tagger-v3`` timm weights).

Architecture notes (SwinV2 = "Swin Transformer V2", Liu et al. 2022):
- post-norm residual blocks: ``x + norm(attn(x))``, ``x + norm(mlp(x))``
- scaled cosine attention: ``cos(q,k) * exp(clamp(logit_scale))`` with
  a learned per-head temperature instead of ``1/sqrt(d)``
- log-spaced continuous relative position bias: a 2-layer MLP maps the
  log-scaled relative coordinate table to per-head biases, passed
  through ``16 * sigmoid``
- qkv projection has no joint bias; separate q_bias / v_bias (k has
  none)
- patch merging: 2x2 neighbour concat -> Linear(4C->2C, no bias) ->
  LayerNorm, applied at the *start* of stages 1..3 (timm layout)

Feature resolutions not divisible by the window size are zero-padded
to the next multiple and cropped after attention (timm does the same).
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

LOGIT_SCALE_MAX = float(np.log(100.0))


# ---------------------------------------------------------------------------
# static (numpy) geometry tables
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=64)
def relative_coords_table(wh: int, ww: int, pwh: int = 0,
                          pww: int = 0) -> np.ndarray:
    """Log-spaced relative coordinate table, ((2wh-1)(2ww-1), 2) f32.

    Normalised by the pretrained window size when given (transfer
    across window sizes), else by the current one."""
    h = np.arange(-(wh - 1), wh, dtype=np.float64)
    w = np.arange(-(ww - 1), ww, dtype=np.float64)
    table = np.stack(np.meshgrid(h, w, indexing='ij'), axis=-1)
    table[..., 0] /= max((pwh if pwh > 0 else wh) - 1, 1)
    table[..., 1] /= max((pww if pww > 0 else ww) - 1, 1)
    table *= 8.0
    table = (np.sign(table) * np.log2(np.abs(table) + 1.0)
             / np.log2(8.0))
    return table.reshape(-1, 2).astype(np.float32)


@functools.lru_cache(maxsize=64)
def relative_position_index(wh: int, ww: int) -> np.ndarray:
    """(wh*ww, wh*ww) int32 index into the flattened coords table."""
    coords = np.stack(np.meshgrid(np.arange(wh), np.arange(ww),
                                  indexing='ij'))          # (2, wh, ww)
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]              # (2, N, N)
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[..., 0] += wh - 1
    rel[..., 1] += ww - 1
    rel[..., 0] *= 2 * ww - 1
    return rel.sum(-1).astype(np.int32)


@functools.lru_cache(maxsize=64)
def shift_attn_mask(hp: int, wp: int, window, shift) -> np.ndarray:
    """(num_windows, wh*ww, wh*ww) additive mask (0 / -100) for
    shifted windows on a (hp, wp) padded feature map. ``window`` and
    ``shift`` may be ints (square) or per-axis (wh, ww)/(sh, sw) —
    an axis with zero shift contributes a single region (the timm
    per-axis suppression rule)."""
    wh, ww = (window, window) if isinstance(window, int) else window
    sh, sw = (shift, shift) if isinstance(shift, int) else shift
    img = np.zeros((hp, wp), np.int32)
    cnt = 0
    hslices = ((slice(0, -wh), slice(-wh, -sh), slice(-sh, None))
               if sh else (slice(None),))
    wslices = ((slice(0, -ww), slice(-ww, -sw), slice(-sw, None))
               if sw else (slice(None),))
    for hs in hslices:
        for ws in wslices:
            img[hs, ws] = cnt
            cnt += 1
    win = img.reshape(hp // wh, wh, wp // ww, ww)
    win = win.transpose(0, 2, 1, 3).reshape(-1, wh * ww)
    diff = win[:, None, :] != win[:, :, None]
    return np.where(diff, -100.0, 0.0).astype(np.float32)


def window_partition(x: jnp.ndarray, w) -> jnp.ndarray:
    """(B, H, W, C) -> (B*nW, wh*ww, C); H, W multiples of wh/ww."""
    wh, ww = (w, w) if isinstance(w, int) else w
    B, H, W, C = x.shape
    x = x.reshape(B, H // wh, wh, W // ww, ww, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, wh * ww, C)


def window_reverse(x: jnp.ndarray, w, H: int, W: int) -> jnp.ndarray:
    """(B*nW, wh*ww, C) -> (B, H, W, C)."""
    wh, ww = (w, w) if isinstance(w, int) else w
    C = x.shape[-1]
    x = x.reshape(-1, H // wh, W // ww, wh, ww, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, H, W, C)


# ---------------------------------------------------------------------------
# modules
# ---------------------------------------------------------------------------

class WindowAttentionV2(nn.Module):
    """Scaled-cosine window attention with continuous rel-pos bias."""
    dim: int
    num_heads: int
    window_size: Tuple[int, int]
    pretrained_window_size: Tuple[int, int] = (0, 0)

    @nn.compact
    def __call__(self, x, mask=None):
        B, N, C = x.shape
        nh = self.num_heads
        hd = C // nh

        qkv_w = self.param('qkv_kernel', nn.initializers.lecun_normal(),
                           (C, 3 * C))
        q_b = self.param('q_bias', nn.initializers.zeros, (C,))
        v_b = self.param('v_bias', nn.initializers.zeros, (C,))
        logit_scale = self.param(
            'logit_scale',
            lambda k, s: jnp.full(s, float(np.log(10.0))),
            (nh, 1, 1))

        qkv_b = jnp.concatenate([q_b, jnp.zeros_like(q_b), v_b])
        qkv = x @ qkv_w + qkv_b
        qkv = qkv.reshape(B, N, 3, nh, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]

        qn = q / jnp.maximum(
            jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
        kn = k / jnp.maximum(
            jnp.linalg.norm(k, axis=-1, keepdims=True), 1e-12)
        attn = jnp.einsum('bhnd,bhmd->bhnm', qn, kn)
        scale = jnp.exp(jnp.minimum(logit_scale, LOGIT_SCALE_MAX))
        attn = attn * scale

        wh, ww = self.window_size
        table = jnp.asarray(relative_coords_table(
            wh, ww, *self.pretrained_window_size))
        hid = nn.Dense(512, name='cpb_fc1')(table)
        bias_table = nn.Dense(nh, use_bias=False,
                              name='cpb_fc2')(nn.relu(hid))
        idx = relative_position_index(wh, ww).reshape(-1)
        bias = bias_table[idx].reshape(N, N, nh).transpose(2, 0, 1)
        attn = attn + 16.0 * jax.nn.sigmoid(bias)[None]

        if mask is not None:
            nW = mask.shape[0]
            attn = attn.reshape(B // nW, nW, nh, N, N) \
                + mask[None, :, None]
            attn = attn.reshape(B, nh, N, N)

        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum('bhnm,bhmd->bhnd', attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, C)
        return nn.Dense(C, name='proj')(out)


class SwinV2Block(nn.Module):
    """Post-norm Swin block; `shift` > 0 means shifted windows."""
    dim: int
    num_heads: int
    window: int
    shift: int
    mlp_ratio: float = 4.0
    pretrained_window_size: int = 0

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        # timm _calc_window_shift, PER AXIS: an axis fully covered by
        # one window shrinks the window to the map and drops its
        # shift; the other axis keeps the configured window/shift
        # (rectangular windows on non-square maps)
        wh = H if H <= self.window else self.window
        ww = W if W <= self.window else self.window
        sh = self.shift if (self.shift > 0 and H > wh) else 0
        sw = self.shift if (self.shift > 0 and W > ww) else 0

        pad_h = (-H) % wh
        pad_w = (-W) % ww
        xa = x
        if pad_h or pad_w:
            xa = jnp.pad(xa, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        Hp, Wp = H + pad_h, W + pad_w

        if sh or sw:
            xa = jnp.roll(xa, (-sh, -sw), axis=(1, 2))
            mask = jnp.asarray(
                shift_attn_mask(Hp, Wp, (wh, ww), (sh, sw)))
        else:
            mask = None

        wins = window_partition(xa, (wh, ww))
        attn = WindowAttentionV2(
            self.dim, self.num_heads, (wh, ww),
            (self.pretrained_window_size,) * 2, name='attn')(wins, mask)
        xa = window_reverse(attn, (wh, ww), Hp, Wp)

        if sh or sw:
            xa = jnp.roll(xa, (sh, sw), axis=(1, 2))
        if pad_h or pad_w:
            xa = xa[:, :H, :W]

        x = x + nn.LayerNorm(epsilon=1e-5, name='norm1')(xa)
        h = nn.Dense(int(self.dim * self.mlp_ratio), name='fc1')(x)
        h = nn.Dense(self.dim, name='fc2')(nn.gelu(h, approximate=False))
        return x + nn.LayerNorm(epsilon=1e-5, name='norm2')(h)


class PatchMerging(nn.Module):
    """2x2 concat -> Linear(4C->2C, no bias) -> LayerNorm (V2 order)."""
    out_dim: int

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        if H % 2 or W % 2:
            x = jnp.pad(x, ((0, 0), (0, H % 2), (0, W % 2), (0, 0)))
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        x = nn.Dense(self.out_dim, use_bias=False, name='reduction')(x)
        return nn.LayerNorm(epsilon=1e-5, name='norm')(x)


class SwinV2(nn.Module):
    """SwinV2 classifier. Input NHWC float; output (B, num_classes)
    logits (the WD tagger applies sigmoid on top)."""
    num_classes: int = 9083
    embed_dim: int = 128
    depths: Sequence[int] = (2, 2, 18, 2)
    num_heads: Sequence[int] = (4, 8, 16, 32)
    window: int = 8
    mlp_ratio: float = 4.0
    pretrained_window_sizes: Sequence[int] = (0, 0, 0, 0)

    @nn.compact
    def __call__(self, x, return_features: bool = False):
        x = nn.Conv(self.embed_dim, (4, 4), strides=(4, 4),
                    padding='VALID', name='patch_embed')(x)
        x = nn.LayerNorm(epsilon=1e-5, name='patch_norm')(x)

        for i, depth in enumerate(self.depths):
            dim = self.embed_dim * (2 ** i)
            if i > 0:
                x = PatchMerging(dim, name=f'merge{i}')(x)
            for j in range(depth):
                x = SwinV2Block(
                    dim, self.num_heads[i], self.window,
                    shift=0 if j % 2 == 0 else self.window // 2,
                    mlp_ratio=self.mlp_ratio,
                    pretrained_window_size=self.pretrained_window_sizes[i],
                    name=f'stage{i}_block{j}')(x)

        x = nn.LayerNorm(epsilon=1e-5, name='norm')(x)
        feats = jnp.mean(x, axis=(1, 2))
        if return_features:
            return feats
        return nn.Dense(self.num_classes, name='head')(feats)


def wd_tagger_swinv2(num_classes: int = 9083) -> "SwinV2":
    """SwinV2-Base geometry used by the WD taggers (448 px input,
    patch 4, window 8 — stage grids 112/56/28/14, the last padded to
    16 for windowing)."""
    return SwinV2(num_classes=num_classes, embed_dim=128,
                  depths=(2, 2, 18, 2), num_heads=(4, 8, 16, 32),
                  window=8)


# ---------------------------------------------------------------------------
# timm checkpoint converter
# ---------------------------------------------------------------------------

def _ln(sd, pre):
    return {'scale': jnp.asarray(sd[pre + '.weight']),
            'bias': jnp.asarray(sd[pre + '.bias'])}


def _dense(sd, pre, bias=True):
    out = {'kernel': jnp.asarray(np.asarray(sd[pre + '.weight']).T)}
    if bias:
        out['bias'] = jnp.asarray(sd[pre + '.bias'])
    return out


def convert_swinv2(sd: Dict[str, Any], depths: Sequence[int] = (2, 2, 18, 2)
                   ) -> Dict[str, Any]:
    """timm swinv2 state dict -> flax variables for `SwinV2`.

    Handles both the bare-`head` and `head.fc` classifier namings."""
    sd = {k[6:] if k.startswith('model.') else k: v for k, v in sd.items()}
    p: Dict[str, Any] = {}

    w = np.asarray(sd['patch_embed.proj.weight'])        # (D, 3, 4, 4)
    p['patch_embed'] = {'kernel': jnp.asarray(w.transpose(2, 3, 1, 0)),
                        'bias': jnp.asarray(sd['patch_embed.proj.bias'])}
    p['patch_norm'] = _ln(sd, 'patch_embed.norm')

    for i, depth in enumerate(depths):
        lp = f'layers.{i}'
        if i > 0:
            p[f'merge{i}'] = {
                'reduction': _dense(sd, f'{lp}.downsample.reduction',
                                    bias=False),
                'norm': _ln(sd, f'{lp}.downsample.norm')}
        for j in range(depth):
            bp = f'{lp}.blocks.{j}'
            attn = {
                'qkv_kernel': jnp.asarray(
                    np.asarray(sd[f'{bp}.attn.qkv.weight']).T),
                'q_bias': jnp.asarray(sd[f'{bp}.attn.q_bias']),
                'v_bias': jnp.asarray(sd[f'{bp}.attn.v_bias']),
                'logit_scale': jnp.asarray(sd[f'{bp}.attn.logit_scale']),
                'cpb_fc1': _dense(sd, f'{bp}.attn.cpb_mlp.0'),
                'cpb_fc2': _dense(sd, f'{bp}.attn.cpb_mlp.2', bias=False),
                'proj': _dense(sd, f'{bp}.attn.proj'),
            }
            p[f'stage{i}_block{j}'] = {
                'attn': attn,
                'norm1': _ln(sd, f'{bp}.norm1'),
                'fc1': _dense(sd, f'{bp}.mlp.fc1'),
                'fc2': _dense(sd, f'{bp}.mlp.fc2'),
                'norm2': _ln(sd, f'{bp}.norm2'),
            }

    p['norm'] = _ln(sd, 'norm')
    head_pre = 'head.fc' if 'head.fc.weight' in sd else 'head'
    if head_pre + '.weight' in sd:
        p['head'] = _dense(sd, head_pre)
    return {'params': p}
