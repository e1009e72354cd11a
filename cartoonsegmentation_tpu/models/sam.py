"""Native Flax SAM (Segment Anything) — box-prompted mask decoder.

The reference's `detector: sam` option routes AnimeInsSeg boxes
through the external `segment_anything` package
(`anime_3dkenburns/kenburns_effect.py:848-860`: `from sam import
apply_sam`; `configs/3dkenburns_sam.yaml:6`). That package is not
part of the reference repo; this module is a from-scratch TPU-native
implementation of the SAM architecture so the shipped
`3dkenburns_sam.yaml` workload is runnable in-process:

- `SamImageEncoder` — ViT-det image encoder (windowed attention with
  decomposed relative positions, a few global blocks, convolutional
  neck). NHWC, static shapes: window partition pads to a multiple of
  the window size with plain reshapes — no dynamic control flow.
- `SamPromptEncoder` — random-Fourier positional embedding of box
  corners plus learned corner type embeddings.
- `SamMaskDecoder` — two-way transformer (tokens↔image cross
  attention), hypernetwork mask heads, IoU ranking head.

Checkpoint compatibility: `convert_sam` maps the official
`sam_vit_{b,l,h}` state dicts onto these modules (key schema
documented per converter); `tests/torch_twins.py::TorchSAM` builds
the same schema in torch and the full forward is compared
numerically in tests/test_sam.py.

All shapes are static: K (box capacity) is fixed and padded with a
validity mask, so one compiled program serves every frame.
"""
from __future__ import annotations

import math
from typing import Dict, Mapping, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .convert import _np, conv_w, deconv_w, lin_w


def _gelu(x):
    # torch nn.GELU default (erf form)
    return jax.nn.gelu(x, approximate=False)


class LayerNorm2d(nn.Module):
    """SAM's channels-first LayerNorm2d: per-pixel normalization over
    the channel axis, eps 1e-6 (here NHWC → last axis)."""
    features: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        w = self.param('weight', nn.initializers.ones, (self.features,))
        b = self.param('bias', nn.initializers.zeros, (self.features,))
        mu = x.mean(-1, keepdims=True)
        var = ((x - mu) ** 2).mean(-1, keepdims=True)
        x = (x - mu) / jnp.sqrt(var + self.eps)
        return x * w + b


# ---------------------------------------------------------------------------
# image encoder
# ---------------------------------------------------------------------------

def _rel_pos_table(q_size: int, k_size: int) -> np.ndarray:
    """Static (q, k) index table into a (2*max(q,k)-1, d) rel-pos
    param (decomposed relative attention; q_size == k_size here)."""
    q = np.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k = np.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    return (q - k + (k_size - 1) * max(q_size / k_size, 1.0)
            ).astype(np.int32)


class SamAttention(nn.Module):
    """Encoder attention with decomposed relative positions. Input
    (B, H, W, C) — windows are just a bigger B."""
    dim: int
    num_heads: int
    rel_pos_dim: int          # 2*size-1 rows in the rel-pos tables

    @nn.compact
    def __call__(self, x):
        B, H, W, _ = x.shape
        hd = self.dim // self.num_heads
        qkv = nn.Dense(self.dim * 3, name='qkv')(x)
        qkv = qkv.reshape(B, H * W, 3, self.num_heads, hd)
        q, k, v = [qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3)]

        attn = (q * (hd ** -0.5)) @ k.transpose(0, 1, 3, 2)

        rel_h = self.param('rel_pos_h', nn.initializers.zeros,
                           (self.rel_pos_dim, hd))
        rel_w = self.param('rel_pos_w', nn.initializers.zeros,
                           (self.rel_pos_dim, hd))
        Rh = rel_h[_rel_pos_table(H, H)]          # (H, H, hd)
        Rw = rel_w[_rel_pos_table(W, W)]          # (W, W, hd)
        rq = q.reshape(B, self.num_heads, H, W, hd)
        bh = jnp.einsum('bnhwc,hkc->bnhwk', rq, Rh)
        bw = jnp.einsum('bnhwc,wkc->bnhwk', rq, Rw)
        attn = attn.reshape(B, self.num_heads, H, W, H, W) \
            + bh[..., :, None] + bw[..., None, :]
        attn = attn.reshape(B, self.num_heads, H * W, H * W)

        attn = jax.nn.softmax(attn, axis=-1)
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(B, H, W, self.dim)
        return nn.Dense(self.dim, name='proj')(out)


class SamBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float
    window: int               # 0 → global attention

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        sc = x
        x = nn.LayerNorm(epsilon=1e-6, name='norm1')(x)
        if self.window > 0:
            w = self.window
            Hp, Wp = -(-H // w) * w, -(-W // w) * w
            x = jnp.pad(x, ((0, 0), (0, Hp - H), (0, Wp - W), (0, 0)))
            x = x.reshape(B, Hp // w, w, Wp // w, w, C) \
                 .transpose(0, 1, 3, 2, 4, 5) \
                 .reshape(B * (Hp // w) * (Wp // w), w, w, C)
            size = w
        else:
            size = H
        x = SamAttention(self.dim, self.num_heads,
                         rel_pos_dim=2 * size - 1, name='attn')(x)
        if self.window > 0:
            w = self.window
            x = x.reshape(B, Hp // w, Wp // w, w, w, C) \
                 .transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, C)
            x = x[:, :H, :W]
        x = sc + x
        sc = x
        x = nn.LayerNorm(epsilon=1e-6, name='norm2')(x)
        x = nn.Dense(int(self.dim * self.mlp_ratio), name='lin1')(x)
        x = nn.Dense(self.dim, name='lin2')(_gelu(x))
        return sc + x


class SamImageEncoder(nn.Module):
    """ViT-det encoder + neck → (B, S/16, S/16, 256)."""
    img_size: int = 1024
    patch: int = 16
    dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    window: int = 14
    global_idx: Sequence[int] = (2, 5, 8, 11)
    out_ch: int = 256

    @nn.compact
    def __call__(self, x):
        g = self.img_size // self.patch
        x = nn.Conv(self.dim, (self.patch, self.patch),
                    strides=(self.patch, self.patch), padding='VALID',
                    name='patch_embed')(x)
        pos = self.param('pos_embed', nn.initializers.zeros,
                         (1, g, g, self.dim))
        x = x + pos
        for i in range(self.depth):
            x = SamBlock(self.dim, self.num_heads, self.mlp_ratio,
                         window=0 if i in self.global_idx
                         else self.window, name=f'block{i}')(x)
        x = nn.Conv(self.out_ch, (1, 1), use_bias=False,
                    name='neck0')(x)
        x = LayerNorm2d(self.out_ch, name='neck1')(x)
        x = nn.Conv(self.out_ch, (3, 3), padding=[(1, 1), (1, 1)],
                    use_bias=False, name='neck2')(x)
        return LayerNorm2d(self.out_ch, name='neck3')(x)


# ---------------------------------------------------------------------------
# prompt encoder
# ---------------------------------------------------------------------------

class SamPromptEncoder(nn.Module):
    """Random-Fourier point encoding + learned corner embeddings.

    Box prompts only (the Ken Burns seam feeds detector boxes);
    the official mask-input branch is not implemented — its
    checkpoint keys are ignored by the converter."""
    embed_dim: int = 256
    grid: int = 64            # image-embedding spatial size
    input_size: int = 1024    # pixel coordinate range of prompts

    def setup(self):
        self.pe_gauss = self.param(
            'pe_gauss',
            lambda k, s: jax.random.normal(k, s, jnp.float32),
            (2, self.embed_dim // 2))
        # 0/1: fg/bg point, 2: box top-left, 3: box bottom-right
        self.point_embed = self.param(
            'point_embed', nn.initializers.normal(1.0),
            (4, self.embed_dim))
        self.no_mask_embed = self.param(
            'no_mask_embed', nn.initializers.normal(1.0),
            (self.embed_dim,))

    def _pe(self, coords01):
        """coords01 (..., 2) in [0,1] → (..., embed_dim)."""
        c = (2.0 * coords01 - 1.0) @ self.pe_gauss
        c = 2.0 * jnp.pi * c
        return jnp.concatenate([jnp.sin(c), jnp.cos(c)], -1)

    def dense_pe(self):
        """Positional encoding of the embedding grid (grid, grid, D)."""
        g = self.grid
        ys = (jnp.arange(g, dtype=jnp.float32) + 0.5) / g
        xs = (jnp.arange(g, dtype=jnp.float32) + 0.5) / g
        grid = jnp.stack(jnp.meshgrid(xs, ys, indexing='xy'), -1)
        return self._pe(grid)

    def encode_boxes(self, boxes_xyxy):
        """(K, 4) pixel boxes → sparse embeddings (K, 2, D)."""
        pts = boxes_xyxy.reshape(-1, 2, 2) + 0.5
        emb = self._pe(pts / self.input_size)
        return emb + self.point_embed[jnp.asarray([2, 3])][None]

    def __call__(self, boxes_xyxy):
        sparse = self.encode_boxes(boxes_xyxy)
        dense = jnp.broadcast_to(
            self.no_mask_embed, (self.grid, self.grid, self.embed_dim))
        return sparse, dense


# ---------------------------------------------------------------------------
# mask decoder
# ---------------------------------------------------------------------------

class TwoWayAttn(nn.Module):
    dim: int
    num_heads: int
    downsample: int = 1

    @nn.compact
    def __call__(self, q, k, v):
        d = self.dim // self.downsample
        hd = d // self.num_heads
        B = q.shape[0]

        def proj(t, name):
            return nn.Dense(d, name=name)(t) \
                .reshape(B, -1, self.num_heads, hd).transpose(0, 2, 1, 3)
        qh, kh, vh = proj(q, 'q_proj'), proj(k, 'k_proj'), proj(v, 'v_proj')
        attn = jax.nn.softmax(qh @ kh.transpose(0, 1, 3, 2)
                              / math.sqrt(hd), axis=-1)
        out = (attn @ vh).transpose(0, 2, 1, 3).reshape(B, -1, d)
        return nn.Dense(self.dim, name='out_proj')(out)


class TwoWayBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_dim: int
    skip_first_layer_pe: bool

    @nn.compact
    def __call__(self, queries, keys, query_pe, key_pe):
        if self.skip_first_layer_pe:
            queries = TwoWayAttn(self.dim, self.num_heads,
                                 name='self_attn')(queries, queries,
                                                   queries)
        else:
            q = queries + query_pe
            queries = queries + TwoWayAttn(
                self.dim, self.num_heads, name='self_attn')(q, q, queries)
        queries = nn.LayerNorm(name='norm1')(queries)

        q = queries + query_pe
        k = keys + key_pe
        queries = queries + TwoWayAttn(
            self.dim, self.num_heads, 2,
            name='cross_attn_token_to_image')(q, k, keys)
        queries = nn.LayerNorm(name='norm2')(queries)

        h = nn.Dense(self.mlp_dim, name='lin1')(queries)
        queries = queries + nn.Dense(self.dim, name='lin2')(_gelu(h))
        queries = nn.LayerNorm(name='norm3')(queries)

        q = queries + query_pe
        keys = keys + TwoWayAttn(
            self.dim, self.num_heads, 2,
            name='cross_attn_image_to_token')(k, q, queries)
        keys = nn.LayerNorm(name='norm4')(keys)
        return queries, keys


class TwoWayTransformer(nn.Module):
    depth: int = 2
    dim: int = 256
    num_heads: int = 8
    mlp_dim: int = 2048

    @nn.compact
    def __call__(self, image_embedding, image_pe, point_embedding):
        """image_embedding/image_pe (B, HW, D), points (B, T, D)."""
        queries, keys = point_embedding, image_embedding
        for i in range(self.depth):
            queries, keys = TwoWayBlock(
                self.dim, self.num_heads, self.mlp_dim,
                skip_first_layer_pe=(i == 0), name=f'layer{i}')(
                    queries, keys, point_embedding, image_pe)
        q = queries + point_embedding
        k = keys + image_pe
        queries = queries + TwoWayAttn(
            self.dim, self.num_heads, 2,
            name='final_attn_token_to_image')(q, k, keys)
        return nn.LayerNorm(name='norm_final_attn')(queries), keys


class _MLP3(nn.Module):
    hidden: int
    out: int

    @nn.compact
    def __call__(self, x):
        x = jax.nn.relu(nn.Dense(self.hidden, name='l0')(x))
        x = jax.nn.relu(nn.Dense(self.hidden, name='l1')(x))
        return nn.Dense(self.out, name='l2')(x)


class SamMaskDecoder(nn.Module):
    dim: int = 256
    num_heads: int = 8
    mlp_dim: int = 2048
    num_multimask: int = 3

    @nn.compact
    def __call__(self, image_embedding, image_pe, sparse, dense):
        """image_embedding (G, G, D); sparse (K, T, D); dense (G,G,D).
        Returns (masks (K, 1+num_multimask, 4G, 4G), iou (K, ...))."""
        G = image_embedding.shape[0]
        K = sparse.shape[0]
        nm = self.num_multimask + 1
        iou_tok = self.param('iou_token', nn.initializers.normal(1.0),
                             (1, self.dim))
        mask_tok = self.param('mask_tokens', nn.initializers.normal(1.0),
                              (nm, self.dim))
        out_tokens = jnp.concatenate([iou_tok, mask_tok], 0)
        tokens = jnp.concatenate(
            [jnp.broadcast_to(out_tokens, (K,) + out_tokens.shape),
             sparse], 1)

        src = (image_embedding + dense).reshape(1, G * G, self.dim)
        src = jnp.broadcast_to(src, (K, G * G, self.dim))
        pos = jnp.broadcast_to(image_pe.reshape(1, G * G, self.dim),
                               (K, G * G, self.dim))
        hs, src = TwoWayTransformer(
            2, self.dim, self.num_heads, self.mlp_dim,
            name='transformer')(src, pos, tokens)
        iou_out = hs[:, 0]
        mask_out = hs[:, 1:1 + nm]

        x = src.reshape(K, G, G, self.dim)
        x = nn.ConvTranspose(self.dim // 4, (2, 2), strides=(2, 2),
                             name='up0')(x)
        x = _gelu(LayerNorm2d(self.dim // 4, name='up_ln')(x))
        x = nn.ConvTranspose(self.dim // 8, (2, 2), strides=(2, 2),
                             name='up1')(x)
        up = _gelu(x)                                 # (K, 4G, 4G, D/8)

        hyper = jnp.stack(
            [_MLP3(self.dim, self.dim // 8, name=f'hyper{i}')(
                mask_out[:, i]) for i in range(nm)], 1)   # (K, nm, D/8)
        masks = jnp.einsum('knc,khwc->knhw', hyper, up)
        iou = _MLP3(self.dim, nm, name='iou_head')(iou_out)
        return masks, iou


# ---------------------------------------------------------------------------
# full model
# ---------------------------------------------------------------------------

class SAM(nn.Module):
    """encode(image) once per image; decode(embedding, boxes) per
    prompt batch. `__call__` chains both (used for init/tests)."""
    img_size: int = 1024
    patch: int = 16
    enc_dim: int = 768
    enc_depth: int = 12
    enc_heads: int = 12
    window: int = 14
    global_idx: Sequence[int] = (2, 5, 8, 11)
    dec_dim: int = 256
    dec_heads: int = 8
    dec_mlp: int = 2048

    def setup(self):
        self.image_encoder = SamImageEncoder(
            self.img_size, self.patch, self.enc_dim, self.enc_depth,
            self.enc_heads, 4.0, self.window, self.global_idx,
            self.dec_dim)
        self.prompt_encoder = SamPromptEncoder(
            self.dec_dim, self.img_size // self.patch, self.img_size)
        self.mask_decoder = SamMaskDecoder(
            self.dec_dim, self.dec_heads, self.dec_mlp)

    def encode(self, x):
        return self.image_encoder(x)

    def decode(self, embedding, boxes_xyxy, multimask: bool = True):
        """embedding (G,G,D), boxes (K,4) → best mask per box:
        (K, 4G, 4G) logits + (K,) predicted IoU."""
        sparse, dense = self.prompt_encoder(boxes_xyxy)
        pe = self.prompt_encoder.dense_pe()
        masks, iou = self.mask_decoder(embedding, pe, sparse, dense)
        if multimask:
            masks, iou = masks[:, 1:], iou[:, 1:]
        else:
            masks, iou = masks[:, :1], iou[:, :1]
        best = jnp.argmax(iou, -1)
        pick = jax.nn.one_hot(best, masks.shape[1], dtype=masks.dtype)
        return jnp.einsum('kn,knhw->khw', pick, masks), \
            jnp.max(iou, -1)

    def __call__(self, x, boxes_xyxy):
        emb = self.encode(x)
        return self.decode(emb[0], boxes_xyxy)


# pixel stats of the official predictor (RGB, 0-255)
SAM_MEAN = np.array([123.675, 116.28, 103.53], np.float32)
SAM_STD = np.array([58.395, 57.12, 57.375], np.float32)


# ---------------------------------------------------------------------------
# checkpoint converter (official sam_vit_* state dict schema)
# ---------------------------------------------------------------------------

def _ln_p(sd, pre):
    return {'scale': _np(sd[pre + '.weight']),
            'bias': _np(sd[pre + '.bias'])}


def _ln2d_p(sd, pre):
    return {'weight': _np(sd[pre + '.weight']),
            'bias': _np(sd[pre + '.bias'])}


def _dense_p(sd, pre):
    return {'kernel': lin_w(sd[pre + '.weight']),
            'bias': _np(sd[pre + '.bias'])}


def _attn2w_p(sd, pre):
    return {n: _dense_p(sd, f'{pre}.{n}')
            for n in ('q_proj', 'k_proj', 'v_proj', 'out_proj')}


def _resize_rel(t: np.ndarray, rows: int) -> np.ndarray:
    """Linearly resample a rel-pos table to `rows` rows (torch
    F.interpolate(linear) — needed when window/global sizes differ
    from the checkpoint's)."""
    if t.shape[0] == rows:
        return t
    import cv2
    return cv2.resize(t, (t.shape[1], rows),
                      interpolation=cv2.INTER_LINEAR)


def convert_sam(sd: Mapping, model: SAM) -> Dict:
    """Official `segment_anything` checkpoint → params for `model`.

    Key schema (sam_vit_b_01ec64.pth):
      image_encoder.{patch_embed.proj, pos_embed, blocks.N.*, neck.*}
      prompt_encoder.{pe_layer.positional_encoding_gaussian_matrix,
                      point_embeddings.0-3, no_mask_embed, ...}
      mask_decoder.{transformer.layers.*, iou_token, mask_tokens,
                    output_upscaling.*, output_hypernetworks_mlps.*,
                    iou_prediction_head.*}
    The prompt mask-input branch (mask_downscaling.*) and
    not_a_point_embed are unused by the box path and ignored.
    """
    sd = {k: v for k, v in sd.items()}
    g = model.img_size // model.patch
    pos = _np(sd['image_encoder.pos_embed'])
    if pos.shape[1] != g:
        # non-1024 img_size: resample the learned position grid the
        # same way the rel-pos tables are (bicubic, standard ViT
        # position-embedding interpolation; cv2 caps at 512 channels
        # → chunked)
        import cv2
        pos = np.concatenate(
            [np.atleast_3d(cv2.resize(pos[0][..., i:i + 256], (g, g),
                                      interpolation=cv2.INTER_CUBIC))
             for i in range(0, pos.shape[-1], 256)], -1)[None]
    enc: Dict = {
        'patch_embed': {'kernel': conv_w(
            sd['image_encoder.patch_embed.proj.weight']),
            'bias': _np(sd['image_encoder.patch_embed.proj.bias'])},
        'pos_embed': pos,
        'neck0': {'kernel': conv_w(sd['image_encoder.neck.0.weight'])},
        'neck1': _ln2d_p(sd, 'image_encoder.neck.1'),
        'neck2': {'kernel': conv_w(sd['image_encoder.neck.2.weight'])},
        'neck3': _ln2d_p(sd, 'image_encoder.neck.3'),
    }
    for i in range(model.enc_depth):
        pre = f'image_encoder.blocks.{i}'
        size = g if i in model.global_idx else model.window
        enc[f'block{i}'] = {
            'norm1': _ln_p(sd, pre + '.norm1'),
            'norm2': _ln_p(sd, pre + '.norm2'),
            'attn': {
                'qkv': _dense_p(sd, pre + '.attn.qkv'),
                'proj': _dense_p(sd, pre + '.attn.proj'),
                'rel_pos_h': _resize_rel(
                    _np(sd[pre + '.attn.rel_pos_h']), 2 * size - 1),
                'rel_pos_w': _resize_rel(
                    _np(sd[pre + '.attn.rel_pos_w']), 2 * size - 1),
            },
            'lin1': _dense_p(sd, pre + '.mlp.lin1'),
            'lin2': _dense_p(sd, pre + '.mlp.lin2'),
        }

    prm = {
        'pe_gauss': _np(
            sd['prompt_encoder.pe_layer'
               '.positional_encoding_gaussian_matrix']),
        'point_embed': np.stack([
            _np(sd[f'prompt_encoder.point_embeddings.{i}.weight'])[0]
            for i in range(4)]),
        'no_mask_embed': _np(
            sd['prompt_encoder.no_mask_embed.weight'])[0],
    }

    def mlp3(pre):
        return {f'l{j}': _dense_p(sd, f'{pre}.layers.{j}')
                for j in range(3)}

    layers = {}
    for i in range(2):
        pre = f'mask_decoder.transformer.layers.{i}'
        layers[f'layer{i}'] = {
            'self_attn': _attn2w_p(sd, pre + '.self_attn'),
            'cross_attn_token_to_image': _attn2w_p(
                sd, pre + '.cross_attn_token_to_image'),
            'cross_attn_image_to_token': _attn2w_p(
                sd, pre + '.cross_attn_image_to_token'),
            'lin1': _dense_p(sd, pre + '.mlp.lin1'),
            'lin2': _dense_p(sd, pre + '.mlp.lin2'),
            **{f'norm{j}': _ln_p(sd, f'{pre}.norm{j}')
               for j in (1, 2, 3, 4)},
        }
    dec = {
        'iou_token': _np(sd['mask_decoder.iou_token.weight']),
        'mask_tokens': _np(sd['mask_decoder.mask_tokens.weight']),
        'transformer': {
            **layers,
            'final_attn_token_to_image': _attn2w_p(
                sd, 'mask_decoder.transformer.final_attn_token_to_image'),
            'norm_final_attn': _ln_p(
                sd, 'mask_decoder.transformer.norm_final_attn'),
        },
        'up0': {'kernel': deconv_w(
            sd['mask_decoder.output_upscaling.0.weight']),
            'bias': _np(sd['mask_decoder.output_upscaling.0.bias'])},
        'up_ln': _ln2d_p(sd, 'mask_decoder.output_upscaling.1'),
        'up1': {'kernel': deconv_w(
            sd['mask_decoder.output_upscaling.3.weight']),
            'bias': _np(sd['mask_decoder.output_upscaling.3.bias'])},
        'iou_head': mlp3('mask_decoder.iou_prediction_head'),
    }
    nm = dec['mask_tokens'].shape[0]
    for i in range(nm):
        dec[f'hyper{i}'] = mlp3(
            f'mask_decoder.output_hypernetworks_mlps.{i}')

    return {'params': {'image_encoder': enc, 'prompt_encoder': prm,
                       'mask_decoder': dec}}


def sam_vit_b(img_size: int = 1024) -> SAM:
    return SAM(img_size=img_size)


def sam_vit_l(img_size: int = 1024) -> SAM:
    return SAM(img_size=img_size, enc_dim=1024, enc_depth=24,
               enc_heads=16, global_idx=(5, 11, 17, 23))


def sam_vit_h(img_size: int = 1024) -> SAM:
    return SAM(img_size=img_size, enc_dim=1280, enc_depth=32,
               enc_heads=16, global_idx=(7, 15, 23, 31))
