"""Marigold diffusion depth — native TPU implementation.

Parity: reference utils/apply_marigold.py:8-49 — the reference pulls
MarigoldPipeline from a git submodule (empty in the snapshot) and
runs LCM 4-step inference with ensemble 5 at processing_res 768,
then kenburns_effect.py:554-561 converts depth∈[0,1] to disparity
(1-depth)*255. This module implements the pipeline natively on the
latent-diffusion backbone in models/ldm.py:

  rgb → VAE-encode (latent mode × 0.18215)
      → E ensemble members batched together: iterative UNet denoise
        of the depth latent conditioned on [rgb‖depth] concat and the
        frozen empty-prompt text embedding
      → VAE-decode, channel-mean → affine-invariant ensemble merge.

The ensemble runs as ONE batched UNet program (members in the batch
axis) — on TPU this is strictly better than the reference's
sequential single-sample calls. ``apply_marigold`` keeps the
diffusers-adapter behavior for environments that have it.
"""
from __future__ import annotations

import functools
import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import LOGGER
from .ldm import (AutoencoderDecoder, AutoencoderEncoder, DDIMScheduler,
                  LCMScheduler, UNet2DCondition)

VAE_SCALE = 0.18215
# CLIP BPE ids of the empty prompt: [startoftext, endoftext]
EMPTY_PROMPT_IDS = (49406, 49407)


class MarigoldDepth:
    """Native Marigold monocular depth estimator.

    ``unet_cfg`` / ``vae_cfg`` override the SD2-sized defaults (the
    tests use tiny configs). Weights load via
    :func:`convert_marigold`; without a checkpoint the nets run at
    random init (same policy as every other net in this package —
    no published checkpoints exist in the image).
    """

    def __init__(self, processing_res: int = 768,
                 denoise_steps: int = 4, ensemble_size: int = 5,
                 scheduler: str = 'lcm', prediction_type: str = 'v',
                 seed: int = 0, context_dim: int = 1024,
                 unet_cfg: Optional[dict] = None,
                 vae_cfg: Optional[dict] = None):
        self.processing_res = processing_res
        self.denoise_steps = denoise_steps
        self.ensemble_size = ensemble_size
        self.scheduler_kind = scheduler
        self.prediction_type = prediction_type
        self.seed = seed
        self.context_dim = context_dim
        self.unet = UNet2DCondition(**(unet_cfg or {}))
        enc_cfg = dict(vae_cfg or {})
        dec_cfg = dict(vae_cfg or {})
        enc_cfg.pop('out_ch', None)
        dec_cfg.pop('latent_ch', None)
        self.encoder = AutoencoderEncoder(**enc_cfg)
        self.decoder = AutoencoderDecoder(**dec_cfg)
        # spatial down factor of the VAE (8 for the SD sizing)
        self.vae_scale = 2 ** (len(self.encoder.block_out) - 1)
        self.variables: Optional[Dict] = None
        self._jit_cache: Dict = {}

    # -- weights -------------------------------------------------------
    def init_random(self, key=None, latent_hw: Tuple[int, int] = (8, 8)
                    ) -> None:
        key = key if key is not None else jax.random.PRNGKey(self.seed)
        k1, k2, k3, k4 = jax.random.split(key, 4)
        lh, lw = latent_hw
        sf = self.vae_scale
        img = jnp.zeros((1, lh * sf, lw * sf, 3), jnp.float32)
        lat = jnp.zeros((1, lh, lw, 8), jnp.float32)
        ctx = jnp.zeros((1, 2, self.context_dim), jnp.float32)
        from ..utils.env import jit_init
        self.variables = {
            'unet': jit_init(self.unet, k1, lat,
                             jnp.zeros((1,), jnp.int32), ctx),
            'encoder': jit_init(self.encoder, k2, img),
            'decoder': jit_init(
                self.decoder, k3,
                jnp.zeros((1, lh, lw, 4), jnp.float32)),
            'text_embed': jax.random.normal(
                k4, (1, 2, self.context_dim), jnp.float32) * 0.02,
        }

    def _ensure_vars(self):
        if self.variables is None:
            LOGGER.warning('marigold: RANDOM init (no checkpoint '
                           'loaded)')
            self.init_random()
        return self.variables

    # -- inference -----------------------------------------------------
    def _infer_fn(self, lh: int, lw: int):
        """Build the jitted (variables, rgb, noise, keys) → (E,H,W)
        program for a static latent size."""
        E = self.ensemble_size
        steps = self.denoise_steps
        if self.scheduler_kind == 'lcm':
            sch = LCMScheduler(steps,
                               prediction_type=self.prediction_type)
        else:
            sch = DDIMScheduler(steps,
                                prediction_type=self.prediction_type)

        @jax.jit
        def fn(variables, rgb, noise, keys):
            mean, _ = self.encoder.apply(variables['encoder'],
                                         rgb * 2.0 - 1.0)
            rgb_lat = mean * VAE_SCALE                     # (1,lh,lw,4)
            rgb_lat = jnp.broadcast_to(rgb_lat, (E, lh, lw, 4))
            ctx = jnp.broadcast_to(
                variables['text_embed'],
                (E,) + variables['text_embed'].shape[1:])
            depth_lat = noise                              # (E,lh,lw,4)
            for i in range(steps):
                t = jnp.full((E,), int(sch.timesteps[i]), jnp.int32)
                inp = jnp.concatenate([rgb_lat, depth_lat], -1)
                out = self.unet.apply(variables['unet'], inp, t, ctx)
                if self.scheduler_kind == 'lcm':
                    depth_lat = sch.step(out, i, depth_lat, keys[i])
                else:
                    depth_lat = sch.step(out, i, depth_lat)
            dec = self.decoder.apply(variables['decoder'],
                                     depth_lat / VAE_SCALE)
            depth = jnp.mean(dec, axis=-1)                 # (E,H,W)
            depth = jnp.clip(depth, -1.0, 1.0)
            return (depth + 1.0) / 2.0
        return fn

    def __call__(self, img_rgb: np.ndarray,
                 seed: Optional[int] = None) -> np.ndarray:
        """img RGB uint8 (H,W,3) → depth float32 (H,W) in [0,1]
        (affine-invariant, resized back to the input resolution)."""
        import cv2
        from ..utils import scaledown_size
        variables = self._ensure_vars()
        H, W = img_rgb.shape[:2]
        sf = self.vae_scale
        # latent dims must also survive the UNet's own down/up path
        div = sf * 2 ** (len(self.unet.block_out) - 1)
        ph, pw = scaledown_size(H, W, self.processing_res, divisor=div)
        small = cv2.resize(img_rgb, (pw, ph),
                           interpolation=cv2.INTER_LINEAR)
        rgb = jnp.asarray(small.astype(np.float32) / 255.0)[None]
        lh, lw = ph // sf, pw // sf
        key = ('infer', lh, lw)
        if key not in self._jit_cache:
            self._jit_cache[key] = self._infer_fn(lh, lw)
        rng = jax.random.PRNGKey(self.seed if seed is None else seed)
        knoise, kloop = jax.random.split(rng)
        noise = jax.random.normal(
            knoise, (self.ensemble_size, lh, lw, 4), jnp.float32)
        keys = jax.random.split(kloop, self.denoise_steps)
        preds = self._jit_cache[key](variables, rgb, noise, keys)
        depth = ensemble_depths(preds)
        depth = np.asarray(jax.device_get(depth))
        return cv2.resize(depth, (W, H),
                          interpolation=cv2.INTER_LINEAR)


@functools.partial(jax.jit, static_argnames=('iters',))
def ensemble_depths(preds: jnp.ndarray, iters: int = 5) -> jnp.ndarray:
    """Affine-invariant ensemble merge (Marigold ensemble_depth):
    per-member min-max init, then iterated closed-form scale/shift
    alignment to the running median, final median + min-max to [0,1].
    preds: (E, H, W) → (H, W)."""
    E = preds.shape[0]
    flat = preds.reshape(E, -1)
    lo = jnp.min(flat, 1, keepdims=True)
    hi = jnp.max(flat, 1, keepdims=True)
    d = (flat - lo) / jnp.maximum(hi - lo, 1e-6)

    def align(d, _):
        med = jnp.median(d, axis=0, keepdims=True)        # (1, N)
        # least-squares a*d_e + b ≈ med, closed form per member
        dm = jnp.mean(d, 1, keepdims=True)
        mm = jnp.mean(med, 1, keepdims=True)
        cov = jnp.mean((d - dm) * (med - mm), 1, keepdims=True)
        var = jnp.maximum(jnp.mean((d - dm) ** 2, 1, keepdims=True),
                          1e-12)
        a = cov / var
        b = mm - a * dm
        return a * d + b, None

    d, _ = jax.lax.scan(align, d, None, length=iters)
    merged = jnp.median(d, axis=0)
    lo = jnp.min(merged)
    hi = jnp.max(merged)
    merged = (merged - lo) / jnp.maximum(hi - lo, 1e-6)
    return merged.reshape(preds.shape[1:])


# -- converters ---------------------------------------------------------

def _t(w):
    return jnp.asarray(np.asarray(w).T)


def _conv(w):
    return jnp.asarray(np.asarray(w).transpose(2, 3, 1, 0))  # OIHW→HWIO


def _norm(sd, k):
    return {'scale': jnp.asarray(np.asarray(sd[f'{k}.weight'])),
            'bias': jnp.asarray(np.asarray(sd[f'{k}.bias']))}


def _dense(sd, k):
    return {'kernel': _t(sd[f'{k}.weight']),
            'bias': jnp.asarray(np.asarray(sd[f'{k}.bias']))}


def _dense_nb(sd, k):
    return {'kernel': _t(sd[f'{k}.weight'])}


def _conv_p(sd, k):
    return {'kernel': _conv(sd[f'{k}.weight']),
            'bias': jnp.asarray(np.asarray(sd[f'{k}.bias']))}


def _resnet(sd, pre):
    p = {'norm1': _norm(sd, f'{pre}.norm1'),
         'conv1': _conv_p(sd, f'{pre}.conv1'),
         'norm2': _norm(sd, f'{pre}.norm2'),
         'conv2': _conv_p(sd, f'{pre}.conv2')}
    if f'{pre}.time_emb_proj.weight' in sd:
        p['time_emb_proj'] = _dense(sd, f'{pre}.time_emb_proj')
    if f'{pre}.conv_shortcut.weight' in sd:
        p['conv_shortcut'] = _conv_p(sd, f'{pre}.conv_shortcut')
    return p


def _xattn(sd, pre):
    return {'to_q': _dense_nb(sd, f'{pre}.to_q'),
            'to_k': _dense_nb(sd, f'{pre}.to_k'),
            'to_v': _dense_nb(sd, f'{pre}.to_v'),
            'to_out': _dense(sd, f'{pre}.to_out.0')}


def _proj(sd, k):
    """Transformer2D projection: Dense (SD2, 2-D weight) or 1x1 conv
    (SD1.x, 4-D weight) — both appear under the same key."""
    w = np.asarray(sd[f'{k}.weight'])
    if w.ndim == 4:
        return {'kernel': jnp.asarray(w.transpose(2, 3, 1, 0)),
                'bias': jnp.asarray(np.asarray(sd[f'{k}.bias']))}
    return _dense(sd, k)


def _transformer(sd, pre, depth=1):
    p = {'norm': _norm(sd, f'{pre}.norm'),
         'proj_in': _proj(sd, f'{pre}.proj_in'),
         'proj_out': _proj(sd, f'{pre}.proj_out')}
    for i in range(depth):
        b = f'{pre}.transformer_blocks.{i}'
        p[f'blocks_{i}'] = {
            'norm1': _norm(sd, f'{b}.norm1'),
            'attn1': _xattn(sd, f'{b}.attn1'),
            'norm2': _norm(sd, f'{b}.norm2'),
            'attn2': _xattn(sd, f'{b}.attn2'),
            'norm3': _norm(sd, f'{b}.norm3'),
            'ff': {'proj': _dense(sd, f'{b}.ff.net.0.proj'),
                   'out': _dense(sd, f'{b}.ff.net.2')},
        }
    return p


def _vae_attn(sd, pre):
    """Handles both the modern to_q/to_out.0 and legacy
    query/key/value/proj_attn VAE attention schemas."""
    if f'{pre}.to_q.weight' in sd:
        names = ('to_q', 'to_k', 'to_v', 'to_out.0')
    else:
        names = ('query', 'key', 'value', 'proj_attn')
    q, k, v, o = (f'{pre}.{n}' for n in names)

    def lin(kk):
        w = np.asarray(sd[f'{kk}.weight'])
        if w.ndim == 4:                      # legacy 1x1-conv weights
            w = w[:, :, 0, 0]
        return {'kernel': jnp.asarray(w.T),
                'bias': jnp.asarray(np.asarray(sd[f'{kk}.bias']))}
    return {'group_norm': _norm(sd, f'{pre}.group_norm'
                                if f'{pre}.group_norm.weight' in sd
                                else f'{pre}.norm'),
            'to_q': lin(q), 'to_k': lin(k), 'to_v': lin(v),
            'to_out': lin(o)}


def convert_unet(sd: Dict, block_out=(320, 640, 1280, 1280),
                 layers_per_block: int = 2,
                 cross_attn=(True, True, True, False)) -> Dict:
    """diffusers UNet2DConditionModel state dict → UNet2DCondition
    params (checkpoint schema: unet/diffusion_pytorch_model.*)."""
    nlev = len(block_out)
    p = {'conv_in': _conv_p(sd, 'conv_in'),
         'time_embedding': {
             'linear_1': _dense(sd, 'time_embedding.linear_1'),
             'linear_2': _dense(sd, 'time_embedding.linear_2')},
         'conv_norm_out': _norm(sd, 'conv_norm_out'),
         'conv_out': _conv_p(sd, 'conv_out')}
    for i in range(nlev):
        for j in range(layers_per_block):
            p[f'down_{i}_res_{j}'] = _resnet(
                sd, f'down_blocks.{i}.resnets.{j}')
            if cross_attn[i]:
                p[f'down_{i}_attn_{j}'] = _transformer(
                    sd, f'down_blocks.{i}.attentions.{j}')
        if i < nlev - 1:
            p[f'down_{i}_downsample'] = {'conv': _conv_p(
                sd, f'down_blocks.{i}.downsamplers.0.conv')}
    p['mid_res_0'] = _resnet(sd, 'mid_block.resnets.0')
    p['mid_attn'] = _transformer(sd, 'mid_block.attentions.0')
    p['mid_res_1'] = _resnet(sd, 'mid_block.resnets.1')
    for k in range(nlev):                    # diffusers: deepest first
        i = nlev - 1 - k
        for j in range(layers_per_block + 1):
            p[f'up_{i}_res_{j}'] = _resnet(
                sd, f'up_blocks.{k}.resnets.{j}')
            if cross_attn[i]:
                p[f'up_{i}_attn_{j}'] = _transformer(
                    sd, f'up_blocks.{k}.attentions.{j}')
        if i > 0:
            p[f'up_{i}_upsample'] = {'conv': _conv_p(
                sd, f'up_blocks.{k}.upsamplers.0.conv')}
    return {'params': p}


def convert_vae(sd: Dict, block_out=(128, 256, 512, 512),
                layers_per_block: int = 2) -> Tuple[Dict, Dict]:
    """diffusers AutoencoderKL state dict → (encoder, decoder)
    params (checkpoint schema: vae/diffusion_pytorch_model.*)."""
    n = len(block_out)
    e = {'conv_in': _conv_p(sd, 'encoder.conv_in'),
         'mid_res_0': _resnet(sd, 'encoder.mid_block.resnets.0'),
         'mid_attn': _vae_attn(sd, 'encoder.mid_block.attentions.0'),
         'mid_res_1': _resnet(sd, 'encoder.mid_block.resnets.1'),
         'conv_norm_out': _norm(sd, 'encoder.conv_norm_out'),
         'conv_out': _conv_p(sd, 'encoder.conv_out'),
         'quant_conv': _conv_p(sd, 'quant_conv')}
    for i in range(n):
        for j in range(layers_per_block):
            e[f'down_{i}_res_{j}'] = _resnet(
                sd, f'encoder.down_blocks.{i}.resnets.{j}')
        if i < n - 1:
            e[f'down_{i}_downsample'] = {'conv': _conv_p(
                sd, f'encoder.down_blocks.{i}.downsamplers.0.conv')}
    d = {'post_quant_conv': _conv_p(sd, 'post_quant_conv'),
         'conv_in': _conv_p(sd, 'decoder.conv_in'),
         'mid_res_0': _resnet(sd, 'decoder.mid_block.resnets.0'),
         'mid_attn': _vae_attn(sd, 'decoder.mid_block.attentions.0'),
         'mid_res_1': _resnet(sd, 'decoder.mid_block.resnets.1'),
         'conv_norm_out': _norm(sd, 'decoder.conv_norm_out'),
         'conv_out': _conv_p(sd, 'decoder.conv_out')}
    for k in range(n):
        for j in range(layers_per_block + 1):
            d[f'up_{k}_res_{j}'] = _resnet(
                sd, f'decoder.up_blocks.{k}.resnets.{j}')
        if k < n - 1:
            d[f'up_{k}_upsample'] = {'conv': _conv_p(
                sd, f'decoder.up_blocks.{k}.upsamplers.0.conv')}
    return {'params': e}, {'params': d}


def empty_text_embed_from_clip(text_sd: Dict,
                               num_layers: int = 23,
                               hidden: int = 1024,
                               heads: int = 16) -> jnp.ndarray:
    """Run the checkpoint's CLIP text tower on the empty prompt
    ONCE (host torch via transformers) and freeze the (1, 2, D)
    embedding — the prompt never changes (Marigold encode_empty_text),
    so the 340M-param text encoder has no business on the TPU."""
    import torch
    from transformers import CLIPTextConfig, CLIPTextModel
    cfg = CLIPTextConfig(
        vocab_size=49408, hidden_size=hidden,
        intermediate_size=hidden * 4, num_hidden_layers=num_layers,
        num_attention_heads=heads, max_position_embeddings=77,
        hidden_act='gelu')
    model = CLIPTextModel(cfg)
    sd = {k[len('text_model.'):] if k.startswith('text_model.') else k:
          torch.as_tensor(np.asarray(v)) for k, v in text_sd.items()}
    res = model.text_model.load_state_dict(sd, strict=False)
    n_own = len(model.text_model.state_dict())
    n_loaded = n_own - len(res.missing_keys)
    if n_loaded < 0.9 * n_own:
        raise ValueError(
            f'CLIP text state dict matched only {n_loaded}/{n_own} '
            'tensors — wrong key schema; the empty-prompt embedding '
            'would come from random init. Unexpected: '
            f'{res.unexpected_keys[:3]}')
    model.eval()
    ids = torch.tensor([list(EMPTY_PROMPT_IDS)])
    with torch.no_grad():
        out = model(input_ids=ids).last_hidden_state
    return jnp.asarray(out.numpy())


def convert_marigold(unet_sd: Dict, vae_sd: Dict,
                     text_sd: Optional[Dict] = None,
                     model: Optional[MarigoldDepth] = None
                     ) -> Dict:
    """Assemble a MarigoldDepth variables dict from the three
    diffusers-schema state dicts of a Marigold checkpoint directory
    (unet/, vae/, text_encoder/)."""
    model = model or MarigoldDepth()
    unet = model.unet
    enc = model.encoder
    variables = {
        'unet': convert_unet(unet_sd, block_out=tuple(unet.block_out),
                             layers_per_block=unet.layers_per_block,
                             cross_attn=tuple(unet.cross_attn)),
        'text_embed': (empty_text_embed_from_clip(text_sd)
                       if text_sd is not None else
                       jnp.zeros((1, 2, model.context_dim),
                                 jnp.float32)),
    }
    ve, vd = convert_vae(vae_sd, block_out=tuple(enc.block_out),
                         layers_per_block=enc.layers_per_block)
    variables['encoder'] = ve
    variables['decoder'] = vd
    return variables


# -- diffusers adapter (kept for environments that ship diffusers) ------

_PIPE = None


def apply_marigold(img_rgb: np.ndarray,
                   checkpoint: str = 'prs-eth/marigold-lcm-v1-0',
                   denoise_steps: int = 4, ensemble_size: int = 5,
                   seed: int = 0, **kwargs) -> np.ndarray:
    """img RGB uint8 → depth float in [0, 1] via the diffusers
    MarigoldDepthPipeline (reference apply_marigold.py behavior).
    Raises when diffusers is absent — use :class:`MarigoldDepth`."""
    global _PIPE
    try:
        import diffusers  # noqa: F401
    except ImportError as e:
        raise RuntimeError(
            'diffusers is not installed; use the native '
            'models.marigold.MarigoldDepth instead') from e
    import torch
    from diffusers import MarigoldDepthPipeline
    if _PIPE is None:
        LOGGER.info(f'loading Marigold pipeline {checkpoint}')
        _PIPE = MarigoldDepthPipeline.from_pretrained(checkpoint)
    gen = torch.Generator().manual_seed(seed)
    out = _PIPE(img_rgb, num_inference_steps=denoise_steps,
                ensemble_size=ensemble_size, generator=gen, **kwargs)
    return np.asarray(out.prediction[0], np.float32)
