"""Latent-diffusion building blocks (TPU-native Flax).

The reference's Marigold depth estimator (utils/apply_marigold.py)
drives a Stable-Diffusion-2 latent diffusion model through the
Marigold submodule; its GuidedLDM inpainting variant (commented out
in the reference) is the same backbone. This module provides the
native NHWC Flax implementation of that backbone:

- ``AutoencoderEncoder`` / ``AutoencoderDecoder`` — the SD VAE
  (AutoencoderKL schema: block_out 128/256/512/512, mid self-attn).
- ``UNet2DCondition`` — the SD2 conditional UNet (cross-attention
  dim 1024, per-level heads, linear transformer projections).
- ``DDIMScheduler`` / ``LCMScheduler`` — pure-jnp samplers
  (Marigold ships DDIM for marigold-v1-0 and LCM for
  marigold-lcm-v1-0, reference apply_marigold.py:8).

Everything is static-shaped and NHWC; attention runs as batched
einsum over (B, HW, C) tokens so XLA tiles it onto the MXU. Module
trees mirror the diffusers state-dict schema one-to-one so the
converters in models/marigold.py are mechanical.
"""
from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def timestep_embedding(t: jnp.ndarray, dim: int) -> jnp.ndarray:
    """Sinusoidal embedding, diffusers get_timestep_embedding with
    flip_sin_to_cos=True, downscale_freq_shift=0: [cos | sin]."""
    half = dim // 2
    freqs = jnp.exp(-math.log(10000.0) *
                    jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


class TimeEmbedding(nn.Module):
    """linear_1 → SiLU → linear_2 (diffusers TimestepEmbedding)."""
    dim: int

    @nn.compact
    def __call__(self, emb):
        emb = nn.Dense(self.dim, name='linear_1')(emb)
        emb = nn.silu(emb)
        return nn.Dense(self.dim, name='linear_2')(emb)


class ResnetBlock2D(nn.Module):
    """GN→SiLU→conv + time-proj → GN→SiLU→conv, conv_shortcut on
    channel change (diffusers ResnetBlock2D)."""
    out_ch: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, temb=None):
        in_ch = x.shape[-1]
        h = nn.GroupNorm(32, epsilon=self.eps, name='norm1')(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=1, name='conv1')(h)
        if temb is not None:
            t = nn.Dense(self.out_ch, name='time_emb_proj')(
                nn.silu(temb))
            h = h + t[:, None, None, :]
        h = nn.GroupNorm(32, epsilon=self.eps, name='norm2')(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=1, name='conv2')(h)
        if in_ch != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), name='conv_shortcut')(x)
        return x + h


def _attention(q, k, v, heads: int):
    """(B, Nq, C) x (B, Nk, C) multi-head softmax attention."""
    B, Nq, C = q.shape
    Nk = k.shape[1]
    d = C // heads
    q = q.reshape(B, Nq, heads, d).transpose(0, 2, 1, 3)
    k = k.reshape(B, Nk, heads, d).transpose(0, 2, 1, 3)
    v = v.reshape(B, Nk, heads, d).transpose(0, 2, 1, 3)
    attn = jnp.einsum('bhqd,bhkd->bhqk', q, k) / math.sqrt(d)
    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum('bhqk,bhkd->bhqd', attn, v)
    return out.transpose(0, 2, 1, 3).reshape(B, Nq, C)


class CrossAttention(nn.Module):
    """to_q/to_k/to_v (no bias) + to_out (diffusers Attention)."""
    heads: int

    @nn.compact
    def __call__(self, x, context=None):
        C = x.shape[-1]
        ctx = x if context is None else context
        q = nn.Dense(C, use_bias=False, name='to_q')(x)
        k = nn.Dense(C, use_bias=False, name='to_k')(ctx)
        v = nn.Dense(C, use_bias=False, name='to_v')(ctx)
        out = _attention(q, k, v, self.heads)
        return nn.Dense(C, name='to_out')(out)


class FeedForward(nn.Module):
    """GEGLU feed-forward (diffusers FeedForward: net.0=GEGLU,
    net.2=Linear)."""
    mult: int = 4

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        inner = C * self.mult
        h = nn.Dense(inner * 2, name='proj')(x)
        h, gate = jnp.split(h, 2, axis=-1)
        h = h * nn.gelu(gate, approximate=False)
        return nn.Dense(C, name='out')(h)


class BasicTransformerBlock(nn.Module):
    """LN→self-attn, LN→cross-attn, LN→GEGLU-FF, all residual."""
    heads: int

    @nn.compact
    def __call__(self, x, context):
        x = x + CrossAttention(self.heads, name='attn1')(
            nn.LayerNorm(epsilon=1e-5, name='norm1')(x))
        x = x + CrossAttention(self.heads, name='attn2')(
            nn.LayerNorm(epsilon=1e-5, name='norm2')(x), context)
        x = x + FeedForward(name='ff')(
            nn.LayerNorm(epsilon=1e-5, name='norm3')(x))
        return x


class Transformer2D(nn.Module):
    """GN → proj_in → transformer blocks → proj_out, residual
    (diffusers Transformer2DModel). ``linear_proj=True`` is the SD2
    configuration (Dense projections on tokens); False is the SD1.x
    one (1x1 convs before/after tokenization)."""
    heads: int
    depth: int = 1
    linear_proj: bool = True

    @nn.compact
    def __call__(self, x, context):
        B, H, W, C = x.shape
        res = x
        h = nn.GroupNorm(32, epsilon=1e-6, name='norm')(x)
        if self.linear_proj:
            h = h.reshape(B, H * W, C)
            h = nn.Dense(C, name='proj_in')(h)
        else:
            h = nn.Conv(C, (1, 1), name='proj_in')(h)
            h = h.reshape(B, H * W, C)
        for i in range(self.depth):
            h = BasicTransformerBlock(
                self.heads, name=f'blocks_{i}')(h, context)
        if self.linear_proj:
            h = nn.Dense(C, name='proj_out')(h)
            h = h.reshape(B, H, W, C)
        else:
            h = h.reshape(B, H, W, C)
            h = nn.Conv(C, (1, 1), name='proj_out')(h)
        return h + res


class Downsample2D(nn.Module):
    """stride-2 conv; the VAE variant pads asymmetrically (0,1)
    like diffusers' Downsample2D(padding=0) + F.pad((0,1,0,1))."""
    out_ch: int
    vae_pad: bool = False

    @nn.compact
    def __call__(self, x):
        if self.vae_pad:
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            return nn.Conv(self.out_ch, (3, 3), strides=2,
                           padding='VALID', name='conv')(x)
        return nn.Conv(self.out_ch, (3, 3), strides=2, padding=1,
                       name='conv')(x)


class Upsample2D(nn.Module):
    """nearest 2x + conv3x3 (diffusers Upsample2D)."""
    out_ch: int

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        x = jax.image.resize(x, (B, 2 * H, 2 * W, C), 'nearest')
        return nn.Conv(self.out_ch, (3, 3), padding=1, name='conv')(x)


class UNet2DCondition(nn.Module):
    """The SD2 conditional UNet (diffusers UNet2DConditionModel).

    Defaults are the Stable-Diffusion-2 / Marigold configuration:
    4 levels (320/640/1280/1280), 2 resnets per level, cross-attn on
    the first 3 down levels and last 3 up levels, per-level heads
    giving head_dim 64, context dim 1024. Marigold widens conv_in to
    8 input channels (rgb latent ‖ depth latent).
    """
    out_ch: int = 4
    block_out: Sequence[int] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    heads: Sequence[int] = (5, 10, 20, 20)
    cross_attn: Sequence[bool] = (True, True, True, False)
    linear_proj: bool = True        # False = the SD1.x configuration

    @nn.compact
    def __call__(self, x, t, context):
        """x (B,h,w,Cin), t (B,) int timesteps, context (B,L,Dc)."""
        nlev = len(self.block_out)
        temb = timestep_embedding(t, self.block_out[0])
        temb = TimeEmbedding(self.block_out[0] * 4,
                             name='time_embedding')(temb)

        h = nn.Conv(self.block_out[0], (3, 3), padding=1,
                    name='conv_in')(x)
        skips = [h]
        for i, ch in enumerate(self.block_out):
            for j in range(self.layers_per_block):
                h = ResnetBlock2D(ch, name=f'down_{i}_res_{j}')(h, temb)
                if self.cross_attn[i]:
                    h = Transformer2D(
                        self.heads[i], linear_proj=self.linear_proj,
                        name=f'down_{i}_attn_{j}')(h, context)
                skips.append(h)
            if i < nlev - 1:
                h = Downsample2D(ch, name=f'down_{i}_downsample')(h)
                skips.append(h)

        h = ResnetBlock2D(self.block_out[-1], name='mid_res_0')(h, temb)
        h = Transformer2D(self.heads[-1],
                          linear_proj=self.linear_proj,
                          name='mid_attn')(h, context)
        h = ResnetBlock2D(self.block_out[-1], name='mid_res_1')(h, temb)

        for i in reversed(range(nlev)):
            ch = self.block_out[i]
            for j in range(self.layers_per_block + 1):
                skip = skips.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                h = ResnetBlock2D(ch, name=f'up_{i}_res_{j}')(h, temb)
                if self.cross_attn[i]:
                    h = Transformer2D(
                        self.heads[i], linear_proj=self.linear_proj,
                        name=f'up_{i}_attn_{j}')(h, context)
            if i > 0:
                h = Upsample2D(ch, name=f'up_{i}_upsample')(h)

        h = nn.GroupNorm(32, epsilon=1e-5, name='conv_norm_out')(h)
        h = nn.silu(h)
        return nn.Conv(self.out_ch, (3, 3), padding=1,
                       name='conv_out')(h)


class VAEAttention(nn.Module):
    """Single-head self-attention over (H,W) tokens (the VAE
    mid-block AttnBlock)."""

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = nn.GroupNorm(32, epsilon=1e-6, name='group_norm')(x)
        h = h.reshape(B, H * W, C)
        q = nn.Dense(C, name='to_q')(h)
        k = nn.Dense(C, name='to_k')(h)
        v = nn.Dense(C, name='to_v')(h)
        out = _attention(q, k, v, heads=1)
        out = nn.Dense(C, name='to_out')(out)
        return x + out.reshape(B, H, W, C)


class AutoencoderEncoder(nn.Module):
    """SD VAE encoder + quant_conv → (mean, logvar). Latent mode
    (the mean) is what Marigold consumes."""
    block_out: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_ch: int = 4

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.block_out[0], (3, 3), padding=1,
                    name='conv_in')(x)
        n = len(self.block_out)
        for i, ch in enumerate(self.block_out):
            for j in range(self.layers_per_block):
                h = ResnetBlock2D(ch, eps=1e-6,
                                  name=f'down_{i}_res_{j}')(h)
            if i < n - 1:
                h = Downsample2D(ch, vae_pad=True,
                                 name=f'down_{i}_downsample')(h)
        h = ResnetBlock2D(self.block_out[-1], eps=1e-6,
                          name='mid_res_0')(h)
        h = VAEAttention(name='mid_attn')(h)
        h = ResnetBlock2D(self.block_out[-1], eps=1e-6,
                          name='mid_res_1')(h)
        h = nn.GroupNorm(32, epsilon=1e-6, name='conv_norm_out')(h)
        h = nn.silu(h)
        h = nn.Conv(2 * self.latent_ch, (3, 3), padding=1,
                    name='conv_out')(h)
        h = nn.Conv(2 * self.latent_ch, (1, 1), name='quant_conv')(h)
        mean, logvar = jnp.split(h, 2, axis=-1)
        return mean, logvar


class AutoencoderDecoder(nn.Module):
    """SD VAE decoder (post_quant_conv → conv_in → mid → ups)."""
    block_out: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 2
    out_ch: int = 3

    @nn.compact
    def __call__(self, z):
        z = nn.Conv(z.shape[-1], (1, 1), name='post_quant_conv')(z)
        h = nn.Conv(self.block_out[-1], (3, 3), padding=1,
                    name='conv_in')(z)
        h = ResnetBlock2D(self.block_out[-1], eps=1e-6,
                          name='mid_res_0')(h)
        h = VAEAttention(name='mid_attn')(h)
        h = ResnetBlock2D(self.block_out[-1], eps=1e-6,
                          name='mid_res_1')(h)
        n = len(self.block_out)
        for idx, i in enumerate(reversed(range(n))):
            ch = self.block_out[i]
            for j in range(self.layers_per_block + 1):
                h = ResnetBlock2D(ch, eps=1e-6,
                                  name=f'up_{idx}_res_{j}')(h)
            if idx < n - 1:
                h = Upsample2D(ch, name=f'up_{idx}_upsample')(h)
        h = nn.GroupNorm(32, epsilon=1e-6, name='conv_norm_out')(h)
        h = nn.silu(h)
        return nn.Conv(self.out_ch, (3, 3), padding=1,
                       name='conv_out')(h)


# -- schedulers ---------------------------------------------------------

def make_alphas_cumprod(num_train_timesteps: int = 1000,
                        beta_start: float = 0.00085,
                        beta_end: float = 0.012) -> np.ndarray:
    """scaled_linear beta schedule (the SD/Marigold configuration)."""
    betas = np.linspace(beta_start ** 0.5, beta_end ** 0.5,
                        num_train_timesteps, dtype=np.float64) ** 2
    return np.cumprod(1.0 - betas).astype(np.float32)


def spaced_timesteps(num_steps: int, num_train: int = 1000,
                     spacing: str = 'trailing',
                     steps_offset: int = 0) -> np.ndarray:
    """Descending inference timesteps (diffusers set_timesteps).

    ``steps_offset`` shifts every timestep up by that amount (the
    SD1.x scheduler configs ship steps_offset=1); only meaningful for
    'leading' spacing, matching diffusers."""
    if spacing == 'trailing':
        ts = np.round(np.arange(num_train, 0,
                                -num_train / num_steps)).astype(int) - 1
    else:  # leading
        step = num_train // num_steps
        ts = (np.arange(num_steps) * step).round().astype(int)[::-1]
        ts = np.minimum(ts + steps_offset, num_train - 1)
    return ts.astype(np.int32)


class DDIMScheduler:
    """Deterministic DDIM (eta=0), epsilon or v prediction.

    Marigold-v1-0 ships a DDIMScheduler; the update below is the
    standard x0/eps reconstruction + jump to alpha_prev. All state is
    host numpy; ``step`` is pure jnp and jit-traceable with static
    step index.
    """

    def __init__(self, num_steps: int, prediction_type: str = 'v',
                 spacing: str = 'trailing', steps_offset: int = 0,
                 set_alpha_to_one: bool = True):
        self.acp = make_alphas_cumprod()
        self.timesteps = spaced_timesteps(num_steps, spacing=spacing,
                                          steps_offset=steps_offset)
        self.prediction_type = prediction_type
        self.num_steps = num_steps
        # SD1.x checkpoints ship set_alpha_to_one=False: the final
        # step jumps to alpha_cumprod[0] rather than exactly 1.0
        self.final_alpha = 1.0 if set_alpha_to_one \
            else float(self.acp[0])

    def step(self, model_out, i: int, sample):
        t = int(self.timesteps[i])
        a_t = float(self.acp[t])
        t_prev = int(self.timesteps[i + 1]) if i + 1 < self.num_steps \
            else -1
        a_prev = float(self.acp[t_prev]) if t_prev >= 0 \
            else self.final_alpha
        sq_at, sq_1mat = math.sqrt(a_t), math.sqrt(1.0 - a_t)
        if self.prediction_type == 'v':
            x0 = sq_at * sample - sq_1mat * model_out
            eps = sq_at * model_out + sq_1mat * sample
        else:  # epsilon
            x0 = (sample - sq_1mat * model_out) / sq_at
            eps = model_out
        return math.sqrt(a_prev) * x0 + math.sqrt(1.0 - a_prev) * eps


class LCMScheduler:
    """Latent-consistency sampling (marigold-lcm-v1-0,
    reference apply_marigold.py:8 default checkpoint, 4 steps).

    Boundary conditions c_skip/c_out at timestep_scaling 10 and
    sigma_data 0.5; between steps the denoised estimate is re-noised
    to the next timestep with fresh gaussian noise.
    """

    def __init__(self, num_steps: int, prediction_type: str = 'v',
                 timestep_scaling: float = 10.0,
                 sigma_data: float = 0.5):
        self.acp = make_alphas_cumprod()
        self.timesteps = spaced_timesteps(num_steps, spacing='trailing')
        self.prediction_type = prediction_type
        self.num_steps = num_steps
        self.timestep_scaling = timestep_scaling
        self.sigma_data = sigma_data

    def step(self, model_out, i: int, sample, key):
        t = int(self.timesteps[i])
        a_t = float(self.acp[t])
        sq_at, sq_1mat = math.sqrt(a_t), math.sqrt(1.0 - a_t)
        if self.prediction_type == 'v':
            x0 = sq_at * sample - sq_1mat * model_out
        else:
            x0 = (sample - sq_1mat * model_out) / sq_at
        st = t * self.timestep_scaling
        c_skip = self.sigma_data ** 2 / (st ** 2 + self.sigma_data ** 2)
        c_out = st / math.sqrt(st ** 2 + self.sigma_data ** 2)
        denoised = c_skip * sample + c_out * x0
        if i + 1 >= self.num_steps:
            return denoised
        t_next = int(self.timesteps[i + 1])
        a_next = float(self.acp[t_next])
        noise = jax.random.normal(key, sample.shape, sample.dtype)
        return math.sqrt(a_next) * denoised \
            + math.sqrt(1.0 - a_next) * noise
