"""ZoeDepth metric depth head on the DPT-BEiT core (Flax).

Parity: reference depth_modules/zoedepth/models/zoedepth/
zoedepth_v1.py (ZoeDepth: seed bin regressor → attractor layers per
decoder level → conditional log-binomial over bin centers) with the
shipped config (config_zoedepth.json: 64 softplus bins, inv
attractors [16,8,4,1] alpha=1000 gamma=2 kind=mean, temp
0.0212-50).

Input: RGB float in [0,1]; the MiDaS normalization (mean/std 0.5) is
applied inside. The flip-TTA + padding of DepthModel.infer
(models/depth_model.py:57-128) lives in ``infer_zoe``.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..utils.image import resize_bilinear_ac
from .dpt import DPTBeit


def _mlp2(x, mid: int, out: int, name: str, act_out=None, parent=None):
    x = nn.Conv(mid, (1, 1), name=f'{name}_0')(x)
    x = nn.relu(x)
    x = nn.Conv(out, (1, 1), name=f'{name}_1')(x)
    return x


class SeedBinRegressorUnnormed(nn.Module):
    n_bins: int = 64
    mlp_dim: int = 256

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.mlp_dim, (1, 1), name='net0')(x)
        h = nn.relu(h)
        h = nn.Conv(self.n_bins, (1, 1), name='net1')(h)
        centers = jax.nn.softplus(h)
        return centers, centers


class Projector(nn.Module):
    out_features: int
    mlp_dim: int = 128

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.mlp_dim, (1, 1), name='net0')(x)
        h = nn.relu(h)
        return nn.Conv(self.out_features, (1, 1), name='net1')(h)


def inv_attractor(dx, alpha: float = 300.0, gamma: int = 2):
    return dx / (1 + alpha * dx ** gamma)


def exp_attractor(dx, alpha: float = 300.0, gamma: int = 2):
    return jnp.exp(-alpha * jnp.abs(dx) ** gamma) * dx


class AttractorLayerUnnormed(nn.Module):
    n_bins: int
    n_attractors: int = 16
    mlp_dim: int = 128
    alpha: float = 1000.0
    gamma: int = 2
    kind: str = 'mean'
    attractor_type: str = 'inv'

    @nn.compact
    def __call__(self, x, b_prev, prev_b_embedding=None):
        if prev_b_embedding is not None:
            prev_b_embedding = resize_bilinear_ac(
                prev_b_embedding, x.shape[-3], x.shape[-2])
            x = x + prev_b_embedding
        h = nn.Conv(self.mlp_dim, (1, 1), name='net0')(x)
        h = nn.relu(h)
        h = nn.Conv(self.n_attractors, (1, 1), name='net1')(h)
        A = jax.nn.softplus(h)                         # (B,H,W,nA)

        b_prev = resize_bilinear_ac(b_prev, x.shape[-3], x.shape[-2])
        dist = inv_attractor if self.attractor_type == 'inv' \
            else exp_attractor
        dx = A[..., :, None] - b_prev[..., None, :]    # (B,H,W,nA,nbins)
        delta = dist(dx, self.alpha, self.gamma)
        delta = delta.mean(-2) if self.kind == 'mean' else delta.sum(-2)
        b_new = b_prev + delta
        return b_new, b_new


def log_binomial(probs: jnp.ndarray, t: jnp.ndarray, n_classes: int,
                 eps: float = 1e-4) -> jnp.ndarray:
    """softmax over k of log C(K-1,k) + k log p + (K-1-k) log(1-p),
    tempered by t (dist_layers.py:36-69). probs/t: (B,H,W,1)."""
    k = jnp.arange(n_classes, dtype=jnp.float32)
    K = float(n_classes)
    log_binom_coef = (jax.scipy.special.gammaln(K) -
                      jax.scipy.special.gammaln(k + 1) -
                      jax.scipy.special.gammaln(K - k))
    p = jnp.clip(probs, eps, 1.0)
    omp = jnp.clip(1.0 - probs, eps, 1.0)
    y = log_binom_coef + k * jnp.log(p) + (K - 1 - k) * jnp.log(omp)
    return jax.nn.softmax(y / t, axis=-1)


class ConditionalLogBinomial(nn.Module):
    n_classes: int = 64
    bottleneck_factor: int = 2
    min_temp: float = 0.0212
    max_temp: float = 50.0
    p_eps: float = 1e-4

    @nn.compact
    def __call__(self, x, cond):
        cat = jnp.concatenate([x, cond], -1)
        mid = cat.shape[-1] // self.bottleneck_factor
        h = nn.Conv(mid, (1, 1), name='mlp0')(cat)
        h = nn.gelu(h, approximate=False)
        h = nn.Conv(4, (1, 1), name='mlp1')(h)
        pt = jax.nn.softplus(h) + self.p_eps
        p = pt[..., 0:1] / (pt[..., 0:1] + pt[..., 1:2])
        t = pt[..., 2:3] / (pt[..., 2:3] + pt[..., 3:4])
        t = (self.max_temp - self.min_temp) * t + self.min_temp
        return log_binomial(p, t, self.n_classes)


class ZoeDepth(nn.Module):
    """Full metric-depth model. Input RGB [0,1] NHWC → metric depth
    (B, H/2, W/2, 1) at the MiDaS head resolution (the reference
    interpolates back in DepthModel.infer)."""
    img_size: Tuple[int, int] = (384, 512)
    n_bins: int = 64
    bin_embedding_dim: int = 128
    n_attractors: Tuple[int, ...] = (16, 8, 4, 1)
    attractor_alpha: float = 1000.0
    attractor_gamma: int = 2
    attractor_kind: str = 'mean'
    attractor_type: str = 'inv'
    min_temp: float = 0.0212
    max_temp: float = 50.0
    min_depth: float = 1e-3
    max_depth: float = 10.0
    # DPT/BEiT core geometry (reduced in twin tests)
    core_features: int = 256
    core_out_channels: Tuple[int, ...] = (256, 512, 1024, 1024)
    core_dim: int = 1024
    core_depth: int = 24
    core_heads: int = 16
    core_hooks: Tuple[int, ...] = (5, 11, 17, 23)
    btlnck_features: int = 256

    @nn.compact
    def __call__(self, rgb01):
        x = (rgb01 - 0.5) / 0.5                        # MiDaS norm
        rel_depth, hooks = DPTBeit(img_size=self.img_size,
                                   features=self.core_features,
                                   out_channels=self.core_out_channels,
                                   dim=self.core_dim,
                                   depth=self.core_depth,
                                   num_heads=self.core_heads,
                                   hooks=self.core_hooks,
                                   name='core')(x)

        btlnck = nn.Conv(self.btlnck_features, (1, 1),
                         name='conv2')(hooks['l4_rn'])
        _, seed_centers = SeedBinRegressorUnnormed(
            self.n_bins, name='seed_bin_regressor')(btlnck)
        b_prev = seed_centers
        prev_emb = Projector(self.bin_embedding_dim,
                             name='seed_projector')(btlnck)

        b_centers = b_prev
        for i, lvl in enumerate(('r4', 'r3', 'r2', 'r1')):
            emb = Projector(self.bin_embedding_dim,
                            name=f'projector{i}')(hooks[lvl])
            b, b_centers = AttractorLayerUnnormed(
                self.n_bins, self.n_attractors[i],
                alpha=self.attractor_alpha, gamma=self.attractor_gamma,
                kind=self.attractor_kind,
                attractor_type=self.attractor_type,
                name=f'attractor{i}')(emb, b_prev, prev_emb)
            b_prev, prev_emb = b, emb

        last = hooks['out_conv']
        rel = resize_bilinear_ac(rel_depth[..., None],
                                 last.shape[-3], last.shape[-2])
        last = jnp.concatenate([last, rel], -1)
        emb_up = resize_bilinear_ac(prev_emb, last.shape[-3],
                                    last.shape[-2])
        probs = ConditionalLogBinomial(
            self.n_bins, min_temp=self.min_temp, max_temp=self.max_temp,
            name='conditional_log_binomial')(last, emb_up)
        centers = resize_bilinear_ac(b_centers, probs.shape[-3],
                                     probs.shape[-2])
        depth = jnp.sum(probs * centers, axis=-1, keepdims=True)
        return {'metric_depth': depth, 'rel_depth': rel_depth}


def pad_tta_amounts(h: int, w: int, fh: float = 3.0,
                    fw: float = 3.0) -> Tuple[int, int]:
    """Reflect-pad sizes of the reference's padding augmentation
    (depth_model.py:57-96): pad_h = int(sqrt(h/2)*fh),
    pad_w = int(sqrt(w/2)*fw)."""
    import math
    return int(math.sqrt(h / 2) * fh), int(math.sqrt(w / 2) * fw)


def _infer_pad_aug(model: ZoeDepth, variables, rgb01: jnp.ndarray,
                   pad_input: bool) -> jnp.ndarray:
    """Single padded forward (depth_model.py:57-96): reflect-pad,
    infer, bicubic-resize the prediction up to the padded input size,
    crop the padding back off.

    The BEiT grid is static (model.img_size), so — like the
    reference's midas core, whose internal Resize transform maps the
    padded image to the network resolution
    (base_models/midas.py Resize, cv2.INTER_CUBIC) — the padded image
    is resized to the model grid for the forward pass and the
    prediction is resized back to the padded size before cropping."""
    H, W = rgb01.shape[-3], rgb01.shape[-2]
    x = rgb01
    pad_h = pad_w = 0
    if pad_input:
        pad_h, pad_w = pad_tta_amounts(H, W)
        pads = [(0, 0)] * (x.ndim - 3) + \
            [(pad_h, pad_h), (pad_w, pad_w), (0, 0)]
        x = jnp.pad(x, pads, mode='reflect')
    ph, pw = x.shape[-3], x.shape[-2]
    mh, mw = model.img_size
    if (ph, pw) != (mh, mw):
        x = jax.image.resize(x, x.shape[:-3] + (mh, mw, x.shape[-1]),
                             method='cubic')
    out = model.apply(variables, x)['metric_depth']
    if out.shape[-3] != ph or out.shape[-2] != pw:
        # reference: F.interpolate(mode='bicubic', align_corners=False)
        out = jax.image.resize(out, out.shape[:-3] + (ph, pw, 1),
                               method='cubic')
    if pad_h > 0:
        out = out[..., pad_h:-pad_h, :, :]
    if pad_w > 0:
        out = out[..., :, pad_w:-pad_w, :]
    return out


def infer_zoe(model: ZoeDepth, variables, rgb01: jnp.ndarray,
              with_flip_aug: bool = True,
              pad_input: bool = True) -> jnp.ndarray:
    """Reference-default inference (depth_model.py:57-128): reflect
    pad augmentation (``pad_input=True`` is the reference default) +
    horizontal-flip TTA, averaged, at input resolution."""
    out = _infer_pad_aug(model, variables, rgb01, pad_input)
    if with_flip_aug:
        out_f = _infer_pad_aug(model, variables, rgb01[..., ::-1, :],
                               pad_input)
        out = 0.5 * (out + out_f[..., ::-1, :])
    return out
