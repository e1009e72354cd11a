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
import numpy as np
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
        # The reference layer calls dist() WITHOUT arguments
        # (attractor.py:194-196), so the torch.jit.script defaults
        # alpha=300, gamma=2 apply and the configured self.alpha/gamma
        # (1000 in the shipped zoedepth config) are silently unused.
        # Reproduced exactly — self.alpha/self.gamma are retained for
        # API compatibility only, like the reference's.  Caught by
        # tests/test_reference_source_parity.py::test_reference_attractor.
        delta = dist(dx, 300.0, 2)
        delta = delta.mean(-2) if self.kind == 'mean' else delta.sum(-2)
        b_new = b_prev + delta
        return b_new, b_new


def log_binomial(probs: jnp.ndarray, t: jnp.ndarray, n_classes: int,
                 eps: float = 1e-4) -> jnp.ndarray:
    """softmax over k of log C(K-1,k) + k log p + (K-1-k) log(1-p),
    tempered by t (dist_layers.py:29-69). probs/t: (B,H,W,1).

    The binomial coefficient uses the reference's crude STIRLING
    approximation n log n - k log k - (n-k) log(n-k) with eps=1e-7
    (dist_layers.py:29-34) — NOT the exact lgamma form, which differs
    by several percent at small k. Caught by
    test_reference_source_parity.py::test_reference_conditional_log_binomial."""
    k = jnp.arange(n_classes, dtype=jnp.float32)
    K = float(n_classes)
    # host numpy f32, exactly like the torch tensor math: at k=K-1
    # the (n-ks) factor is an exact 0.0 killing the log(seps) term;
    # leaving this to XLA lets constant folding reassociate it into
    # 0 * log(0) = NaN
    seps = np.float32(1e-7)
    kf = np.arange(n_classes, dtype=np.float32)
    n = np.float32(K - 1.0) + seps
    ks = kf + seps
    log_binom_coef = jnp.asarray(
        n * np.log(n) - ks * np.log(ks)
        - (n - ks) * np.log(n - ks + seps))
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


class TorchTransformerLayer(nn.Module):
    """Twin of torch.nn.TransformerEncoderLayer defaults (post-LN,
    ReLU feed-forward, packed-qkv in_proj) used by the ZoeDepth-NK
    router (reference depth_modules/zoedepth/models/layers/
    patch_transformer.py:46-49). Dropout is inert at inference and is
    omitted."""
    embed_dim: int = 128
    num_heads: int = 4
    ff_dim: int = 1024

    @nn.compact
    def __call__(self, x):                         # (B, S, E)
        E, H = self.embed_dim, self.num_heads
        in_kernel = self.param('in_proj_kernel', nn.initializers.xavier_uniform(), (E, 3 * E))
        in_bias = self.param('in_proj_bias', nn.initializers.zeros, (3 * E,))
        qkv = x @ in_kernel + in_bias
        q, k, v = jnp.split(qkv, 3, axis=-1)
        B, S = x.shape[0], x.shape[1]
        hd = E // H

        def heads(t):
            return t.reshape(B, S, H, hd).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        attn = jax.nn.softmax(
            (q @ k.transpose(0, 1, 3, 2)) / jnp.sqrt(hd), axis=-1)
        o = (attn @ v).transpose(0, 2, 1, 3).reshape(B, S, E)
        o = nn.Dense(E, name='out_proj')(o)
        x = nn.LayerNorm(name='norm1')(x + o)
        h = nn.Dense(self.ff_dim, name='linear1')(x)
        h = nn.Dense(E, name='linear2')(nn.relu(h))
        return nn.LayerNorm(name='norm2')(x + h)


class PatchTransformerEncoder(nn.Module):
    """ViT-like router encoder (patch_transformer.py:29-92): 1×1 patch
    embedding, optional zero class token at sequence start, fixed 1-D
    sinusoidal position encoding (sin block then cos block — NOT
    interleaved), 4 post-LN transformer layers."""
    embedding_dim: int = 128
    num_heads: int = 4
    num_layers: int = 4
    use_class_token: bool = True

    @nn.compact
    def __call__(self, x):                         # NHWC → (B, S, E)
        E = self.embedding_dim
        emb = nn.Conv(E, (1, 1), name='embedding_convPxP')(x)
        B = emb.shape[0]
        emb = emb.reshape(B, -1, E)
        if self.use_class_token:
            emb = jnp.concatenate(
                [jnp.zeros((B, 1, E), emb.dtype), emb], axis=1)
        S = emb.shape[1]
        pos = jnp.arange(S, dtype=jnp.float32)[:, None]
        idx = jnp.arange(0, E, 2, dtype=jnp.float32)[None, :]
        ang = pos * jnp.exp(idx * (-jnp.log(10000.0) / E))
        pe = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=1)
        emb = emb + pe[None]
        for i in range(self.num_layers):
            emb = TorchTransformerLayer(E, self.num_heads,
                                        name=f'layer{i}')(emb)
        return emb


# domain bin configurations of the shipped NK checkpoint
# (config_zoedepth_nk.json: nyu 64 bins 1e-3..10, kitti 64 bins
# 1e-3..80)
NK_BIN_CONF = (('nyu', 64, 1e-3, 10.0), ('kitti', 64, 1e-3, 80.0))


class ZoeDepthNK(nn.Module):
    """Two-headed metric-depth model with a learned domain router
    (reference zoedepth_nk/zoedepth_nk_v1.py:40-243).

    The reference routes with a Python-level argmax over the batch
    domain vote and runs only the winning head. Under XLA both metric
    heads (4 tiny 1×1-conv MLP stacks + one log-binomial head each —
    negligible next to the 24-block BEiT core) are computed and the
    result is selected with `jnp.where`, keeping the graph static.

    NK head deltas vs the single-head ZoeDepth: seed/projector MLPs
    use mlp_dim = bin_embedding_dim//2, attractors use alpha from the
    NK config, the conditional-log-binomial input is the 32-channel
    DPT out-conv activation WITHOUT the relative-depth concat
    (zoedepth_nk_v1.py:152,222-230), and its bottleneck factor is 4."""
    img_size: Tuple[int, int] = (384, 512)
    bin_conf: Tuple[Tuple[str, int, float, float], ...] = NK_BIN_CONF
    bin_embedding_dim: int = 128
    n_attractors: Tuple[int, ...] = (16, 8, 4, 1)
    attractor_alpha: float = 1000.0
    attractor_gamma: int = 2
    attractor_kind: str = 'mean'
    attractor_type: str = 'inv'
    min_temp: float = 0.0212
    max_temp: float = 50.0
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
        x = (rgb01 - 0.5) / 0.5                    # MiDaS norm
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

        # learned nyu/kitti router (zoedepth_nk_v1.py:101-107,187-195)
        seq = PatchTransformerEncoder(
            name='patch_transformer')(btlnck)
        h = nn.Dense(128, name='mlp_classifier0')(seq[:, 0])
        domain_logits = nn.Dense(2, name='mlp_classifier1')(nn.relu(h))
        vote = jax.nn.softmax(domain_logits.sum(0))
        is_kitti = vote[1] > vote[0]

        # shared embedding chain (seed_projector + projectors are NOT
        # per-domain; only the attractor/seed/clb MLPs are)
        emb_mid = self.bin_embedding_dim // 2
        prev_emb0 = Projector(self.bin_embedding_dim, mlp_dim=emb_mid,
                              name='seed_projector')(btlnck)
        levels = [hooks[k] for k in ('r4', 'r3', 'r2', 'r1')]
        embs = [Projector(self.bin_embedding_dim, mlp_dim=emb_mid,
                          name=f'projector{i}')(lv)
                for i, lv in enumerate(levels)]

        last = hooks['out_conv']
        depths = []
        for name, n_bins, _, _ in self.bin_conf:
            _, b_prev = SeedBinRegressorUnnormed(
                n_bins, mlp_dim=emb_mid,
                name=f'seed_bin_regressor_{name}')(btlnck)
            prev_emb = prev_emb0
            b_centers = b_prev
            for i, emb in enumerate(embs):
                _, b_centers = AttractorLayerUnnormed(
                    n_bins, self.n_attractors[i],
                    mlp_dim=self.bin_embedding_dim,
                    alpha=self.attractor_alpha,
                    gamma=self.attractor_gamma,
                    kind=self.attractor_kind,
                    attractor_type=self.attractor_type,
                    name=f'attractor{i}_{name}')(emb, b_prev, prev_emb)
                b_prev, prev_emb = b_centers, emb
            emb_up = resize_bilinear_ac(prev_emb, last.shape[-3],
                                        last.shape[-2])
            probs = ConditionalLogBinomial(
                n_bins, bottleneck_factor=4, min_temp=self.min_temp,
                max_temp=self.max_temp,
                name=f'conditional_log_binomial_{name}')(last, emb_up)
            centers = resize_bilinear_ac(b_centers, probs.shape[-3],
                                         probs.shape[-2])
            depths.append(jnp.sum(probs * centers, -1, keepdims=True))

        depth = jnp.where(is_kitti, depths[1], depths[0])
        return {'metric_depth': depth, 'rel_depth': rel_depth,
                'domain_logits': domain_logits}


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
