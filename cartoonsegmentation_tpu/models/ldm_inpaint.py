"""Native latent-diffusion inpainting (the reference's GuidedLDM).

Parity: kenburns_effect.py:264-266, 432-436 — the reference carries a
commented-out in-process GuidedLDM path (guided_ldm_inpaint9_v15.yaml
+ an sd-1.5-inpainting checkpoint) and ships only the out-of-process
sd-webui adapter (serving/sd_webui.py — also implemented here). This
module makes the in-process path actually runnable on TPU with the
SD1.5-inpainting architecture on the models/ldm.py blocks:

- 9-channel conv_in UNet (noisy latent ‖ hole mask ‖ masked-image
  latent), conv transformer projections, 8 heads/level, CLIP-L 768
  context (the SD1.x configuration).
- classifier-free guidance with both prompts embedded ONCE host-side
  (the kenburns inpaint prompt is a constant — the 123M-param text
  tower has no business on the TPU at inference time).
- a self-contained CLIP BPE tokenizer reading the checkpoint
  directory's vocab.json/merges.txt (no network, no transformers
  tokenizer assets needed).

Checkpoint layout: a diffusers-style directory (unet/ vae/
text_encoder/ tokenizer/) — e.g. runwayml/stable-diffusion-inpainting.
"""
from __future__ import annotations

import json
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import LOGGER
from .ldm import (AutoencoderDecoder, AutoencoderEncoder, DDIMScheduler,
                  UNet2DCondition)
from .marigold import VAE_SCALE, convert_unet, convert_vae

SD15_UNET = dict(out_ch=4, block_out=(320, 640, 1280, 1280),
                 layers_per_block=2, heads=(8, 8, 8, 8),
                 cross_attn=(True, True, True, False),
                 linear_proj=False)


# -- CLIP BPE tokenizer -------------------------------------------------

def _bytes_to_unicode():
    bs = list(range(ord('!'), ord('~') + 1)) + \
        list(range(ord('¡'), ord('¬') + 1)) + \
        list(range(ord('®'), ord('ÿ') + 1))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


class ClipTokenizer:
    """Minimal CLIP BPE tokenizer (openai/CLIP simple_tokenizer
    semantics) built from a checkpoint's tokenizer/vocab.json +
    merges.txt."""

    def __init__(self, vocab_path: str, merges_path: str):
        import re
        with open(vocab_path, encoding='utf8') as f:
            self.encoder = json.load(f)
        with open(merges_path, encoding='utf8') as f:
            merges = f.read().split('\n')
        merges = [tuple(m.split()) for m in merges
                  if m and not m.startswith('#') and len(m.split()) == 2]
        self.bpe_ranks = dict(zip(merges, range(len(merges))))
        self.byte_encoder = _bytes_to_unicode()
        # CLIP's pattern uses \p{L}/\p{N} (regex module); the ASCII
        # classes below are equivalent for the English prompts this
        # pipeline builds
        self.pat = re.compile(
            r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d"
            r"|[a-zA-Z]+|[0-9]|[^\sa-zA-Z0-9]+", re.IGNORECASE)
        self.bos = self.encoder.get('<|startoftext|>', 49406)
        self.eos = self.encoder.get('<|endoftext|>', 49407)

    def _bpe(self, token: str) -> List[str]:
        # CLIP convention: the last character carries the </w> marker
        word = tuple(token[:-1]) + (token[-1] + '</w>',)
        while len(word) > 1:
            pairs = set(zip(word[:-1], word[1:]))
            pair = min(pairs,
                       key=lambda p: self.bpe_ranks.get(p, 1 << 30))
            if pair not in self.bpe_ranks:
                break
            a, b = pair
            out = []
            i = 0
            while i < len(word):
                if i < len(word) - 1 and word[i] == a \
                        and word[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            word = tuple(out)
        return list(word)

    def encode(self, text: str, context_len: int = 77) -> List[int]:
        import re
        text = re.sub(r'\s+', ' ', text.strip()).lower()
        ids = [self.bos]
        for tok in self.pat.findall(text):
            tok = ''.join(self.byte_encoder[b]
                          for b in tok.encode('utf-8'))
            for piece in self._bpe(tok):
                if piece in self.encoder:
                    ids.append(self.encoder[piece])
        ids = ids[:context_len - 1] + [self.eos]
        ids = ids + [self.eos] * (context_len - len(ids))
        return ids


def clip_text_embed(text_sd: Dict, token_ids: List[int],
                    hidden: int = 768, num_layers: int = 12,
                    heads: int = 12) -> jnp.ndarray:
    """Run a CLIP text tower (state dict) on token ids host-side
    (torch via transformers) → (1, L, hidden) last_hidden_state."""
    import torch
    from transformers import CLIPTextConfig, CLIPTextModel
    cfg = CLIPTextConfig(
        vocab_size=49408, hidden_size=hidden,
        intermediate_size=hidden * 4, num_hidden_layers=num_layers,
        num_attention_heads=heads, max_position_embeddings=77,
        hidden_act='quick_gelu')
    model = CLIPTextModel(cfg)
    sd = {k[len('text_model.'):] if k.startswith('text_model.') else k:
          torch.as_tensor(np.asarray(v)) for k, v in text_sd.items()}
    res = model.text_model.load_state_dict(sd, strict=False)
    n_own = len(model.text_model.state_dict())
    n_loaded = n_own - len(res.missing_keys)
    if n_loaded < 0.9 * n_own:
        raise ValueError(
            f'CLIP text state dict matched only {n_loaded}/{n_own} '
            'tensors — wrong key schema (expected text_model.* / '
            'bare CLIPTextModel keys); prompt embeddings would come '
            f'from random init. Unexpected: {res.unexpected_keys[:3]}')
    model.eval()
    with torch.no_grad():
        out = model(input_ids=torch.tensor([token_ids]))
    return jnp.asarray(out.last_hidden_state.numpy())


# -- the inpainter ------------------------------------------------------

class LDMInpainter:
    """SD-inpainting-architecture latent inpainter.

    ``variables`` carries unet/encoder/decoder params plus the two
    frozen prompt embeddings ('cond', 'uncond'). Without a checkpoint
    the nets run at random init (same policy as the rest of the
    package)."""

    def __init__(self, steps: int = 32, guidance: float = 7.0,
                 seed: int = 0, context_dim: int = 768,
                 context_len: int = 77,
                 unet_cfg: Optional[dict] = None,
                 vae_cfg: Optional[dict] = None):
        self.steps = steps
        self.guidance = guidance
        self.seed = seed
        self.context_dim = context_dim
        self.context_len = context_len
        self.unet = UNet2DCondition(**(unet_cfg or SD15_UNET))
        enc_cfg = dict(vae_cfg or {})
        dec_cfg = dict(vae_cfg or {})
        enc_cfg.pop('out_ch', None)
        dec_cfg.pop('latent_ch', None)
        self.encoder = AutoencoderEncoder(**enc_cfg)
        self.decoder = AutoencoderDecoder(**dec_cfg)
        self.vae_scale = 2 ** (len(self.encoder.block_out) - 1)
        self.variables: Optional[Dict] = None
        self._jit_cache: Dict = {}

    def init_random(self, key=None,
                    latent_hw: Tuple[int, int] = (8, 8)) -> None:
        key = key if key is not None else jax.random.PRNGKey(self.seed)
        k1, k2, k3, k4 = jax.random.split(key, 4)
        lh, lw = latent_hw
        sf = self.vae_scale
        from ..utils.env import jit_init
        self.variables = {
            'unet': jit_init(
                self.unet, k1, jnp.zeros((1, lh, lw, 9), jnp.float32),
                jnp.zeros((1,), jnp.int32),
                jnp.zeros((1, self.context_len, self.context_dim))),
            'encoder': jit_init(
                self.encoder, k2,
                jnp.zeros((1, lh * sf, lw * sf, 3), jnp.float32)),
            'decoder': jit_init(
                self.decoder, k3,
                jnp.zeros((1, lh, lw, 4), jnp.float32)),
            'cond': jax.random.normal(
                k4, (1, self.context_len, self.context_dim)) * 0.02,
            'uncond': jnp.zeros(
                (1, self.context_len, self.context_dim), jnp.float32),
        }

    def _ensure_vars(self):
        if self.variables is None:
            LOGGER.warning('ldm inpaint: RANDOM init (no checkpoint '
                           'loaded)')
            self.init_random()
        return self.variables

    def _infer_fn(self, lh: int, lw: int):
        # the runwayml SD1.5-inpainting scheduler config: leading
        # spacing with steps_offset=1 and set_alpha_to_one=False
        sch = DDIMScheduler(self.steps, prediction_type='epsilon',
                            spacing='leading', steps_offset=1,
                            set_alpha_to_one=False)
        guidance = self.guidance

        @jax.jit
        def fn(variables, rgb01, mask, noise):
            """rgb01 (1,H,W,3) in [0,1]; mask (1,H,W,1) {0,1} hole."""
            masked = rgb01 * (1.0 - mask)
            mean, _ = self.encoder.apply(variables['encoder'],
                                         masked * 2.0 - 1.0)
            m_lat = mean * VAE_SCALE                       # (1,lh,lw,4)
            mask_l = jax.image.resize(mask, (1, lh, lw, 1), 'nearest')
            z = noise
            ctx = jnp.concatenate([variables['uncond'],
                                   variables['cond']], 0)   # (2,L,D)
            for i in range(self.steps):
                t = jnp.full((2,), int(sch.timesteps[i]), jnp.int32)
                zin = jnp.concatenate([z, mask_l, m_lat], -1)
                zin2 = jnp.concatenate([zin, zin], 0)       # CFG pair
                eps = self.unet.apply(variables['unet'], zin2, t, ctx)
                e_un, e_c = eps[0:1], eps[1:2]
                eps_g = e_un + guidance * (e_c - e_un)
                z = sch.step(eps_g, i, z)
            dec = self.decoder.apply(variables['decoder'],
                                     z / VAE_SCALE)
            out01 = jnp.clip((dec + 1.0) / 2.0, 0.0, 1.0)
            # composite: only the hole is hallucinated
            return rgb01 * (1.0 - mask) + out01 * mask
        return fn

    def __call__(self, img_bgr: np.ndarray, mask: np.ndarray,
                 res: Optional[int] = None,
                 seed: Optional[int] = None) -> np.ndarray:
        """img_bgr uint8 (H,W,3); mask uint8/bool (H,W) nonzero=hole.
        Returns the inpainted uint8 BGR image at input resolution."""
        import cv2
        from ..utils import scaledown_size
        variables = self._ensure_vars()
        H, W = img_bgr.shape[:2]
        res = res or max(H, W)
        div = self.vae_scale * 2 ** (len(self.unet.block_out) - 1)
        rh, rw = scaledown_size(H, W, res, divisor=div)
        small = cv2.resize(img_bgr, (rw, rh))
        m = cv2.resize((np.asarray(mask) > 0).astype(np.uint8),
                       (rw, rh), interpolation=cv2.INTER_NEAREST)
        rgb = jnp.asarray(small[..., ::-1].astype(np.float32)
                          / 255.0)[None]
        m_f = jnp.asarray(m.astype(np.float32))[None, ..., None]
        lh, lw = rh // self.vae_scale, rw // self.vae_scale
        key = ('infer', lh, lw)
        if key not in self._jit_cache:
            self._jit_cache[key] = self._infer_fn(lh, lw)
        rng = jax.random.PRNGKey(self.seed if seed is None else seed)
        noise = jax.random.normal(rng, (1, lh, lw, 4), jnp.float32)
        out = self._jit_cache[key](variables, rgb, m_f, noise)
        out_u8 = np.asarray(jnp.clip(out[0], 0, 1)
                            * 255).astype(np.uint8)[..., ::-1]
        if (rh, rw) != (H, W):
            out_u8 = cv2.resize(out_u8, (W, H))
            # keep original pixels outside the hole at full res
            hole = (np.asarray(mask) > 0)[..., None]
            out_u8 = np.where(hole, out_u8, img_bgr)
        return out_u8

    # -- weights -------------------------------------------------------
    def load_checkpoint(self, unet_path: str, vae_path: str,
                        text_path: str, tokenizer_dir: str,
                        prompt: str, negative: str = '') -> None:
        """diffusers-layout checkpoint: unet/vae/text_encoder weight
        files + tokenizer dir (vocab.json, merges.txt). The two
        prompts are embedded once on host."""
        from .convert import load_torch_ckpt
        import os.path as osp
        unet_sd = load_torch_ckpt(unet_path)
        vae_sd = load_torch_ckpt(vae_path)
        text_sd = load_torch_ckpt(text_path)
        tok = ClipTokenizer(osp.join(tokenizer_dir, 'vocab.json'),
                            osp.join(tokenizer_dir, 'merges.txt'))
        self.variables = {
            'unet': convert_unet(
                unet_sd, block_out=tuple(self.unet.block_out),
                layers_per_block=self.unet.layers_per_block,
                cross_attn=tuple(self.unet.cross_attn)),
            'cond': clip_text_embed(
                text_sd, tok.encode(prompt, self.context_len)),
            'uncond': clip_text_embed(
                text_sd, tok.encode(negative, self.context_len)),
        }
        ve, vd = convert_vae(
            vae_sd, block_out=tuple(self.encoder.block_out),
            layers_per_block=self.encoder.layers_per_block)
        self.variables['encoder'] = ve
        self.variables['decoder'] = vd
