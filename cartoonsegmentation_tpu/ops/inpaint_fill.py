"""On-device hole filling — PatchMatch replacement.

The reference inpaints backgrounds through a ctypes FFI into an
external C++ PyPatchMatch library (animeinsseg/inpainting/
patch_match.py, SURVEY.md #17) — a host-side CPU detour. Here the
fill stays on the TPU:

1. **push–pull** (pull-push pyramid): validity-weighted downsample to
   1px, then upsample filling holes level by level — smooth,
   seam-free color propagation, O(HW) total.
2. an optional **jitter-refine** pass: each hole pixel samples a
   small neighborhood of already-filled pixels at multiple radii and
   keeps the candidate whose 3x3 ring best matches its surroundings —
   a cheap, vectorized step toward PatchMatch texture quality.

API mirrors ``patch_match.inpaint(image, mask, patch_size)``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _downsample2(img_w: jnp.ndarray) -> jnp.ndarray:
    """2x2 mean of premultiplied (C+1)-channel image (pad to even)."""
    H, W, C = img_w.shape
    ph, pw = H % 2, W % 2
    if ph or pw:
        img_w = jnp.pad(img_w, ((0, ph), (0, pw), (0, 0)))
    H2, W2 = img_w.shape[0] // 2, img_w.shape[1] // 2
    r = img_w.reshape(H2, 2, W2, 2, C)
    return r.sum(axis=(1, 3))


def _upsample2_to(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    return jax.image.resize(x, (h, w, x.shape[-1]), method='linear')


@functools.partial(jax.jit, static_argnames=('levels',))
def push_pull_fill(image: jnp.ndarray, hole: jnp.ndarray,
                   levels: int = 0) -> jnp.ndarray:
    """Fill ``hole`` pixels of image (H, W, C) by pull-push.

    hole: (H, W) bool — True where content must be synthesized."""
    H, W, C = image.shape
    if levels <= 0:
        levels = int(np.ceil(np.log2(max(H, W))))
    w0 = (~hole).astype(image.dtype)[..., None]
    pyr = [jnp.concatenate([image * w0, w0], -1)]
    for _ in range(levels):
        pyr.append(_downsample2(pyr[-1]))

    # pull: coarsest level normalizes to the global valid mean
    top = pyr[-1]
    filled = top[..., :C] / jnp.maximum(top[..., C:], 1e-8)
    for lv in range(len(pyr) - 2, -1, -1):
        cur = pyr[lv]
        h, w = cur.shape[0], cur.shape[1]
        up = _upsample2_to(filled, h, w)
        wgt = jnp.clip(cur[..., C:], 0.0, 1.0)
        col = cur[..., :C] / jnp.maximum(cur[..., C:], 1e-8)
        filled = col * wgt + up * (1.0 - wgt)
    return jnp.where(hole[:H, :W, None], filled[:H, :W], image)


@functools.partial(jax.jit, static_argnames=('iters',))
def jitter_refine(image: jnp.ndarray, hole: jnp.ndarray,
                  seed: int = 0, iters: int = 2) -> jnp.ndarray:
    """Texture refinement: propose candidate source pixels at random
    offsets (multi-radius), keep the one minimizing a 3x3 ring SSD
    against the current estimate. All gathers, fully vectorized."""
    H, W, C = image.shape
    py, px = jnp.mgrid[0:H, 0:W]
    key = jax.random.PRNGKey(seed)

    def ring(img):
        # edge-replicated shifts — jnp.roll would wrap the rings
        # around the frame, scoring border candidates against
        # opposite-edge content
        pad = jnp.pad(img, ((1, 1), (1, 1), (0, 0)), mode='edge')
        taps = []
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                taps.append(pad[1 + dy:1 + dy + H, 1 + dx:1 + dx + W])
        return jnp.stack(taps, 0)  # (8, H, W, C)

    out = image
    for it in range(iters):
        cur_ring = ring(out)
        best_cost = jnp.full((H, W), jnp.inf)
        best = out
        for radius in (4, 8, 16, 32):
            key, k1 = jax.random.split(key)
            off = jax.random.randint(k1, (2, H, W), -radius, radius + 1)
            qy = jnp.clip(py + off[0], 0, H - 1)
            qx = jnp.clip(px + off[1], 0, W - 1)
            # only sample from non-hole sources
            ok = ~hole[qy, qx]
            cand = out[qy, qx]
            cand_ring = cur_ring[:, qy, qx]
            cost = jnp.sum((cand_ring - cur_ring) ** 2, axis=(0, -1))
            cost = jnp.where(ok, cost, jnp.inf)
            better = cost < best_cost
            best_cost = jnp.where(better, cost, best_cost)
            best = jnp.where(better[..., None], cand, best)
        out = jnp.where((hole & jnp.isfinite(best_cost))[..., None],
                        best, out)
    return out


def inpaint(image: np.ndarray, mask: np.ndarray, patch_size: int = 3,
            refine: bool = True) -> np.ndarray:
    """Drop-in for reference patch_match.inpaint: uint8 BGR image +
    uint8/bool mask (>0 = hole) → uint8 BGR."""
    img = jnp.asarray(image.astype(np.float32) / 255.0)
    hole = jnp.asarray(np.asarray(mask) > 0)
    out = push_pull_fill(img, hole)
    if refine:
        out = jitter_refine(out, hole)
    return np.asarray(jnp.clip(out, 0, 1) * 255).astype(np.uint8)
