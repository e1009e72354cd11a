"""Depth post-processing: instance-aware disparity adjustment,
grayscale depth colorization.

`adjust_disparity_by_instances` is the paper's key "instance-guided"
trick (reference anime_3dkenburns/kenburns_effect.py:39-91,
depth_adjustment_animesseg): each character's disparity is flattened
to the max over the bottom 3% of its mask rows (feet anchor), or to
the masked median. Implemented as a `lax.scan` over the static
instance capacity — later instances see earlier adjustments, exactly
like the reference's sequential loop.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..instances import Instances


def adjust_disparity_by_instances(disparity: jnp.ndarray,
                                  instances: Instances,
                                  use_median: bool = False) -> jnp.ndarray:
    """disparity (H, W) at image resolution; instances at same res."""
    H, W = disparity.shape
    rows = jnp.arange(H, dtype=jnp.float32)

    def adjust_one(adjusted, mask):
        m = mask.astype(adjusted.dtype)
        plane = adjusted * m
        nonempty = jnp.sum(plane) != 0.0

        if not use_median:
            row_any = jnp.sum(plane, axis=1) > 0.0
            top = jnp.argmax(row_any)
            bottom = (H - 1) - jnp.argmax(row_any[::-1])
            r0 = jnp.round(top + 0.97 * (bottom - top))
            region = rows[:, None] >= r0
            # reference takes plane[r0:, :].max() over the *unmasked*
            # rows — zeros outside the mask participate
            value = jnp.max(jnp.where(region, plane, -jnp.inf))
            new = (1.0 - m) * adjusted + m * value
        else:
            sel = plane > 0
            vals = jnp.where(sel, adjusted, jnp.inf)
            svals = jnp.sort(vals.reshape(-1))
            cnt = jnp.sum(sel).astype(jnp.int32)
            # torch .median(): lower of the two middles
            value = svals[jnp.maximum((cnt - 1) // 2, 0)]
            new = jnp.where(sel, value, adjusted)

        return jnp.where(nonempty, new, adjusted)

    def step(adjusted, xs):
        mask, valid = xs
        # cond, not where: invalid capacity slots (the common case at
        # the reference-parity capacity of 100) skip the O(HW) body
        # entirely — the reference loops over actual instances only
        adjusted = jax.lax.cond(valid, adjust_one,
                                lambda a, _m: a, adjusted, mask)
        return adjusted, None

    out, _ = jax.lax.scan(step, disparity,
                          (instances.masks, instances.valid))
    return out


def masked_median_u8(values: jnp.ndarray, masks: jnp.ndarray,
                     valid: jnp.ndarray,
                     chunk: int = 65536) -> jnp.ndarray:
    """Per-instance lower-median of ``round(values)`` over each mask.

    ``values`` (H, W) float in [0, 255]; ``masks`` (N, H, W) bool;
    ``valid`` (N,). Returns (N,) f32 medians; invalid or empty
    instances give -inf (so a plain ``max`` picks the focal plane).

    Parity note: the reference medians the *uint8* colorized depth
    (zoedepth colorize returns bytes — misc.py:97-140 — consumed at
    kenburns_effect.py:1045-1059), so a 256-bin histogram median over
    rounded values matches its quantization. The histogram is one
    (N, HW) @ (HW, 256) matmul — MXU work, no per-instance O(HW log
    HW) sorts, and the one-hot operand never materializes at full
    size because HW is scanned in ``chunk``-sized slices. bf16
    operands are exact here (0/1 values, f32 accumulation).
    """
    N = masks.shape[0]
    q = jnp.clip(jnp.round(values), 0, 255).astype(jnp.int32).reshape(-1)
    m = masks.reshape(N, -1)
    HW = q.shape[0]
    pad = (-HW) % chunk
    if pad:
        # padded pixels get bin 0 but an all-False mask row → no count
        q = jnp.pad(q, (0, pad))
        m = jnp.pad(m, ((0, 0), (0, pad)))
    nc = q.shape[0] // chunk
    qc = q.reshape(nc, chunk)
    mc = m.reshape(N, nc, chunk).transpose(1, 0, 2)

    def body(hist, xs):
        mi, qi = xs
        oh = jax.nn.one_hot(qi, 256, dtype=jnp.bfloat16)
        return hist + jnp.dot(mi.astype(jnp.bfloat16), oh,
                              preferred_element_type=jnp.float32), None

    hist, _ = jax.lax.scan(body, jnp.zeros((N, 256), jnp.float32),
                           (mc, qc))
    cnt = jnp.sum(hist, -1)
    cum = jnp.cumsum(hist, -1)
    rank = jnp.floor((cnt - 1.0) / 2.0) + 1.0   # lower median, 1-based
    med = jnp.sum(cum < rank[:, None], -1).astype(jnp.float32)
    return jnp.where(valid & (cnt > 0), med, -jnp.inf)


def colorize_gray_r(x: jnp.ndarray) -> jnp.ndarray:
    """Min-max normalize and invert to [0, 255] — the `colorize(...,
    cmap='gray_r')[..., 0]` the reference feeds to bokeh
    (kenburns_effect.py:1043-1044)."""
    lo, hi = jnp.min(x), jnp.max(x)
    norm = (x - lo) / jnp.maximum(hi - lo, 1e-12)
    return (1.0 - norm) * 255.0
