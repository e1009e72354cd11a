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

    def step(adjusted, xs):
        mask, valid = xs
        m = mask.astype(adjusted.dtype)
        plane = adjusted * m
        nonempty = valid & (jnp.sum(plane) != 0.0)

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

        adjusted = jnp.where(nonempty, new, adjusted)
        return adjusted, None

    out, _ = jax.lax.scan(step, disparity,
                          (instances.masks, instances.valid))
    return out


def colorize_gray_r(x: jnp.ndarray) -> jnp.ndarray:
    """Min-max normalize and invert to [0, 255] — the `colorize(...,
    cmap='gray_r')[..., 0]` the reference feeds to bokeh
    (kenburns_effect.py:1043-1044)."""
    lo, hi = jnp.min(x), jnp.max(x)
    norm = (x - lo) / jnp.maximum(hi - lo, 1e-12)
    return (1.0 - norm) * 255.0
