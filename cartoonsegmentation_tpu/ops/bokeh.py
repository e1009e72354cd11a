"""Depth-of-field bokeh blur (TPU-native).

Re-design of reference utils/effects.py:12-181 (``kernel_bokeh`` CUDA
kernel + ``bokeh_blur`` wrapper): a depth-weighted directional
sampling blur run in three passes (vertical, two diagonals forming a
hexagonal aperture), with highlight boosting via pow(img, lightness)
and a focal-plane remap of the depth map.

TPU formulation: the 32 data-dependent samples per pixel become one
(S, H, W) gather per pass — fully vectorized, no host round-trips.
The whole effect (all three passes) is a single jitted program that
slots into the per-frame `lax.scan` of the Ken Burns render loop.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

_SCALE = 0.0005  # reference effects.py:163


def _c_round_int(v: jnp.ndarray) -> jnp.ndarray:
    """C round() (half away from zero) then int32 — the CUDA kernel
    does `int(round(_dx * sp))`."""
    return (jnp.sign(v) * jnp.floor(jnp.abs(v) + 0.5)).astype(jnp.int32)


def bokeh_pass(img: jnp.ndarray, depth: jnp.ndarray, dx: float, dy: float,
               num_samples: int = 32) -> jnp.ndarray:
    """One directional bokeh pass.

    img: (H, W, C) float; depth: (H, W) float (already remapped /
    scaled weight field). Parity: effects.py:12-84 (kernel_bokeh).
    """
    H, W = depth.shape
    im_size = min(H, W)
    offset = num_samples // 2
    sp = (jnp.arange(num_samples) - offset) * im_size        # (S,)

    py, px = jnp.mgrid[0:H, 0:W]
    qx = px[None] + _c_round_int(depth[None] * (dx * sp)[:, None, None])
    qy = py[None] + _c_round_int(depth[None] * (dy * sp)[:, None, None])
    inb = (qx >= 0) & (qx < W) & (qy >= 0) & (qy < H)        # (S, H, W)
    qys = jnp.clip(qy, 0, H - 1)
    qxs = jnp.clip(qx, 0, W - 1)

    w = jnp.where(inb, depth[qys, qxs], 0.0)                 # (S, H, W)
    wsum = jnp.sum(w, axis=0)                                # (H, W)
    color = jnp.einsum('shw,shwc->hwc',
                       w, jnp.where(inb[..., None], img[qys, qxs], 0.0))
    out = color / jnp.maximum(wsum, 1e-30)[..., None]
    return jnp.where((wsum != 0.0)[..., None], out, img)


@functools.partial(jax.jit, static_argnames=('num_samples',))
def _bokeh_core(img01, weight, lightness_factor, num_samples):
    PI = math.pi
    hi = jnp.power(jnp.maximum(img01, 0.0), lightness_factor)
    vert = bokeh_pass(hi, weight, 0.0, 1.0, num_samples)
    diag = bokeh_pass(vert, weight, math.cos(-PI / 6), math.sin(-PI / 6),
                      num_samples)
    rhom = bokeh_pass(diag, weight, math.cos(-PI * 5 / 6),
                      math.sin(-PI * 5 / 6), num_samples)
    blurred = (diag + rhom) / 2.0
    return jnp.power(blurred, 1.0 / lightness_factor)


def bokeh_weight_field(depth: jnp.ndarray, depth_factor: float = 2.0,
                       focal_plane=None) -> jnp.ndarray:
    """Depth → per-pixel blur weight (parity: effects.py:147-164).

    Remaps around the focal plane, applies the power curve, normalizes
    to [0, 1], inverts and scales by 0.0005."""
    d = depth.astype(jnp.float32)
    if focal_plane is not None:
        d = jnp.max(d) - jnp.abs(d - focal_plane)
    d = jnp.power(jnp.maximum(d, 0.0), depth_factor) \
        if depth_factor != 1 else d
    d = d - jnp.min(d)
    d = d / jnp.maximum(jnp.max(d), 1e-12)
    return (1.0 - d) * _SCALE


def bokeh_blur(img: jnp.ndarray, depth: jnp.ndarray, num_samples: int = 32,
               lightness_factor: float = 10.0, depth_factor: float = 2.0,
               focal_plane=None) -> jnp.ndarray:
    """Full hexagonal bokeh effect on device.

    img: (H, W, 3) float32 in [0, 1] (the reference takes uint8 and
    normalizes; our pipeline stays float on device).
    depth: (H, W) raw rendered depth.
    Returns (H, W, 3) float32 in [0, 1].
    Parity: effects.py:143-181 (bokeh_blur).
    """
    weight = bokeh_weight_field(depth, depth_factor, focal_plane)
    return jnp.clip(
        _bokeh_core(img, weight, float(lightness_factor), num_samples),
        0.0, 1.0)
