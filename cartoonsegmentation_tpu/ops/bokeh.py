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


def _bokeh_pass_gather(img: jnp.ndarray, depth: jnp.ndarray, dx: float,
                       dy: float, num_samples: int = 32) -> jnp.ndarray:
    """Direct (S, H, W) gather formulation — reference semantics
    transcribed 1:1 (effects.py:12-84). Kept as the readable oracle;
    ~20x slower than ``bokeh_pass`` on TPU because gather cost is
    per-row (see ops/pointcloud.py)."""
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


def _c_round_scalar(v: float) -> int:
    import math as _m
    return int(_m.copysign(_m.floor(abs(v) + 0.5), v))


def _reachable_pairs(dxsp, dysp, max_weight: float):
    """Static enumeration of every integer offset pair
    (cround(dxsp_s*w), cround(dysp_s*w)) reachable for w in
    [0, max_weight] — breakpoint-exact in f64, then dilated by the
    8-neighborhood to absorb any f32-vs-f64 rounding-boundary flips
    on device (a flip moves a sample to an adjacent pair; extra pairs
    only cost time, never correctness)."""
    import numpy as np
    pairs = set()
    for a, b in zip(np.asarray(dxsp, np.float64),
                    np.asarray(dysp, np.float64)):
        bps = {0.0, max_weight}
        for coef in (a, b):
            if abs(coef) > 1e-12:
                kmax = int(np.floor(abs(coef) * max_weight + 0.5))
                for k in range(kmax + 1):
                    wb = (k + 0.5) / abs(coef)
                    if 0.0 < wb < max_weight:
                        bps.add(wb)
        bps = sorted(bps)
        for lo, hi in zip(bps[:-1], bps[1:]):
            m = 0.5 * (lo + hi)
            pairs.add((_c_round_scalar(a * m), _c_round_scalar(b * m)))
        pairs.add((_c_round_scalar(a * max_weight),
                   _c_round_scalar(b * max_weight)))
    pairs.add((0, 0))
    dilated = set()
    for kx, ky in pairs:
        for ddx in (-1, 0, 1):
            for ddy in (-1, 0, 1):
                dilated.add((kx + ddx, ky + ddy))
    return sorted(dilated)


def _shift2d(x: jnp.ndarray, ky: int, kx: int) -> jnp.ndarray:
    """y[p] = x[p + (ky, kx)], zero padded."""
    H, W = x.shape[:2]
    pad = [(max(-ky, 0), max(ky, 0)), (max(-kx, 0), max(kx, 0))] + \
        [(0, 0)] * (x.ndim - 2)
    xp = jnp.pad(x, pad)
    return xp[max(ky, 0):max(ky, 0) + H, max(kx, 0):max(kx, 0) + W]


def bokeh_pass(img: jnp.ndarray, depth: jnp.ndarray, dx: float, dy: float,
               num_samples: int = 32,
               max_weight: float = _SCALE) -> jnp.ndarray:
    """One directional bokeh pass — dense shifted-add formulation.

    img: (H, W, C) float; depth: (H, W) weight field in
    [0, ``max_weight``] (bokeh_weight_field guarantees <= 0.0005).
    Parity: effects.py:12-84 (kernel_bokeh) — exactly the same
    per-sample arithmetic, but instead of gathering S=32 samples per
    pixel (sparse-row-bound on TPU), the per-sample integer offsets
    are bounded by max_weight, so samples are COUNTED per reachable
    offset pair (dense compares over the (S, H, W) offset codes) and
    each pair contributes one zero-padded dense shift of img/weight.
    ~20x faster than the gather at 576x1024.
    """
    H, W = depth.shape
    import numpy as np
    # the shifted-add formulation statically enumerates the offsets
    # reachable for weights in [0, max_weight]; out-of-range weights
    # would silently match no offset pair and drop their samples, so
    # clamp (in-range inputs are untouched — bit-exact)
    depth = jnp.clip(depth, 0.0, max_weight)
    im_size = min(H, W)
    offset = num_samples // 2
    sp = (np.arange(num_samples) - offset) * im_size          # (S,)
    dxsp = (dx * sp).astype(np.float32)
    dysp = (dy * sp).astype(np.float32)
    pairs = _reachable_pairs(dxsp, dysp, max_weight)

    # per-sample offsets, encoded to one u8 code per sample
    ox = _c_round_int(depth[None] * jnp.asarray(dxsp)[:, None, None])
    oy = _c_round_int(depth[None] * jnp.asarray(dysp)[:, None, None])
    span = max(max(abs(kx) for kx, _ in pairs),
               max(abs(ky) for _, ky in pairs)) + 1
    code = ((ox + span) * (2 * span + 1) + (oy + span)).astype(jnp.int32)

    wsum = jnp.zeros((H, W), depth.dtype)
    color = jnp.zeros(img.shape[:2] + (img.shape[-1],), img.dtype)
    for kx, ky in pairs:
        pk = (kx + span) * (2 * span + 1) + (ky + span)
        n = jnp.sum(code == pk, axis=0).astype(depth.dtype)   # (H, W)
        wsh = _shift2d(depth, ky, kx)
        contrib = n * wsh
        wsum = wsum + contrib
        color = color + contrib[..., None] * _shift2d(img, ky, kx)
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
