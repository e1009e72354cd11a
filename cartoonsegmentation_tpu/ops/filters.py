"""Spatial filters (laplacian validity filter, median-3/5).

TPU-native port of reference anime_3dkenburns/models/utils.py:9-40
(``spatial_filter``). Layout is NHWC (channel-last); all ops are pure
jnp stencils that XLA fuses — no im2col materialization.
"""
from __future__ import annotations

import jax.numpy as jnp


def _shift2d(x: jnp.ndarray, dy: int, dx: int, mode: str) -> jnp.ndarray:
    """x shifted so out[y, x] = in[y+dy, x+dx], with boundary padding.

    mode: 'edge' (torch 'replicate') or 'reflect' (torch 'reflect').
    """
    H, W = x.shape[-3], x.shape[-2]
    pt, pb = max(-dy, 0), max(dy, 0)
    pl, pr = max(-dx, 0), max(dx, 0)
    pad = [(0, 0)] * (x.ndim - 3) + [(pt, pb), (pl, pr), (0, 0)]
    xp = jnp.pad(x, pad, mode=mode)
    ys, xs = dy + pt, dx + pl
    return xp[..., ys:ys + H, xs:xs + W, :]


def laplacian_filter(x: jnp.ndarray) -> jnp.ndarray:
    """Asymmetric 3x3 laplacian with replicate padding.

    out[y,x] = 4*in[y,x] - in[y-1,x] - in[y-1,x+1] - in[y,x-1]
               - in[y+1,x-1]
    (exact kernel of reference models/utils.py:13-24; torch conv2d is
    cross-correlation, weight[ky,kx] taps in[y-1+ky, x-1+kx]).
    x: (..., H, W, C).
    """
    return (4.0 * x
            - _shift2d(x, -1, 0, 'edge')
            - _shift2d(x, -1, 1, 'edge')
            - _shift2d(x, 0, -1, 'edge')
            - _shift2d(x, 1, -1, 'edge'))


def median_filter(x: jnp.ndarray, size: int) -> jnp.ndarray:
    """size x size median with reflect padding (size odd: 3 or 5).

    Parity: models/utils.py:26-36 (median-3 / median-5 via unfold +
    median). Implemented as a sort over the size^2 shifted copies —
    a fully vectorized VPU program.
    """
    assert size % 2 == 1
    r = size // 2
    taps = [_shift2d(x, dy, dx, 'reflect')
            for dy in range(-r, r + 1) for dx in range(-r, r + 1)]
    stacked = jnp.stack(taps, axis=-1)
    med = jnp.sort(stacked, axis=-1)[..., (size * size) // 2]
    return med


def spatial_filter(x: jnp.ndarray, kind: str) -> jnp.ndarray:
    """Dispatch matching the reference's string API."""
    if kind == 'laplacian':
        return laplacian_filter(x)
    if kind == 'median-3':
        return median_filter(x, 3)
    if kind == 'median-5':
        return median_filter(x, 5)
    raise ValueError(f'unknown spatial filter: {kind}')


def valid_depth_mask(disparity: jnp.ndarray, thr: float = 0.03) -> jnp.ndarray:
    """|laplacian(disparity / max)| < thr — the point-cloud validity
    mask used everywhere in the kenburns pipeline
    (kenburns_effect.py:931, pointcloud_inpainting.py:118)."""
    norm = disparity / (jnp.max(disparity) + 1e-12)
    return (jnp.abs(laplacian_filter(norm)) < thr).astype(disparity.dtype)
