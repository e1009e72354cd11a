"""Point-cloud forward-splat renderer (TPU-native).

Re-design of the three CuPy RawKernels in reference
anime_3dkenburns/models/utils.py:56-315:

- ``kernel_pointrender_updateZee``  (float atomicMin z-buffer) →
  deterministic ``scatter-min`` on the nearest bilinear corner
- ``kernel_pointrender_updateDegrid`` (in-place, racy opposing-neighbor
  smoothing) → a pure stencil over the z-buffer (deterministic; the
  reference's in-place read/write order is an acknowledged benign race,
  see SURVEY.md §5.2)
- ``kernel_pointrender_updateOutput`` (atomicAdd bilinear splat gated
  by z-test) → masked ``scatter-add`` over all four corners

Everything is static-shaped: invalid / out-of-frame points are routed
to a dropped scatter index, so a fixed-capacity point cloud with a
validity mask renders in one compiled XLA program.

Layout: points (P, 3) xyz camera space, data (P, C) channel-last.
Batch via ``jax.vmap``.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

BIG = 1000000.0  # reference z-buffer init (models/utils.py:59)


def depth_to_points(depth: jnp.ndarray, focal: float) -> jnp.ndarray:
    """Unproject a depth map to camera-space xyz.

    depth: (H, W) or (H, W, 1) → (H, W, 3). Pixel grid is centered:
    u ∈ [-W/2+0.5, W/2-0.5] (parity: models/utils.py:43-50).
    """
    if depth.ndim == 3:
        depth = depth[..., 0]
    H, W = depth.shape
    xs = (jnp.arange(W, dtype=depth.dtype) - 0.5 * W + 0.5) / focal
    ys = (jnp.arange(H, dtype=depth.dtype) - 0.5 * H + 0.5) / focal
    x = depth * xs[None, :]
    y = depth * ys[:, None]
    return jnp.stack([x, y, depth], axis=-1)


def _project(points: jnp.ndarray, H: int, W: int, focal: float,
             baseline: float):
    """Project points to the image plane.

    The reference intersects the ray to the origin with the plane
    z=focal (models/utils.py:76-99); algebraically that is the pinhole
    projection u = x*focal/z. Returns (u, v, error, valid) where
    ``error`` is the z-buffer key 1e6 - focal*baseline/(z+1e-7).
    """
    x, y, z = points[:, 0], points[:, 1], points[:, 2]
    valid = z >= 0.001
    zs = jnp.where(valid, z, 1.0)  # avoid div-by-~0 garbage
    u = x * focal / zs + 0.5 * W - 0.5
    v = y * focal / zs + 0.5 * H - 0.5
    error = BIG - (focal * baseline) / (z + 1e-7)
    return u, v, error, valid


def _corners(u: jnp.ndarray, v: jnp.ndarray):
    """Four bilinear corners and weights: NW, NE, SW, SE (reference
    corner order, models/utils.py:101-113)."""
    x0 = jnp.floor(u)
    y0 = jnp.floor(v)
    fx = u - x0
    fy = v - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    cx = jnp.stack([x0i, x0i + 1, x0i, x0i + 1], 0)        # (4, P)
    cy = jnp.stack([y0i, y0i, y0i + 1, y0i + 1], 0)
    w = jnp.stack([(1 - fx) * (1 - fy), fx * (1 - fy),
                   (1 - fx) * fy, fx * fy], 0)             # (4, P)
    return cx, cy, w


def _flat_idx(cx, cy, H, W, extra_invalid=None):
    """Flattened pixel index; out-of-frame (or masked) → H*W (dropped
    by scatter mode='drop')."""
    inb = (cx >= 0) & (cx < W) & (cy >= 0) & (cy < H)
    if extra_invalid is not None:
        inb = inb & ~extra_invalid
    return jnp.where(inb, cy * W + cx, H * W), inb


def degrid(zee: jnp.ndarray) -> jnp.ndarray:
    """Opposing-neighbor z-buffer smoothing (models/utils.py:152-212).

    For each of 4 opposing neighbor pairs, if both neighbors are in
    bounds and the center exceeds both by >= 1.0, the pair contributes
    its two values; the center becomes min(center, mean of all
    contributions). Computed as a pure stencil over the input buffer
    (deterministic; the CUDA original reads a buffer it is mutating).
    zee: (H, W).
    """
    INF = jnp.asarray(jnp.inf, zee.dtype)

    def shifted(dy, dx):
        return jnp.pad(zee, ((1, 1), (1, 1)), constant_values=INF)[
            1 + dy:1 + dy + zee.shape[0], 1 + dx:1 + dx + zee.shape[1]]

    total = jnp.zeros_like(zee)
    count = jnp.zeros_like(zee)
    for dy, dx in ((0, 1), (1, 0), (1, 1), (-1, 1)):
        one = shifted(dy, dx)
        two = shifted(-dy, -dx)
        cond = (zee >= one + 1.0) & (zee >= two + 1.0)
        # inf padding makes cond False at borders (both must be inb)
        total = total + jnp.where(cond, one + two, 0.0)
        count = count + jnp.where(cond, 2.0, 0.0)
    avg = total / jnp.maximum(count, 1.0)
    return jnp.where(count > 0, jnp.minimum(zee, avg), zee)


@functools.partial(jax.jit, static_argnums=(2, 3),
                   static_argnames=('payload_dtype',))
def _render_impl(points, data, H, W, focal, baseline,
                 payload_dtype=None):
    """Corner-packed splat.

    TPU scatter/gather cost is dominated by the number of indexed
    ROWS, not row width (measured ~2.2x end-to-end win at 576x1024,
    655k points). So instead of 4 corner scatters of (C+1)-wide rows
    plus 4 z-ref gathers, each point scatters ONE 4*(C+1)-wide row at
    its quad origin (y0, x0) into a (H+2, W+2) padded grid, and reads
    ONE 4-wide z-ref row from a shift-stacked z-buffer; dense shifted
    adds fold the quad fields back onto true pixels. Per-corner sums
    are bit-identical to the unpacked formulation (same addends per
    pixel; float order within a scatter is unspecified either way).
    """
    P = points.shape[0]
    C = data.shape[1]
    u, v, error, valid = _project(points, H, W, focal, baseline)
    cx, cy, w = _corners(u, v)

    # --- pass 1: nearest-corner z-buffer (scatter-min) ---------------
    # the CUDA kernel routes each point to the corner with the largest
    # bilinear weight, first-wins on ties in NW,NE,SW,SE order. The
    # bilinear weights factorize (w = wx * wy with wx ∈ {1-fx, fx}),
    # so the argmax decomposes into two independent comparisons with
    # the same tie behavior (fx == 0.5 → W side, fy == 0.5 → N side,
    # the lower corner index) — no (4,P) argmax + P-row
    # take_along_axis gathers, which cost several ms at 655k points.
    x0f, y0f = jnp.floor(u), jnp.floor(v)
    bx = (x0f + (u - x0f > 0.5)).astype(jnp.int32)
    by = (y0f + (v - y0f > 0.5)).astype(jnp.int32)
    zidx, _ = _flat_idx(bx, by, H, W, extra_invalid=~valid)
    zee = jnp.full((H * W + 1,), BIG, points.dtype)
    zee = zee.at[zidx].min(jnp.where(valid, error, BIG), mode='drop')
    zee = degrid(zee[:H * W].reshape(H, W)).reshape(-1)

    # --- pass 2: packed bilinear splat gated by z-test ---------------
    Hp, Wp = H + 2, W + 2
    z2 = jnp.full((Hp, Wp), BIG, points.dtype)
    z2 = z2.at[1:H + 1, 1:W + 1].set(zee.reshape(H, W))
    # zw[q] = z at the [NW, NE, SW, SE] pixels of quad slot q
    zw = jnp.stack([z2, jnp.roll(z2, -1, 1), jnp.roll(z2, -1, 0),
                    jnp.roll(jnp.roll(z2, -1, 0), -1, 1)], -1)
    zw = zw.reshape(Hp * Wp, 4)
    x0, y0 = cx[0], cy[0]
    inq = (x0 >= -1) & (x0 <= W - 1) & (y0 >= -1) & (y0 <= H - 1) \
        & valid
    qidx = jnp.where(inq, (y0 + 1) * Wp + (x0 + 1), Hp * Wp)
    zref = zw[jnp.clip(qidx, 0, Hp * Wp - 1)]          # (P, 4)

    # optional reduced-precision accumulation (bf16 halves scatter
    # bytes at ~0.4% relative color error — invisible at uint8 output)
    acc_dtype = jnp.dtype(payload_dtype) if payload_dtype is not None \
        else data.dtype
    data1 = jnp.concatenate([data, jnp.ones((P, 1), data.dtype)], 1)
    if acc_dtype != data.dtype:
        # build the pack directly in the accumulation dtype: halves
        # the elementwise write traffic of the (P, 4*(C+1)) product
        # and drops the separate cast
        data1 = data1.astype(acc_dtype)
    packs = []
    for c in range(4):
        inb = (cx[c] >= 0) & (cx[c] < W) & (cy[c] >= 0) & (cy[c] < H)
        pass_z = error <= zref[:, c] + 1.0             # tolerance +1.0
        wc = jnp.where(inb & valid & pass_z, w[c], 0.0)
        packs.append(data1 * wc[:, None].astype(acc_dtype))
    pack = jnp.concatenate(packs, 1).astype(acc_dtype)  # (P, 4*(C+1))
    out = jnp.zeros((Hp * Wp + 1, 4 * (C + 1)), acc_dtype)
    out = out.at[qidx].add(pack, mode='drop')
    q = out[:Hp * Wp].reshape(Hp, Wp, 4, C + 1).astype(data.dtype)
    # fold quad fields back onto pixels:
    # final[y,x] = NW@(y+1,x+1) + NE@(y+1,x) + SW@(y,x+1) + SE@(y,x)
    out = (q[1:H + 1, 1:W + 1, 0] + q[1:H + 1, 0:W, 1] +
           q[0:H, 1:W + 1, 2] + q[0:H, 0:W, 3])
    weight = out[..., C:]
    render = out[..., :C] / (weight + 1e-7)
    return render, weight, zee.reshape(H, W)


def render_pointcloud(points: jnp.ndarray, data: jnp.ndarray, H: int,
                      W: int, focal, baseline, payload_dtype=None
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Forward-splat ``data`` carried by ``points`` into an (H, W) view.

    Args:
      points: (P, 3) camera-space xyz. Invalid slots: set z <= 0.
      data:   (P, C) per-point payload (e.g. RGB+disparity).
      focal, baseline: camera intrinsics (traced or python scalars).

    Returns:
      render (H, W, C) — weight-normalized splat,
      weight (H, W, 1) — accumulated bilinear weight ("existing" mask).

    Parity: reference render_pointcloud returns
    (output[:C]/(w+1e-7), w) — models/utils.py:315.
    """
    render, weight, _ = _render_impl(
        points, data, H, W,
        jnp.asarray(focal, points.dtype),
        jnp.asarray(baseline, points.dtype),
        payload_dtype=payload_dtype)
    return render, weight


def render_coverage_fast(points: jnp.ndarray, H: int, W: int, focal,
                         baseline) -> jnp.ndarray:
    """Approximate coverage: pixels receiving any positive bilinear
    weight, WITHOUT the z-buffer passes. Differs from the full render
    only at pixels whose degrid-lowered z-buffer rejects *every*
    contributor — a handful of pixels, candidate-independent in
    practice, so the autozoom argmax is unaffected while the 256-
    candidate search becomes one cheap scatter per candidate."""
    u, v, _, valid = _project(points, H, W, focal, baseline)
    cx, cy, w = _corners(u, v)
    # corner-packed single scatter (see _render_impl)
    Hp, Wp = H + 2, W + 2
    x0, y0 = cx[0], cy[0]
    inq = (x0 >= -1) & (x0 <= W - 1) & (y0 >= -1) & (y0 <= H - 1) \
        & valid
    qidx = jnp.where(inq, (y0 + 1) * Wp + (x0 + 1), Hp * Wp)
    packs = []
    for c in range(4):
        inb = (cx[c] >= 0) & (cx[c] < W) & (cy[c] >= 0) & (cy[c] < H)
        packs.append(jnp.where(inb & valid, w[c], 0.0))
    out = jnp.zeros((Hp * Wp + 1, 4), points.dtype)
    out = out.at[qidx].add(jnp.stack(packs, 1), mode='drop')
    q = out[:Hp * Wp].reshape(Hp, Wp, 4)
    cov = (q[1:H + 1, 1:W + 1, 0] + q[1:H + 1, 0:W, 1] +
           q[0:H, 1:W + 1, 2] + q[0:H, 0:W, 3])
    return jnp.sum(cov > 0.0)


def render_coverage(points: jnp.ndarray, H: int, W: int, focal,
                    baseline) -> jnp.ndarray:
    """Number of covered pixels (weight > 0) — the objective of
    autozoom's 16x16 candidate search (common.py:86-141, which runs a
    full render per candidate and counts ``existing > 0``). We run
    the same z-buffered splat with an empty payload (C=0: only the
    weight channel is scattered), so the count matches the full
    render exactly at a quarter of the scatter traffic."""
    data0 = jnp.zeros((points.shape[0], 0), points.dtype)
    _, weight, _ = _render_impl(
        points, data0, H, W,
        jnp.asarray(focal, points.dtype), jnp.asarray(baseline, points.dtype))
    return jnp.sum(weight > 0.0)
