"""Camera-path math: point shifting, depth range, autozoom search.

TPU re-design of reference anime_3dkenburns/common.py:59-141
(process_shift / process_autozoom): the reference runs a python
double loop of up to 256 candidate renders; here the candidate grid
is evaluated as one vmapped coverage program on device.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .pointcloud import render_coverage_fast


class DepthRange(NamedTuple):
    """min depth value and its (u, v) location — the subset of
    cv2.minMaxLoc the pipeline consumes (kenburns_effect.py:937,
    common.py:60-62)."""
    min_val: jnp.ndarray
    min_u: jnp.ndarray
    min_v: jnp.ndarray


def depth_range(depth: jnp.ndarray, margin: int = 128) -> DepthRange:
    """minMaxLoc over depth[margin:-margin, margin:-margin].

    Location is reported in full-image coordinates, like the
    reference's cv2.minMaxLoc over the cropped view... note the
    reference keeps crop-local coordinates (kenburns_effect.py:937) —
    we reproduce that exactly (no margin offset added) because
    process_shift consumes them as-is.
    """
    H, W = depth.shape
    m = min(margin, (H - 1) // 2, (W - 1) // 2)
    crop = depth[m:H - m, m:W - m]
    idx = jnp.argmin(crop)
    ch, cw = crop.shape
    v, u = idx // cw, idx % cw
    return DepthRange(crop.reshape(-1)[idx], u.astype(jnp.float32),
                      v.astype(jnp.float32))


def compute_shift(drange: DepthRange, shift_u, shift_v, depth_from,
                  depth_to, width: int, height: int, focal) -> jnp.ndarray:
    """3-vector camera shift anchored at the closest scene point
    (parity: common.py:59-74)."""
    closest_depth = drange.min_val + (depth_to - depth_from)
    from_u, from_v = drange.min_u, drange.min_v
    to_u, to_v = from_u + shift_u, from_v + shift_v
    from_x = (from_u - width / 2.0) * closest_depth / focal
    from_y = (from_v - height / 2.0) * closest_depth / focal
    to_x = (to_u - width / 2.0) * closest_depth / focal
    to_y = (to_v - height / 2.0) * closest_depth / focal
    return jnp.stack([from_x - to_x, from_y - to_y,
                      depth_to - depth_from]).astype(jnp.float32)


def shift_points(points: jnp.ndarray, shift: jnp.ndarray) -> jnp.ndarray:
    """Apply a camera shift to (P, 3) points (parity: common.py:76-81).

    The reference multiplies x,y by z/(z+1e-7) before adding the shift
    — numerically a no-op kept for exactness."""
    z = points[:, 2:3]
    ratio = z / (z + 1e-7)
    xy = points[:, :2] * ratio
    return jnp.concatenate([xy, points[:, 2:3]], axis=1) + shift[None, :]


# ---------------------------------------------------------------------------
# autozoom
# ---------------------------------------------------------------------------

def autozoom(points: jnp.ndarray, drange: DepthRange, int_width: int,
             int_height: int, focal, baseline, flt_shift: float = 100.0,
             flt_zoom: float = 1.25, crop_ratio: float = 0.97,
             grid: int = 16, stride: int = 1,
             ) -> Tuple[jnp.ndarray, jnp.ndarray, int, int]:
    """Find the camera shift maximizing rendered coverage.

    Returns (best_u, best_v, crop_w_to, crop_h_to) with best_* as
    device scalars. Parity: common.py:86-141 + kenburns_effect.py:
    953-967 (objFrom construction).

    The search itself is a jitted function taking ``points`` and the
    camera floats as ARGUMENTS — run eagerly, lax.map would close
    over the concrete point cloud and bake it into the trace as a
    literal, recompiling the 256-candidate program for every new
    image (~19 s/clip on the TPU tunnel, measured r3).

    ``stride`` > 1 evaluates the search on a miniature: every
    stride-th point of the grid-ordered cloud, rendered at a
    1/stride raster with focal/stride — a true downsampled render of
    the same scene, so each candidate's coverage FRACTION (the
    search objective, common.py:128) is preserved up to holes
    narrower than ``stride`` px. TPU scatter cost scales with the
    number of indexed rows, so stride=2 cuts the 256-candidate
    search 12.9 s -> 1.7 s at 576x1024 (measured r4); stride=1 is
    the exact reference search. Requires ``points`` grid-ordered as
    (int_height * int_width, 3) when stride > 1 (the pipeline's
    ``raw_points`` is; camera-shift math stays in full-image
    coordinates either way).
    """
    import math
    if stride > 1 and points.shape[0] != int_height * int_width:
        raise ValueError(
            f'autozoom stride={stride} needs a grid-ordered '
            f'(H*W, 3) cloud, got {points.shape[0]} points for '
            f'{int_height}x{int_width}')
    crop_w_from = int(math.floor(crop_ratio * int_width))
    crop_h_from = int(math.floor(crop_ratio * int_height))
    crop_w = crop_w_from / flt_zoom
    crop_h = crop_h_from / flt_zoom
    best_u, best_v = _autozoom_search(
        points, drange, int_width, int_height,
        jnp.float32(focal), jnp.float32(baseline),
        jnp.float32(flt_shift), jnp.float32(crop_w),
        jnp.float32(crop_h), jnp.float32(crop_w_from), grid, stride)
    crop_w_to = int(round(crop_w_from / flt_zoom))
    crop_h_to = int(round(crop_h_from / flt_zoom))
    return best_u, best_v, crop_w_to, crop_h_to


@partial(jax.jit,
         static_argnames=('int_width', 'int_height', 'grid', 'stride'))
def _autozoom_search(points, drange, int_width: int, int_height: int,
                     focal, baseline, flt_shift, crop_w, crop_h,
                     crop_w_from, grid: int, stride: int = 1):
    center_u = int_width / 2.0
    center_v = int_height / 2.0
    # miniature raster for the coverage objective (see autozoom doc)
    if stride > 1:
        points = points.reshape(int_height, int_width, 3)[
            ::stride, ::stride].reshape(-1, 3)
    cov_h = max(1, int_height // stride)
    cov_w = max(1, int_width // stride)
    cov_focal = focal / stride

    su = jnp.linspace(-flt_shift, flt_shift, grid)
    sv = jnp.linspace(-flt_shift, flt_shift, grid)
    uu, vv = jnp.meshgrid(su, sv, indexing='xy')     # [u_idx, v_idx] grid
    cand_u = uu.reshape(-1)
    cand_v = vv.reshape(-1)

    ok = ((center_u + cand_u >= crop_w / 2.0) &
          (center_u + cand_u <= int_width - crop_w / 2.0) &
          (center_v + cand_v >= crop_h / 2.0) &
          (center_v + cand_v <= int_height - crop_h / 2.0))

    depth_from = drange.min_val
    depth_to = drange.min_val * (crop_w / crop_w_from)

    def coverage_one(u, v):
        shift = compute_shift(drange, u, v, depth_from, depth_to,
                              int_width, int_height, focal)
        pts = shift_points(points, shift)
        return render_coverage_fast(pts, cov_h, cov_w,
                                    cov_focal, baseline)

    # chunked vmap: 16 candidates at a time keeps scatter buffers small
    cov = jax.lax.map(lambda uv: jax.vmap(coverage_one)(uv[0], uv[1]),
                      (cand_u.reshape(grid, -1), cand_v.reshape(grid, -1)))
    cov = cov.reshape(-1).astype(jnp.float32)
    cov = jnp.where(ok, cov, -1.0)
    # The reference's nested loop (common.py:99-101 with the repeated
    # linspace grids) enumerates shiftV in the outer loop and shiftU in
    # the inner one with a strict > update, i.e. first max wins in
    # V-major order — exactly the order of our flattened meshgrid, so
    # argmax (first occurrence) reproduces the tie-breaking.
    best = jnp.argmax(cov)
    # no in-frame candidate (image smaller than the shift range):
    # fall back to zero shift — the reference would crash on its
    # None sentinel here (common.py:96-137).
    any_ok = jnp.any(ok)
    best_u = jnp.where(any_ok, cand_u[best], 0.0)
    best_v = jnp.where(any_ok, cand_v[best], 0.0)
    return best_u, best_v
