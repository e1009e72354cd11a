"""Disocclusion fill — 16-direction ray search (TPU-native).

Re-design of ``kernel_discfill_updateOutput`` (reference
anime_3dkenburns/common.py:145-247): for every hole pixel (rendered
depth <= 0), rays are marched in 16 directions both ways to the
nearest valid pixel; the direction with the shortest valid-to-valid
gap wins, and the hole copies the endpoint that is *farther* in depth
(the background side).

TPU formulation: the per-thread ``do { pos += dir } while`` march
becomes a precomputed (16, K, 2) integer offset table (exact C
``round()`` semantics, computed on host) and a streamed gather of the
depth map at p + offset — a first-event reduction processed in step
chunks so peak memory stays at O(chunk · H · W). K (``max_steps``)
bounds the search radius; the CUDA original searches to the frame
edge, but disocclusion gaps are baseline-bounded (tens of pixels at
the default baseline 40), so a static cap is exact in practice and
keeps the program static-shaped.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# direction table, reference common.py:171-172
_DIR_X = np.array([-1, 0, 1, 1, -1, 1, 2, 2, -2, -1, 1, 2, 3, 3, 3, 3],
                  np.float64)
_DIR_Y = np.array([1, 1, 1, 0, 2, 2, 1, -1, 3, 3, 3, 3, 2, 1, -1, -2],
                  np.float64)

_CHUNK = 16
BIG = 1000000.0


def _c_round(v: np.ndarray) -> np.ndarray:
    """C round(): half away from zero (np.round is half-to-even)."""
    return np.sign(v) * np.floor(np.abs(v) + 0.5)


@functools.lru_cache(maxsize=8)
def _offset_table(max_steps: int):
    """(16, K, 2) int32 (dy, dx) offsets for the '+dir' way; the
    '-dir' way negates them.

    Matches the reference's accumulate-then-round walk: the pixel
    visited at step s from integer origin p is p + round(s * d̂)
    (round(int + f) == int + round(f), and C round is odd-symmetric
    so the backward walk is the exact negation)."""
    norm = np.sqrt(_DIR_X ** 2 + _DIR_Y ** 2)
    dx, dy = _DIR_X / norm, _DIR_Y / norm
    s = np.arange(1, max_steps + 1, dtype=np.float64)
    offx = _c_round(s[None, :] * dx[:, None]).astype(np.int32)
    offy = _c_round(s[None, :] * dy[:, None]).astype(np.int32)
    # NOTE: cached as numpy — a jnp array materialized here would be a
    # tracer when first called under jit, leaking across traces.
    return np.stack([offy, offx], axis=-1)  # (16, K, 2)


def _first_hit(depth, py, px, offs, H, W):
    """First valid endpoint along one direction-way for every pixel.

    depth: (H, W); py/px: (H, W) int grids; offs: (K, 2) with K a
    multiple of _CHUNK. Walks terminate at the first of: a valid
    pixel (success) or leaving the frame (failure) — reference
    common.py:188-208. Streamed over chunks of steps so only
    (chunk, H, W) intermediates exist.

    Returns (found, ey, ex, ed): endpoint coords and depth.
    """
    K = offs.shape[0]
    offs_c = offs.reshape(K // _CHUNK, _CHUNK, 2)

    def chunk_step(carry, off_c):
        active, found, ey, ex, ed = carry
        qy = py[None] + off_c[:, 0][:, None, None]       # (chunk, H, W)
        qx = px[None] + off_c[:, 1][:, None, None]
        inb = (qy >= 0) & (qy < H) & (qx >= 0) & (qx < W)
        d = depth[jnp.clip(qy, 0, H - 1), jnp.clip(qx, 0, W - 1)]
        hit = inb & (d > 0.0)
        evt = hit | ~inb                                 # hit xor exit
        any_evt = jnp.any(evt, axis=0)
        s_evt = jnp.argmax(evt, axis=0)                  # first event
        is_hit = jnp.take_along_axis(hit, s_evt[None], 0)[0]
        ney = jnp.take_along_axis(qy, s_evt[None], 0)[0]
        nex = jnp.take_along_axis(qx, s_evt[None], 0)[0]
        ned = jnp.take_along_axis(d, s_evt[None], 0)[0]
        upd = active & any_evt & is_hit
        found = found | upd
        ey = jnp.where(upd, ney, ey)
        ex = jnp.where(upd, nex, ex)
        ed = jnp.where(upd, ned, ed)
        active = active & ~any_evt
        return (active, found, ey, ex, ed), None

    init = (jnp.ones((H, W), jnp.bool_), jnp.zeros((H, W), jnp.bool_),
            py, px, jnp.zeros((H, W), depth.dtype))
    (active, found, ey, ex, ed), _ = jax.lax.scan(chunk_step, init, offs_c)
    return found, ey, ex, ed


# ---------------------------------------------------------------------------
# fast path: shear + column scans (no big gathers)
# ---------------------------------------------------------------------------

def _shear_tables(H: int, W: int, dx: float, dy: float):
    """Static shear tables for a direction with |dy| >= |dx|:
    off[y] = round(y * dx/dy); sheared column x' = x - off[y] + base."""
    slope = dx / dy
    off = _c_round(np.arange(H, dtype=np.float64) * slope).astype(np.int32)
    # coverage: image pixel (y, x) lives at sheared column
    # x' = x + base - off[y]; x' >= 0 for all y requires
    # base = off.max() (base = -off.min() left a triangular region of
    # pixels unmapped for positive-slope directions — the unshear
    # then read a neighboring line's results)
    base = int(off.max())
    Wp = W + base - int(off.min())
    return off, base, Wp


def _fill_one_direction(depth, dx, dy):
    """Best (found, dist, fy, fx) for one direction via shear + scans.

    depth: (H, W). Returns per-pixel arrays in image space.
    The digital line here is the Bresenham form x(y) = round(y·dx/dy)
    — one cell per row — instead of the reference's accumulate-and-
    round walk (which can visit two cells of a row); endpoints differ
    by at most one pixel, invisible in the fill.
    """
    H, W = depth.shape
    off, base, Wp = _shear_tables(H, W, dx, dy)
    off_j = jnp.asarray(off)

    ys = jnp.arange(H)[:, None]
    xps = jnp.arange(Wp)[None, :]
    xs = xps - base + off_j[:, None]              # actual x at (y, x')
    inframe = (xs >= 0) & (xs < W)
    d_s = jnp.where(inframe,
                    depth[ys, jnp.clip(xs, 0, W - 1)], 0.0)
    valid = inframe & (d_s > 0.0)
    oob = ~inframe

    yrow = jnp.broadcast_to(jnp.arange(H)[:, None], (H, Wp))
    NEG, POS = -1, H

    # exclusive scans: nearest event strictly above / below each row
    lastv = jax.lax.cummax(jnp.where(valid, yrow, NEG), axis=0)
    lasto = jax.lax.cummax(jnp.where(oob, yrow, NEG), axis=0)
    lastv_ex = jnp.concatenate(
        [jnp.full((1, Wp), NEG), lastv[:-1]], axis=0)
    lasto_ex = jnp.concatenate(
        [jnp.full((1, Wp), NEG), lasto[:-1]], axis=0)
    firstv = jax.lax.cummin(jnp.where(valid, yrow, POS), axis=0,
                            reverse=True)
    firsto = jax.lax.cummin(jnp.where(oob, yrow, POS), axis=0,
                            reverse=True)
    firstv_ex = jnp.concatenate(
        [firstv[1:], jnp.full((1, Wp), POS)], axis=0)
    firsto_ex = jnp.concatenate(
        [firsto[1:], jnp.full((1, Wp), POS)], axis=0)

    up = (lastv_ex > lasto_ex, jnp.clip(lastv_ex, 0, H - 1))
    down = (firstv_ex < firsto_ex, jnp.clip(firstv_ex, 0, H - 1))
    (f_from, r_from), (f_to, r_to) = (up, down) if dy > 0 else (down, up)

    def endpoint(rows):
        ex = off_j[rows] + (xps - base)
        ed = jnp.take_along_axis(d_s, rows, axis=0)
        return ex, rows, ed

    ex_f, ey_f, ed_f = endpoint(r_from)
    ex_t, ey_t, ed_t = endpoint(r_to)
    found = f_from & f_to
    dist = jnp.sqrt(((ex_t - ex_f).astype(depth.dtype)) ** 2 +
                    ((ey_t - ey_f).astype(depth.dtype)) ** 2)
    use_to = ed_f < ed_t
    fy = jnp.where(use_to, ey_t, ey_f)
    fx = jnp.where(use_to, ex_t, ex_f)

    # unshear: image-space value at (y, x) lives at column x-off[y]+base
    col = jnp.arange(W)[None, :] - off_j[:, None] + base   # (H, W)
    take = lambda a: jnp.take_along_axis(a, col, axis=1)
    return take(found), take(dist), take(fy), take(fx)


@jax.jit
def fill_disocclusion_fast(img: jnp.ndarray, depth: jnp.ndarray
                           ) -> jnp.ndarray:
    """Shear-scan disocclusion fill — same policy as the exact version
    (shortest valid-to-valid gap over 16 directions, farther-depth
    endpoint wins) at a fraction of the cost: per direction it's two
    static-index shears, four column scans and two row gathers instead
    of a K-step ray march. Unbounded search radius (full frame)."""
    H, W = depth.shape
    best_d = jnp.full((H, W), BIG, depth.dtype)
    py, px = jnp.mgrid[0:H, 0:W]
    by, bx = py.astype(jnp.int32), px.astype(jnp.int32)
    bfound = jnp.zeros((H, W), jnp.bool_)

    for dx, dy in zip(_DIR_X, _DIR_Y):
        if abs(dy) >= abs(dx):
            found, dist, fy, fx = _fill_one_direction(
                depth, float(dx), float(dy))
        else:  # transpose so the line parameter is the row index
            found, dist, fx, fy = _fill_one_direction(
                depth.T, float(dy), float(dx))
            found, dist = found.T, dist.T
            fy, fx = fy.T, fx.T
        better = found & (best_d > dist)
        best_d = jnp.where(better, dist, best_d)
        by = jnp.where(better, fy, by)
        bx = jnp.where(better, fx, bx)
        bfound = bfound | better

    hole = depth <= 0.0
    take = hole & bfound
    src_y = jnp.where(take, by, py)
    src_x = jnp.where(take, bx, px)
    return img[src_y, src_x]


@functools.partial(jax.jit, static_argnames=('max_steps',))
def fill_disocclusion(img: jnp.ndarray, depth: jnp.ndarray,
                      max_steps: int = 128) -> jnp.ndarray:
    """Fill hole pixels (depth <= 0) of ``img``.

    img: (H, W, C) — typically the 4-channel RGB+disparity render.
    depth: (H, W) — rendered depth * existing mask.
    Parity: reference fill_disocclusion (common.py:145-247).
    """
    H, W = depth.shape
    max_steps = max(_CHUNK, (max_steps // _CHUNK) * _CHUNK)
    offs = _offset_table(max_steps)                    # (16, K, 2)
    py, px = jnp.mgrid[0:H, 0:W]
    py = py.astype(jnp.int32)
    px = px.astype(jnp.int32)

    def direction_step(carry, off_k):
        best_d, by, bx, bfound = carry
        f_from, fy, fx, fd = _first_hit(depth, py, px, -off_k, H, W)
        f_to, ty, tx, td = _first_hit(depth, py, px, off_k, H, W)
        ok = f_from & f_to
        dist = jnp.sqrt(((tx - fx).astype(depth.dtype)) ** 2 +
                        ((ty - fy).astype(depth.dtype)) ** 2)
        better = ok & (best_d > dist)                  # strict: first wins
        use_to = fd < td                               # farther side wins
        ny = jnp.where(use_to, ty, fy)
        nx = jnp.where(use_to, tx, fx)
        best_d = jnp.where(better, dist, best_d)
        by = jnp.where(better, ny, by)
        bx = jnp.where(better, nx, bx)
        return (best_d, by, bx, bfound | better), None

    init = (jnp.full((H, W), BIG, depth.dtype), py, px,
            jnp.zeros((H, W), jnp.bool_))
    (_, fill_y, fill_x, found), _ = jax.lax.scan(direction_step, init, offs)

    hole = depth <= 0.0
    take = hole & found
    src_y = jnp.where(take, fill_y, py)
    src_x = jnp.where(take, fill_x, px)
    return img[src_y, src_x]
