"""Gather-free disocclusion fill (v2) — TEST-ORACLE ONLY.

The shipped fill is ops/discfill3.py (bit-identical, faster); this
module remains as the intermediate link of the bit-exactness oracle
chain (tests/test_discfill_fast.py compares discfill → discfill2 →
discfill3) and as the home of the shared shear helpers discfill3
imports. Do not wire it into pipelines.

Same policy as ops/discfill.py (16-direction shortest-gap fill,
farther-depth endpoint wins) but with **zero large gathers**:

- the per-direction image shear (slope p/q, q ∈ {1,2,3}) is computed
  with the stride-reshape trick: rows are grouped by residue class
  (constant column shift each — pure slices), then the per-block skew
  falls out of viewing the flattened buffer with row stride
  (q·Wc + p). Positions whose source falls outside the frame are
  masked analytically (elementwise iota compare), so the trick's
  wrap-reads never leak garbage.
- the nearest-valid/-oob search along each sheared column carries its
  payload (valid?, y, x, depth) through a "last event wins"
  `associative_scan`, so endpoint attributes need no
  `take_along_axis` afterwards.

The only remaining gather is the final H×W×C fill copy itself.

Direction geometry note: all 16 reference directions
(common.py:171-172) have dy > 0 when |dy| >= |dx| and dx > 0
otherwise, so the 'to' walk is always the increasing-parameter scan
after the (optional) transpose.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .discfill import _DIR_X, _DIR_Y, _c_round

BIG = 1000000.0


@functools.lru_cache(maxsize=64)
def _offsets_np(H: int, p: int, q: int):
    off = _c_round(np.arange(H, dtype=np.float64) * (p / q)).astype(int)
    return tuple(off.tolist()), int(off.min()), int(off.max())


def _row_shift(a: jnp.ndarray, p: int, q: int, const: int, Wout: int,
               fill: float) -> jnp.ndarray:
    """B[y, j] = a[y, j + const + round(y*p/q)], out-of-range → fill.

    Pure slices/reshapes/concats — no gathers. a: (H, W_in) float.

    The stride-reshape skew below is only garbage-free for p >= 0
    with a block width covering every in-range source column
    (j + z·p must stay inside the block for all in-range sources —
    the old fixed Wout+|p| margin leaked neighboring-line data into
    the unshear direction); negative slopes reduce to the positive
    case by mirroring the columns (off_{-p}[y] = -off_p[y] exactly,
    C-rounding is odd)."""
    H, W_in = a.shape
    if p < 0:
        out = _row_shift(a[:, ::-1], -p, q, W_in - Wout - const,
                         Wout, fill)
        return out[:, ::-1]
    off, _, _ = _offsets_np(H, p, q)

    Hq = -(-H // q) * q
    Z = Hq // q
    if Hq != H:
        a = jnp.pad(a, ((0, Hq - H), (0, 0)), constant_values=fill)

    # in-range sources satisfy j + z*p < W_in - const - min_r off[r];
    # the block must contain them all
    minr = min(off[r] for r in range(min(q, len(off)))) if len(off) \
        else 0
    Wc = max(Wout + p, W_in - const - minr, 1)

    # step 1: per-residue constant shifts (s_r = const + off[r])
    per_r = []
    for r in range(q):
        s = const + (off[r] if r < len(off) else 0)
        rows = a[r::q]                                   # (Z, W_in)
        left = max(-s, 0)
        right = max(s + Wc - W_in, 0)
        padded = jnp.pad(rows, ((0, 0), (left, right)),
                         constant_values=fill)
        per_r.append(padded[:, s + left:s + left + Wc])
    C = jnp.stack(per_r, axis=1)                         # (Z, q, Wc)

    # step 2: skew by p per z-block via the stride-reshape view:
    # D[z, r, j] = flat[z*(q*Wc + p) + r*Wc + j]
    flat = C.reshape(-1)
    stride = q * Wc + p
    need = Z * stride
    if need > flat.shape[0]:
        flat = jnp.pad(flat, (0, need - flat.shape[0]),
                       constant_values=fill)
    E = flat[:need].reshape(Z, stride)
    outs = [E[:, r * Wc:r * Wc + Wout] for r in range(q)]
    B = jnp.stack(outs, axis=1).reshape(Hq, Wout)[:H]

    # analytic source mask: src x = j + const + off[y]
    offj = jnp.asarray(np.asarray(off, np.int32))
    src = jnp.arange(Wout, dtype=jnp.int32)[None, :] + const \
        + offj[:H, None]
    return jnp.where((src >= 0) & (src < W_in), B, fill)


def _exclusive_last_event(event, payloads, reverse: bool):
    """'Latest event wins' scan along axis 0, made exclusive
    (strictly before / strictly after the current row)."""
    def combine(a, b):
        eb = b[0]
        return tuple(jnp.where(eb, bb, aa) for aa, bb in zip(a, b))

    res = jax.lax.associative_scan(combine, (event, *payloads),
                                   axis=0, reverse=reverse)
    out = []
    for arr in res:
        pad = jnp.zeros_like(arr[:1])
        if reverse:
            out.append(jnp.concatenate([arr[1:], pad], axis=0))
        else:
            out.append(jnp.concatenate([pad, arr[:-1]], axis=0))
    return out


def _direction_pass(depth, p: int, q: int):
    """One direction with |slope|=|p|/q <= 1 along rows; 'from' walks
    decreasing row, 'to' increasing. Returns per-pixel
    (found, dist, ey, ex) in this orientation's image space."""
    H, W = depth.shape
    off, omin, omax = _offsets_np(H, p, q)
    # base = omax so every image pixel has a sheared column
    # (see ops/discfill.py:_shear_tables coverage note)
    base = omax
    Wp = W + base - omin

    d_s = _row_shift(depth, p, q, -base, Wp, fill=-1.0)
    inframe = d_s >= 0.0          # fill=-1 marks out-of-frame
    valid = d_s > 0.0
    event = valid | ~inframe

    offj = jnp.asarray(np.asarray(off, np.int32))
    ys = jnp.broadcast_to(
        jnp.arange(H, dtype=jnp.int32)[:, None], (H, Wp))
    xs = jnp.broadcast_to(
        jnp.arange(Wp, dtype=jnp.int32)[None, :] - base
        + offj[:, None], (H, Wp))

    payload = (valid, ys, xs, d_s)
    e_f, v_f, y_f, x_f, d_f = _exclusive_last_event(
        event, payload, reverse=False)   # nearest event strictly above
    e_t, v_t, y_t, x_t, d_t = _exclusive_last_event(
        event, payload, reverse=True)    # nearest event strictly below

    found = (e_f & v_f) & (e_t & v_t)
    dist = jnp.sqrt(((x_t - x_f).astype(depth.dtype)) ** 2 +
                    ((y_t - y_f).astype(depth.dtype)) ** 2)
    use_to = d_f < d_t
    ey = jnp.where(use_to, y_t, y_f)
    ex = jnp.where(use_to, x_t, x_f)

    # unshear back to image space (p' = -p, const = +base)
    def un(arr, fill):
        return _row_shift(arr, -p, q, base, W, fill)

    return (un(found.astype(jnp.float32), 0.0) > 0.5,
            un(dist, BIG),
            un(ey.astype(jnp.float32), 0.0).astype(jnp.int32),
            un(ex.astype(jnp.float32), 0.0).astype(jnp.int32))


@jax.jit
def fill_disocclusion_fast2(img: jnp.ndarray, depth: jnp.ndarray
                            ) -> jnp.ndarray:
    """Gather-free 16-direction disocclusion fill. img (H, W, C),
    depth (H, W); holes where depth <= 0."""
    H, W = depth.shape
    best_d = jnp.full((H, W), BIG, depth.dtype)
    py, px = jnp.mgrid[0:H, 0:W]
    py = py.astype(jnp.int32)
    px = px.astype(jnp.int32)
    by, bx = py, px

    dT = depth.T
    for dx, dy in zip(_DIR_X.astype(int), _DIR_Y.astype(int)):
        dx, dy = int(dx), int(dy)
        if abs(dy) >= abs(dx):
            found, dist, fy, fx = _direction_pass(depth, dx, dy)
        else:
            found, dist, fx, fy = _direction_pass(dT, dy, dx)
            found, dist = found.T, dist.T
            fy, fx = fy.T, fx.T
        better = found & (best_d > dist)
        best_d = jnp.where(better, dist, best_d)
        by = jnp.where(better, fy, by)
        bx = jnp.where(better, fx, bx)

    hole = depth <= 0.0
    take = hole & (best_d < BIG)
    src_y = jnp.where(take, by, py)
    src_x = jnp.where(take, bx, px)
    return img[src_y, src_x]
