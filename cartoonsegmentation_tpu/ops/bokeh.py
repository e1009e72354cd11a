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


# ---------------------------------------------------------------------------
# exact-f32 host-side enumeration of reachable offsets
# ---------------------------------------------------------------------------

def _cround_f32(coef, w):
    """Host twin of the device per-sample offset: sign*floor(|x|+0.5)
    with x = f32(coef) * f32(w), all arithmetic float32 — bit-exact
    to _c_round_int(depth * coef) on device."""
    import numpy as np
    x = np.float32(coef) * np.float32(w)
    return int(np.sign(x) * np.floor(np.abs(x) + np.float32(0.5)))


def _axis_segments(coef, max_w):
    """Exact f32 segmentation of w in [0, max_w]: sorted breakpoints
    b_1 < ... < b_n (each the SMALLEST f32 w whose offset differs
    from the previous segment's), so segment i = [b_i, b_{i+1}) has a
    constant offset k_i. Found by bisecting the f32 bit lattice — the
    offset is monotone in w for fixed coef."""
    import numpy as np
    if np.float32(coef) == 0.0:
        return [(np.float32(0.0), 0)]
    hi_k = _cround_f32(coef, max_w)
    segs = [(np.float32(0.0), _cround_f32(coef, 0.0))]
    while segs[-1][1] != hi_k:
        prev_b, prev_k = segs[-1]
        # smallest f32 w in (prev_b, max_w] whose offset != prev_k:
        # bisect directly on the (ordered, positive) f32 bit lattice
        lo_b = int(np.float32(prev_b).view(np.uint32))
        hi_b = int(np.float32(max_w).view(np.uint32))
        while hi_b - lo_b > 1:
            mid_b = (lo_b + hi_b) // 2
            mid = np.uint32(mid_b).view(np.float32)
            if _cround_f32(coef, mid) != prev_k:
                hi_b = mid_b
            else:
                lo_b = mid_b
        b = np.uint32(hi_b).view(np.float32)
        segs.append((b, _cround_f32(coef, b)))
    return segs


def _sample_pairs(dxm, dym, max_w):
    """Exact reachable (kx, ky) cells of ONE sample's offset map
    w -> (cround(dxm*w), cround(dym*w)) over [0, max_w], f32-exact."""
    import numpy as np
    sx = _axis_segments(dxm, max_w)
    sy = _axis_segments(dym, max_w)
    # merge the two breakpoint lists; each joint segment = one cell
    bps = sorted({float(b) for b, _ in sx} | {float(b) for b, _ in sy})
    cells = []
    for b in bps:
        kx = next(k for bb, k in reversed(sx) if float(bb) <= b)
        ky = next(k for bb, k in reversed(sy) if float(bb) <= b)
        if not cells or cells[-1] != (kx, ky):
            cells.append((kx, ky))
    return cells


def _shift2d(x: jnp.ndarray, ky: int, kx: int) -> jnp.ndarray:
    """y[p] = x[p + (ky, kx)], zero padded."""
    H, W = x.shape[:2]
    pad = [(max(-ky, 0), max(ky, 0)), (max(-kx, 0), max(kx, 0))] + \
        [(0, 0)] * (x.ndim - 2)
    xp = jnp.pad(x, pad)
    return xp[max(ky, 0):max(ky, 0) + H, max(kx, 0):max(kx, 0) + W]


@functools.lru_cache(maxsize=64)
def _pass_table(dx: float, dy: float, H: int, W: int,
                num_samples: int, max_weight: float):
    """Host tables for one pass direction: positive-side per-sample
    coefficients (m = 1..S/2) and the exact-f32 map
    cell -> (positive-side m list, negative-side m list).

    The device samples are sp = (s - S//2)*im_size for s = 0..S-1:
    negative side m = 1..S//2, positive side m = 1..S-S//2-1 (equal
    to S//2-1 for even S, S//2 for odd S), plus the center sp = 0
    (always offset (0,0)). f32(dx * -m*im_size) is the
    exact negation of f32(dx * m*im_size) (IEEE negation commutes
    with rounding), so one set of positive-side offset codes B_m
    serves both sides: positive samples land on cell B_m, negative
    samples on -B_m."""
    import numpy as np
    im_size = min(H, W)
    offset = num_samples // 2
    dxm = tuple(np.float32(np.float64(dx) * (m * im_size))
                for m in range(1, offset + 1))
    dym = tuple(np.float32(np.float64(dy) * (m * im_size))
                for m in range(1, offset + 1))
    table = {}
    for m in range(1, offset + 1):
        for cell in _sample_pairs(dxm[m - 1], dym[m - 1], max_weight):
            e = table.setdefault(cell, ([], []))
            if m <= num_samples - offset - 1:
                e[0].append(m)
            e[1].append(m)
    span = 1 + max((max(abs(kx), abs(ky)) for kx, ky in table), default=0)
    return dxm, dym, tuple((c, tuple(p), tuple(n))
                           for c, (p, n) in sorted(table.items())), span


def _pass_counts(depth, dx, dy, num_samples, max_weight):
    """Per-offset sample-count tensors for one direction:
    dict (kx, ky) -> (H, W) int32. Only S/2 per-sample code planes
    are computed (mirror symmetry covers the other side)."""
    H, W = depth.shape
    dxm, dym, table, span = _pass_table(dx, dy, H, W, num_samples,
                                        max_weight)
    ox = _c_round_int(depth[None] * jnp.asarray(dxm)[:, None, None])
    oy = _c_round_int(depth[None] * jnp.asarray(dym)[:, None, None])
    code = ((ox + span) * (2 * span + 1) + (oy + span)).astype(jnp.int32)

    counts = {}
    for cell, pos_m, neg_m in table:
        enc = (cell[0] + span) * (2 * span + 1) + (cell[1] + span)
        if pos_m:
            c = jnp.sum(code[jnp.asarray([m - 1 for m in pos_m])]
                        == enc, axis=0) if len(pos_m) > 1 \
                else (code[pos_m[0] - 1] == enc).astype(jnp.int32)
            counts[cell] = counts.get(cell, 0) + c
        mcell = (-cell[0], -cell[1])
        c = jnp.sum(code[jnp.asarray([m - 1 for m in neg_m])]
                    == enc, axis=0) if len(neg_m) > 1 \
            else (code[neg_m[0] - 1] == enc).astype(jnp.int32)
        counts[mcell] = counts.get(mcell, 0) + c
    counts[(0, 0)] = counts.get((0, 0), 0) + 1   # center sample
    return counts


def _apply_counts(img, depth, counts):
    """color/weight accumulation over the per-offset counts: one
    zero-padded dense shift + FMA per reachable offset."""
    H, W = depth.shape
    wsum = jnp.zeros((H, W), depth.dtype)
    color = jnp.zeros(img.shape[:2] + (img.shape[-1],), img.dtype)
    for (kx, ky), n in counts.items():
        wsh = _shift2d(depth, ky, kx)
        contrib = n.astype(depth.dtype) * wsh
        wsum = wsum + contrib
        color = color + contrib[..., None] * _shift2d(img, ky, kx)
    out = color / jnp.maximum(wsum, 1e-30)[..., None]
    return jnp.where((wsum != 0.0)[..., None], out, img)


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
    offset cell (dense compares over per-sample offset-code planes)
    and each cell contributes one zero-padded dense shift of
    img/weight. Three exactness-preserving reductions vs the naive
    counting: (1) offset cells are enumerated EXACTLY on the f32
    lattice (_axis_segments bisection) instead of over-approximated
    and dilated; (2) only S/2 code planes are computed — mirror
    symmetry of cround covers the negative samples; (3) each cell
    compares only the m-planes that can actually reach it.
    Bit-exact to _bokeh_pass_gather (tests/test_ops_bokeh.py).
    """
    # out-of-range weights would silently match no offset cell and
    # drop their samples, so clamp (in-range inputs are untouched —
    # bit-exact)
    depth = jnp.clip(depth, 0.0, max_weight)
    counts = _pass_counts(depth, dx, dy, num_samples, max_weight)
    return _apply_counts(img, depth, counts)


def _diag_mirrorable(H, W, num_samples, max_weight=_SCALE):
    """True when the rhomboid direction's per-sample f32 coefficients
    are the EXACT x-negation of the diagonal's (they are cos(-pi/6)
    vs cos(-5pi/6) — equal after f32 rounding in practice, but this
    is verified, not assumed). Then the rhomboid pass can reuse the
    diagonal's count tensors with kx mirrored — the most expensive
    part of a pass — at zero cost."""
    import numpy as np
    PI = math.pi
    d2 = _pass_table(math.cos(-PI / 6), math.sin(-PI / 6), H, W,
                     num_samples, max_weight)
    d3 = _pass_table(math.cos(-PI * 5 / 6), math.sin(-PI * 5 / 6), H, W,
                     num_samples, max_weight)
    return (np.array_equal(np.asarray(d3[0]), -np.asarray(d2[0]))
            and np.array_equal(np.asarray(d3[1]), np.asarray(d2[1])))


@functools.partial(jax.jit, static_argnames=('num_samples',))
def _bokeh_core(img01, weight, lightness_factor, num_samples):
    PI = math.pi
    H, W = weight.shape
    hi = jnp.power(jnp.maximum(img01, 0.0), lightness_factor)
    weight = jnp.clip(weight, 0.0, _SCALE)
    vert = bokeh_pass(hi, weight, 0.0, 1.0, num_samples)
    c_diag = _pass_counts(weight, math.cos(-PI / 6), math.sin(-PI / 6),
                          num_samples, _SCALE)
    diag = _apply_counts(vert, weight, c_diag)
    if _diag_mirrorable(H, W, num_samples):
        c_rhom = {(-kx, ky): n for (kx, ky), n in c_diag.items()}
    else:  # pragma: no cover - never hit for the shipped directions
        c_rhom = _pass_counts(weight, math.cos(-PI * 5 / 6),
                              math.sin(-PI * 5 / 6), num_samples, _SCALE)
    rhom = _apply_counts(diag, weight, c_rhom)
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
