"""Slow numpy oracles mirroring the reference CUDA kernel semantics
exactly (anime_3dkenburns/models/utils.py, common.py, utils/effects.py).
Used only by tests; intentionally scalar-loop literal."""
from __future__ import annotations

import math

import numpy as np

BIG = 1000000.0


def c_round(v):
    return math.copysign(math.floor(abs(v) + 0.5), v)


def oracle_render_pointcloud(points, data, H, W, focal, baseline,
                             degrid_inplace=False):
    """points (P,3), data (P,C) → (render (H,W,C), weight (H,W)).

    Mirrors the three CUDA passes. degrid pass is computed out-of-place
    (the deterministic semantics our op implements); set
    degrid_inplace=True for the racy sequential order."""
    P, C = data.shape[0], data.shape[1]
    zee = np.full((H, W), BIG, np.float32)
    f32 = np.float32

    proj = []
    for p in range(P):
        x, y, z = (f32(points[p, 0]), f32(points[p, 1]),
                   f32(points[p, 2]))
        if z < 0.001:
            proj.append(None)
            continue
        # float32 arithmetic throughout, matching the CUDA kernel
        u = x * f32(focal) / z + f32(0.5 * W) - f32(0.5)
        v = y * f32(focal) / z + f32(0.5 * H) - f32(0.5)
        err = f32(BIG) - (f32(focal) * f32(baseline)) / (z + f32(1e-7))
        x0, y0 = math.floor(u), math.floor(v)
        corners = [(x0, y0), (x0 + 1, y0), (x0, y0 + 1), (x0 + 1, y0 + 1)]
        fx, fy = f32(u - x0), f32(v - y0)
        one = f32(1.0)
        ws = [(one - fx) * (one - fy), fx * (one - fy),
              (one - fx) * fy, fx * fy]
        proj.append((corners, ws, err))
        # nearest-corner z-buffer: first corner with max weight
        best = int(np.argmax(ws))
        cx, cy = corners[best]
        if 0 <= cx < W and 0 <= cy < H:
            zee[int(cy), int(cx)] = min(zee[int(cy), int(cx)], err)

    # degrid
    src = zee if degrid_inplace else zee.copy()
    out_zee = zee  # written in place either way
    pairs = [(1, 0), (0, 1), (1, 1), (1, -1)]  # (dx, dy)
    for yy in range(H):
        for xx in range(W):
            cnt, s = 0, 0.0
            for dx, dy in pairs:
                x1, y1 = xx + dx, yy + dy
                x2, y2 = xx - dx, yy - dy
                if not (0 <= x1 < W and 0 <= y1 < H):
                    continue
                if not (0 <= x2 < W and 0 <= y2 < H):
                    continue
                if src[yy, xx] >= src[y1, x1] + 1.0 and \
                        src[yy, xx] >= src[y2, x2] + 1.0:
                    cnt += 2
                    s += src[y1, x1] + src[y2, x2]
            if cnt > 0:
                out_zee[yy, xx] = min(src[yy, xx], s / cnt)

    out = np.zeros((H, W, C + 1), np.float64)
    for p in range(P):
        if proj[p] is None:
            continue
        corners, ws, err = proj[p]
        for (cx, cy), w in zip(corners, ws):
            cx, cy = int(cx), int(cy)
            if 0 <= cx < W and 0 <= cy < H and err <= out_zee[cy, cx] + 1.0:
                out[cy, cx, :C] += data[p] * w
                out[cy, cx, C] += w
    render = out[..., :C] / (out[..., C:] + 1e-7)
    return render, out[..., C]


def oracle_fill_disocclusion(img, depth):
    """img (H,W,C), depth (H,W). Mirrors kernel_discfill_updateOutput."""
    H, W = depth.shape
    out = img.copy()
    dir_x = [-1, 0, 1, 1, -1, 1, 2, 2, -2, -1, 1, 2, 3, 3, 3, 3]
    dir_y = [1, 1, 1, 0, 2, 2, 1, -1, 3, 3, 3, 3, 2, 1, -1, -2]
    dirs = []
    for dx, dy in zip(dir_x, dir_y):
        n = math.sqrt(dx * dx + dy * dy)
        dirs.append((dx / n, dy / n))

    for y in range(H):
        for x in range(W):
            if depth[y, x] > 0.0:
                continue
            shortest = BIG
            fill = None
            for dx, dy in dirs:
                fx, fy = float(x), float(y)
                ifx = ify = 0
                while True:
                    fx -= dx
                    fy -= dy
                    ifx, ify = int(c_round(fx)), int(c_round(fy))
                    if not (0 <= ifx < W) or not (0 <= ify < H):
                        break
                    if depth[ify, ifx] > 0.0:
                        break
                if not (0 <= ifx < W) or not (0 <= ify < H):
                    continue
                from_x, from_y = ifx, ify

                tx, ty = float(x), float(y)
                itx = ity = 0
                while True:
                    tx += dx
                    ty += dy
                    itx, ity = int(c_round(tx)), int(c_round(ty))
                    if not (0 <= itx < W) or not (0 <= ity < H):
                        break
                    if depth[ity, itx] > 0.0:
                        break
                if not (0 <= itx < W) or not (0 <= ity < H):
                    continue
                to_x, to_y = itx, ity

                dist = math.sqrt((to_x - from_x) ** 2 + (to_y - from_y) ** 2)
                if shortest > dist:
                    fx_, fy_ = from_x, from_y
                    if depth[from_y, from_x] < depth[to_y, to_x]:
                        fx_, fy_ = to_x, to_y
                    fill = (fx_, fy_)
                    shortest = dist
            if fill is not None:
                out[y, x] = img[fill[1], fill[0]]
    return out


def oracle_bokeh_pass(img, depth, dx, dy, num_samples=32):
    """Mirrors kernel_bokeh (effects.py:16-75). img (H,W,3), depth (H,W)."""
    H, W = depth.shape
    im_size = min(H, W)
    offset = num_samples // 2
    out = img.copy()
    for y in range(H):
        for x in range(W):
            d = depth[y, x]
            _dx, _dy = dx * d, dy * d
            weight = 0.0
            color = np.zeros(img.shape[2], np.float64)
            for s in range(num_samples):
                sp = (s - offset) * im_size
                x_ = x + int(c_round(_dx * sp))
                y_ = y + int(c_round(_dy * sp))
                if x_ >= W or y_ >= H or x_ < 0 or y_ < 0:
                    continue
                w = depth[y_, x_]
                weight += w
                color += img[y_, x_] * w
            if weight != 0:
                out[y, x] = color / weight
    return out
