"""Numeric parity tests: ops layer vs slow numpy oracles that mirror
the reference CUDA kernel semantics."""
import numpy as np
import jax.numpy as jnp

import torch

from cartoonsegmentation_tpu.ops import (
    depth_to_points, render_pointcloud, render_coverage, spatial_filter,
    fill_disocclusion,
)
from oracles import oracle_render_pointcloud, oracle_fill_disocclusion


def _make_cloud(rng, H, W, focal=32.0, spread=0.3):
    depth = (1.0 + rng.rand(H, W).astype(np.float32)) * 50.0
    pts = np.array(depth_to_points(jnp.asarray(depth), focal))
    pts = pts.reshape(-1, 3)
    # jitter so projections land at generic sub-pixel positions
    pts[:, :2] += (rng.rand(*pts[:, :2].shape).astype(np.float32) - 0.5) \
        * spread * pts[:, 2:3] / focal
    data = rng.rand(pts.shape[0], 4).astype(np.float32)
    return pts, data, depth


def test_depth_to_points_matches_torch_linspace():
    H, W, focal = 5, 7, 10.0
    depth = np.arange(H * W, dtype=np.float32).reshape(H, W) + 1.0
    got = np.asarray(depth_to_points(jnp.asarray(depth), focal))
    tx = torch.linspace(-0.5 * W + 0.5, 0.5 * W - 0.5, W) / focal
    ty = torch.linspace(-0.5 * H + 0.5, 0.5 * H - 0.5, H) / focal
    td = torch.from_numpy(depth)
    want = torch.stack([td * tx[None, :], td * ty[:, None], td], -1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_render_pointcloud_vs_oracle(rng):
    H = W = 24
    focal, baseline = 16.0, 40.0
    pts, data, _ = _make_cloud(rng, H, W, focal)
    # drop some points (simulates fixed-capacity invalid slots: z <= 0)
    kill = rng.rand(pts.shape[0]) < 0.1
    pts[kill, 2] = 0.0

    render, weight = render_pointcloud(
        jnp.asarray(pts), jnp.asarray(data), H, W, focal, baseline)
    o_render, o_weight = oracle_render_pointcloud(
        pts.astype(np.float64), data.astype(np.float64), H, W, focal,
        baseline)

    np.testing.assert_allclose(np.asarray(weight)[..., 0], o_weight,
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(render), o_render,
                               rtol=2e-3, atol=2e-3)


def test_render_coverage_matches_full_render(rng):
    H = W = 20
    focal, baseline = 12.0, 40.0
    pts, data, _ = _make_cloud(rng, H, W, focal)
    # shift the cloud so part leaves the frame
    pts[:, 0] += 0.3 * pts[:, 2] / focal * 8

    _, weight = render_pointcloud(
        jnp.asarray(pts), jnp.asarray(data), H, W, focal, baseline)
    cov = render_coverage(jnp.asarray(pts), H, W, focal, baseline)
    assert int(cov) == int(np.sum(np.asarray(weight) > 0.0))


def test_fill_disocclusion_vs_oracle(rng):
    H = W = 32
    img = rng.rand(H, W, 4).astype(np.float32)
    depth = (rng.rand(H, W).astype(np.float32) + 0.5)
    # punch holes: a blob and a stripe
    depth[10:16, 12:20] = 0.0
    depth[24:26, :20] = 0.0
    img[depth == 0] = 0.0

    got = np.asarray(fill_disocclusion(
        jnp.asarray(img), jnp.asarray(depth), max_steps=64))
    want = oracle_fill_disocclusion(img.astype(np.float64), depth)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_spatial_filter_vs_torch(rng):
    x = rng.rand(1, 9, 11, 2).astype(np.float32)
    tx = torch.from_numpy(x.transpose(0, 3, 1, 2))

    # laplacian
    lap = np.asarray(spatial_filter(jnp.asarray(x), 'laplacian'))
    k = torch.zeros(2, 2, 3, 3)
    for c in range(2):
        k[c, c, 0, 1] = -1.0
        k[c, c, 0, 2] = -1.0
        k[c, c, 1, 1] = 4.0
        k[c, c, 1, 0] = -1.0
        k[c, c, 2, 0] = -1.0
    want = torch.nn.functional.conv2d(
        torch.nn.functional.pad(tx, [1, 1, 1, 1], mode='replicate'), k)
    np.testing.assert_allclose(
        lap, want.numpy().transpose(0, 2, 3, 1), rtol=1e-5, atol=1e-5)

    # medians
    for size in (3, 5):
        med = np.asarray(spatial_filter(jnp.asarray(x), f'median-{size}'))
        p = size // 2
        tpad = torch.nn.functional.pad(tx, [p] * 4, mode='reflect')
        unf = tpad.unfold(2, size, 1).unfold(3, size, 1)
        unf = unf.contiguous().view(*unf.shape[:4], size * size)
        want = unf.median(-1, False)[0]
        np.testing.assert_allclose(
            med, want.numpy().transpose(0, 2, 3, 1), rtol=1e-6, atol=1e-6)
