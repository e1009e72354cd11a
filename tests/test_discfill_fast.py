"""Fast (shear-scan) disocclusion fill vs the exact ray-march
version. The digital lines differ by at most one pixel per step, so
fills agree exactly on axis-aligned gaps and near-exactly elsewhere."""
import numpy as np
import pytest
import jax.numpy as jnp

from cartoonsegmentation_tpu.ops.discfill import (fill_disocclusion,
                                                  fill_disocclusion_fast)


def _case(rng, H=40, W=48):
    img = rng.rand(H, W, 4).astype(np.float32)
    depth = (rng.rand(H, W).astype(np.float32) + 0.5)
    return img, depth


def test_fast_fill_axis_aligned_exact(rng):
    img, depth = _case(rng)
    depth[:, 20:26] = 0.0   # vertical stripe: horizontal rays dominate
    img[depth == 0] = 0.0
    got = np.asarray(fill_disocclusion_fast(jnp.asarray(img),
                                            jnp.asarray(depth)))
    want = np.asarray(fill_disocclusion(jnp.asarray(img),
                                        jnp.asarray(depth), max_steps=64))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_fast_fill_blob_close_to_exact(rng):
    """On a smooth image the fast fill's one-pixel endpoint shifts
    (Bresenham digital line vs accumulate-and-round) produce values
    within a few percent of the exact ray-march fill."""
    H, W = 40, 48
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    img = np.stack([yy / H, xx / W, (yy + xx) / (H + W),
                    np.ones((H, W))], -1).astype(np.float32)
    depth = (rng.rand(H, W).astype(np.float32) + 0.5)
    depth[12:30, 14:34] = 0.0
    depth[5:9, 40:46] = 0.0
    img[depth == 0] = 0.0
    got = np.asarray(fill_disocclusion_fast(jnp.asarray(img),
                                            jnp.asarray(depth)))
    want = np.asarray(fill_disocclusion(jnp.asarray(img),
                                        jnp.asarray(depth), max_steps=64))
    hole = depth == 0
    # every fillable hole is filled
    assert (got[hole] != 0).any(axis=-1).all()
    err = np.abs(got[hole] - want[hole]).mean()
    assert err < 0.05, err


def test_fast_fill_edge_holes_stay(rng):
    """Holes spanning a full edge column are unfillable in both
    versions (every direction exits the frame on one side)."""
    img, depth = _case(rng, 24, 24)
    depth[:, :3] = 0.0
    img[depth == 0] = 0.0
    got = np.asarray(fill_disocclusion_fast(jnp.asarray(img),
                                            jnp.asarray(depth)))
    want = np.asarray(fill_disocclusion(jnp.asarray(img),
                                        jnp.asarray(depth), max_steps=64))
    np.testing.assert_allclose(got, want, atol=1e-6)


@pytest.mark.slow
def test_fast2_matches_fast_exactly(rng):
    from cartoonsegmentation_tpu.ops.discfill2 import (
        fill_disocclusion_fast2)
    H, W = 37, 53  # odd sizes exercise the residue/stride machinery
    img = rng.rand(H, W, 4).astype(np.float32)
    depth = (rng.rand(H, W).astype(np.float32) + 0.5)
    depth[12:30, 14:34] = 0.0
    depth[:, :2] = 0.0
    img[depth == 0] = 0.0
    a = np.asarray(fill_disocclusion_fast(jnp.asarray(img),
                                          jnp.asarray(depth)))
    b = np.asarray(fill_disocclusion_fast2(jnp.asarray(img),
                                           jnp.asarray(depth)))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_fast3_matches_fast_exactly(rng):
    from cartoonsegmentation_tpu.ops.discfill3 import (
        fill_disocclusion_fast3)
    H, W = 37, 53
    img = rng.rand(H, W, 4).astype(np.float32)
    depth = (rng.rand(H, W).astype(np.float32) + 0.5)
    depth[12:30, 14:34] = 0.0
    depth[:, :2] = 0.0
    img[depth == 0] = 0.0
    a = np.asarray(fill_disocclusion_fast(jnp.asarray(img),
                                          jnp.asarray(depth)))
    b = np.asarray(fill_disocclusion_fast3(jnp.asarray(img),
                                           jnp.asarray(depth)))
    np.testing.assert_allclose(a, b, atol=1e-6)


@pytest.mark.slow
def test_fast_fills_match_bruteforce_walk_oracle(rng):
    from cartoonsegmentation_tpu.ops.discfill2 import \
        fill_disocclusion_fast2
    from cartoonsegmentation_tpu.ops.discfill3 import \
        fill_disocclusion_fast3
    """Strongest guard for the shear machinery: a per-pixel
    brute-force walk along each direction's digital line
    x(y) = x0 + off[y] - off[y0] (the fast fills' discretization)
    must agree bit-for-bit with all three implementations. Catches
    coverage bugs in the shear tables (a wrong base once left a
    triangular region reading a neighboring line's results)."""
    from cartoonsegmentation_tpu.ops.discfill import (_DIR_X, _DIR_Y,
                                                      _c_round)

    def oracle_fill(img, depth):
        H, W = depth.shape
        out = img.copy()
        valid = depth > 0
        for y0 in range(H):
            for x0 in range(W):
                if valid[y0, x0]:
                    continue
                best = (np.inf, None)
                for dx, dy in zip(_DIR_X.astype(float),
                                  _DIR_Y.astype(float)):
                    if abs(dy) >= abs(dx):
                        off = _c_round(np.arange(H) * dx / dy
                                       ).astype(int)

                        def walk(step):
                            y = y0
                            while True:
                                y += step
                                if y < 0 or y >= H:
                                    return None
                                x = x0 + off[y] - off[y0]
                                if x < 0 or x >= W:
                                    return None
                                if valid[y, x]:
                                    return (y, x)
                        s = 1 if dy > 0 else -1
                    else:
                        off = _c_round(np.arange(W) * dy / dx
                                       ).astype(int)

                        def walk(step):
                            x = x0
                            while True:
                                x += step
                                if x < 0 or x >= W:
                                    return None
                                y = y0 + off[x] - off[x0]
                                if y < 0 or y >= H:
                                    return None
                                if valid[y, x]:
                                    return (y, x)
                        s = 1 if dx > 0 else -1
                    f, t = walk(-s), walk(s)
                    if f is None or t is None:
                        continue
                    d2 = (f[0] - t[0]) ** 2 + (f[1] - t[1]) ** 2
                    if d2 < best[0]:
                        best = (d2, t if depth[f] < depth[t] else f)
                if best[1] is not None:
                    out[y0, x0] = img[best[1]]
        return out

    H, W = 26, 34
    img = rng.rand(H, W, 4).astype(np.float32)
    depth = (rng.rand(H, W).astype(np.float32) + 0.5)
    depth[8:19, 10:26] = 0.0
    depth[:, :2] = 0.0
    depth[rng.rand(H, W) < 0.1] = 0.0
    img[depth == 0] = 0.0
    want = oracle_fill(img, depth)
    for fn in (fill_disocclusion_fast, fill_disocclusion_fast2,
               fill_disocclusion_fast3):
        got = np.asarray(fn(jnp.asarray(img), jnp.asarray(depth)))
        np.testing.assert_allclose(got, want, atol=1e-6)
