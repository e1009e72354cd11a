"""Fast (shear-scan) disocclusion fill vs the exact ray-march
version. The digital lines differ by at most one pixel per step, so
fills agree exactly on axis-aligned gaps and near-exactly elsewhere."""
import numpy as np
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
