import math

import numpy as np
import jax.numpy as jnp

from cartoonsegmentation_tpu.ops import bokeh_pass, bokeh_blur
from oracles import oracle_bokeh_pass


def test_bokeh_pass_vs_oracle(rng):
    H, W = 20, 24
    img = rng.rand(H, W, 3).astype(np.float32)
    depth = rng.rand(H, W).astype(np.float32) * 0.0005

    for dx, dy in [(0.0, 1.0),
                   (math.cos(-math.pi / 6), math.sin(-math.pi / 6))]:
        got = np.asarray(bokeh_pass(jnp.asarray(img), jnp.asarray(depth),
                                    dx, dy, num_samples=8))
        want = oracle_bokeh_pass(img.astype(np.float64), depth, dx, dy,
                                 num_samples=8)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_bokeh_blur_shapes_and_range(rng):
    H, W = 16, 16
    img = rng.rand(H, W, 3).astype(np.float32)
    depth = rng.rand(H, W).astype(np.float32) * 100
    out = np.asarray(bokeh_blur(jnp.asarray(img), jnp.asarray(depth),
                                num_samples=8, lightness_factor=10,
                                depth_factor=2, focal_plane=50.0))
    assert out.shape == (H, W, 3)
    assert np.all(out >= 0) and np.all(out <= 1)
    assert np.isfinite(out).all()
