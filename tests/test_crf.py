"""Dense CRF + CRF depth refinement tests."""
import numpy as np
import jax.numpy as jnp
import pytest

cv2 = pytest.importorskip('cv2')

from cartoonsegmentation_tpu.ops.crf import densecrf_binary
from cartoonsegmentation_tpu.pipeline.crf_refine import (enlarge_window,
                                                         refine_depth_crf)


def test_densecrf_snaps_to_edges(rng):
    """A sloppy mask over a two-tone image should snap to the color
    boundary."""
    H = W = 48
    rgb = np.zeros((H, W, 3), np.uint8)
    rgb[:, :24] = (200, 40, 40)
    rgb[:, 24:] = (40, 40, 200)
    # unary: roughly left half but with a ragged, offset edge
    unary = np.zeros((H, W), np.float32)
    unary[:, :20] = 0.9
    unary[:, 20:30] = 0.5 + 0.1 * rng.randn(H, 10)
    out = np.asarray(densecrf_binary(jnp.asarray(np.clip(unary, 0, 1)),
                                     jnp.asarray(rgb)))
    # left side solidly fg, right side solidly bg
    assert out[:, :16].mean() > 0.95
    assert out[:, 34:].mean() < 0.05


def test_enlarge_window_matches_reference_math():
    out = enlarge_window([10, 10, 20, 20], 100, 100, ratio=4)
    # area should grow ~4x, centered, clipped within bounds
    x1, y1, x2, y2 = out
    assert x1 < 10 and y1 < 10 and x2 > 20 and y2 > 20
    assert 0 <= x1 and x2 <= 100
    area_ratio = (x2 - x1) * (y2 - y1) / 100.0
    assert 3.0 < area_ratio < 5.0


def test_refine_depth_crf_runs_and_flattens(rng):
    H = W = 64
    img = np.zeros((H, W, 3), np.uint8)
    img[:, :32] = (180, 60, 60)
    img[:, 32:] = (60, 60, 180)
    disparity = np.broadcast_to(
        np.where(np.arange(W)[None, :] < 32, 30.0, 10.0),
        (H, W)).astype(np.float32).copy()
    disparity += rng.randn(H, W).astype(np.float32) * 0.5
    out = refine_depth_crf(img, disparity)
    assert out.shape == disparity.shape
    assert np.isfinite(out).all()
    # flattened segments → lower within-half variance (or unchanged)
    assert out[:, :28].std() <= disparity[:, :28].std() + 1e-3
