"""Autozoom + full bokeh chain oracle tests."""
import math

import numpy as np
import jax
import jax.numpy as jnp

from cartoonsegmentation_tpu.ops import (autozoom, bokeh_blur,
                                         depth_range, depth_to_points,
                                         render_coverage_fast)
from cartoonsegmentation_tpu.ops.camera import (DepthRange, compute_shift,
                                                shift_points)
from oracles import oracle_bokeh_pass


def test_autozoom_matches_reference_loop(rng):
    """Replicate the reference's nested candidate loop (common.py:
    86-141) in python around the same coverage primitive and check
    the device search picks the identical candidate."""
    H, W = 48, 64
    depth = (rng.rand(H, W).astype(np.float32) * 200 + 300)
    pts = np.array(depth_to_points(jnp.asarray(depth), 32.0)).reshape(-1, 3)
    dr_dev = depth_range(jnp.asarray(depth))
    dr = DepthRange(jnp.float32(float(dr_dev.min_val)),
                    jnp.float32(float(dr_dev.min_u)),
                    jnp.float32(float(dr_dev.min_v)))
    focal, baseline = 32.0, 40.0
    flt_shift, flt_zoom, crop_ratio = 10.0, 1.25, 0.97

    best_u, best_v, cw, ch = autozoom(
        jnp.asarray(pts), dr, W, H, focal, baseline,
        flt_shift=flt_shift, flt_zoom=flt_zoom, crop_ratio=crop_ratio)

    # reference-style loop (V outer, U inner, strict > update)
    crop_w_from = int(math.floor(crop_ratio * W))
    crop_h_from = int(math.floor(crop_ratio * H))
    center_u, center_v = W / 2.0, H / 2.0
    crop_w = crop_w_from / flt_zoom
    crop_h = crop_h_from / flt_zoom
    depth_from = float(dr.min_val)
    depth_to = depth_from * (crop_w / crop_w_from)
    lin = np.linspace(-flt_shift, flt_shift, 16)
    best, bu, bv = 0.0, None, None
    for sv in lin:
        for su in lin:
            if (center_u + su < crop_w / 2.0 or
                    center_u + su > W - crop_w / 2.0 or
                    center_v + sv < crop_h / 2.0 or
                    center_v + sv > H - crop_h / 2.0):
                continue
            shift = compute_shift(dr, su, sv, depth_from, depth_to,
                                  W, H, focal)
            moved = shift_points(jnp.asarray(pts), shift)
            cov = float(render_coverage_fast(moved, H, W, focal,
                                             baseline))
            if best < cov:
                best, bu, bv = cov, su, sv
    assert bu is not None
    assert abs(float(best_u) - bu) < 1e-4
    assert abs(float(best_v) - bv) < 1e-4
    assert cw == int(round(crop_w_from / flt_zoom))
    assert ch == int(round(crop_h_from / flt_zoom))


def test_autozoom_miniature_quality(rng):
    """The stride-2 miniature search (the pipeline default,
    config.autozoom_stride) must pick a candidate whose EXACT
    full-resolution coverage is essentially the optimum: the search
    objective is a coverage fraction, and the miniature is a true
    half-res render of the same scene, so only holes narrower than
    the stride can flip the pick between near-tied candidates."""
    H, W = 64, 96
    # structured scene: far background plane + two near blobs whose
    # disocclusion holes grow with shift away from them
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    depth = np.full((H, W), 500.0, np.float32)
    for (cy, cx, r, d) in ((20.0, 30.0, 12.0, 300.0),
                           (44.0, 70.0, 9.0, 340.0)):
        blob = ((yy - cy) ** 2 + (xx - cx) ** 2) < r * r
        depth = np.where(blob, np.float32(d), depth)
    depth += (rng.rand(H, W).astype(np.float32) - 0.5) * 2.0
    focal, baseline, flt_shift = 48.0, 40.0, 12.0

    pts = jnp.asarray(
        np.array(depth_to_points(jnp.asarray(depth), focal))
        .reshape(-1, 3))
    dr = depth_range(jnp.asarray(depth))

    picks = {}
    for stride in (1, 2):
        bu, bv, cw, ch = autozoom(pts, dr, W, H, focal, baseline,
                                  flt_shift=flt_shift, stride=stride)
        picks[stride] = (float(bu), float(bv))

    # exact full-res coverage of each pick
    crop_w_from = int(math.floor(0.97 * W))
    crop_w = crop_w_from / 1.25
    depth_from = float(dr.min_val)
    depth_to = depth_from * (crop_w / crop_w_from)

    def exact_cov(su, sv):
        shift = compute_shift(dr, su, sv, depth_from, depth_to,
                              W, H, focal)
        moved = shift_points(pts, shift)
        return float(render_coverage_fast(moved, H, W, focal,
                                          baseline))

    cov1 = exact_cov(*picks[1])
    cov2 = exact_cov(*picks[2])
    assert cov2 >= 0.995 * cov1, (picks, cov1, cov2)


def test_autozoom_stride_requires_grid_cloud(rng):
    import pytest
    pts = jnp.asarray(rng.rand(100, 3).astype(np.float32))
    dr = DepthRange(jnp.float32(300.0), jnp.float32(5.0),
                    jnp.float32(5.0))
    with pytest.raises(ValueError, match='grid-ordered'):
        autozoom(pts, dr, 64, 48, 32.0, 40.0, stride=2)


def test_bokeh_blur_full_chain_vs_oracle(rng):
    """Full bokeh_blur (highlight pow → 3 passes → average of the two
    diagonal passes → inverse pow) vs a numpy replication of
    effects.py:143-181."""
    H, W = 16, 20
    img01 = rng.rand(H, W, 3).astype(np.float32)
    depth = rng.rand(H, W).astype(np.float32) * 50
    ns, lf, dfac, fp = 8, 13.0, 2.0, 25.0

    got = np.asarray(bokeh_blur(jnp.asarray(img01), jnp.asarray(depth),
                                num_samples=ns, lightness_factor=lf,
                                depth_factor=dfac, focal_plane=fp))

    d = depth.astype(np.float64)
    d = d.max() - np.abs(d - fp)
    d = np.power(d, dfac)
    d = d - d.min()
    d = d / d.max()
    d = (1 - d) * 0.0005
    hi = np.power(img01.astype(np.float64), lf)
    PI = math.pi
    v = oracle_bokeh_pass(hi, d, 0, 1, ns)
    dg = oracle_bokeh_pass(v, d, math.cos(-PI / 6), math.sin(-PI / 6), ns)
    rh = oracle_bokeh_pass(dg, d, math.cos(-PI * 5 / 6),
                           math.sin(-PI * 5 / 6), ns)
    want = np.power((dg + rh) / 2, 1 / lf)
    np.testing.assert_allclose(got, np.clip(want, 0, 1),
                               rtol=5e-3, atol=5e-3)
