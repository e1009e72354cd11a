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


def test_bokeh_pass_bitexact_to_gather(rng):
    """The shifted-add counting pass (exact-f32 cell enumeration,
    mirror-halved code planes, per-cell m-subsets) must be BIT-exact
    to the direct (S,H,W) gather transcription in its sample COUNTS
    — including at f32 rounding boundaries, which the weight field
    below hits by construction — and value-equal up to f32 summation
    order."""
    import math
    from cartoonsegmentation_tpu.ops.bokeh import (_SCALE,
                                                   _axis_segments,
                                                   _bokeh_pass_gather,
                                                   bokeh_pass)
    H, W = 40, 56
    im_size = min(H, W)
    dirs = [(0.0, 1.0),
            (math.cos(-math.pi / 6), math.sin(-math.pi / 6)),
            (math.cos(-math.pi * 5 / 6), math.sin(-math.pi * 5 / 6))]
    # weights: random in range + every f32 segment boundary (and its
    # predecessor) of the largest-m axis maps
    ws = [rng.rand(H * W).astype(np.float32) * _SCALE]
    for dx, dy in dirs:
        for coef in (dx * 16 * im_size, dy * 16 * im_size):
            for b, _k in _axis_segments(np.float32(coef), _SCALE):
                ws.append(np.float32(b))
                ws.append(np.nextafter(np.float32(b), np.float32(-1),
                                       dtype=np.float32))
    flat = np.concatenate([np.atleast_1d(w) for w in ws])[:H * W]
    flat = np.clip(np.resize(flat, H * W), 0, _SCALE)
    depth = flat.reshape(H, W).astype(np.float32)
    img = rng.rand(H, W, 3).astype(np.float32)
    from cartoonsegmentation_tpu.ops.bokeh import _pass_counts
    for dx, dy in dirs:
        # 1. the COUNTS are exact: every sample's device-f32 offset
        #    lands in an enumerated cell with the right multiplicity
        #    (a missed cell would silently drop samples)
        sp = (np.arange(32) - 16) * im_size
        dxsp = jnp.asarray((dx * sp).astype(np.float32))
        dysp = jnp.asarray((dy * sp).astype(np.float32))
        def cround(v):
            return np.asarray((jnp.sign(v) * jnp.floor(jnp.abs(v) + 0.5)
                               ).astype(jnp.int32))
        ox = cround(jnp.asarray(depth)[None] * dxsp[:, None, None])
        oy = cround(jnp.asarray(depth)[None] * dysp[:, None, None])
        counts = _pass_counts(jnp.asarray(depth), dx, dy, 32, _SCALE)
        total = np.zeros((H, W), np.int64)
        for (kx, ky), n in counts.items():
            want_n = ((ox == kx) & (oy == ky)).sum(0)
            np.testing.assert_array_equal(np.asarray(n), want_n,
                                          err_msg=f'{dx},{dy} {kx},{ky}')
            total += np.asarray(n)
        np.testing.assert_array_equal(total, 32)   # nothing dropped

        # 2. values match the gather transcription to f32 summation
        #    order (n*w vs repeated adds differ in the last ulp)
        want = np.asarray(_bokeh_pass_gather(jnp.asarray(img),
                                             jnp.asarray(depth), dx, dy))
        got = np.asarray(bokeh_pass(jnp.asarray(img),
                                    jnp.asarray(depth), dx, dy))
        np.testing.assert_allclose(got, want, rtol=2e-6, atol=2e-6,
                                   err_msg=f'{dx},{dy}')


def test_bokeh_pass_odd_num_samples(rng):
    """Odd S: the positive side has S//2 samples (one MORE than even
    S's S//2-1); the counting table must credit m = 1..S-S//2-1 on
    the positive side, or the top positive sample is silently dropped
    (the per-pixel count sum would read S-1)."""
    from cartoonsegmentation_tpu.ops.bokeh import (_SCALE, _pass_counts,
                                                   _bokeh_pass_gather)
    H, W = 24, 28
    im_size = min(H, W)
    img = rng.rand(H, W, 3).astype(np.float32)
    depth = (rng.rand(H, W).astype(np.float32) * _SCALE)
    for S in (9, 7):
        dx, dy = math.cos(-math.pi / 6), math.sin(-math.pi / 6)
        sp = (np.arange(S) - S // 2) * im_size
        ox = np.round(depth[None] * (dx * sp)[:, None, None]
                      .astype(np.float32) * 1.0)
        counts = _pass_counts(jnp.asarray(depth), dx, dy, S, _SCALE)
        total = sum(np.asarray(n) for n in counts.values())
        np.testing.assert_array_equal(total, S)   # nothing dropped
        want = np.asarray(_bokeh_pass_gather(
            jnp.asarray(img), jnp.asarray(depth), dx, dy, num_samples=S))
        got = np.asarray(bokeh_pass(jnp.asarray(img), jnp.asarray(depth),
                                    dx, dy, num_samples=S))
        np.testing.assert_allclose(got, want, rtol=2e-6, atol=2e-6)


def test_bokeh_core_rhom_mirror_sharing(rng):
    """_bokeh_core's rhomboid pass reuses the diagonal's count
    tensors (kx-mirrored); the result must equal composing the three
    directional gather passes directly."""
    import math
    from cartoonsegmentation_tpu.ops.bokeh import (_bokeh_core,
                                                   _bokeh_pass_gather,
                                                   bokeh_weight_field)
    H, W = 32, 48
    img = rng.rand(H, W, 3).astype(np.float32)
    depth = (rng.rand(H, W).astype(np.float32) * 200).astype(np.float32)
    weight = bokeh_weight_field(jnp.asarray(depth), 2.0, 100.0)
    hi = jnp.power(jnp.asarray(img), 13.0)
    PI = math.pi
    vert = _bokeh_pass_gather(hi, weight, 0.0, 1.0)
    diag = _bokeh_pass_gather(vert, weight, math.cos(-PI / 6),
                              math.sin(-PI / 6))
    rhom = _bokeh_pass_gather(diag, weight, math.cos(-PI * 5 / 6),
                              math.sin(-PI * 5 / 6))
    want = np.asarray(jnp.power((diag + rhom) / 2.0, 1.0 / 13.0))
    got = np.asarray(_bokeh_core(jnp.asarray(img), weight, 13.0, 32))
    # ulp-level per-pass summation-order noise lands on pow(x, 1/13),
    # whose derivative explodes for the tiniest highlight values — a
    # handful of near-black pixels may move visibly, the rest must
    # agree to f32 noise
    diff = np.abs(got - want)
    assert (diff <= 2e-6).mean() > 0.999, diff.max()
    assert diff.max() < 0.01, diff.max()
