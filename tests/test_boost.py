"""BoostingMonoDepth orchestration tests: host-side patch machinery
against oracle semantics + the full LeReSBoost driver at reduced
geometry with stub nets (the real nets' conversion is covered by
test_leres.py / test_pix2pix4depth.py)."""
import numpy as np
import pytest

cv2 = pytest.importorskip('cv2')

import jax.numpy as jnp  # noqa: E402

from cartoonsegmentation_tpu.pipeline import boost  # noqa: E402


def test_generatemask():
    m = boost.generatemask((300, 400))
    assert m.shape == (300, 400)
    assert m.min() == 0.0 and m.max() == 1.0
    assert m[150, 200] > 0.99          # center fully on
    assert m[0, 0] < 0.01              # border off


def test_resizewithpool_matches_blockreduce(rng):
    img = rng.rand(37, 53).astype(np.float64)
    out = boost._resizewithpool(img, 9)
    n = int(np.floor(37 / 9))          # 4
    # oracle: max over n x n blocks (with -inf padding)
    ph, pw = (-37) % n, (-53) % n
    pad = np.pad(img, ((0, ph), (0, pw)), constant_values=-np.inf)
    H, W = pad.shape
    want = pad.reshape(H // n, n, W // n, n).max(axis=(1, 3))
    np.testing.assert_array_equal(out, want)


def _textured_image(h=300, w=400, seed=0):
    rng = np.random.RandomState(seed)
    img = np.full((h, w, 3), 128, np.uint8)
    # high-frequency texture in the top-left quadrant only
    img[:h // 2, :w // 2] = (rng.rand(h // 2, w // 2, 3) * 255
                             ).astype(np.uint8)
    return img


def test_calculateprocessingres():
    img = _textured_image()
    size, k = boost.calculateprocessingres(img, 64, 0.2, 3, 1600)
    assert isinstance(size, int) and size >= 64
    assert 0.0 <= k <= 1.0


def test_generatepatchs_selects_textured_region():
    img = _textured_image(400, 400)
    patches = boost.generatepatchs(img, 128, factor=1.0)
    assert patches, 'expected at least one gradient-dense patch'
    sizes = [p['size'] for p in patches]
    assert sizes == sorted(sizes, reverse=True)
    # every selected patch must overlap the textured quadrant
    for p in patches:
        x, y, w, h = p['rect']
        assert x < 200 and y < 200, p['rect']
        assert x >= 0 and y >= 0
        assert x + w <= 400 and y + h <= 400


class _FakeLeres:
    """Depth proxy: inverted brightness (finer at higher res)."""

    def apply(self, variables, rgb):
        return (1.0 - rgb.mean(-1, keepdims=True))


class _FakeP2P:
    """Merge stub: mean of the two normalized inputs → tanh range."""

    def apply(self, variables, x):
        return x.mean(-1, keepdims=True)


def test_leres_boost_driver(rng, monkeypatch):
    # smallest sizes the R_x search supports (its step is
    # basesize/64, so the receptive field must be >= 64)
    monkeypatch.setattr(boost, 'RECEPTIVE_FIELD', 64)
    monkeypatch.setattr(boost, 'PATCH_NETSIZE', 128)
    monkeypatch.setattr(boost, 'PIX2PIX_SIZE', 128)
    monkeypatch.setattr(boost, 'WHOLE_SIZE_THRESHOLD', 400)

    img = _textured_image(160, 200, seed=3)
    b = boost.LeReSBoost(_FakeLeres(), None, _FakeP2P(), None,
                         max_res=2048)
    out = b(img)
    assert out.shape == (160, 200)
    assert np.isfinite(out).all()

    # with max_res below the whole-image size, only the double
    # estimate runs (depthmap.py:426-428)
    b2 = boost.LeReSBoost(_FakeLeres(), None, _FakeP2P(), None,
                          max_res=1)
    out2 = b2(img)
    assert out2.shape == (160, 200)
    # patch refinement must actually change the result
    assert not np.allclose(out, out2)
