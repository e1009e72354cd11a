"""scripts/estimate_depth.py — the upstream depthestim.py chain.

The net forwards themselves are twin-tested elsewhere
(test_models_kenburns / test_convert_kenburns); these tests pin the
CLI's GLUE: the 4x-guide refinement call, the max/256 grid-scale
factor, the depth conversion, and the .npy/.png output convention
(Parity: anime_3dkenburns/depthestim.py:60-78)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cartoonsegmentation_tpu.config import KenBurnsConfig
from cartoonsegmentation_tpu.pipeline import KenBurnsPipeline

from scripts.estimate_depth import BASELINE, depthestim, save_outputs


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def test_depthestim_default_chain(monkeypatch, rng):
    """Stub the two net calls with known functions → every glue step
    (guide size, resize order, max/256 scale, depth formula) is
    checked exactly."""
    cfg = KenBurnsConfig(depth_est='default', detector='none')
    pipe = KenBurnsPipeline(cfg)
    H, W = 40, 64
    img = (rng.rand(H, W, 3) * 255).astype(np.uint8)

    c = 3.0
    grid = (10, 16)
    monkeypatch.setattr(
        pipe, '_est_default',
        lambda image: jnp.full(grid + (1,), c, jnp.float32))

    guides = []

    def fake_refine(guide, disp):
        guides.append(guide.shape)
        return jax.image.resize(disp, guide.shape[:2] + (1,),
                                method='linear', antialias=False)

    monkeypatch.setattr(pipe, '_refine_disparity', fake_refine)

    disp, depth = depthestim(pipe, img)
    # refinement guide is the image at 4x the disparity grid
    # (depthestim.py:68), which here coincides with the input size
    assert guides == [(40, 64, 3)]
    scale = max(H, W) / 256.0
    focal = max(H, W) / 2.0
    assert disp.shape == (H, W) and depth.shape == (H, W)
    np.testing.assert_allclose(disp, c * scale, rtol=1e-6)
    np.testing.assert_allclose(
        depth, (focal * BASELINE) / (c * scale + 1e-7), rtol=1e-6)


def test_depthestim_pipeline_estimators(monkeypatch, rng):
    """Non-default estimators take the PIPELINE depth conversion
    (normalize to baseline; _prepare_state semantics)."""
    cfg = KenBurnsConfig(depth_est='leres', detector='none')
    pipe = KenBurnsPipeline(cfg)
    H, W = 24, 32
    img = (rng.rand(H, W, 3) * 255).astype(np.uint8)
    d = jnp.asarray(rng.rand(H, W, 1).astype(np.float32)) + 0.1
    monkeypatch.setattr(pipe, '_estimate_disparity', lambda image: d)

    disp, depth = depthestim(pipe, img)
    dn = np.asarray(d)[..., 0]
    exp_disp = dn / (dn.max() + 1e-12) * BASELINE
    np.testing.assert_allclose(disp, exp_disp, rtol=1e-5)
    np.testing.assert_allclose(
        depth, (max(H, W) / 2.0 * BASELINE) / (exp_disp + 1e-5),
        rtol=1e-5)


def test_save_outputs_convention(tmp_path, rng):
    disp = rng.rand(8, 12).astype(np.float32) * BASELINE
    depth = rng.rand(8, 12).astype(np.float32) * 100
    out = str(tmp_path / 'd.npy')
    npy, png = save_outputs(disp, depth, out)
    assert npy == out and png == str(tmp_path / 'd.png')
    np.testing.assert_allclose(np.load(npy), depth)
    import cv2
    im = cv2.imread(png, cv2.IMREAD_GRAYSCALE)
    np.testing.assert_allclose(
        im, np.clip(disp / BASELINE * 255.0, 0, 255).astype(np.uint8))
