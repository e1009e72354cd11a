"""Viz hook + io utils tests."""
import numpy as np
import pytest

cv2 = pytest.importorskip('cv2')

from cartoonsegmentation_tpu.parallel.hooks import (
    InstanceSegVisualizationHook)
from cartoonsegmentation_tpu.utils.io import (find_all_imgs, imglist2grid,
                                              img2b64, b64_2img)
from cartoonsegmentation_tpu.utils.env import set_multi_processing


def test_viz_hook_grid(tmp_path, rng):
    sample_dir = tmp_path / 'samples'
    sample_dir.mkdir()
    for i in range(3):
        cv2.imwrite(str(sample_dir / f's{i}.jpg'),
                    (rng.rand(40, 50, 3) * 255).astype(np.uint8))

    from cartoonsegmentation_tpu.instances import Instances

    class FakeDet:
        def infer(self, img, *a, **k):
            m = np.zeros(img.shape[:2], bool)
            m[5:20, 5:25] = True
            return Instances.from_numpy(
                m[None], np.array([[5, 5, 20, 15]], np.float32))

    logged = []
    hook = InstanceSegVisualizationHook(
        str(sample_dir), grid_size=64,
        log_fn=lambda tag, img, step: logged.append((tag, step)))
    grid = hook.before_val(FakeDet(), step=7)
    assert grid is not None and grid.ndim == 3
    assert logged == [('val_samples', 7)]
    assert (tmp_path / 'samples' / 'viz' / 'val_step7.jpg').exists()


def test_io_helpers(tmp_path, rng):
    img = (rng.rand(20, 30, 3) * 255).astype(np.uint8)
    rt = b64_2img(img2b64(img))
    np.testing.assert_array_equal(rt, img)

    grid = imglist2grid([img, img, img], grid_size=32)
    assert grid.shape == (64, 64, 3)

    cv2.imwrite(str(tmp_path / 'a.png'), img)
    (tmp_path / 'x.txt').write_text('no')
    assert find_all_imgs(str(tmp_path)) == ['a.png']

    set_multi_processing()  # idempotent, no raise


def test_enable_compilation_cache(tmp_path, monkeypatch):
    """Every pipeline entry point turns on the persistent XLA compile
    cache (a second process skips the multi-minute tunnel compiles);
    the helper is idempotent and honors $CARTOONSEG_JAX_CACHE."""
    import jax

    from cartoonsegmentation_tpu.utils import env as env_mod
    monkeypatch.setattr(env_mod, '_CACHE_ENABLED', False)
    monkeypatch.setenv('CARTOONSEG_JAX_CACHE', str(tmp_path / 'jc'))
    assert env_mod.enable_compilation_cache() is True
    assert (tmp_path / 'jc').is_dir()
    assert jax.config.jax_compilation_cache_dir == str(tmp_path / 'jc')
    # second call: cached short-circuit
    assert env_mod.enable_compilation_cache() is True
