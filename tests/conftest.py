"""Test config: force an 8-device virtual CPU platform so
sharding/pjit tests run fast and without TPU hardware.

Note: the environment's sitecustomize registers the 'axon' TPU
platform and overrides JAX_PLATFORMS at interpreter start, so the env
var alone is not enough — we also reset jax.config before any backend
is initialized."""
import os

flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()
os.environ['JAX_PLATFORMS'] = 'cpu'

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        'markers', 'slow: long-running closure/integration tests')
    config.addinivalue_line(
        'markers', 'quick: fast tier (`pytest -m quick` < 5 min) — '
                   'oracle ops, config/instances, metrics fixtures, '
                   'serving routes, style loop')


# files whose tests (minus any marked slow) form the <5-min quick
# tier (VERDICT r4 item 7). Timed unloaded: ~3.5 min total.
QUICK_FILES = {
    'test_core.py', 'test_rle.py', 'test_metrics.py',
    'test_ops_pointcloud.py', 'test_ops_bokeh.py',
    'test_discfill_fast.py', 'test_camera_autozoom.py',
    'test_crf.py', 'test_coco_protocol.py',
    'test_style_and_fill.py', 'test_serving.py',
}


def pytest_collection_modifyitems(config, items):
    import os.path as osp
    for it in items:
        if osp.basename(str(it.fspath)) in QUICK_FILES \
                and 'slow' not in it.keywords:
            it.add_marker(pytest.mark.quick)


@pytest.fixture
def rng():
    return np.random.RandomState(0)


@pytest.fixture(scope='session')
def cpu_mesh():
    """8-device mesh (data=4, model=2) for parallelism tests."""
    from jax.sharding import Mesh
    devs = np.array(jax.devices()).reshape(4, 2)
    return Mesh(devs, ('data', 'model'))
