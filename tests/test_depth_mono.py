"""Mono-depth data pipeline + eval metrics + ZoeDepth trainer wiring."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
import optax
import pytest

from cartoonsegmentation_tpu.data.depth_mono import (
    MonoDepthSource, MonoDepthTrainLoader, augment_image,
    compute_depth_errors, compute_depth_metrics, eval_mask,
    evaluate_depth, rotate_pair)
from cartoonsegmentation_tpu.parallel import (
    SimpleState, make_zoe_train_step, zoe_optimizer)


# ---------------------------------------------------------------------------
# metrics
# ---------------------------------------------------------------------------

def test_compute_errors_known_values():
    gt = np.array([1.0, 2.0, 4.0])
    pred = np.array([1.0, 2.0, 4.0])
    m = compute_depth_errors(gt, pred)
    for k in ('abs_rel', 'rmse', 'rmse_log', 'sq_rel', 'log_10'):
        assert m[k] == 0.0
    assert m['a1'] == m['a2'] == m['a3'] == 1.0

    pred = gt * 1.3            # ratio 1.3: outside d1, inside d2/d3
    m = compute_depth_errors(gt, pred)
    assert m['a1'] == 0.0 and m['a2'] == 1.0 and m['a3'] == 1.0
    np.testing.assert_allclose(m['abs_rel'], 0.3, atol=1e-6)
    # constant log offset → scale-invariant error is exactly 0
    np.testing.assert_allclose(m['silog'], 0.0, atol=1e-5)


def test_compute_metrics_crop_and_clamp(rng):
    gt = rng.rand(480, 640).astype(np.float32) * 8 + 0.5
    pred = gt.copy()
    pred[:45] = 1000.0           # junk outside the eigen crop
    pred[:, :41] = np.nan
    m = compute_depth_metrics(gt, pred, eigen_crop=True, dataset='nyu')
    assert m['rmse'] < 1e-5 and m['a1'] == 1.0

    # garg crop covers different rows than eigen/nyu
    em_g = eval_mask(480, 640, garg_crop=True)
    em_e = eval_mask(480, 640, eigen_crop=True)
    assert em_g.sum() != em_e.sum()

    # resolution mismatch → align-corners upsample path (smooth gt)
    yy, xx = np.mgrid[0:480, 0:640].astype(np.float32)
    smooth = 1.0 + 6.0 * (yy / 479 + xx / 639) / 2
    m2 = compute_depth_metrics(smooth, smooth[::2, ::2],
                               eigen_crop=True)
    assert m2['abs_rel'] < 0.05


# ---------------------------------------------------------------------------
# source + loader over a synthesized on-disk dataset
# ---------------------------------------------------------------------------

@pytest.fixture
def nyu_dir(tmp_path, rng):
    import cv2
    img_dir = tmp_path / 'rgb'
    dep_dir = tmp_path / 'gt'
    img_dir.mkdir()
    dep_dir.mkdir()
    lines = []
    for i in range(6):
        img = (rng.rand(48, 64, 3) * 255).astype(np.uint8)
        dep = (rng.rand(48, 64) * 4000 + 500).astype(np.uint16)
        cv2.imwrite(str(img_dir / f'{i}.png'), img)
        cv2.imwrite(str(dep_dir / f'{i}.png'), dep)
        lines.append(f'{i}.png {i}.png 518.8')
    split = tmp_path / 'train.txt'
    split.write_text('\n'.join(lines) + '\n')
    return str(img_dir), str(dep_dir), str(split)


def test_source_and_loader(nyu_dir, rng):
    img_dir, dep_dir, split = nyu_dir
    src = MonoDepthSource(img_dir, dep_dir, split, dataset='nyu')
    assert len(src) == 6
    img, dep, focal = src.load(0)
    assert img.shape == (48, 64, 3) and img.max() <= 1.0
    assert dep.shape == (48, 64, 1)
    assert 0.5 <= dep.min() and dep.max() <= 4.5     # /1000 scaling
    assert focal == 518.8

    loader = MonoDepthTrainLoader(src, batch_size=2, input_hw=(32, 40),
                                  seed=7)
    batches = list(loader.epoch(0))
    assert len(batches) == 3
    b = batches[0]
    assert b['images'].shape == (2, 32, 40, 3)
    assert b['depth'].shape == (2, 32, 40, 1)
    assert b['mask'].dtype == bool and b['mask'].any()

    # deterministic given (seed, epoch); different across epochs
    again = next(iter(loader.epoch(0)))
    np.testing.assert_array_equal(b['images'], again['images'])
    other = next(iter(loader.epoch(1)))
    assert not np.array_equal(b['images'], other['images'])


def test_augment_and_rotate(rng):
    img = rng.rand(24, 30, 3).astype(np.float32)
    dep = (rng.rand(24, 30, 1) * 5).astype(np.float32)
    out = augment_image(img, np.random.RandomState(0))
    assert out.shape == img.shape and out.min() >= 0 and out.max() <= 1
    img_r, dep_r = rotate_pair(img, dep, 3.0)
    assert img_r.shape == img.shape and dep_r.shape == dep.shape
    # nearest depth keeps original value set (plus 0 border fill)
    vals = set(np.unique(dep_r)) - {0.0}
    assert vals <= set(np.unique(dep))


def test_evaluate_depth_split(nyu_dir):
    img_dir, dep_dir, split = nyu_dir
    src = MonoDepthSource(img_dir, dep_dir, split)
    res = evaluate_depth(lambda im: src.load(2)[1][..., 0], src,
                         indices=[2], eigen_crop=False)
    assert res['a1'] == 1.0 and res['rmse'] < 1e-5


# ---------------------------------------------------------------------------
# ZoeDepth trainer wiring (stub half-res model, real loss/optimizer)
# ---------------------------------------------------------------------------

class _HalfResStub(nn.Module):
    @nn.compact
    def __call__(self, x):
        h = nn.Conv(8, (3, 3), strides=(2, 2), name='core')(x)
        d = nn.Conv(1, (1, 1), name='head')(nn.relu(h))
        return {'metric_depth': jax.nn.softplus(d) + 1e-3}


def test_zoe_train_step_decreases(nyu_dir):
    img_dir, dep_dir, split = nyu_dir
    src = MonoDepthSource(img_dir, dep_dir, split)
    loader = MonoDepthTrainLoader(src, batch_size=2, input_hw=(32, 40),
                                  seed=0, do_random_rotate=False)
    batch = next(iter(loader.epoch(0)))

    model = _HalfResStub()
    variables = model.init(jax.random.PRNGKey(0), batch['images'])
    tx = zoe_optimizer(lr=2e-2, warmup_steps=1, total_steps=50)
    state = SimpleState(variables['params'],
                        tx.init(variables['params']),
                        jnp.zeros((), jnp.int32))
    step = make_zoe_train_step(model, tx)
    losses = []
    for _ in range(8):
        state, metrics = step(state, batch)
        losses.append(float(metrics['loss']))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]

    # core subtree gets the lr/10 transform: both subtrees updated
    assert not np.allclose(
        np.asarray(state.params['core']['kernel']),
        np.asarray(variables['params']['core']['kernel']))


@pytest.mark.slow
def test_zoe_train_to_eval_closure(tmp_path, rng):
    """Train→eval closure for the depth stack (the depth-side sibling
    of tests/test_train_map_closure.py): a brightness-coded synthetic
    set trained through the REAL trainer (make_zoe_train_step: SILog
    loss, align-corners half-res upsample, zoe_optimizer one-cycle
    with backbone lr/10) must score well through the REAL
    evaluate_depth protocol (validity mask, clamp, resolution-mismatch
    upsample). A scaling seam (mm-vs-m decode, resize order, mask
    polarity) would train fine and still score ~0 a1 here.
    Reference recipe: zoedepth/trainers/zoedepth_trainer.py +
    utils/misc.py compute_errors."""
    import cv2
    img_dir = tmp_path / 'rgb'
    dep_dir = tmp_path / 'gt'
    img_dir.mkdir()
    dep_dir.mkdir()
    lines = []
    for i in range(6):
        # smooth image (upsampled low-res noise) so the half-res
        # model can represent the pointwise brightness→depth map
        low = rng.rand(6, 8, 3).astype(np.float32)
        img = cv2.resize(low, (64, 48), interpolation=cv2.INTER_LINEAR)
        gray = img.mean(-1)
        depth_m = 0.8 + 3.0 * gray            # meters, in [0.8, 3.8]
        cv2.imwrite(str(img_dir / f'{i}.png'),
                    (img * 255).astype(np.uint8))
        cv2.imwrite(str(dep_dir / f'{i}.png'),
                    (depth_m * 1000).astype(np.uint16))   # nyu mm
        lines.append(f'{i}.png {i}.png 518.8')
    split = tmp_path / 'train.txt'
    split.write_text('\n'.join(lines) + '\n')

    src = MonoDepthSource(str(img_dir), str(dep_dir), str(split),
                          dataset='nyu')
    loader = MonoDepthTrainLoader(src, batch_size=3, input_hw=(48, 64),
                                  seed=0, do_random_rotate=False)
    model = _HalfResStub()
    params0 = model.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 48, 64, 3)))['params']
    total = 400
    tx = zoe_optimizer(lr=3e-2, warmup_steps=20, total_steps=total)
    state = SimpleState(params0, tx.init(params0),
                        jnp.zeros((), jnp.int32))
    step = make_zoe_train_step(model, tx)

    def predict(params):
        def fn(im):
            out = model.apply({'params': params},
                              jnp.asarray(im, jnp.float32)[None])
            return np.asarray(out['metric_depth'])[0, ..., 0]
        return fn

    before = evaluate_depth(predict(params0), src, eigen_crop=False)
    it = iter(loader.epoch(0))
    epoch = 0
    for _ in range(total):
        try:
            batch = next(it)
        except StopIteration:
            epoch += 1
            it = iter(loader.epoch(epoch))
            batch = next(it)
        state, metrics = step(state, batch)
    assert np.isfinite(float(metrics['loss']))
    after = evaluate_depth(predict(state.params), src,
                           eigen_crop=False)
    assert after['abs_rel'] < 0.10, (before, after)
    assert after['a1'] > 0.9, (before, after)
    assert after['abs_rel'] < before['abs_rel']
