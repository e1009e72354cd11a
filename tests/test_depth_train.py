"""Depth/refine training-step tests + checkpoint round-trip."""
import numpy as np
import jax
import jax.numpy as jnp
import optax

from cartoonsegmentation_tpu.models.isnet import ISNetDIS
from cartoonsegmentation_tpu.parallel.depth_train import (
    SimpleState, f1_mae, grad_l1_loss, make_refine_train_step,
    multi_side_bce, silog_loss, make_depth_train_step,
)
from cartoonsegmentation_tpu.utils.checkpoint import (load_params,
                                                      save_params)


def test_silog_zero_for_perfect_and_scale_families(rng):
    d = jnp.asarray(rng.rand(1, 8, 8, 1).astype(np.float32) + 0.5)
    m = jnp.ones_like(d)
    # perfect prediction: g = 0 exactly, so the loss is exactly 0
    assert float(silog_loss(d, d, m)) < 1e-6
    # pure global scaling = constant log-offset: Var[g] = 0 and only
    # the beta=0.15 * E[g]^2 term remains, so it stays small relative
    # to a random prediction
    scaled = float(silog_loss(d * 2.0, d, m))
    rand = float(silog_loss(jnp.asarray(
        rng.rand(1, 8, 8, 1).astype(np.float32) + 0.1), d, m))
    assert scaled < rand


def test_grad_and_bce_and_metrics(rng):
    p = jnp.asarray(rng.rand(1, 16, 16, 1).astype(np.float32))
    t = p + 0.5  # constant offset → zero gradient difference
    m = jnp.ones_like(p)
    assert float(grad_l1_loss(p, t, m)) < 1e-5

    sides = [jnp.full((1, 8, 8, 1), 10.0)] * 3
    tgt = jnp.ones((1, 8, 8))
    assert float(multi_side_bce(sides, tgt)) < 1e-3

    f1, mae = f1_mae(jnp.ones((4, 4)) * 0.9, jnp.ones((4, 4)))
    assert float(f1) > 0.99 and float(mae) < 0.11


def test_refine_train_step_learns(rng):
    net = ISNetDIS(in_ch=4)
    x = jnp.asarray(rng.rand(2, 32, 32, 4).astype(np.float32))
    tgt = jnp.asarray((rng.rand(2, 32, 32) > 0.5).astype(np.float32))
    variables = net.init(jax.random.PRNGKey(0), x)

    def apply_fn(params, inp):
        sides, _ = net.apply(
            {'params': params, 'batch_stats': variables['batch_stats']},
            inp)
        return sides

    tx = optax.adam(1e-3)
    state = SimpleState(variables['params'],
                        tx.init(variables['params']),
                        jnp.zeros((), jnp.int32))
    step = make_refine_train_step(apply_fn, tx)
    batch = {'input': x, 'target': tgt}
    state, m0 = step(state, batch)
    for _ in range(4):
        state, m1 = step(state, batch)
    assert float(m1['loss']) < float(m0['loss'])
    assert np.isfinite(float(m1['f1']))


def test_depth_train_step_and_checkpoint(rng, tmp_path):
    # trivially small depth "model": conv head over the image
    from flax import linen as nn

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = nn.Conv(8, (3, 3), padding=1)(x)
            h = nn.relu(h)
            return jax.nn.softplus(nn.Conv(1, (1, 1))(h)) + 0.01

    net = Tiny()
    x = jnp.asarray(rng.rand(2, 16, 16, 3).astype(np.float32))
    depth = jnp.asarray(rng.rand(2, 16, 16, 1).astype(np.float32) + 0.5)
    params = net.init(jax.random.PRNGKey(0), x)['params']
    tx = optax.adam(1e-2)
    state = SimpleState(params, tx.init(params), jnp.zeros((), jnp.int32))
    step = make_depth_train_step(lambda p, im: net.apply({'params': p},
                                                         im),
                                 tx, w_grad=0.1)
    batch = {'images': x, 'depth': depth,
             'mask': jnp.ones((2, 16, 16, 1))}
    state, m0 = step(state, batch)
    for _ in range(10):
        state, m1 = step(state, batch)
    assert float(m1['loss']) < float(m0['loss'])

    # checkpoint round trip
    p = str(tmp_path / 'params.msgpack')
    save_params(p, state.params)
    restored = load_params(p, params)
    a = jax.tree_util.tree_leaves(restored)[0]
    b = jax.tree_util.tree_leaves(state.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_grad_l1_nan_safe_on_masked_out_pixels():
    """ADVICE r3: a masked-out pixel where dy/(dx+1e-10) is 0/0 must
    not leak NaN into the loss or its gradient (0*nan = nan; grads
    leak through where)."""
    H = W = 4
    t = jnp.zeros((1, H, W, 1), jnp.float32)
    m = jnp.ones((1, H, W, 1), jnp.float32).at[0, 2, 2, 0].set(0.0) \
        .at[0, 1, 2, 0].set(0.0).at[0, 2, 1, 0].set(0.0)

    def loss(p):
        # make dx == -1e-10 and dy == 0 at the masked-out (2, 2):
        # denominator exactly 0 -> 0/0 without the sanitization
        p = p.at[0, 2, 1, 0].add(1e-10)
        p = p.at[0, 1, 2, 0].add(0.0)
        return grad_l1_loss(p, t, m)

    p0 = jnp.zeros((1, H, W, 1), jnp.float32)
    val = float(loss(p0))
    assert np.isfinite(val)
    g = jax.grad(loss)(p0)
    assert np.isfinite(np.asarray(g)).all()
