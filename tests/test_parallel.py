"""DP training-step tests on the virtual 8-device CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import optax

from cartoonsegmentation_tpu.models.rtmdet import AnimeDetector
from cartoonsegmentation_tpu.parallel import (
    create_train_state, make_mesh, make_train_step, shard_batch,
)


def _tiny_batch(rng, B, H, W, G=2):
    boxes = []
    masks = np.zeros((B, G, H, W), bool)
    for b in range(B):
        bs = []
        for g in range(G):
            x1, y1 = rng.randint(0, W // 2), rng.randint(0, H // 2)
            x2, y2 = x1 + rng.randint(8, W // 2), y1 + rng.randint(8, H // 2)
            bs.append([x1, y1, min(x2, W - 1), min(y2, H - 1)])
            masks[b, g, y1:y2, x1:x2] = True
        boxes.append(bs)
    return {
        'images': rng.rand(B, H, W, 3).astype(np.float32),
        'gt_boxes': np.asarray(boxes, np.float32),
        'gt_valid': np.ones((B, G), bool),
        'gt_masks': masks,
    }


def test_detector_overfits_fixed_batch(rng):
    """End-to-end optimization proof: 30 steps on one fixed tiny batch
    must cut the total detector loss by >2x and drive the positive
    locations' cls scores up — exercises DSLA assignment, QFL/GIoU/
    dice-mask losses and gradients together (not just one step)."""
    model = AnimeDetector(deepen=0.33, widen=0.125)
    tx = optax.adamw(3e-4)
    state = create_train_state(model, jax.random.PRNGKey(0), (64, 64), tx)
    batch = _tiny_batch(rng, B=2, H=64, W=64)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    step = make_train_step(model, tx)

    losses = []
    for _ in range(30):
        state, metrics = step(state, batch)
        losses.append(float(metrics['loss']))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < 0.5 * losses[0], (losses[0], losses[-1])


def test_dp_train_step_on_mesh(rng):
    mesh = make_mesh(8, data=8, model=1)
    model = AnimeDetector(deepen=0.33, widen=0.125)
    tx = optax.adamw(1e-3)
    state = create_train_state(model, jax.random.PRNGKey(0), (64, 64), tx)
    batch = _tiny_batch(rng, B=8, H=64, W=64)

    with mesh:
        sharded = shard_batch(mesh, batch)
        step = make_train_step(model, tx)
        state2, metrics = step(state, sharded)
        loss0 = float(metrics['loss'])
        state3, metrics2 = step(state2, sharded)
        loss1 = float(metrics2['loss'])

    assert np.isfinite(loss0) and np.isfinite(loss1)
    assert int(state3.step) == 2
    # params actually changed
    p0 = jax.tree_util.tree_leaves(state.params)[0]
    p1 = jax.tree_util.tree_leaves(state3.params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))


def test_frame_sharded_render_matches_single(rng):
    """Frame-parallel rendering over the 8-device mesh must produce
    byte-identical frames to the single-device scan (the point cloud
    is replicated; each chip scans its slice of the camera path).
    T=5 also exercises the pad-to-multiple-of-8 path."""
    from cartoonsegmentation_tpu.config import KenBurnsConfig
    from cartoonsegmentation_tpu.pipeline import KenBurnsPipeline

    cfg = KenBurnsConfig(max_size=64, num_frame=5, depth_field=True,
                         point_capacity_factor=1.5,
                         discfill_max_steps=16, auto_zoom=True)
    pipe = KenBurnsPipeline(cfg)
    img = (rng.rand(48, 64, 3) * 255).astype(np.uint8)
    state = pipe.generate_state(img)
    obj_from, obj_to = pipe.autozoom(state)
    steps = np.linspace(0.0, 1.0, cfg.num_frame)

    single = pipe.render_frames(state, obj_from, obj_to, steps)
    mesh = make_mesh(8, data=8, model=1)
    sharded = pipe.render_frames(state, obj_from, obj_to, steps,
                                 mesh=mesh)
    assert sharded.shape == single.shape == (5, 48, 64, 3)
    np.testing.assert_array_equal(sharded, single)


def test_ema_update_and_schedule():
    from cartoonsegmentation_tpu.parallel import (ema_decay_schedule,
                                                  ema_update)
    p0 = {'a': jnp.zeros((3,)), 'b': {'c': jnp.zeros(())}}
    p1 = {'a': jnp.ones((3,)), 'b': {'c': jnp.ones(())}}
    out = ema_update(p0, p1, jnp.float32(0.9))
    np.testing.assert_allclose(np.asarray(out['a']), 0.1, rtol=1e-6)
    np.testing.assert_allclose(float(out['b']['c']), 0.1, rtol=1e-6)
    # warmup: early steps track params fast, late steps approach base
    assert abs(float(ema_decay_schedule(0.9998, 0)) - 0.1) < 1e-6
    assert abs(float(ema_decay_schedule(0.9998, 100000)) - 0.9998) < 1e-6
