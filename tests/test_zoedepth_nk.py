"""ZoeDepth-NK: full-model converter numerics (torch twin with a real
torch.nn.TransformerEncoder router), forced-domain routing coverage,
and the NK train step (SILog + domain CE) over the mixed nyu/kitti
round-robin loader."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cartoonsegmentation_tpu.models.convert_zoedepth import \
    convert_zoedepth_nk
from cartoonsegmentation_tpu.models.zoedepth import ZoeDepthNK

GEO = dict(img_size=(64, 64), dim=64, depth=8, heads=4,
           hooks=(1, 3, 5, 7), features=32,
           out_channels=(32, 64, 96, 96), n_bins=16,
           bin_embedding_dim=32, btlnck=48)


def _flax_nk():
    return ZoeDepthNK(
        img_size=(64, 64),
        bin_conf=(('nyu', 16, 1e-3, 10.0), ('kitti', 16, 1e-3, 80.0)),
        bin_embedding_dim=32, core_features=32,
        core_out_channels=(32, 64, 96, 96), core_dim=64, core_depth=8,
        core_heads=4, core_hooks=(1, 3, 5, 7), btlnck_features=48)


def _twin(seed):
    import torch  # noqa: F401
    from torch_twins import TorchZoeDepthNK, randomize_
    return randomize_(TorchZoeDepthNK(**GEO), seed=seed,
                      scale=0.1).eval()


@pytest.mark.parametrize('seed,force', [(3, None), (5, 'nyu'),
                                        (5, 'kitti')])
def test_zoedepth_nk_converter_full_numeric(rng, seed, force):
    """COMPLETE NK graph: BEiT core + router (4-layer torch
    TransformerEncoder semantics) + both per-domain metric heads.
    ``force`` biases the router's final bias so BOTH domain branches
    of the jnp.where selection are exercised against the torch
    python-level argmax routing."""
    import torch

    tm = _twin(seed)
    if force is not None:
        with torch.no_grad():
            idx = 0 if force == 'nyu' else 1
            tm.mlp_classifier[2].bias[idx] += 100.0
    converted = convert_zoedepth_nk(tm.state_dict(), img_size=(64, 64))
    model = _flax_nk()

    x = rng.rand(2, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x))
    if force is not None:
        assert want['domain'] == force
    got = model.apply(converted, jnp.asarray(x.transpose(0, 2, 3, 1)))

    np.testing.assert_allclose(
        np.asarray(got['domain_logits']), want['domain_logits'].numpy(),
        rtol=1e-3, atol=1e-4, err_msg='domain_logits')
    np.testing.assert_allclose(
        np.asarray(got['rel_depth']), want['rel_depth'].numpy(),
        rtol=1e-3, atol=1e-4, err_msg='rel_depth')
    np.testing.assert_allclose(
        np.asarray(got['metric_depth'])[..., 0],
        want['metric_depth'].numpy()[:, 0],
        rtol=1e-3, atol=1e-4, err_msg='metric_depth')


def test_nk_domains_use_distinct_heads(rng):
    """Forcing the router to nyu vs kitti must change the output —
    proves per-domain parameters are actually selected, not shared."""
    import torch

    tm = _twin(7)
    x = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    model = _flax_nk()
    outs = {}
    for i, name in enumerate(('nyu', 'kitti')):
        with torch.no_grad():
            tm.mlp_classifier[2].bias[i] += 100.0
        v = convert_zoedepth_nk(tm.state_dict(), img_size=(64, 64))
        outs[name] = np.asarray(model.apply(v, x)['metric_depth'])
        with torch.no_grad():
            tm.mlp_classifier[2].bias[i] -= 100.0
    assert np.abs(outs['nyu'] - outs['kitti']).max() > 1e-4


def test_nk_train_step_mixed_loader(tmp_path, rng):
    """make_zoe_nk_train_step over MixedNYUKITTILoader batches: loss
    finite and decreasing, domain loss responds to the labels."""
    import optax

    from cartoonsegmentation_tpu.parallel.depth_train import (
        SimpleState, make_zoe_nk_train_step)

    model = _flax_nk()
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 64, 64, 3)))['params']
    tx = optax.adam(1e-3)
    step = make_zoe_nk_train_step(model, tx)
    state = SimpleState(params, tx.init(params), jnp.zeros((), jnp.int32))

    losses = []
    for it in range(3):
        batch = {
            'images': jnp.asarray(rng.rand(2, 64, 64, 3), jnp.float32),
            'depth': jnp.asarray(1.0 + rng.rand(2, 64, 64, 1) * 4,
                                 jnp.float32),
            'mask': jnp.ones((2, 64, 64, 1), bool),
            'domain': jnp.int32(it % 2),
        }
        state, metrics = step(state, batch)
        assert np.isfinite(float(metrics['loss']))
        assert float(metrics['l_domain']) >= 0.0
        losses.append(float(metrics['loss']))
    assert losses[-1] < losses[0]


def test_mixed_roundrobin_loader(tmp_path, rng):
    """MixedNYUKITTILoader alternates domains and restarts the shorter
    stream (data_mono.py repetitive_roundrobin semantics)."""
    import cv2

    from cartoonsegmentation_tpu.data.depth_mono import (
        MixedNYUKITTILoader, MonoDepthSource, MonoDepthTrainLoader)

    def make_split(name, n):
        d = tmp_path / name
        (d / 'img').mkdir(parents=True)
        lines = []
        for i in range(n):
            img = (rng.rand(40, 48, 3) * 255).astype(np.uint8)
            dep = (rng.rand(40, 48) * 3000 + 500).astype(np.uint16)
            cv2.imwrite(str(d / 'img' / f'{i}.png'), img)
            cv2.imwrite(str(d / 'img' / f'{i}_d.png'), dep)
            lines.append(f'img/{i}.png img/{i}_d.png 500.0')
        (d / 'split.txt').write_text('\n'.join(lines))
        return MonoDepthSource(str(d), str(d), str(d / 'split.txt'),
                               dataset=name)

    nyu = MonoDepthTrainLoader(make_split('nyu', 6), 2, (32, 32),
                               seed=0)
    kitti = MonoDepthTrainLoader(make_split('kitti', 2), 2, (32, 32),
                                 seed=1)
    mixed = MixedNYUKITTILoader(nyu, kitti)
    batches = list(mixed.epoch(0))
    domains = [int(b['domain']) for b in batches]
    assert domains == [0, 1, 0, 1, 0, 1]      # alternating, kitti loops
    for b in batches:
        assert b['images'].shape == (2, 32, 32, 3)
        assert b['depth'].shape == (2, 32, 32, 1)
