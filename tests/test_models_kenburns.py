"""Kenburns net tests: layer-level torch parity (weight conversion +
forward numerics) and full-net structural checks."""
import numpy as np
import jax
import jax.numpy as jnp
import torch

from cartoonsegmentation_tpu.models.layers import Basic, Downsample, Upsample
from cartoonsegmentation_tpu.models import convert
from cartoonsegmentation_tpu.models.kenburns import (
    Disparity, DisparityEstimator, Inpaint, Refine, Semantics,
)
from torch_twins import t_basic, t_down, t_up, randomize_


def _run_pair(tmod, fmod, fparams, x_nchw):
    with torch.no_grad():
        want = tmod.forward(torch.from_numpy(x_nchw)).numpy()
    x = jnp.asarray(x_nchw.transpose(0, 2, 3, 1))
    got = np.asarray(fmod.apply({'params': fparams}, x))
    np.testing.assert_allclose(got, want.transpose(0, 2, 3, 1),
                               rtol=2e-5, atol=2e-5)


def test_basic_block_conversion(rng):
    for kind in ('relu-conv-relu-conv', 'conv-relu-conv'):
        for ch in ((6, 8, 6), (6, 8, 4)):
            tm = randomize_(t_basic(kind, ch), seed=1)
            params = convert.basic_p(
                {f'root.{k}': v for k, v in tm.state_dict().items()},
                'root', kind)
            x = rng.rand(2, ch[0], 10, 12).astype(np.float32)
            _run_pair(tm, Basic(kind, ch), params, x)


def test_down_up_conversion(rng):
    ch = (6, 8, 8)
    tm = randomize_(t_down(ch), seed=2)
    params = convert.down_p(
        {f'root.{k}': v for k, v in tm.state_dict().items()}, 'root')
    x = rng.rand(1, 6, 11, 13).astype(np.float32)  # odd sizes
    _run_pair(tm, Downsample(ch), params, x)

    ch = (8, 6, 6)
    tm = randomize_(t_up(ch), seed=3)
    params = convert.up_p(
        {f'root.{k}': v for k, v in tm.state_dict().items()}, 'root')
    x = rng.rand(1, 8, 7, 9).astype(np.float32)
    _run_pair(tm, Upsample(ch), params, x)


def test_disparity_net_shapes(rng):
    net = DisparityEstimator()
    img = jnp.asarray(rng.rand(1, 96, 128, 3).astype(np.float32))
    params = net.init(jax.random.PRNGKey(0), img)
    out = net.apply(params, img)
    # reference wrapper always rescales to long side 512 (96x128 →
    # 384x512), and the net outputs at /2 of that
    assert out.shape == (1, 192, 256, 1)
    assert np.all(np.asarray(out) >= 0)


def test_refine_net_shapes(rng):
    net = Refine()
    img = jnp.asarray(rng.rand(1, 64, 96, 3).astype(np.float32))
    disp = jnp.asarray(rng.rand(1, 16, 24, 1).astype(np.float32))
    params = net.init(jax.random.PRNGKey(0), img, disp)
    out = net.apply(params, img, disp)
    assert out.shape == (1, 64, 96, 1)
    assert np.all(np.asarray(out) >= 0)


def test_inpaint_net_full_graph(rng):
    net = Inpaint()
    H, W = 32, 48
    img = jnp.asarray(rng.rand(H, W, 3).astype(np.float32))
    disp = jnp.asarray((rng.rand(H, W, 1) * 20 + 1).astype(np.float32))
    shift = jnp.asarray([2.0, 1.0, -5.0], jnp.float32)
    params = net.init(jax.random.PRNGKey(0), img, disp, shift, 24.0, 40.0)
    out = net.apply(params, img, disp, shift, 24.0, 40.0)
    assert out['image'].shape == (H, W, 3)
    assert out['disparity'].shape == (H, W, 1)
    assert out['existing'].shape == (H, W, 1)
    assert np.isfinite(np.asarray(out['image'])).all()
    img_np = np.asarray(out['image'])
    assert img_np.min() >= 0 and img_np.max() <= 1


def test_semantics_vgg_conversion(rng):
    """Convert a randomly initialized torchvision-schema VGG and check
    forward parity (exercises BN + ceil-mode pooling)."""
    tv = torch.nn.Sequential()
    # minimal 'features' schema replica: conv/bn indices as torchvision
    import torch.nn as tnn
    layers = []
    cfg = [64, 64, 'M', 128, 128, 'M', 256, 256, 256, 256, 'M',
           512, 512, 512, 512, 'M']
    cin = 3
    for v in cfg:
        if v == 'M':
            layers.append(tnn.MaxPool2d(2, 2, ceil_mode=True))
        else:
            layers += [tnn.Conv2d(cin, v, 3, padding=1),
                       tnn.BatchNorm2d(v), tnn.ReLU(inplace=True)]
            cin = v
    feats = tnn.Sequential(*layers)
    g = torch.Generator().manual_seed(0)
    sd = feats.state_dict()
    for k, v in sd.items():
        if k.endswith('num_batches_tracked'):
            continue
        if k.endswith('running_var'):
            sd[k] = torch.rand(v.shape, generator=g) + 0.5
        else:
            sd[k] = torch.randn(v.shape, generator=g) * 0.1
    feats.load_state_dict(sd)
    feats.eval()

    full_sd = {f'features.{k}': v for k, v in feats.state_dict().items()}
    params, stats = convert.convert_semantics(full_sd)

    x = rng.rand(1, 3, 50, 66).astype(np.float32)  # odd /16 → ceil pools
    # torch forward incl. the reference's preprocessing
    tx = torch.from_numpy(x).flip([1])
    tmean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    tstd = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    with torch.no_grad():
        want = feats((tx - tmean) / tstd).numpy()

    got = Semantics().apply(
        {'params': params, 'batch_stats': stats},
        jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got),
                               want.transpose(0, 2, 3, 1),
                               rtol=2e-4, atol=2e-4)
