"""LeReS net: structure + torch parity of the grouped bottleneck +
converter round-trip on a torchvision-schema block."""
import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn as tnn

from cartoonsegmentation_tpu.models.leres import (
    Bottleneck, LeReS, convert_leres, leres_postprocess,
)


def test_leres_forward_shape(rng):
    net = LeReS()
    x = jnp.asarray(rng.rand(1, 64, 96, 3).astype(np.float32))
    variables = net.init(jax.random.PRNGKey(0), x)
    out = net.apply(variables, x)
    assert out.shape == (1, 64, 96, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_leres_postprocess_matches_apply_leres_semantics():
    d = jnp.asarray(np.linspace(2.0, 7.0, 16).reshape(4, 4),
                    jnp.float32)
    out = np.asarray(leres_postprocess(d))
    # min depth → disparity 255, max depth → 0
    assert out.max() == 255.0 and out.min() == 0.0
    assert out[0, 0] == 255.0 and out[-1, -1] == 0.0
    # constant input → all 255 after inversion of zeros
    c = jnp.full((4, 4), 3.0)
    np.testing.assert_allclose(np.asarray(leres_postprocess(c)), 255.0)


def test_grouped_bottleneck_vs_torch(rng):
    """ResNeXt bottleneck (groups=32, width 8) converted from a
    torchvision-schema torch block must match numerically."""
    planes, groups, base_width = 64, 32, 8
    width = int(planes * base_width / 64) * groups  # 256
    tb = tnn.Module()
    tb.conv1 = tnn.Conv2d(256, width, 1, bias=False)
    tb.bn1 = tnn.BatchNorm2d(width)
    tb.conv2 = tnn.Conv2d(width, width, 3, padding=1, groups=groups,
                          bias=False)
    tb.bn2 = tnn.BatchNorm2d(width)
    tb.conv3 = tnn.Conv2d(width, planes * 4, 1, bias=False)
    tb.bn3 = tnn.BatchNorm2d(planes * 4)
    g = torch.Generator().manual_seed(0)
    sd = tb.state_dict()
    for k, v in sd.items():
        if k.endswith('num_batches_tracked'):
            continue
        sd[k] = torch.rand(v.shape, generator=g) * 0.2 + 0.05
    tb.load_state_dict(sd)
    tb.eval()

    full = {f'encoder.layer1.0.{k}': v for k, v in tb.state_dict().items()}
    conv = convert_leres(full)
    p = conv['params']['encoder']['layer1_0']
    s = conv['batch_stats']['encoder']['layer1_0']

    x = rng.rand(1, 256, 8, 10).astype(np.float32)
    with torch.no_grad():
        tx = torch.from_numpy(x)
        h = torch.relu(tb.bn1(tb.conv1(tx)))
        h = torch.relu(tb.bn2(tb.conv2(h)))
        h = tb.bn3(tb.conv3(h))
        want = torch.relu(h + tx).numpy()

    got = Bottleneck(planes, 1, downsample=False).apply(
        {'params': p, 'batch_stats': s},
        jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got),
                               want.transpose(0, 2, 3, 1),
                               rtol=1e-4, atol=1e-5)
