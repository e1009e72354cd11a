"""LeReS converter structure check against a synthesized res101.pth
manifest (torchvision resnext101_32x8d + LeReS decoder schema)."""
import numpy as np
import jax
import jax.numpy as jnp

from cartoonsegmentation_tpu.models.leres import LeReS, convert_leres


def _synth_sd():
    sd = {}

    def conv(name, o, i, k, bias=True):
        sd[f'{name}.weight'] = np.zeros((o, i, k, k), np.float32)
        if bias:
            sd[f'{name}.bias'] = np.zeros((o,), np.float32)

    def bn(name, c):
        for a in ('weight', 'bias', 'running_mean', 'running_var'):
            sd[f'{name}.{a}'] = np.zeros((c,), np.float32)
        sd[f'{name}.num_batches_tracked'] = np.zeros((), np.int64)

    e = 'encoder'
    conv(f'{e}.conv1', 64, 3, 7, bias=False)
    bn(f'{e}.bn1', 64)
    layers = ((64, 3), (128, 4), (256, 23), (512, 3))
    cin = 64
    for li, (planes, blocks) in enumerate(layers):
        width = planes * 4  # groups=32, base_width=8 → planes*4
        cout = planes * 4
        for b in range(blocks):
            t = f'{e}.layer{li + 1}.{b}'
            conv(f'{t}.conv1', width, cin if b == 0 else cout, 1,
                 bias=False)
            bn(f'{t}.bn1', width)
            conv(f'{t}.conv2', width, width // 32, 3, bias=False)
            bn(f'{t}.bn2', width)
            conv(f'{t}.conv3', cout, width, 1, bias=False)
            bn(f'{t}.bn3', cout)
            if b == 0:
                conv(f'{t}.downsample.0', cout,
                     cin if li else 64, 1, bias=False)
                bn(f'{t}.downsample.1', cout)
        cin = cout

    d = 'decoder'

    def ftb(prefix, cin, mid):
        conv(f'{prefix}.conv1', mid, cin, 3)
        conv(f'{prefix}.conv_branch.1', mid, mid, 3)
        bn(f'{prefix}.conv_branch.2', mid)
        conv(f'{prefix}.conv_branch.4', mid, mid, 3)

    ftb(f'{d}.conv', 2048, 512)
    conv(f'{d}.conv1', 256, 512, 3)
    for name, cin in (('ffm2', 1024), ('ffm1', 512), ('ffm0', 256)):
        ftb(f'{d}.{name}.ftb1', cin, 256)
        ftb(f'{d}.{name}.ftb2', 256, 256)
    conv(f'{d}.outconv.adapt_conv.0', 128, 256, 3)
    bn(f'{d}.outconv.adapt_conv.1', 128)
    conv(f'{d}.outconv.adapt_conv.3', 1, 128, 3)
    return {f'module.{k}': v for k, v in sd.items()}


def _paths(tree, prefix=()):
    out = set()
    for k, v in tree.items():
        if isinstance(v, dict):
            out |= _paths(v, prefix + (k,))
        else:
            out.add(prefix + (k,))
    return out


def test_leres_converter_structure():
    converted = convert_leres(_synth_sd())
    model = LeReS()
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3), jnp.float32)))
    want = _paths(variables['params'])
    got = _paths(converted['params'])
    assert not (want - got), f'missing {sorted(want - got)[:8]}'
    assert not (got - want), f'extra {sorted(got - want)[:8]}'
    want_s = _paths(variables['batch_stats'])
    got_s = _paths(converted['batch_stats'])
    assert want_s == got_s, (sorted(want_s - got_s)[:5],
                             sorted(got_s - want_s)[:5])


def test_leres_converter_full_numeric(rng):
    """COMPLETE LeReS (ResNeXt trunk + FTB/FFM/AO decoder) with a
    reduced (1,1,1,1) trunk: res101-schema torch twin → convert →
    flax forward allclose. Exercises every converter rule (grouped
    bottlenecks, downsample blocks, FTB/FFM/outconv naming)."""
    import torch
    import jax.numpy as jnp
    from torch_twins import TorchLeReS, randomize_
    from cartoonsegmentation_tpu.models.leres import (LeReS,
                                                      convert_leres)

    tm = randomize_(TorchLeReS(layers=(1, 1, 1, 1)), seed=13,
                    scale=0.1).eval()
    converted = convert_leres(tm.state_dict())
    model = LeReS(encoder_layers=(1, 1, 1, 1))

    x = rng.rand(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()
    got = model.apply(converted, jnp.asarray(x.transpose(0, 2, 3, 1)))
    # deep trunk of random BNs: a handful of near-zero outputs pick
    # up ~2e-3 accumulation-order noise
    np.testing.assert_allclose(np.asarray(got),
                               want.transpose(0, 2, 3, 1),
                               rtol=1e-3, atol=5e-3)
