"""Kenburns-net converter structure checks (disparity / refine /
inpaint) against synthesized checkpoint manifests."""
import numpy as np
import jax
import jax.numpy as jnp

from cartoonsegmentation_tpu.models import convert as C
from cartoonsegmentation_tpu.models.kenburns import (Disparity, Inpaint,
                                                     Refine)


def _conv(sd, name, o, i, k=3):
    sd[f'{name}.weight'] = np.zeros((o, i, k, k), np.float32)
    sd[f'{name}.bias'] = np.zeros((o,), np.float32)


def _prelu(sd, name, c):
    sd[f'{name}.weight'] = np.zeros((c,), np.float32)


def _basic(sd, prefix, kind, ch):
    cin, cmid, cout = ch
    if kind == 'relu-conv-relu-conv':
        _prelu(sd, f'{prefix}.netMain.0', cin)
        _conv(sd, f'{prefix}.netMain.1', cmid, cin)
        _prelu(sd, f'{prefix}.netMain.2', cmid)
        _conv(sd, f'{prefix}.netMain.3', cout, cmid)
    else:
        _conv(sd, f'{prefix}.netMain.0', cmid, cin)
        _prelu(sd, f'{prefix}.netMain.1', cmid)
        _conv(sd, f'{prefix}.netMain.2', cout, cmid)
    if cin != cout:
        _conv(sd, f'{prefix}.netShortcut', cout, cin, 1)


def _down(sd, prefix, ch):
    cin, cmid, cout = ch
    _prelu(sd, f'{prefix}.netMain.0', cin)
    _conv(sd, f'{prefix}.netMain.1', cmid, cin)
    _prelu(sd, f'{prefix}.netMain.2', cmid)
    _conv(sd, f'{prefix}.netMain.3', cout, cmid)


def _up(sd, prefix, ch):
    cin, cmid, cout = ch
    _prelu(sd, f'{prefix}.netMain.1', cin)
    _conv(sd, f'{prefix}.netMain.2', cmid, cin)
    _prelu(sd, f'{prefix}.netMain.3', cmid)
    _conv(sd, f'{prefix}.netMain.4', cout, cmid)


def _grid(sd, feats):
    n = len(feats)
    for r in range(n):
        for c in range(3):
            _basic(sd, f'{r}x{c} - {r}x{c + 1}', 'relu-conv-relu-conv',
                   (feats[r],) * 3)
    for c in (0, 1):
        for r in range(n - 1):
            _down(sd, f'{r}x{c} - {r + 1}x{c}',
                  (feats[r], feats[r + 1], feats[r + 1]))
    for c in (2, 3):
        for r in range(n - 1):
            _up(sd, f'{r + 1}x{c} - {r}x{c}',
                (feats[r + 1], feats[r], feats[r]))


def _paths(tree, prefix=()):
    out = set()
    for k, v in tree.items():
        if isinstance(v, dict):
            out |= _paths(v, prefix + (k,))
        else:
            out.add(prefix + (k,))
    return out


def _check(converted_params, model, *init_args):
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), *init_args))
    want = _paths(variables['params'])
    got = _paths(converted_params)
    assert not (want - got), f'missing {sorted(want - got)[:8]}'
    assert not (got - want), f'extra {sorted(got - want)[:8]}'


def test_disparity_converter_structure():
    sd = {}
    _conv(sd, 'netImage', 32, 3, 7)
    _conv(sd, 'netSemantics', 512, 512)
    _grid(sd, (32, 48, 64, 512, 512, 512))
    _basic(sd, 'netDisparity', 'conv-relu-conv', (32, 32, 1))
    _check(C.convert_disparity(sd), Disparity(),
           jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 4, 4, 512)))


def test_refine_converter_structure():
    sd = {}
    _basic(sd, 'netImageOne', 'conv-relu-conv', (3, 24, 24))
    _down(sd, 'netImageTwo', (24, 48, 48))
    _down(sd, 'netImageThr', (48, 96, 96))
    _basic(sd, 'netDisparityOne', 'conv-relu-conv', (1, 96, 96))
    _up(sd, 'netDisparityTwo', (192, 96, 96))
    _up(sd, 'netDisparityThr', (144, 48, 48))
    _basic(sd, 'netDisparityFou', 'conv-relu-conv', (72, 24, 24))
    _basic(sd, 'netRefine', 'conv-relu-conv', (24, 24, 1))
    _check(C.convert_refine(sd), Refine(),
           jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 16, 16, 1)))


def test_inpaint_converter_structure():
    sd = {}
    _conv(sd, 'netContext.0', 64, 4)
    _prelu(sd, 'netContext.1', 64)
    _conv(sd, 'netContext.2', 64, 64)
    _prelu(sd, 'netContext.3', 64)
    _basic(sd, 'netInput', 'conv-relu-conv', (69, 32, 32))
    _grid(sd, (32, 64, 128, 256))
    _basic(sd, 'netImage', 'conv-relu-conv', (32, 32, 3))
    _basic(sd, 'netDisparity', 'conv-relu-conv', (32, 32, 1))
    _check(C.convert_inpaint(sd), Inpaint(),
           jnp.zeros((32, 32, 3)), jnp.ones((32, 32, 1)),
           jnp.zeros((3,)), 16.0, 40.0)


def test_disparity_converter_full_numeric(rng):
    """Full-forward numeric validation of convert_disparity +
    convert_semantics via the checkpoint-schema torch twins
    (torch_twins.TorchDisparity / TorchSemanticsVGG)."""
    import torch
    from torch_twins import TorchDisparity, TorchSemanticsVGG, randomize_
    from cartoonsegmentation_tpu.models.kenburns import Semantics

    tsem = randomize_(TorchSemanticsVGG(), seed=2).eval()
    tdisp = randomize_(TorchDisparity(), seed=3).eval()

    x = rng.rand(1, 3, 64, 96).astype(np.float32)
    with torch.no_grad():
        tfeat = tsem(torch.from_numpy(x))
        tout = tdisp(torch.from_numpy(x), tfeat)

    sem_params, sem_stats = C.convert_semantics(tsem.state_dict())
    jfeat = Semantics().apply(
        {'params': sem_params, 'batch_stats': sem_stats},
        jnp.asarray(x.transpose(0, 2, 3, 1)))
    # deep conv/BN chain in f32: accumulation-order noise up to ~1e-3
    np.testing.assert_allclose(np.asarray(jfeat),
                               tfeat.numpy().transpose(0, 2, 3, 1),
                               rtol=2e-3, atol=2e-3)

    jout = Disparity().apply(
        {'params': C.convert_disparity(tdisp.state_dict())},
        jnp.asarray(x.transpose(0, 2, 3, 1)), jfeat)
    np.testing.assert_allclose(np.asarray(jout),
                               tout.numpy().transpose(0, 2, 3, 1),
                               rtol=2e-3, atol=2e-3)


def test_refine_converter_full_numeric(rng):
    import torch
    from torch_twins import TorchRefine, randomize_

    tm = randomize_(TorchRefine(), seed=4).eval()
    img = rng.rand(1, 3, 48, 64).astype(np.float32)
    disp = rng.rand(1, 1, 12, 16).astype(np.float32)
    with torch.no_grad():
        tout = tm(torch.from_numpy(img), torch.from_numpy(disp))

    jout = Refine().apply(
        {'params': C.convert_refine(tm.state_dict())},
        jnp.asarray(img.transpose(0, 2, 3, 1)),
        jnp.asarray(disp.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(jout),
                               tout.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-4, atol=1e-4)


def test_inpaint_converter_full_numeric(rng):
    """Validates every tensor convert_inpaint produces: the context
    convs and the post-render grid U-net are driven with identical
    inputs in torch and flax (the splat render itself is covered by
    tests/test_ops_pointcloud.py oracles)."""
    import torch
    from torch_twins import TorchInpaintUNet, randomize_

    # small weight scale: the residual grid doubles activations per
    # row, and f32 noise at exploded magnitudes breaks comparison
    tm = randomize_(TorchInpaintUNet(), seed=5, scale=0.05).eval()
    params = C.convert_inpaint(tm.state_dict())
    model = Inpaint()

    imgN = rng.randn(1, 3, 32, 32).astype(np.float32)
    dispN = rng.randn(1, 1, 32, 32).astype(np.float32)
    render = rng.randn(1, 68, 32, 32).astype(np.float32)
    existing = (rng.rand(1, 1, 32, 32) > 0.3).astype(np.float32)

    with torch.no_grad():
        tctx = tm.context(torch.from_numpy(imgN), torch.from_numpy(dispN))
        timg, tdisp = tm(torch.from_numpy(render),
                         torch.from_numpy(existing))

    jctx = model.apply({'params': params},
                       jnp.asarray(imgN.transpose(0, 2, 3, 1)),
                       jnp.asarray(dispN.transpose(0, 2, 3, 1)),
                       method=Inpaint.context)
    np.testing.assert_allclose(np.asarray(jctx),
                               tctx.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-4, atol=1e-4)

    jimg, jdisp = model.apply({'params': params},
                              jnp.asarray(render.transpose(0, 2, 3, 1)),
                              jnp.asarray(existing.transpose(0, 2, 3, 1)),
                              method=Inpaint.unet)
    np.testing.assert_allclose(np.asarray(jimg),
                               timg.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(jdisp),
                               tdisp.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-4, atol=1e-4)


def test_isnet_converter_structure():
    """Inverse-generate the torch manifest from the flax tree (ISNet
    names map 1:1) and round-trip through convert_isnet."""
    from cartoonsegmentation_tpu.models.isnet import (ISNetDIS,
                                                      convert_isnet)
    model = ISNetDIS(in_ch=4)
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 4), jnp.float32)))
    sd = {}
    p = variables['params']
    for name in p:
        if name == 'conv_in' or name.startswith('side'):
            sd[f'{name}.weight'] = np.zeros((1, 1, 3, 3), np.float32)
            sd[f'{name}.bias'] = np.zeros((1,), np.float32)
        else:  # stage blocks of REBNConvs
            for block in p[name]:
                sd[f'{name}.{block}.conv_s1.weight'] = \
                    np.zeros((1, 1, 3, 3), np.float32)
                sd[f'{name}.{block}.conv_s1.bias'] = \
                    np.zeros((1,), np.float32)
                for a in ('weight', 'bias', 'running_mean',
                          'running_var'):
                    sd[f'{name}.{block}.bn_s1.{a}'] = \
                        np.zeros((1,), np.float32)
    converted = convert_isnet(sd)
    assert _paths(converted['params']) == _paths(p)
    assert _paths(converted['batch_stats']) == \
        _paths(variables['batch_stats'])
