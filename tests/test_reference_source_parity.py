"""Parity against the REFERENCE'S OWN torch source (read-only import
from /root/reference), not builder-authored twins — kills the
shared-misreading risk: a converter/model pair that both encode the
same wrong reading of the reference passes a twin test but fails
here.

Modules imported directly (pure torch, or behind tiny stubs injected
into sys.modules — torchvision supplying vgg19_bn weight storage,
cupy supplying a no-op memoize; the CUDA render_pointcloud symbol is
monkeypatched to the numpy oracle so the reference Inpaint.forward
runs end to end on CPU):

- anime_3dkenburns/models/disparity_estimation.py (Semantics,
  Disparity)
- anime_3dkenburns/models/disparity_refinement.py (Refine)
- anime_3dkenburns/models/pointcloud_inpainting.py (Inpaint) +
  models/utils.py (spatial_filter / depth_to_points)
- depth_modules/zoedepth/models/layers/{localbins_layers, attractor,
  dist_layers}.py (the metric-bins math)
- animeinsseg/models/animeseg_refine/u2net.py (U2NET_full2/lite2)
- animeinsseg/models/animeseg_refine/isnet.py (ISNetDIS)
"""
import importlib
import importlib.util
import math
import sys
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from oracles import oracle_render_pointcloud
from torch_twins import TorchSemanticsVGG
from test_composed_pipeline import randomize_calibrated_

from cartoonsegmentation_tpu.models import convert as C

REF = '/root/reference'


# ---------------------------------------------------------------------------
# import machinery
# ---------------------------------------------------------------------------

def _ensure_stubs():
    if 'torchvision' not in sys.modules:
        tv = types.ModuleType('torchvision')
        tvm = types.ModuleType('torchvision.models')

        def vgg19_bn(pretrained=False, **kw):
            # weight storage only: the reference Semantics slices the
            # conv/bn/relu triples out of .features and adds its own
            # pools, so the stub's pool flavor is never exercised
            m = randomize_calibrated_(TorchSemanticsVGG(), seed=7)
            vgg19_bn.last = m
            return m
        tvm.vgg19_bn = vgg19_bn
        tvt = types.ModuleType('torchvision.transforms')
        tvt.ToTensor = object
        tv.models = tvm
        tv.transforms = tvt
        sys.modules['torchvision'] = tv
        sys.modules['torchvision.models'] = tvm
        sys.modules['torchvision.transforms'] = tvt
    if 'cupy' not in sys.modules:
        cupy = types.ModuleType('cupy')
        cupy.memoize = lambda **kw: (lambda f: f)
        cupy.RawKernel = None
        sys.modules['cupy'] = cupy
    if REF not in sys.path:
        sys.path.insert(0, REF)  # for 'utils.cupy_utils'


def _load_file(name, relpath):
    _ensure_stubs()
    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(
        name, f'{REF}/{relpath}')
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _load_refkb(modname):
    """Import anime_3dkenburns/models/<modname> as part of a synthetic
    package so its relative imports (.utils) resolve WITHOUT running
    the reference package __init__ (which pulls mmcv/moviepy/...)."""
    _ensure_stubs()
    if 'refkb' not in sys.modules:
        pkg = types.ModuleType('refkb')
        pkg.__path__ = [f'{REF}/anime_3dkenburns/models']
        sys.modules['refkb'] = pkg
    return importlib.import_module(f'refkb.{modname}')


def _nchw(a):
    return torch.from_numpy(np.ascontiguousarray(a))


def _hwc(t):
    return t.detach().numpy().transpose(0, 2, 3, 1)


# ---------------------------------------------------------------------------
# 3D-Ken-Burns disparity family
# ---------------------------------------------------------------------------

def test_reference_semantics_disparity(rng):
    de = _load_refkb('disparity_estimation')
    ref_sem = de.Semantics().eval()
    vgg = sys.modules['torchvision'].models.vgg19_bn.last
    ref_disp = randomize_calibrated_(de.Disparity(), seed=8).eval()

    from cartoonsegmentation_tpu.models.kenburns import (Disparity,
                                                         Semantics)
    x = rng.rand(1, 3, 64, 96).astype(np.float32)
    with torch.no_grad():
        tfeat = ref_sem(_nchw(x))
        tout = ref_disp(_nchw(x), tfeat)

    sem_params, sem_stats = C.convert_semantics(vgg.state_dict())
    jfeat = Semantics().apply(
        {'params': sem_params, 'batch_stats': sem_stats},
        jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(jfeat), _hwc(tfeat),
                               rtol=2e-3, atol=2e-3)

    jout = Disparity().apply(
        {'params': C.convert_disparity(ref_disp.state_dict())},
        jnp.asarray(x.transpose(0, 2, 3, 1)), jfeat)
    np.testing.assert_allclose(np.asarray(jout), _hwc(tout),
                               rtol=2e-3, atol=2e-3)


def test_reference_refine(rng):
    dr = _load_refkb('disparity_refinement')
    ref = randomize_calibrated_(dr.Refine(), seed=9).eval()

    from cartoonsegmentation_tpu.models.kenburns import Refine
    img = rng.rand(1, 3, 48, 64).astype(np.float32)
    disp = rng.rand(1, 1, 12, 16).astype(np.float32)
    with torch.no_grad():
        tout = ref(_nchw(img), _nchw(disp))
    jout = Refine().apply(
        {'params': C.convert_refine(ref.state_dict())},
        jnp.asarray(img.transpose(0, 2, 3, 1)),
        jnp.asarray(disp.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(jout), _hwc(tout),
                               rtol=1e-4, atol=1e-4)


def test_reference_inpaint_full_forward(rng):
    """The reference Inpaint.forward END TO END (valid mask, points,
    normalization, context, splat [numpy oracle], median gating, grid
    U-net, de-norm, clip) vs our Inpaint.__call__ (whose splat is the
    TPU op, oracle-bit-exact per tests/test_ops_pointcloud.py)."""
    pi = _load_refkb('pointcloud_inpainting')
    ref = randomize_calibrated_(pi.Inpaint(), seed=10).eval()

    def fake_render(tenPoints, tenData, W, H, focal, baseline):
        pts = tenPoints[0].detach().numpy().reshape(3, -1).T
        data = tenData[0].detach().numpy().reshape(
            tenData.shape[1], -1).T
        render, weight = oracle_render_pointcloud(
            pts, data, H, W, focal, baseline)
        return (_nchw(render.astype(np.float32).transpose(2, 0, 1)[None]),
                _nchw(weight.astype(np.float32)[None, None]))
    pi.render_pointcloud = fake_render

    H, W = 32, 48
    focal, baseline = 512.0, 40.0
    img = rng.rand(H, W, 3).astype(np.float32)
    disp = (rng.rand(H, W, 1).astype(np.float32) * 20 + 1.0)
    shift = np.asarray([1.5, -2.0, 3.0], np.float32)
    common = {'fltFocal': focal, 'fltBaseline': baseline,
              'intWidth': W, 'intHeight': H}
    with torch.no_grad():
        tout = ref(_nchw(img.transpose(2, 0, 1)[None]),
                   _nchw(disp.transpose(2, 0, 1)[None]),
                   _nchw(shift.reshape(1, 3, 1)), common)

    from cartoonsegmentation_tpu.models.kenburns import Inpaint
    model = Inpaint()
    jout = model.apply(
        {'params': C.convert_inpaint(ref.state_dict())},
        jnp.asarray(img), jnp.asarray(disp), jnp.asarray(shift),
        focal, baseline)
    np.testing.assert_allclose(
        np.asarray(jout['existing'])[..., 0],
        tout['tenExisting'][0, 0].numpy(), atol=0)
    np.testing.assert_allclose(np.asarray(jout['image'])[None],
                               _hwc(tout['tenImage']),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(jout['disparity'])[None],
                               _hwc(tout['tenDisparity']),
                               rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# ZoeDepth metric-bins layers
# ---------------------------------------------------------------------------

def _conv1x1_params(seq, i0=0, i1=2):
    """torch Sequential [Conv1x1, ReLU, Conv1x1, ...] → flax
    {'net0', 'net1'} param dict."""
    def conv(c):
        return {'kernel': c.weight.detach().numpy().transpose(2, 3, 1, 0),
                'bias': c.bias.detach().numpy()}
    return {'net0': conv(seq[i0]), 'net1': conv(seq[i1])}


def test_reference_seed_bin_regressor(rng):
    lb = _load_file('ref_localbins',
                    'depth_modules/zoedepth/models/layers/'
                    'localbins_layers.py')
    ref = lb.SeedBinRegressorUnnormed(24, n_bins=16, mlp_dim=32).eval()
    randomize_calibrated_(ref, seed=11)
    x = rng.rand(1, 24, 8, 10).astype(np.float32)
    with torch.no_grad():
        tb, tc = ref(_nchw(x))

    from cartoonsegmentation_tpu.models.zoedepth import \
        SeedBinRegressorUnnormed
    jb, jc = SeedBinRegressorUnnormed(n_bins=16, mlp_dim=32).apply(
        {'params': _conv1x1_params(ref._net)},
        jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(jb), _hwc(tb),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(jc), _hwc(tc),
                               rtol=1e-5, atol=1e-6)


def test_reference_projector(rng):
    lb = _load_file('ref_localbins',
                    'depth_modules/zoedepth/models/layers/'
                    'localbins_layers.py')
    ref = lb.Projector(24, 12, mlp_dim=32).eval()
    randomize_calibrated_(ref, seed=12)
    x = rng.rand(1, 24, 8, 10).astype(np.float32)
    with torch.no_grad():
        tout = ref(_nchw(x))
    from cartoonsegmentation_tpu.models.zoedepth import Projector
    jout = Projector(12, mlp_dim=32).apply(
        {'params': _conv1x1_params(ref._net)},
        jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(jout), _hwc(tout),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize('atype,kind,alpha',
                         [('inv', 'mean', 1000.0), ('exp', 'sum', 300.0)])
def test_reference_attractor(rng, atype, kind, alpha):
    """AttractorLayerUnnormed — the trickiest metric-bins math
    (attractor.py:139-213): conditional prev-embedding add (bilinear
    align_corners=True), softplus attractor positions, inv/exp
    attraction, mean/sum aggregation. The alpha parametrization also
    pins the reference's quirk that the configured alpha/gamma are
    IGNORED (dist() is called with its jit defaults 300/2) — this
    test caught our model and twin both honouring alpha=1000."""
    at = _load_file('ref_attractor',
                    'depth_modules/zoedepth/models/layers/attractor.py')
    ref = at.AttractorLayerUnnormed(
        24, 16, n_attractors=8, mlp_dim=32, alpha=alpha, gamma=2,
        kind=kind, attractor_type=atype).eval()
    randomize_calibrated_(ref, seed=13)
    x = rng.rand(1, 24, 8, 10).astype(np.float32)
    b_prev = (rng.rand(1, 16, 4, 5).astype(np.float32) + 0.1)
    emb = rng.rand(1, 24, 4, 5).astype(np.float32)
    with torch.no_grad():
        tb, tc = ref(_nchw(x), _nchw(b_prev),
                     prev_b_embedding=_nchw(emb), interpolate=True)

    from cartoonsegmentation_tpu.models.zoedepth import \
        AttractorLayerUnnormed
    jb, jc = AttractorLayerUnnormed(
        n_bins=16, n_attractors=8, mlp_dim=32, alpha=alpha, gamma=2,
        kind=kind, attractor_type=atype).apply(
        {'params': _conv1x1_params(ref._net)},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(b_prev.transpose(0, 2, 3, 1)),
        jnp.asarray(emb.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(jb), _hwc(tb),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(jc), _hwc(tc),
                               rtol=1e-4, atol=1e-5)


def test_reference_conditional_log_binomial(rng):
    dl = _load_file('ref_distlayers',
                    'depth_modules/zoedepth/models/layers/'
                    'dist_layers.py')
    # explicit temps: the reference CLASS defaults min_temp=1e-7 but
    # the shipped zoedepth config (and our flax default) uses 0.0212
    ref = dl.ConditionalLogBinomial(
        24, 8, n_classes=16, bottleneck_factor=2,
        min_temp=0.0212, max_temp=50.0).eval()
    # randomize ONLY the mlp: the LogBinomial submodule registers
    # k_idx / K_minus_1 index BUFFERS that live in the state dict —
    # randomizing those lgamma inputs NaNs the reference
    randomize_calibrated_(ref.mlp, seed=14)
    x = rng.rand(1, 24, 6, 7).astype(np.float32)
    cond = rng.rand(1, 8, 6, 7).astype(np.float32)
    with torch.no_grad():
        tout = ref(_nchw(x), _nchw(cond))

    from cartoonsegmentation_tpu.models.zoedepth import \
        ConditionalLogBinomial
    jout = ConditionalLogBinomial(
        n_classes=16, bottleneck_factor=2).apply(
        {'params': {'mlp0': _conv1x1_params(ref.mlp)['net0'],
                    'mlp1': _conv1x1_params(ref.mlp)['net1']}},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(cond.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(jout), _hwc(tout),
                               rtol=1e-4, atol=1e-6)


# ---------------------------------------------------------------------------
# animeseg refine nets
# ---------------------------------------------------------------------------

@pytest.mark.parametrize('lite', [False, True])
def test_reference_u2net(rng, lite):
    u2 = _load_file('ref_u2net',
                    'animeinsseg/models/animeseg_refine/u2net.py')
    ref = (u2.U2NET_lite2() if lite else u2.U2NET_full2()).eval()
    randomize_calibrated_(ref, seed=15 + lite)

    from cartoonsegmentation_tpu.models.u2net import (U2Net,
                                                      convert_u2net)
    x = rng.rand(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        touts = ref(_nchw(x))
    (jfused, *jsides), _ = U2Net(lite=lite).apply(
        convert_u2net(ref.state_dict()),
        jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(jfused), _hwc(touts[0]),
                               rtol=2e-3, atol=2e-3)
    for js, ts in zip(jsides, touts[1:]):
        np.testing.assert_allclose(np.asarray(js), _hwc(ts),
                                   rtol=2e-3, atol=2e-3)


def test_reference_isnet(rng):
    isn = _load_file('ref_isnet',
                     'animeinsseg/models/animeseg_refine/isnet.py')
    ref = isn.ISNetDIS(in_ch=3, out_ch=1).eval()
    randomize_calibrated_(ref, seed=17)

    from cartoonsegmentation_tpu.models.isnet import (ISNetDIS,
                                                      convert_isnet)
    x = rng.rand(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        tsides, tfeats = ref(_nchw(x))
    jsides, jfeats = ISNetDIS(in_ch=3).apply(
        convert_isnet(ref.state_dict()),
        jnp.asarray(x.transpose(0, 2, 3, 1)))
    for js, ts in zip(jsides, tsides):
        np.testing.assert_allclose(np.asarray(js), _hwc(ts),
                                   rtol=2e-3, atol=2e-3)


def test_reference_patch_transformer(rng):
    """The ZoeDepth-NK router encoder against the reference's OWN
    PatchTransformerEncoder (patch_transformer.py:29-92, pure torch):
    1×1 patch embedding, zero class token padded at sequence START,
    sin-block-then-cos-block positional encoding covering the token
    position, 4 post-LN torch TransformerEncoder layers. The NK
    full-model twin already uses the real torch TransformerEncoder;
    this additionally pins the reference's pad/PE/flatten seams."""
    ptm = _load_file('ref_patch_transformer',
                     'depth_modules/zoedepth/models/layers/'
                     'patch_transformer.py')
    ref = ptm.PatchTransformerEncoder(
        32, patch_size=1, embedding_dim=128, num_heads=4,
        use_class_token=True).eval()
    randomize_calibrated_(ref, seed=20)
    sd = ref.state_dict()

    def lin(k):
        return sd[k].detach().numpy().T

    P = {'embedding_convPxP': {
        'kernel': sd['embedding_convPxP.weight'].detach().numpy()
        .transpose(2, 3, 1, 0),
        'bias': _np_t(sd['embedding_convPxP.bias'])}}
    for i in range(4):
        t = f'transformer_encoder.layers.{i}'
        P[f'layer{i}'] = {
            'in_proj_kernel': lin(f'{t}.self_attn.in_proj_weight'),
            'in_proj_bias': _np_t(sd[f'{t}.self_attn.in_proj_bias']),
            'out_proj': {'kernel': lin(f'{t}.self_attn.out_proj.weight'),
                         'bias': _np_t(sd[f'{t}.self_attn.out_proj.bias'])},
            'linear1': {'kernel': lin(f'{t}.linear1.weight'),
                        'bias': _np_t(sd[f'{t}.linear1.bias'])},
            'linear2': {'kernel': lin(f'{t}.linear2.weight'),
                        'bias': _np_t(sd[f'{t}.linear2.bias'])},
            'norm1': {'scale': _np_t(sd[f'{t}.norm1.weight']),
                      'bias': _np_t(sd[f'{t}.norm1.bias'])},
            'norm2': {'scale': _np_t(sd[f'{t}.norm2.weight']),
                      'bias': _np_t(sd[f'{t}.norm2.bias'])},
        }

    x = rng.rand(2, 32, 6, 8).astype(np.float32)
    with torch.no_grad():
        tout = ref(_nchw(x))                       # (S, N, E)

    from cartoonsegmentation_tpu.models.zoedepth import \
        PatchTransformerEncoder
    jout = PatchTransformerEncoder().apply(
        {'params': P}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(jout).transpose(1, 0, 2), tout.numpy(),
        rtol=2e-3, atol=2e-3)


def _np_t(t):
    return t.detach().numpy()


def test_reference_losses(rng):
    """Depth-training losses against the reference's OWN
    trainers/loss.py: SILogLoss (torch.var is the UNBIASED estimator;
    alpha=1e-7 ADDED inside the logs, not a clamp) and GradL1Loss
    (single-scale mag+angle on the shared [1:,1:] grid over
    grad_mask) — this test caught our grad_l1_loss being a different
    (multi-scale |∇|-matching) algorithm entirely."""
    lm = _load_file('ref_zoe_loss',
                    'depth_modules/zoedepth/trainers/loss.py')
    pred = rng.rand(2, 1, 12, 16).astype(np.float32) * 5 + 0.05
    gt = rng.rand(2, 1, 12, 16).astype(np.float32) * 5 + 0.05
    mask = rng.rand(2, 1, 12, 16) > 0.3
    with torch.no_grad():
        tsil = lm.SILogLoss()(torch.from_numpy(pred),
                              torch.from_numpy(gt),
                              mask=torch.from_numpy(mask))
        tgl = lm.GradL1Loss()(torch.from_numpy(pred),
                              torch.from_numpy(gt),
                              mask=torch.from_numpy(mask))

    from cartoonsegmentation_tpu.parallel.depth_train import (
        grad_l1_loss, silog_loss)
    jp = jnp.asarray(pred.transpose(0, 2, 3, 1))
    jt = jnp.asarray(gt.transpose(0, 2, 3, 1))
    jm = jnp.asarray(mask.transpose(0, 2, 3, 1))
    np.testing.assert_allclose(float(silog_loss(jp, jt, jm)),
                               float(tsil), rtol=1e-5)
    np.testing.assert_allclose(float(grad_l1_loss(jp, jt, jm)),
                               float(tgl), rtol=1e-5)


# ---------------------------------------------------------------------------
# LeReS (depth_modules/leres) — pure torch
# ---------------------------------------------------------------------------

def _load_refleres(modname, subdir='leres'):
    """Import depth_modules/leres/<subdir>/<modname> as part of a
    synthetic package so relative imports resolve WITHOUT running the
    depth_modules package __init__ (matplotlib/zoedepth/torchvision)."""
    _ensure_stubs()
    pkgname = f'refleres_{subdir}'
    if pkgname not in sys.modules:
        pkg = types.ModuleType(pkgname)
        pkg.__path__ = [f'{REF}/depth_modules/leres/{subdir}']
        sys.modules[pkgname] = pkg
    return importlib.import_module(f'{pkgname}.{modname}')


def test_reference_leres(rng):
    """The reference's OWN ResNeXt101-32x8d trunk + FTB/FFM/AO decoder
    (Resnext_torch.py / network_auxi.py), wrapped in the REAL
    RelDepthModel attribute nesting (multi_depth_model_woauxi.py:23-33)
    so the state dict reproduces the genuine res101.pth key layout.

    This test caught a real bug: convert_leres AND the builder-authored
    twin both expected bare 'encoder.*'/'decoder.*' keys while the
    shipped checkpoint stores
    'depth_model.encoder_modules.encoder.*' /
    'depth_model.decoder_modules.*' — the real res101.pth would have
    silently converted to an EMPTY param tree."""
    na = _load_refleres('network_auxi')
    import torch.nn as tnn

    class DepthModelWrap(tnn.Module):
        # multi_depth_model_woauxi.DepthModel minus net_tools.get_func
        # (whose importlib path would pull the full package chain)
        def __init__(self):
            super().__init__()
            self.encoder_modules = na.resnext101_stride32x8d()
            self.decoder_modules = na.Decoder()

    class RelWrap(tnn.Module):
        def __init__(self):
            super().__init__()
            self.depth_model = DepthModelWrap()

        def forward(self, x):
            dm = self.depth_model
            return dm.decoder_modules(dm.encoder_modules(x))

    ref = RelWrap().eval()
    randomize_calibrated_(ref, seed=18)

    from cartoonsegmentation_tpu.models.leres import (LeReS,
                                                      convert_leres)
    x = rng.rand(1, 3, 64, 64).astype(np.float32) * 2 - 0.5
    with torch.no_grad():
        tout = ref(_nchw(x))

    variables = convert_leres(ref.state_dict())
    # non-empty conversion (the bug above produced {} silently)
    assert 'layer3_10' in variables['params']['encoder']
    assert 'ffm0' in variables['params']['decoder']
    # the reference takes the already-normalized tensor (estimateleres
    # normalizes host-side, depthmap.py:16-46); our LeReS normalizes
    # inside __call__ — undo it at the input
    mean = np.asarray([0.485, 0.456, 0.406], np.float32)
    std = np.asarray([0.229, 0.224, 0.225], np.float32)
    rgb01 = x.transpose(0, 2, 3, 1) * std + mean
    jout = LeReS().apply(variables, jnp.asarray(rgb01))
    np.testing.assert_allclose(np.asarray(jout), _hwc(tout),
                               rtol=5e-3, atol=5e-3)


def test_reference_pix2pix4depth(rng):
    """The reference's OWN UnetGenerator (pix2pix/models/networks.py:
    444-532) at norm='none', as built by Pix2Pix4DepthModel
    (pix2pix4depth_model.py:63-64) — depth 7 instead of the shipped
    'unet_1024' depth 10 to keep the CPU forward small; the recursive
    UnetSkipConnectionBlock nesting and the ngf→8ngf width ladder are
    identical at every depth ≥ 6 and the converter is parameterized
    over num_downs."""
    networks = _load_refleres('networks', subdir='pix2pix/models')
    norm_layer = networks.get_norm_layer('none')
    ref = networks.UnetGenerator(2, 1, 7, 64,
                                 norm_layer=norm_layer).eval()
    randomize_calibrated_(ref, seed=19)

    from cartoonsegmentation_tpu.models.pix2pix4depth import (
        Pix2Pix4Depth, convert_pix2pix4depth)
    x = (rng.rand(1, 2, 128, 128).astype(np.float32) * 2 - 1)
    with torch.no_grad():
        tout = ref(_nchw(x))
    jout = Pix2Pix4Depth(num_downs=7).apply(
        convert_pix2pix4depth(ref.state_dict(), num_downs=7),
        jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(jout), _hwc(tout),
                               rtol=2e-3, atol=2e-3)
