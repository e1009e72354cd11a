"""torch checkpoint → Flax params converters.

The published CartoonSegmentation weights are torch state dicts
(reference utils/constants.py:79-82; loading quirks at
anime_3dkenburns/models/__init__.py:7-23,39 and
animeinsseg/__init__.py:196-209). These converters map them onto our
NHWC Flax modules. They are pure name/layout mappers — no torch
import needed if the state dict is already numpy.

Layout rules:
- Conv:  torch (O, I, kh, kw) → flax kernel (kh, kw, I, O)
- PReLU: torch (C,) weight    → flax 'alpha'
- BatchNorm: weight/bias → params.scale/bias;
  running_mean/var → batch_stats.mean/var
"""
from __future__ import annotations

from typing import Dict, Mapping, Tuple

import numpy as np


def _np(t):
    """torch tensor or ndarray → float32 ndarray."""
    if hasattr(t, 'detach'):
        t = t.detach().cpu().numpy()
    return np.asarray(t, np.float32)


def conv_w(v):
    """torch Conv2d weight (out, in, kh, kw) → flax (kh, kw, in, out)."""
    return _np(v).transpose(2, 3, 1, 0)


def deconv_w(v):
    """torch ConvTranspose2d weight (in, out, kh, kw) → flax
    ConvTranspose kernel: spatial flip + (kh, kw, in, out) layout —
    verified numerically against torch (without the flip
    overlapping-tap deconvs are wrong by O(1))."""
    return _np(v)[:, :, ::-1, ::-1].transpose(2, 3, 0, 1)


def lin_w(v):
    """torch Linear weight (out, in) → flax Dense kernel (in, out)."""
    return _np(v).T


def strip_prefix(sd: Mapping, prefix: str = 'module.') -> Dict:
    """Drop a DataParallel-style key prefix where present."""
    return {k[len(prefix):] if k.startswith(prefix) else k: v
            for k, v in sd.items()}


def conv_p(sd: Mapping, prefix: str) -> Dict:
    w = _np(sd[prefix + '.weight']).transpose(2, 3, 1, 0)
    out = {'kernel': w}
    if prefix + '.bias' in sd:
        out['bias'] = _np(sd[prefix + '.bias'])
    return out


def prelu_p(sd: Mapping, prefix: str) -> Dict:
    return {'alpha': _np(sd[prefix + '.weight'])}


def basic_p(sd: Mapping, prefix: str, kind: str) -> Dict:
    """Basic block: torch netMain indices depend on kind
    (relu-conv-relu-conv: PReLU,Conv,PReLU,Conv = 0..3;
    conv-relu-conv: Conv,PReLU,Conv = 0..2)."""
    out: Dict = {}
    if kind == 'relu-conv-relu-conv':
        out['prelu_in'] = prelu_p(sd, f'{prefix}.netMain.0')
        out['conv0'] = conv_p(sd, f'{prefix}.netMain.1')
        out['prelu_mid'] = prelu_p(sd, f'{prefix}.netMain.2')
        out['conv1'] = conv_p(sd, f'{prefix}.netMain.3')
    else:
        out['conv0'] = conv_p(sd, f'{prefix}.netMain.0')
        out['prelu_mid'] = prelu_p(sd, f'{prefix}.netMain.1')
        out['conv1'] = conv_p(sd, f'{prefix}.netMain.2')
    if f'{prefix}.netShortcut.weight' in sd:
        out['shortcut'] = conv_p(sd, f'{prefix}.netShortcut')
    return out


def down_p(sd: Mapping, prefix: str) -> Dict:
    return {'prelu0': prelu_p(sd, f'{prefix}.netMain.0'),
            'conv0': conv_p(sd, f'{prefix}.netMain.1'),
            'prelu1': prelu_p(sd, f'{prefix}.netMain.2'),
            'conv1': conv_p(sd, f'{prefix}.netMain.3')}


def up_p(sd: Mapping, prefix: str) -> Dict:
    # netMain.0 is the (param-free) torch Upsample layer
    return {'prelu0': prelu_p(sd, f'{prefix}.netMain.1'),
            'conv0': conv_p(sd, f'{prefix}.netMain.2'),
            'prelu1': prelu_p(sd, f'{prefix}.netMain.3'),
            'conv1': conv_p(sd, f'{prefix}.netMain.4')}


def _grid_p(sd: Mapping, n_rows: int) -> Dict:
    """Shared grid-net blocks: basics r×3, downs 2×(n-1), ups 2×(n-1).

    Torch module names: '{r}x{c} - {r}x{c+1}' (basics),
    '{r}x{c} - {r+1}x{c}' (downs, cols 0-1),
    '{r+1}x{c} - {r}x{c}' (ups, cols 2-3)."""
    p: Dict = {}
    for r in range(n_rows):
        for c in range(3):
            p[f'basic_r{r}c{c}'] = basic_p(
                sd, f'{r}x{c} - {r}x{c + 1}', 'relu-conv-relu-conv')
    for ci, c in enumerate((0, 1)):
        for r in range(n_rows - 1):
            p[f'down_c{ci}r{r}'] = down_p(sd, f'{r}x{c} - {r + 1}x{c}')
    for ci, c in enumerate((2, 3)):
        for r in range(n_rows - 1):
            p[f'up_c{ci}r{r}'] = up_p(sd, f'{r + 1}x{c} - {r}x{c}')
    return p


def convert_disparity(sd: Mapping) -> Dict:
    """Disparity net ckpt (keys prefixed 'net*' after the reference's
    module→net rename, models/__init__.py:39)."""
    p = _grid_p(sd, 6)
    p['net_image'] = conv_p(sd, 'netImage')
    p['net_semantics'] = conv_p(sd, 'netSemantics')
    p['net_disparity'] = basic_p(sd, 'netDisparity', 'conv-relu-conv')
    return p


def convert_refine(sd: Mapping) -> Dict:
    return {
        'img_one': basic_p(sd, 'netImageOne', 'conv-relu-conv'),
        'img_two': down_p(sd, 'netImageTwo'),
        'img_thr': down_p(sd, 'netImageThr'),
        'disp_one': basic_p(sd, 'netDisparityOne', 'conv-relu-conv'),
        'disp_two': up_p(sd, 'netDisparityTwo'),
        'disp_thr': up_p(sd, 'netDisparityThr'),
        'disp_fou': basic_p(sd, 'netDisparityFou', 'conv-relu-conv'),
        'refine': basic_p(sd, 'netRefine', 'conv-relu-conv'),
    }


def convert_inpaint(sd: Mapping) -> Dict:
    p = _grid_p(sd, 4)
    p['context0'] = conv_p(sd, 'netContext.0')
    p['context_prelu0'] = prelu_p(sd, 'netContext.1')
    p['context1'] = conv_p(sd, 'netContext.2')
    p['context_prelu1'] = prelu_p(sd, 'netContext.3')
    p['net_input'] = basic_p(sd, 'netInput', 'conv-relu-conv')
    p['net_image'] = basic_p(sd, 'netImage', 'conv-relu-conv')
    p['net_disparity'] = basic_p(sd, 'netDisparity', 'conv-relu-conv')
    return p


_VGG_CONV_IDX = (0, 3, 7, 10, 14, 17, 20, 23, 27, 30, 33, 36)


def convert_semantics(vgg_sd: Mapping, prefix: str = 'features'
                      ) -> Tuple[Dict, Dict]:
    """torchvision vgg19_bn state dict → (params, batch_stats) for
    Semantics (12 conv-bn-relu units through the 4th pool)."""
    params: Dict = {}
    stats: Dict = {}
    for i, ci in enumerate(_VGG_CONV_IDX):
        name = f'unit{i}'
        params[name] = {
            'conv': conv_p(vgg_sd, f'{prefix}.{ci}'),
            'bn': {'scale': _np(vgg_sd[f'{prefix}.{ci + 1}.weight']),
                   'bias': _np(vgg_sd[f'{prefix}.{ci + 1}.bias'])},
        }
        stats[name] = {
            'bn': {'mean': _np(vgg_sd[f'{prefix}.{ci + 1}.running_mean']),
                   'var': _np(vgg_sd[f'{prefix}.{ci + 1}.running_var'])},
        }
    return params, stats


def load_torch_ckpt(path: str) -> Dict:
    """Load a torch checkpoint file into a flat name→ndarray dict."""
    import torch
    sd = torch.load(path, map_location='cpu', weights_only=False)
    if isinstance(sd, dict) and 'state_dict' in sd:
        sd = sd['state_dict']
    return {k: _np(v) for k, v in sd.items() if hasattr(v, 'shape')}
