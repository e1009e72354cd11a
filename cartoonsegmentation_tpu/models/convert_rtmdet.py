"""rtmdetl_e60.ckpt (mmdet state dict) → Flax AnimeDetector params.

mmdet naming (registry-built RTMDet-Ins-L, config embedded in the
checkpoint meta — animeinsseg/__init__.py:196-209):
- backbone.stem.{0,1,2}.conv/bn
- backbone.stage{1..4}.0 (stride ConvModule), stage4.1 (SPP),
  stage{s}.{last} CSPLayer: main_conv/short_conv/final_conv,
  blocks.{i}.conv1 + blocks.{i}.conv2.{depthwise,pointwise}_conv,
  attention.fc
- neck.reduce_layers.{k} / top_down_blocks.{k} / downsamples.{k} /
  bottom_up_blocks.{k} / out_convs.{k}
- bbox_head.cls_convs.0.{i} (conv weights shared across levels;
  per-level BN at cls_convs.{lvl}.{i}.bn), rtm_cls.{lvl},
  rtm_reg.{lvl}, rtm_kernel.{lvl}, kernel_convs likewise,
  mask_head.stacked_convs.{i} + mask_head.projection

Our Flax names are defined in models/cspnext.py / models/rtmdet.py.
"""
from __future__ import annotations

from typing import Dict, Mapping

from .convert import _np


def _put(tree: Dict, path, leaf):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = leaf


def _conv(sd, t):
    return _np(sd[f'{t}.weight']).transpose(2, 3, 1, 0)


class _Ctx:
    def __init__(self, sd):
        self.sd = sd
        self.params: Dict = {}
        self.stats: Dict = {}

    def convmod(self, t, path):
        """mmcv ConvModule (conv + bn) → {conv:{kernel}, bn:{...}}."""
        sd = self.sd
        _put(self.params, path + ('conv', 'kernel'), _conv(sd, f'{t}.conv'))
        _put(self.params, path + ('bn', 'scale'),
             _np(sd[f'{t}.bn.weight']))
        _put(self.params, path + ('bn', 'bias'), _np(sd[f'{t}.bn.bias']))
        _put(self.stats, path + ('bn', 'mean'),
             _np(sd[f'{t}.bn.running_mean']))
        _put(self.stats, path + ('bn', 'var'),
             _np(sd[f'{t}.bn.running_var']))

    def plain_conv(self, t, path, bias=True):
        _put(self.params, path + ('kernel',), _conv(self.sd, t))
        if bias and f'{t}.bias' in self.sd:
            _put(self.params, path + ('bias',), _np(self.sd[f'{t}.bias']))

    def csp_layer(self, t, path, num_blocks):
        self.convmod(f'{t}.main_conv', path + ('main_conv',))
        self.convmod(f'{t}.short_conv', path + ('short_conv',))
        self.convmod(f'{t}.final_conv', path + ('final_conv',))
        for i in range(num_blocks):
            b = f'{t}.blocks.{i}'
            self.convmod(f'{b}.conv1', path + (f'block{i}', 'conv1'))
            self.convmod(f'{b}.conv2.depthwise_conv',
                         path + (f'block{i}', 'conv2', 'dw'))
            self.convmod(f'{b}.conv2.pointwise_conv',
                         path + (f'block{i}', 'conv2', 'pw'))
        if f'{t}.attention.fc.weight' in self.sd:
            self.plain_conv(f'{t}.attention.fc',
                            path + ('attention', 'fc'))


def convert_rtmdet(sd: Mapping, deepen: float = 1.0,
                   widen: float = 1.0) -> Dict:
    """Returns {'params': ..., 'batch_stats': ...} for AnimeDetector."""
    if any(k.startswith('model.') for k in sd):
        sd = {k[len('model.'):]: v for k, v in sd.items()
              if k.startswith('model.')}
    c = _Ctx(sd)
    nb = lambda n: max(round(n * deepen), 1)  # noqa: E731

    # --- backbone -----------------------------------------------------
    B = ('backbone',)
    for i in range(3):
        c.convmod(f'backbone.stem.{i}', B + (f'stem{i}',))
    stage_blocks = (3, 6, 6, 3)
    for si in range(4):
        t = f'backbone.stage{si + 1}'
        c.convmod(f'{t}.0', B + (f'stage{si}_conv',))
        csp_idx = 1
        if si == 3:  # SPP before the CSP layer in the last stage
            c.convmod(f'{t}.1.conv1', B + ('stage3_spp', 'conv1'))
            c.convmod(f'{t}.1.conv2', B + ('stage3_spp', 'conv2'))
            csp_idx = 2
        c.csp_layer(f'{t}.{csp_idx}', B + (f'stage{si}_csp',),
                    nb(stage_blocks[si]))

    # --- neck -----------------------------------------------------------
    N = ('neck',)
    for k in range(2):
        c.convmod(f'neck.reduce_layers.{k}', N + (f'reduce{k}',))
        c.csp_layer(f'neck.top_down_blocks.{k}', N + (f'top_down{k}',),
                    nb(3))
        c.convmod(f'neck.downsamples.{k}', N + (f'downsample{k}',))
        c.csp_layer(f'neck.bottom_up_blocks.{k}',
                    N + (f'bottom_up{k}',), nb(3))
    for k in range(3):
        c.convmod(f'neck.out_convs.{k}', N + (f'out{k}',))

    # --- head -------------------------------------------------------------
    H = ('bbox_head',)
    n_levels, n_stacked = 3, 2
    for i in range(n_stacked):
        for branch_t, branch_f in (('cls_convs', 'cls_conv'),
                                   ('reg_convs', 'reg_conv'),
                                   ('kernel_convs', 'kernel_conv')):
            # shared conv kernels (level 0's tensors)
            _put(c.params, H + (f'{branch_f}{i}', 'kernel'),
                 _conv(sd, f'bbox_head.{branch_t}.0.{i}.conv'))
            for lv in range(n_levels):
                bt = f'bbox_head.{branch_t}.{lv}.{i}.bn'
                bf = H + (f'{branch_f.split("_")[0]}_bn_l{lv}_{i}',)
                _put(c.params, bf + ('scale',), _np(sd[f'{bt}.weight']))
                _put(c.params, bf + ('bias',), _np(sd[f'{bt}.bias']))
                _put(c.stats, bf + ('mean',),
                     _np(sd[f'{bt}.running_mean']))
                _put(c.stats, bf + ('var',),
                     _np(sd[f'{bt}.running_var']))
    for lv in range(n_levels):
        c.plain_conv(f'bbox_head.rtm_cls.{lv}', H + (f'rtm_cls_l{lv}',))
        c.plain_conv(f'bbox_head.rtm_reg.{lv}', H + (f'rtm_reg_l{lv}',))
        c.plain_conv(f'bbox_head.rtm_kernel.{lv}',
                     H + (f'rtm_kernel_l{lv}',))

    # --- mask feat module ----------------------------------------------
    M = ('mask_head',)
    c.plain_conv('bbox_head.mask_head.fusion_conv', M + ('fusion_conv',))
    for i in range(4):
        c.convmod(f'bbox_head.mask_head.stacked_convs.{i}',
                  M + (f'conv{i}',))
    c.plain_conv('bbox_head.mask_head.projection', M + ('projection',))

    return {'params': c.params, 'batch_stats': c.stats}
