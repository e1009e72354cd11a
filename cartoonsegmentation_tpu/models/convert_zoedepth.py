"""ZoeD_M12_N.pt (torch) → Flax ZoeDepth params.

Checkpoint layout: ZoeDepth.state_dict() with the MiDaS DPT-BEiT core
under 'core.core.pretrained.model.*' (BEiT blocks) /
'core.core.pretrained.act_postprocessN.*' (readout+resample) /
'core.core.scratch.*' (RefineNet decoder), and the metric-bins head
at the top level (conv2, seed_bin_regressor, projectors.N,
attractors.N, conditional_log_binomial).

Relative-position bias tables are trained for the 24x24 patch grid
(384px); ``_resize_rel_pos`` bicubic-resizes them to the target grid
like MiDaS's variable-resolution path.
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from .convert import _np


def _resize_rel_pos(table: np.ndarray, src: Tuple[int, int],
                    dst: Tuple[int, int]) -> np.ndarray:
    """(src_rel + 3, H) → (dst_rel + 3, H) bicubic over the 2D
    relative-coordinate lattice."""
    sh, sw = 2 * src[0] - 1, 2 * src[1] - 1
    dh, dw = 2 * dst[0] - 1, 2 * dst[1] - 1
    if (sh, sw) == (dh, dw):
        return table
    heads = table.shape[1]
    body = table[:sh * sw].reshape(sh, sw, heads)
    import jax
    import jax.numpy as jnp
    resized = jax.image.resize(jnp.asarray(body), (dh, dw, heads),
                               method='cubic')
    return np.concatenate([np.asarray(resized).reshape(-1, heads),
                           table[sh * sw:]], axis=0)


def _put(tree: Dict, path, leaf):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = leaf


from .convert import conv_w, deconv_w, lin_w  # shared helpers


def _convert_core(sd: Dict, P: Dict, grid: Tuple[int, int]) -> None:
    """MiDaS DPT-BEiT core: 'core.core.pretrained.*' +
    'core.core.scratch.*' → the Flax 'core' subtree."""
    # ---- BEiT backbone -------------------------------------------------
    pm = 'core.core.pretrained.model'
    bb = ('core', 'backbone')
    _put(P, bb + ('patch_embed', 'kernel'),
         conv_w(sd[f'{pm}.patch_embed.proj.weight']))
    _put(P, bb + ('patch_embed', 'bias'),
         _np(sd[f'{pm}.patch_embed.proj.bias']))
    _put(P, bb + ('cls_token',), _np(sd[f'{pm}.cls_token'])[0][None])

    n_blocks = 1 + max(
        int(k[len(f'{pm}.blocks.'):].split('.')[0]) for k in sd
        if k.startswith(f'{pm}.blocks.'))
    for i in range(n_blocks):
        t = f'{pm}.blocks.{i}'
        f = bb + (f'block{i}',)
        _put(P, f + ('norm1', 'scale'), _np(sd[f'{t}.norm1.weight']))
        _put(P, f + ('norm1', 'bias'), _np(sd[f'{t}.norm1.bias']))
        _put(P, f + ('norm2', 'scale'), _np(sd[f'{t}.norm2.weight']))
        _put(P, f + ('norm2', 'bias'), _np(sd[f'{t}.norm2.bias']))
        _put(P, f + ('gamma_1',), _np(sd[f'{t}.gamma_1']))
        _put(P, f + ('gamma_2',), _np(sd[f'{t}.gamma_2']))
        _put(P, f + ('attn', 'qkv_kernel'),
             lin_w(sd[f'{t}.attn.qkv.weight']))
        _put(P, f + ('attn', 'q_bias'), _np(sd[f'{t}.attn.q_bias']))
        _put(P, f + ('attn', 'v_bias'), _np(sd[f'{t}.attn.v_bias']))
        _put(P, f + ('attn', 'proj', 'kernel'),
             lin_w(sd[f'{t}.attn.proj.weight']))
        _put(P, f + ('attn', 'proj', 'bias'),
             _np(sd[f'{t}.attn.proj.bias']))
        table = _np(sd[f'{t}.attn.relative_position_bias_table'])
        src = int(round((np.sqrt(table.shape[0] - 3) + 1) / 2))
        _put(P, f + ('attn', 'rel_pos_table'),
             _resize_rel_pos(table, (src, src), grid))
        _put(P, f + ('mlp_fc1', 'kernel'),
             lin_w(sd[f'{t}.mlp.fc1.weight']))
        _put(P, f + ('mlp_fc1', 'bias'), _np(sd[f'{t}.mlp.fc1.bias']))
        _put(P, f + ('mlp_fc2', 'kernel'),
             lin_w(sd[f'{t}.mlp.fc2.weight']))
        _put(P, f + ('mlp_fc2', 'bias'), _np(sd[f'{t}.mlp.fc2.bias']))

    # ---- readout / resample / scratch ----------------------------------
    pre = 'core.core.pretrained'
    for i in range(4):
        ap = f'{pre}.act_postprocess{i + 1}'
        _put(P, ('core', f'readout{i}', 'project', 'kernel'),
             lin_w(sd[f'{ap}.0.project.0.weight']))
        _put(P, ('core', f'readout{i}', 'project', 'bias'),
             _np(sd[f'{ap}.0.project.0.bias']))
        _put(P, ('core', f'proj{i}', 'kernel'),
             conv_w(sd[f'{ap}.3.weight']))
        _put(P, ('core', f'proj{i}', 'bias'), _np(sd[f'{ap}.3.bias']))
        if i in (0, 1):
            _put(P, ('core', f'resample{i}', 'kernel'),
                 deconv_w(sd[f'{ap}.4.weight']))
            _put(P, ('core', f'resample{i}', 'bias'),
                 _np(sd[f'{ap}.4.bias']))
        elif i == 3:
            _put(P, ('core', 'resample3', 'kernel'),
                 conv_w(sd[f'{ap}.4.weight']))
            _put(P, ('core', 'resample3', 'bias'),
                 _np(sd[f'{ap}.4.bias']))

    sc = 'core.core.scratch'
    for i in range(4):
        _put(P, ('core', f'layer{i + 1}_rn', 'kernel'),
             conv_w(sd[f'{sc}.layer{i + 1}_rn.weight']))
    for i in range(1, 5):
        t = f'{sc}.refinenet{i}'
        f = ('core', f'refinenet{i}')
        for rcu_t, rcu_f in (('resConfUnit1', 'rcu1'),
                             ('resConfUnit2', 'rcu2')):
            if f'{t}.{rcu_t}.conv1.weight' not in sd:
                continue
            if i == 4 and rcu_t == 'resConfUnit1':
                # refinenet4 has no skip input; the torch module still
                # instantiates (dead) resConfUnit1 weights — drop them
                continue
            for c in ('conv1', 'conv2'):
                _put(P, f + (rcu_f, c, 'kernel'),
                     conv_w(sd[f'{t}.{rcu_t}.{c}.weight']))
                _put(P, f + (rcu_f, c, 'bias'),
                     _np(sd[f'{t}.{rcu_t}.{c}.bias']))
        _put(P, f + ('out_conv', 'kernel'),
             conv_w(sd[f'{t}.out_conv.weight']))
        _put(P, f + ('out_conv', 'bias'), _np(sd[f'{t}.out_conv.bias']))

    for ti, fi in ((0, 'head_conv0'), (2, 'head_conv1'),
                   (4, 'head_conv2')):
        _put(P, ('core', fi, 'kernel'),
             conv_w(sd[f'{sc}.output_conv.{ti}.weight']))
        _put(P, ('core', fi, 'bias'),
             _np(sd[f'{sc}.output_conv.{ti}.bias']))


def _mlp2(sd: Dict, P: Dict, prefix_t: str, path: Tuple) -> None:
    """torch Sequential Conv1x1(0) ReLU Conv1x1(2) → net0/net1."""
    _put(P, path + ('net0', 'kernel'), conv_w(sd[f'{prefix_t}.0.weight']))
    _put(P, path + ('net0', 'bias'), _np(sd[f'{prefix_t}.0.bias']))
    _put(P, path + ('net1', 'kernel'), conv_w(sd[f'{prefix_t}.2.weight']))
    _put(P, path + ('net1', 'bias'), _np(sd[f'{prefix_t}.2.bias']))


def convert_zoedepth(sd: Dict, img_size: Tuple[int, int] = (384, 512)
                     ) -> Dict:
    from .convert import strip_prefix
    sd = strip_prefix(sd)
    grid = (img_size[0] // 16, img_size[1] // 16)
    P: Dict = {}

    def mlp2(prefix_t, path):
        _mlp2(sd, P, prefix_t, path)

    _convert_core(sd, P, grid)

    # ---- metric bins head ----------------------------------------------
    _put(P, ('conv2', 'kernel'), conv_w(sd['conv2.weight']))
    _put(P, ('conv2', 'bias'), _np(sd['conv2.bias']))
    mlp2('seed_bin_regressor._net', ('seed_bin_regressor',))
    mlp2('seed_projector._net', ('seed_projector',))
    for i in range(4):
        mlp2(f'projectors.{i}._net', (f'projector{i}',))
        mlp2(f'attractors.{i}._net', (f'attractor{i}',))
    _put(P, ('conditional_log_binomial', 'mlp0', 'kernel'),
         conv_w(sd['conditional_log_binomial.mlp.0.weight']))
    _put(P, ('conditional_log_binomial', 'mlp0', 'bias'),
         _np(sd['conditional_log_binomial.mlp.0.bias']))
    _put(P, ('conditional_log_binomial', 'mlp1', 'kernel'),
         conv_w(sd['conditional_log_binomial.mlp.2.weight']))
    _put(P, ('conditional_log_binomial', 'mlp1', 'bias'),
         _np(sd['conditional_log_binomial.mlp.2.bias']))
    return {'params': P}


def convert_zoedepth_nk(sd: Dict,
                        img_size: Tuple[int, int] = (384, 512),
                        domains: Tuple[str, ...] = ('nyu', 'kitti')
                        ) -> Dict:
    """ZoeD_M12_NK.pt → Flax ZoeDepthNK params.

    NK layout (zoedepth_nk_v1.py:97-157): shared conv2 / seed_projector
    / projectors, plus per-domain ModuleDicts (seed_bin_regressors.*,
    attractors.*, conditional_log_binomial.*) and the patch-transformer
    router (patch_transformer.* + mlp_classifier.*)."""
    from .convert import strip_prefix
    sd = strip_prefix(sd)
    grid = (img_size[0] // 16, img_size[1] // 16)
    P: Dict = {}
    _convert_core(sd, P, grid)

    _put(P, ('conv2', 'kernel'), conv_w(sd['conv2.weight']))
    _put(P, ('conv2', 'bias'), _np(sd['conv2.bias']))

    # router: 1×1 patch embedding + 4 torch TransformerEncoder layers
    pt = 'patch_transformer'
    _put(P, (pt, 'embedding_convPxP', 'kernel'),
         conv_w(sd[f'{pt}.embedding_convPxP.weight']))
    _put(P, (pt, 'embedding_convPxP', 'bias'),
         _np(sd[f'{pt}.embedding_convPxP.bias']))
    n_layers = 1 + max(
        int(k.split('.layers.')[1].split('.')[0]) for k in sd
        if '.layers.' in k)
    for i in range(n_layers):
        t = f'{pt}.transformer_encoder.layers.{i}'
        f = (pt, f'layer{i}')
        _put(P, f + ('in_proj_kernel',),
             lin_w(sd[f'{t}.self_attn.in_proj_weight']))
        _put(P, f + ('in_proj_bias',),
             _np(sd[f'{t}.self_attn.in_proj_bias']))
        _put(P, f + ('out_proj', 'kernel'),
             lin_w(sd[f'{t}.self_attn.out_proj.weight']))
        _put(P, f + ('out_proj', 'bias'),
             _np(sd[f'{t}.self_attn.out_proj.bias']))
        for lin in ('linear1', 'linear2'):
            _put(P, f + (lin, 'kernel'), lin_w(sd[f'{t}.{lin}.weight']))
            _put(P, f + (lin, 'bias'), _np(sd[f'{t}.{lin}.bias']))
        for norm in ('norm1', 'norm2'):
            _put(P, f + (norm, 'scale'), _np(sd[f'{t}.{norm}.weight']))
            _put(P, f + (norm, 'bias'), _np(sd[f'{t}.{norm}.bias']))
    _put(P, ('mlp_classifier0', 'kernel'),
         lin_w(sd['mlp_classifier.0.weight']))
    _put(P, ('mlp_classifier0', 'bias'), _np(sd['mlp_classifier.0.bias']))
    _put(P, ('mlp_classifier1', 'kernel'),
         lin_w(sd['mlp_classifier.2.weight']))
    _put(P, ('mlp_classifier1', 'bias'), _np(sd['mlp_classifier.2.bias']))

    # shared embedding chain + per-domain metric heads
    _mlp2(sd, P, 'seed_projector._net', ('seed_projector',))
    for i in range(4):
        _mlp2(sd, P, f'projectors.{i}._net', (f'projector{i}',))
    for name in domains:
        _mlp2(sd, P, f'seed_bin_regressors.{name}._net',
              (f'seed_bin_regressor_{name}',))
        for i in range(4):
            _mlp2(sd, P, f'attractors.{name}.{i}._net',
                  (f'attractor{i}_{name}',))
        clb_t = f'conditional_log_binomial.{name}.mlp'
        clb_f = f'conditional_log_binomial_{name}'
        _put(P, (clb_f, 'mlp0', 'kernel'), conv_w(sd[f'{clb_t}.0.weight']))
        _put(P, (clb_f, 'mlp0', 'bias'), _np(sd[f'{clb_t}.0.bias']))
        _put(P, (clb_f, 'mlp1', 'kernel'), conv_w(sd[f'{clb_t}.2.weight']))
        _put(P, (clb_f, 'mlp1', 'bias'), _np(sd[f'{clb_t}.2.bias']))
    return {'params': P}
