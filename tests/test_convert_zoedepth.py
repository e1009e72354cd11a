"""ZoeDepth converter structure check: synthesize the ZoeD_M12_N
state-dict key manifest (MiDaS DPT-BEiT-L schema) with zero arrays
and verify the converted tree lines up with ZoeDepth.init exactly."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cartoonsegmentation_tpu.models.convert_zoedepth import convert_zoedepth
from cartoonsegmentation_tpu.models.zoedepth import ZoeDepth


def _synth_sd(dim=1024, heads=16, depth=24, mlp=4096):
    sd = {}

    def conv(name, o, i, k):
        sd[f'{name}.weight'] = np.zeros((o, i, k, k), np.float32)
        sd[f'{name}.bias'] = np.zeros((o,), np.float32)

    def lin(name, o, i):
        sd[f'{name}.weight'] = np.zeros((o, i), np.float32)
        sd[f'{name}.bias'] = np.zeros((o,), np.float32)

    pm = 'core.core.pretrained.model'
    sd[f'{pm}.cls_token'] = np.zeros((1, 1, dim), np.float32)
    conv(f'{pm}.patch_embed.proj', dim, 3, 16)
    n_rel = (2 * 24 - 1) ** 2 + 3
    for b in range(depth):
        t = f'{pm}.blocks.{b}'
        for n in ('norm1', 'norm2'):
            sd[f'{t}.{n}.weight'] = np.zeros((dim,), np.float32)
            sd[f'{t}.{n}.bias'] = np.zeros((dim,), np.float32)
        sd[f'{t}.gamma_1'] = np.zeros((dim,), np.float32)
        sd[f'{t}.gamma_2'] = np.zeros((dim,), np.float32)
        sd[f'{t}.attn.qkv.weight'] = np.zeros((3 * dim, dim), np.float32)
        sd[f'{t}.attn.q_bias'] = np.zeros((dim,), np.float32)
        sd[f'{t}.attn.v_bias'] = np.zeros((dim,), np.float32)
        lin(f'{t}.attn.proj', dim, dim)
        sd[f'{t}.attn.relative_position_bias_table'] = \
            np.zeros((n_rel, heads), np.float32)
        lin(f'{t}.mlp.fc1', mlp, dim)
        lin(f'{t}.mlp.fc2', dim, mlp)

    pre = 'core.core.pretrained'
    ocs = (256, 512, 1024, 1024)
    for i in range(4):
        lin(f'{pre}.act_postprocess{i + 1}.0.project.0', dim, 2 * dim)
        conv(f'{pre}.act_postprocess{i + 1}.3', ocs[i], dim, 1)
        if i in (0, 1):
            k = 4 if i == 0 else 2
            sd[f'{pre}.act_postprocess{i + 1}.4.weight'] = \
                np.zeros((ocs[i], ocs[i], k, k), np.float32)
            sd[f'{pre}.act_postprocess{i + 1}.4.bias'] = \
                np.zeros((ocs[i],), np.float32)
        elif i == 3:
            conv(f'{pre}.act_postprocess4.4', ocs[i], ocs[i], 3)

    sc = 'core.core.scratch'
    for i in range(4):
        sd[f'{sc}.layer{i + 1}_rn.weight'] = \
            np.zeros((256, ocs[i], 3, 3), np.float32)
    for i in range(1, 5):
        for rcu in ('resConfUnit1', 'resConfUnit2'):
            conv(f'{sc}.refinenet{i}.{rcu}.conv1', 256, 256, 3)
            conv(f'{sc}.refinenet{i}.{rcu}.conv2', 256, 256, 3)
        conv(f'{sc}.refinenet{i}.out_conv', 256, 256, 1)
    conv(f'{sc}.output_conv.0', 128, 256, 3)
    conv(f'{sc}.output_conv.2', 32, 128, 3)
    conv(f'{sc}.output_conv.4', 1, 32, 1)

    conv('conv2', 256, 256, 1)
    for pfx, o in (('seed_bin_regressor._net', 64),
                   ('seed_projector._net', 128)):
        conv(f'{pfx}.0', 256, 256, 1)
        conv(f'{pfx}.2', o, 256, 1)
    for i in range(4):
        conv(f'projectors.{i}._net.0', 128, 256, 1)
        conv(f'projectors.{i}._net.2', 128, 128, 1)
        conv(f'attractors.{i}._net.0', 128, 128, 1)
        conv(f'attractors.{i}._net.2', (16, 8, 4, 1)[i], 128, 1)
    conv('conditional_log_binomial.mlp.0', (33 + 128) // 2, 33 + 128, 1)
    conv('conditional_log_binomial.mlp.2', 4, (33 + 128) // 2, 1)
    return sd


def test_zoedepth_converter_structure():
    sd = _synth_sd()
    converted = convert_zoedepth(sd, img_size=(384, 512))

    model = ZoeDepth(img_size=(384, 512))
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 384, 512, 3), jnp.float32)))

    def paths(tree, prefix=()):
        out = set()
        for k, v in tree.items():
            if isinstance(v, dict):
                out |= paths(v, prefix + (k,))
            else:
                out.add(prefix + (k,))
        return out

    want = paths(variables['params'])
    got = paths(converted['params'])
    missing = want - got
    extra = got - want
    assert not missing, f'missing {sorted(missing)[:8]}'
    assert not extra, f'extra {sorted(extra)[:8]}'

    # rel-pos tables resized 24x24 → (24, 32) grid
    t = converted['params']['core']['backbone']['block0']['attn'][
        'rel_pos_table']
    assert t.shape == ((2 * 24 - 1) * (2 * 32 - 1) + 3, 16)


def test_zoedepth_converter_full_numeric(rng):
    """COMPLETE ZoeDepth graph (BEiT core + DPT decoder + metric-bins
    head) at reduced geometry: torch twin → convert → flax forward
    allclose. Exercises every converter rule incl. the spatially
    flipped deconv kernels and the rel-pos tables."""
    import torch
    from torch_twins import TorchZoeDepth, randomize_

    geo = dict(img_size=(64, 64), dim=64, depth=8, heads=4,
               hooks=(1, 3, 5, 7), features=32,
               out_channels=(32, 64, 96, 96), n_bins=16,
               bin_embedding_dim=32, btlnck=48)
    tm = randomize_(TorchZoeDepth(**geo), seed=11, scale=0.1).eval()
    converted = convert_zoedepth(tm.state_dict(), img_size=(64, 64))

    model = ZoeDepth(img_size=(64, 64), n_bins=16, bin_embedding_dim=32,
                     core_features=32, core_out_channels=(32, 64, 96, 96),
                     core_dim=64, core_depth=8, core_heads=4,
                     core_hooks=(1, 3, 5, 7), btlnck_features=48)

    x = rng.rand(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x))
    got = model.apply(converted, jnp.asarray(x.transpose(0, 2, 3, 1)))

    np.testing.assert_allclose(
        np.asarray(got['rel_depth']), want['rel_depth'].numpy(),
        rtol=1e-3, atol=1e-4, err_msg='rel_depth')
    np.testing.assert_allclose(
        np.asarray(got['metric_depth'])[..., 0],
        want['metric_depth'].numpy()[:, 0],
        rtol=1e-3, atol=1e-4, err_msg='metric_depth')
