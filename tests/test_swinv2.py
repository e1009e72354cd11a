"""SwinV2 (WD tagger backbone) vs explicit torch oracles.

The full-model test synthesizes a timm-format state dict, runs a
hand-written torch forward directly off those tensors, and checks the
Flax model with `convert_swinv2(sd)` matches — converter numerics and
model numerics in one shot."""
import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip('torch')
import torch.nn.functional as F  # noqa: E402

from cartoonsegmentation_tpu.models.swinv2 import (  # noqa: E402
    PatchMerging, SwinV2, SwinV2Block, WindowAttentionV2, convert_swinv2,
    relative_coords_table, relative_position_index, shift_attn_mask)


def _t(a):
    return torch.tensor(np.asarray(a), dtype=torch.float64)


def torch_win_attn(x, p, nh, window, mask=None):
    """Oracle for scaled-cosine window attention, from flax params."""
    x = _t(x)
    B, N, C = x.shape
    qkv_b = torch.cat([_t(p['q_bias']), torch.zeros(C, dtype=torch.float64),
                       _t(p['v_bias'])])
    qkv = x @ _t(p['qkv_kernel']) + qkv_b
    qkv = qkv.reshape(B, N, 3, nh, C // nh).permute(2, 0, 3, 1, 4)
    q, k, v = qkv.unbind(0)
    attn = F.normalize(q, dim=-1) @ F.normalize(k, dim=-1).transpose(-2, -1)
    scale = torch.clamp(_t(p['logit_scale']), max=math.log(100.0)).exp()
    attn = attn * scale
    table = _t(relative_coords_table(window, window))
    hid = F.relu(table @ _t(p['cpb_fc1']['kernel'])
                 + _t(p['cpb_fc1']['bias']))
    bt = hid @ _t(p['cpb_fc2']['kernel'])
    idx = relative_position_index(window, window).reshape(-1).astype(int)
    bias = bt[idx].reshape(N, N, nh).permute(2, 0, 1)
    attn = attn + 16.0 * torch.sigmoid(bias)
    if mask is not None:
        m = _t(mask)
        nW = m.shape[0]
        attn = attn.view(B // nW, nW, nh, N, N) + m[None, :, None]
        attn = attn.view(B, nh, N, N)
    attn = attn.softmax(-1)
    out = (attn @ v).transpose(1, 2).reshape(B, N, C)
    return out @ _t(p['proj']['kernel']) + _t(p['proj']['bias'])


def torch_partition(x, w):
    B, H, W, C = x.shape
    x = x.reshape(B, H // w, w, W // w, w, C).permute(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, w * w, C)


def torch_reverse(x, w, H, W):
    C = x.shape[-1]
    x = x.reshape(-1, H // w, W // w, w, w, C).permute(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, H, W, C)


def _ln(x, p):
    return F.layer_norm(x, (x.shape[-1],), _t(p['scale']), _t(p['bias']),
                        eps=1e-5)


def torch_block(x, p, nh, window, shift):
    x = _t(x)
    B, H, W, C = x.shape
    if shift:
        xs = torch.roll(x, (-shift, -shift), (1, 2))
        mask = shift_attn_mask(H, W, window, shift)
    else:
        xs, mask = x, None
    wins = torch_partition(xs, window)
    a = torch_win_attn(wins, p['attn'], nh, window, mask)
    a = torch_reverse(a, window, H, W)
    if shift:
        a = torch.roll(a, (shift, shift), (1, 2))
    x = x + _ln(a, p['norm1'])
    h = F.gelu(x @ _t(p['fc1']['kernel']) + _t(p['fc1']['bias']))
    h = h @ _t(p['fc2']['kernel']) + _t(p['fc2']['bias'])
    return x + _ln(h, p['norm2'])


def test_window_attention_matches_torch(rng):
    C, nh, w = 16, 4, 4
    mod = WindowAttentionV2(C, nh, (w, w))
    x = rng.randn(6, w * w, C).astype(np.float32)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    got = np.asarray(mod.apply(variables, jnp.asarray(x)))
    want = torch_win_attn(x, variables['params'], nh, w).numpy()
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    mask = shift_attn_mask(8, 12, w, 2)
    xm = rng.randn(2 * mask.shape[0], w * w, C).astype(np.float32)
    got = np.asarray(mod.apply(variables, jnp.asarray(xm),
                               jnp.asarray(mask)))
    want = torch_win_attn(xm, variables['params'], nh, w, mask).numpy()
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_shifted_block_matches_torch(rng):
    dim, nh, w, shift = 16, 2, 4, 2
    mod = SwinV2Block(dim, nh, w, shift)
    x = rng.randn(2, 8, 8, dim).astype(np.float32)
    variables = mod.init(jax.random.PRNGKey(1), jnp.asarray(x))
    got = np.asarray(mod.apply(variables, jnp.asarray(x)))
    want = torch_block(x, variables['params'], nh, w, shift).numpy()
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


def test_patch_merging_matches_torch(rng):
    mod = PatchMerging(32)
    x = rng.randn(1, 6, 8, 16).astype(np.float32)
    variables = mod.init(jax.random.PRNGKey(2), jnp.asarray(x))
    got = np.asarray(mod.apply(variables, jnp.asarray(x)))
    xt = _t(x)
    cat = torch.cat([xt[:, 0::2, 0::2], xt[:, 1::2, 0::2],
                     xt[:, 0::2, 1::2], xt[:, 1::2, 1::2]], -1)
    p = variables['params']
    want = _ln(cat @ _t(p['reduction']['kernel']), p['norm']).numpy()
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# full model + converter, from a synthesized timm state dict
# ---------------------------------------------------------------------------

DEPTHS, HEADS, EMBED, WIN, NCLS = (2, 1), (2, 2), 16, 4, 7


def _timm_sd(rng):
    def a(*s):
        return (rng.randn(*s) * 0.05).astype(np.float32)

    sd = {
        'patch_embed.proj.weight': a(EMBED, 3, 4, 4),
        'patch_embed.proj.bias': a(EMBED),
        'patch_embed.norm.weight': 1 + a(EMBED),
        'patch_embed.norm.bias': a(EMBED),
        'norm.weight': 1 + a(2 * EMBED), 'norm.bias': a(2 * EMBED),
        'head.fc.weight': a(NCLS, 2 * EMBED), 'head.fc.bias': a(NCLS),
        'layers.1.downsample.reduction.weight': a(2 * EMBED, 4 * EMBED),
        'layers.1.downsample.norm.weight': 1 + a(2 * EMBED),
        'layers.1.downsample.norm.bias': a(2 * EMBED),
    }
    for i, depth in enumerate(DEPTHS):
        d = EMBED * 2 ** i
        for j in range(depth):
            bp = f'layers.{i}.blocks.{j}'
            sd.update({
                f'{bp}.attn.qkv.weight': a(3 * d, d),
                f'{bp}.attn.q_bias': a(d), f'{bp}.attn.v_bias': a(d),
                f'{bp}.attn.logit_scale':
                    np.full((HEADS[i], 1, 1), math.log(10.0), np.float32),
                f'{bp}.attn.cpb_mlp.0.weight': a(512, 2),
                f'{bp}.attn.cpb_mlp.0.bias': a(512),
                f'{bp}.attn.cpb_mlp.2.weight': a(HEADS[i], 512),
                f'{bp}.attn.proj.weight': a(d, d),
                f'{bp}.attn.proj.bias': a(d),
                f'{bp}.norm1.weight': 1 + a(d), f'{bp}.norm1.bias': a(d),
                f'{bp}.mlp.fc1.weight': a(4 * d, d),
                f'{bp}.mlp.fc1.bias': a(4 * d),
                f'{bp}.mlp.fc2.weight': a(d, 4 * d),
                f'{bp}.mlp.fc2.bias': a(4 * d)[:d],
                f'{bp}.norm2.weight': 1 + a(d), f'{bp}.norm2.bias': a(d),
            })
    return sd


def torch_full(img, sd):
    """Full-model oracle straight off the timm tensors."""
    x = F.conv2d(_t(img).permute(0, 3, 1, 2),
                 _t(sd['patch_embed.proj.weight']),
                 _t(sd['patch_embed.proj.bias']), stride=4)
    x = x.permute(0, 2, 3, 1)
    x = F.layer_norm(x, (EMBED,), _t(sd['patch_embed.norm.weight']),
                     _t(sd['patch_embed.norm.bias']), eps=1e-5)

    fx = convert_swinv2(sd, DEPTHS)['params']
    for i, depth in enumerate(DEPTHS):
        if i > 0:
            cat = torch.cat([x[:, 0::2, 0::2], x[:, 1::2, 0::2],
                             x[:, 0::2, 1::2], x[:, 1::2, 1::2]], -1)
            p = fx[f'merge{i}']
            x = _ln(cat @ _t(p['reduction']['kernel']), p['norm'])
        for j in range(depth):
            shift = 0 if j % 2 == 0 else WIN // 2
            x = torch_block(x.numpy(), fx[f'stage{i}_block{j}'],
                            HEADS[i], WIN, shift)
    x = F.layer_norm(x, (x.shape[-1],), _t(sd['norm.weight']),
                     _t(sd['norm.bias']), eps=1e-5)
    feats = x.mean((1, 2))
    return (feats @ _t(sd['head.fc.weight']).T
            + _t(sd['head.fc.bias'])).numpy()


def test_full_model_converter_matches_torch(rng):
    sd = _timm_sd(rng)
    model = SwinV2(num_classes=NCLS, embed_dim=EMBED, depths=DEPTHS,
                   num_heads=HEADS, window=WIN)
    variables = convert_swinv2(sd, DEPTHS)

    # structure parity vs a fresh init
    img = rng.rand(1, 32, 32, 3).astype(np.float32)
    ref = model.init(jax.random.PRNGKey(0), jnp.asarray(img))
    got_tree = jax.tree_util.tree_map(lambda x: x.shape, variables)
    ref_tree = jax.tree_util.tree_map(lambda x: x.shape, ref)
    assert got_tree == ref_tree

    got = np.asarray(model.apply(variables, jnp.asarray(img)))
    want = torch_full(img, sd)
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_bare_head_naming_and_padding(rng):
    sd = _timm_sd(rng)
    sd['head.weight'] = sd.pop('head.fc.weight')
    sd['head.bias'] = sd.pop('head.fc.bias')
    variables = convert_swinv2(sd, DEPTHS)
    model = SwinV2(num_classes=NCLS, embed_dim=EMBED, depths=DEPTHS,
                   num_heads=HEADS, window=WIN)
    # 56x56 -> 14x14 tokens: stage0 pads 14->16 for window 4? no —
    # 14 isn't a multiple of 4, so the pad/crop path runs; stage1 at
    # 7x7 pads to 8.
    img = rng.rand(1, 56, 56, 3).astype(np.float32)
    out = np.asarray(model.apply(variables, jnp.asarray(img)))
    assert out.shape == (1, NCLS) and np.isfinite(out).all()


def test_tagger_flax_backend(rng, tmp_path):
    """Tagger with the native SwinV2 backend: timm ckpt on disk +
    selected_tags.csv → thresholded (tags, characters) like the
    reference's label_cv2_bgr."""
    from cartoonsegmentation_tpu.models.tagger import Tagger

    sd = _timm_sd(rng)
    ck = tmp_path / 'wd.ckpt'
    torch.save({k: torch.tensor(v) for k, v in sd.items()}, ck)
    with open(tmp_path / 'selected_tags.csv', 'w') as f:
        f.write('tag_id,name,category,count\n')
        f.write('1,general,9,1\n2,sensitive,9,1\n'
                '3,questionable,9,1\n4,explicit,9,1\n')
        for i in range(NCLS - 4):
            f.write(f'{5 + i},tag{i},{4 if i == 0 else 0},1\n')

    t = Tagger(str(ck), backend='flax', general_thr=-1.0,
               character_thr=-1.0, input_size=32,
               swin_kwargs=dict(num_classes=NCLS, embed_dim=EMBED,
                                depths=DEPTHS, num_heads=HEADS,
                                window=WIN))
    assert t.backend == 'flax'
    img = (rng.rand(40, 24, 3) * 255).astype(np.uint8)
    tags, chars = t.label_cv2_bgr(img)
    # thr -1 → every non-rating tag fires; character subset = tag0
    assert tags == [f'tag{i}' for i in range(NCLS - 4)]
    assert chars == ['tag0']

    # numeric parity with the oracle on the exact preprocessed input
    x = t._prep(img)
    want = 1.0 / (1.0 + np.exp(-torch_full(x, sd)))[0]
    got = np.asarray(t._fwd(t._variables, x))[0]
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_wd_base_config_shapes():
    """Production WD geometry (448 input, window 8): abstract eval
    only — guards the stage-grid padding path (14 -> 16) and the
    parameter structure at full scale without running the compute."""
    from cartoonsegmentation_tpu.models.swinv2 import wd_tagger_swinv2

    model = wd_tagger_swinv2(num_classes=123)
    img = jnp.zeros((1, 448, 448, 3), jnp.float32)
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), img))
    out = jax.eval_shape(
        lambda v: model.apply(v, img), variables)
    assert out.shape == (1, 123)
    n_params = sum(int(np.prod(x.shape)) for x in
                   jax.tree_util.tree_leaves(variables['params']))
    assert 80e6 < n_params < 120e6        # SwinV2-B ≈ 87M + head


def test_rel_pos_helpers_match_timm_transcription():
    """INDEPENDENT timm swinv2 transcriptions of the log-CPB coords
    table and relative-position index must equal our builders exactly
    (shared helpers between model and torch oracle are blind to
    layout bugs — a BEiT cls-row swap slipped through that way)."""
    def timm_table(wh, ww, pwh=0, pww=0):
        import torch
        h = torch.arange(-(wh - 1), wh, dtype=torch.float32)
        w = torch.arange(-(ww - 1), ww, dtype=torch.float32)
        t = torch.stack(torch.meshgrid([h, w], indexing='ij'))
        t = t.permute(1, 2, 0).contiguous()
        if pwh > 0:
            t[:, :, 0] /= (pwh - 1)
            t[:, :, 1] /= (pww - 1)
        else:
            t[:, :, 0] /= max(wh - 1, 1)
            t[:, :, 1] /= max(ww - 1, 1)
        t *= 8
        t = torch.sign(t) * torch.log2(torch.abs(t) + 1.0) / \
            np.log2(8)
        return t.reshape(-1, 2).numpy()

    def timm_index(wh, ww):
        import torch
        coords = torch.stack(torch.meshgrid(
            [torch.arange(wh), torch.arange(ww)], indexing='ij'))
        flat = torch.flatten(coords, 1)
        rel = flat[:, :, None] - flat[:, None, :]
        rel = rel.permute(1, 2, 0).contiguous()
        rel[:, :, 0] += wh - 1
        rel[:, :, 1] += ww - 1
        rel[:, :, 0] *= 2 * ww - 1
        return rel.sum(-1).numpy()

    for (wh, ww, pwh, pww) in ((4, 4, 0, 0), (4, 6, 0, 0),
                               (7, 7, 12, 12), (3, 8, 6, 16)):
        np.testing.assert_allclose(
            relative_coords_table(wh, ww, pwh, pww),
            timm_table(wh, ww, pwh, pww), atol=1e-6)
        np.testing.assert_array_equal(
            relative_position_index(wh, ww), timm_index(wh, ww))
