"""ZoeDepth stack tests: BEiT block torch parity, rel-pos index
correctness, full-model forward shapes, flip-TTA wrapper."""
import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn as tnn

from cartoonsegmentation_tpu.models.beit import (BeitBlock,
                                                 rel_pos_index)
from cartoonsegmentation_tpu.models.zoedepth import (ZoeDepth, infer_zoe,
                                                     log_binomial)


def test_rel_pos_index_properties():
    idx = rel_pos_index(3, 3)
    n = 9
    assert idx.shape == (n + 1, n + 1)
    num_rel = 25
    # cls entries — timm gen_relative_position_index layout:
    # row 0 (cls query) = num-3, col 0 (cls key) = num-2,
    # corner (cls-cls) = num-1 for a table of size num_rel+3
    assert (idx[0, 1:] == num_rel).all()
    assert (idx[1:, 0] == num_rel + 1).all()
    assert idx[0, 0] == num_rel + 2
    # symmetric displacement: idx[i,j] of (dy,dx) equals idx of (-dy,-dx)
    center = idx[5, 5]  # self-pair → zero displacement bucket
    assert (np.diag(idx)[1:] == center).all()
    assert idx[1:, 1:].min() >= 0 and idx[1:, 1:].max() < num_rel


def test_beit_block_vs_torch(rng):
    """Flax BEiT block vs an explicit torch computation with the same
    weights (layer scale + q/v-only bias + rel pos bias)."""
    dim, heads, wh, ww = 32, 4, 3, 3
    N = wh * ww + 1
    blk = BeitBlock(dim, heads, (wh, ww))
    x = rng.rand(1, N, dim).astype(np.float32)
    params = blk.init(jax.random.PRNGKey(0), jnp.asarray(x))['params']
    # randomize
    params = jax.tree_util.tree_map(
        lambda a: jnp.asarray(rng.randn(*a.shape).astype(np.float32))
        * 0.1, params)
    got = np.asarray(blk.apply({'params': params}, jnp.asarray(x)))

    # torch re-computation
    p = jax.tree_util.tree_map(lambda a: torch.from_numpy(np.asarray(a)),
                               params)
    tx = torch.from_numpy(x)
    h = torch.nn.functional.layer_norm(
        tx, (dim,), p['norm1']['scale'], p['norm1']['bias'], 1e-6)
    qkv = h @ p['attn']['qkv_kernel']
    q, k, v = qkv.chunk(3, -1)
    q = q + p['attn']['q_bias']
    v = v + p['attn']['v_bias']
    hd = dim // heads

    def sp(t):
        return t.reshape(1, N, heads, hd).permute(0, 2, 1, 3)
    q, k, v = sp(q), sp(k), sp(v)
    idx = torch.from_numpy(rel_pos_index(wh, ww))
    bias = p['attn']['rel_pos_table'][idx].permute(2, 0, 1)[None]
    attn = torch.softmax((q * hd ** -0.5) @ k.transpose(-2, -1) + bias,
                         dim=-1)
    o = (attn @ v).permute(0, 2, 1, 3).reshape(1, N, dim)
    o = o @ p['attn']['proj']['kernel'] + p['attn']['proj']['bias']
    tx = tx + p['gamma_1'] * o
    h = torch.nn.functional.layer_norm(
        tx, (dim,), p['norm2']['scale'], p['norm2']['bias'], 1e-6)
    h = h @ p['mlp_fc1']['kernel'] + p['mlp_fc1']['bias']
    h = torch.nn.functional.gelu(h)
    h = h @ p['mlp_fc2']['kernel'] + p['mlp_fc2']['bias']
    want = (tx + p['gamma_2'] * h).numpy()
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_log_binomial_is_distribution():
    p = jnp.full((1, 4, 4, 1), 0.3)
    t = jnp.full((1, 4, 4, 1), 1.0)
    out = log_binomial(p, t, 16)
    np.testing.assert_allclose(np.asarray(out.sum(-1)), 1.0, rtol=1e-5)
    # mode near p*(K-1)
    assert abs(int(out[0, 0, 0].argmax()) - round(0.3 * 15)) <= 1


def test_zoedepth_forward_tiny(rng):
    """Tiny-geometry ZoeDepth (2 blocks) end to end."""
    import cartoonsegmentation_tpu.models.beit as beit_mod
    model = ZoeDepth(img_size=(64, 64))
    # shrink the backbone for test speed
    object.__setattr__(model, '__dict__', model.__dict__)
    x = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    # full-depth BEiT at 4x4 grid is affordable
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    d = out['metric_depth']
    assert d.shape[0] == 1 and d.shape[-1] == 1
    assert np.isfinite(np.asarray(d)).all()
    assert (np.asarray(d) >= 0).all()

    tta = infer_zoe(model, variables, x)
    assert tta.shape == (1, 64, 64, 1)


class _FakeZoe:
    """Stub whose 'metric depth' is the input red channel at input
    resolution — makes the pad/resize/crop arithmetic of
    _infer_pad_aug exactly checkable."""

    def __init__(self, img_size):
        self.img_size = img_size

    def apply(self, variables, x):
        return {'metric_depth': x[..., :1]}


def test_zoe_pad_tta(rng):
    """Padding-augmentation arithmetic parity (depth_model.py:57-96):
    pad_h = int(sqrt(h/2)*fh) reflect padding, bicubic resize back,
    crop — verified against an explicit oracle composition."""
    import math
    from cartoonsegmentation_tpu.models.zoedepth import (_infer_pad_aug,
                                                         pad_tta_amounts)

    for (h, w) in [(384, 512), (64, 64), (576, 1024)]:
        ph, pw = pad_tta_amounts(h, w)
        assert ph == int(math.sqrt(h / 2) * 3)
        assert pw == int(math.sqrt(w / 2) * 3)

    x = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    # pad 16 each side -> 96x96; model grid == padded size, so with an
    # identity depth stub the pad+crop must return the input exactly
    assert pad_tta_amounts(64, 64) == (16, 16)
    out = _infer_pad_aug(_FakeZoe((96, 96)), None, x, pad_input=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x[..., :1]),
                               atol=1e-6)
    # pad_input=False is a plain forward (after the grid resize)
    out = _infer_pad_aug(_FakeZoe((64, 64)), None, x, pad_input=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x[..., :1]),
                               atol=1e-6)

    # model grid != padded size: oracle = crop(resize_back(
    #   model(resize_to_grid(pad(x)))))  with cubic resizes
    out = _infer_pad_aug(_FakeZoe((48, 48)), None, x, pad_input=True)
    xp = jnp.pad(x, ((0, 0), (16, 16), (16, 16), (0, 0)), mode='reflect')
    small = jax.image.resize(xp, (1, 48, 48, 3), method='cubic')
    up = jax.image.resize(small[..., :1], (1, 96, 96, 1), method='cubic')
    expected = up[:, 16:-16, 16:-16]
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                               atol=1e-6)

    # flip aug: average of the straight and mirrored pad-aug passes
    fake = _FakeZoe((96, 96))
    tta = infer_zoe(fake, None, x, with_flip_aug=True, pad_input=True)
    a = _infer_pad_aug(fake, None, x, True)
    b = _infer_pad_aug(fake, None, x[..., ::-1, :], True)[..., ::-1, :]
    np.testing.assert_allclose(np.asarray(tta),
                               np.asarray(0.5 * (a + b)), atol=1e-6)
