"""Tensor parallelism (parallel/tp.py): Megatron-style parameter
shardings must leave the transformer forwards numerically intact —
GSPMD inserts the per-block psums; we check against the replicated
single-device result.

Reference has no TP at all (SURVEY.md §2.3); this is beyond-reference
capability for serving the big transformer families (BEiT-L, SD2
UNet) over a pod slice.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cartoonsegmentation_tpu.parallel.tp import (
    shard_params, tp_sharded_fraction, tp_shardings)


def mesh_dm(data, model):
    devs = np.array(jax.devices()[:data * model]).reshape(data, model)
    return Mesh(devs, ('data', 'model'))


@pytest.fixture(scope='module')
def beit_small():
    from cartoonsegmentation_tpu.models.beit import BeitBackbone
    model = BeitBackbone(img_size=(64, 64), patch=16, dim=64, depth=2,
                         num_heads=8, hooks=(0, 1))
    x = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3),
                    jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    ref = jax.jit(model.apply)(variables, x)
    return model, variables, x, ref


def test_beit_tp_matches_replicated(beit_small):
    model, variables, x, ref = beit_small
    mesh = mesh_dm(1, 8)
    v_tp = shard_params(mesh, variables)
    out = jax.jit(model.apply)(v_tp, x)
    for a, b in zip(jax.device_get(ref), jax.device_get(out)):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5)


def test_beit_tp_actually_shards(beit_small):
    model, variables, x, ref = beit_small
    mesh = mesh_dm(1, 8)
    # the big matrices (qkv, proj, fc1, fc2 = the bulk of a ViT) shard
    assert tp_sharded_fraction(mesh, variables) > 0.5
    sh = tp_shardings(mesh, variables)
    qkv = sh['params']['block0']['attn']['qkv_kernel']
    assert qkv.spec == P(None, 'model')
    proj = sh['params']['block0']['attn']['proj']['kernel']
    assert proj.spec == P('model', None)
    # patch embed stays replicated
    pe = sh['params']['patch_embed']['kernel']
    assert pe.spec == P()


def test_beit_dp_times_tp(beit_small):
    model, variables, x, ref = beit_small
    mesh = mesh_dm(2, 4)
    v_tp = shard_params(mesh, variables)
    xb = jax.device_put(x, NamedSharding(mesh, P('data')))
    out = jax.jit(model.apply)(v_tp, xb)
    for a, b in zip(jax.device_get(ref), jax.device_get(out)):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5)


def test_indivisible_falls_back_replicated():
    from cartoonsegmentation_tpu.models.beit import BeitBackbone
    # dim=36 → qkv out 108, heads 6: 108 % 8 != 0 → replicated, and
    # the forward still runs exactly
    model = BeitBackbone(img_size=(32, 32), patch=16, dim=36, depth=1,
                         num_heads=6, hooks=(0,))
    x = jnp.asarray(np.random.RandomState(1).rand(1, 32, 32, 3),
                    jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    mesh = mesh_dm(1, 8)
    sh = tp_shardings(mesh, variables)
    assert sh['params']['block0']['attn']['qkv_kernel'].spec == P()
    ref = jax.jit(model.apply)(variables, x)
    out = jax.jit(model.apply)(shard_params(mesh, variables), x)
    np.testing.assert_allclose(jax.device_get(ref[0]),
                               jax.device_get(out[0]), rtol=2e-5,
                               atol=2e-5)


def test_ldm_transformer_block_tp():
    from cartoonsegmentation_tpu.models.ldm import BasicTransformerBlock
    block = BasicTransformerBlock(heads=8)
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.rand(2, 16, 64), jnp.float32)
    ctx = jnp.asarray(rng.rand(2, 5, 64), jnp.float32)
    variables = block.init(jax.random.PRNGKey(0), x, ctx)
    ref = jax.jit(block.apply)(variables, x, ctx)
    mesh = mesh_dm(1, 8)
    assert tp_sharded_fraction(mesh, variables) > 0.5
    out = jax.jit(block.apply)(shard_params(mesh, variables), x, ctx)
    np.testing.assert_allclose(jax.device_get(ref),
                               jax.device_get(out), rtol=2e-5,
                               atol=2e-5)


@pytest.mark.slow
def test_beit_L_block_realistic_shape():
    """TP at the REAL BEiT-L config (dim 1024, 16 heads, fc 4096,
    384px conv stem → 577 tokens — the ZoeDepth backbone shape,
    reference midas.py:333-346): numerics vs replicated + sharded
    fraction on the real config, 8-device CPU mesh (VERDICT r4
    item 5 — toy shapes say little about the L-sized matrices)."""
    from cartoonsegmentation_tpu.models.beit import BeitBackbone
    from cartoonsegmentation_tpu.parallel.tp import tp_bench_block
    from cartoonsegmentation_tpu.utils.env import jit_init

    # the shared helper runs the sharded forward at the real shape
    out = tp_bench_block(n_model=8, depth=1, img=384, repeats=1)
    assert out['n_model'] == 8
    # heads=16 divides 8; qkv/proj/fc1/fc2 are ~12.6M of the block's
    # params, patch embed + norms replicated → well above half
    assert out['sharded_fraction'] > 0.6
    assert 'dim1024 heads16 fc4096' in out['config']

    # numerics: TP forward == replicated forward at the same weights
    model = BeitBackbone(img_size=(384, 384), depth=1, hooks=(0,))
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, 384, 384, 3), jnp.float32)
    variables = jit_init(model, jax.random.PRNGKey(0), x)
    ref = jax.jit(model.apply)(variables, x)
    mesh = mesh_dm(1, 8)
    out_tp = jax.jit(model.apply)(shard_params(mesh, variables), x)
    for a, b in zip(jax.device_get(ref), jax.device_get(out_tp)):
        np.testing.assert_allclose(a, b, rtol=5e-5, atol=5e-5)


def test_swinv2_tp():
    from cartoonsegmentation_tpu.models.swinv2 import WindowAttentionV2
    attn = WindowAttentionV2(dim=64, num_heads=8, window_size=(4, 4))
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.rand(3, 16, 64), jnp.float32)
    variables = attn.init(jax.random.PRNGKey(0), x)
    ref = jax.jit(attn.apply)(variables, x)
    mesh = mesh_dm(1, 8)
    assert tp_sharded_fraction(mesh, variables) > 0.5
    out = jax.jit(attn.apply)(shard_params(mesh, variables), x)
    np.testing.assert_allclose(jax.device_get(ref),
                               jax.device_get(out), rtol=2e-5,
                               atol=2e-5)
