"""Pix2pix depth-merge generator: converter structure at full
unet_1024 size + full-forward numeric twin at reduced geometry."""
import numpy as np
import jax
import jax.numpy as jnp
import torch

from cartoonsegmentation_tpu.models.pix2pix4depth import (
    Pix2Pix4Depth, convert_pix2pix4depth, merge_depths,
    minmax_normalize)
from torch_twins import TorchPix2Pix4Depth, randomize_


def _paths(tree, prefix=()):
    out = set()
    for k, v in tree.items():
        if isinstance(v, dict):
            out |= _paths(v, prefix + (k,))
        else:
            out.add(prefix + (k,))
    return out


def test_pix2pix_converter_structure_full():
    """Full unet_1024 (10 downs, ngf 64): converted tree == init tree."""
    tm = TorchPix2Pix4Depth(ngf=64, num_downs=10)
    converted = convert_pix2pix4depth(tm.state_dict())
    model = Pix2Pix4Depth()
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 1024, 1024, 2), jnp.float32)))
    want = _paths(variables['params'])
    got = _paths(converted['params'])
    assert want == got, (sorted(want - got)[:5], sorted(got - want)[:5])
    # and shapes line up leaf by leaf
    jax.tree_util.tree_map(
        lambda a, b: None if a.shape == b.shape else
        (_ for _ in ()).throw(AssertionError((a.shape, b.shape))),
        jax.tree_util.tree_map(np.asarray, converted['params']),
        variables['params'])


def test_pix2pix_converter_full_numeric(rng):
    tm = randomize_(TorchPix2Pix4Depth(ngf=8, num_downs=6), seed=7,
                    scale=0.1).eval()
    converted = convert_pix2pix4depth(tm.state_dict(), num_downs=6,
                                      ngf=8)
    model = Pix2Pix4Depth(num_downs=6, ngf=8)

    x = rng.randn(1, 2, 64, 64).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()
    got = model.apply(converted, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got),
                               want.transpose(0, 2, 3, 1),
                               rtol=1e-4, atol=1e-5)


def test_merge_depths_wrapper(rng):
    model = Pix2Pix4Depth(num_downs=6, ngf=8)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 2), jnp.float32))
    outer = jnp.asarray(rng.rand(64, 64).astype(np.float32) * 7 + 3)
    inner = jnp.asarray(rng.rand(64, 64).astype(np.float32))
    out = merge_depths(model, variables, outer, inner)
    assert out.shape == (64, 64)
    o = np.asarray(out)
    assert np.isfinite(o).all() and o.min() >= 0.0 and o.max() <= 1.0
    # normalization matches the reference arithmetic
    n = np.asarray(minmax_normalize(outer))
    assert n.min() == -1.0 and n.max() == 1.0
