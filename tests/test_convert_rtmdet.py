"""Detector checkpoint converter: the produced tree must line up
exactly with AnimeDetector.init's structure (catches any naming drift
between the converter's mmdet map and the Flax modules before real
weights ever arrive)."""
import numpy as np
import jax
import jax.numpy as jnp

from cartoonsegmentation_tpu.models.convert_rtmdet import convert_rtmdet
from cartoonsegmentation_tpu.models.rtmdet import AnimeDetector


class FakeSD(dict):
    """Fabricates arrays for any requested key and records access."""

    def __init__(self):
        super().__init__()
        self.keys_seen = set()

    def __getitem__(self, k):
        self.keys_seen.add(k)
        if k.endswith('.weight') and 'bn' not in k.split('.')[-2]:
            return np.zeros((2, 2, 1, 1), np.float32)
        return np.zeros((2,), np.float32)

    def __contains__(self, k):
        # mirror the real checkpoint: channel attention exists only in
        # the backbone CSP layers (mmdet CSPNeXt channel_attention=True;
        # the PAFPN CSP layers have none)
        if 'attention' in k and not k.startswith('backbone.'):
            return False
        return True


def _paths(tree, prefix=()):
    out = set()
    for k, v in tree.items():
        if isinstance(v, dict):
            out |= _paths(v, prefix + (k,))
        else:
            out.add(prefix + (k,))
    return out


def test_converter_structure_matches_model():
    sd = FakeSD()
    converted = convert_rtmdet(sd)

    model = AnimeDetector()  # full-size L
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3), jnp.float32)))
    want_params = _paths(jax.tree_util.tree_map(
        lambda x: 0, variables['params'],
        is_leaf=lambda x: not isinstance(x, dict)))
    got_params = _paths(converted['params'])

    missing = want_params - got_params
    extra = got_params - want_params
    assert not missing, f'converter missing {sorted(missing)[:10]}'
    assert not extra, f'converter extra {sorted(extra)[:10]}'

    want_stats = _paths(variables['batch_stats'])
    got_stats = _paths(converted['batch_stats'])
    assert want_stats == got_stats, (
        sorted(want_stats - got_stats)[:5],
        sorted(got_stats - want_stats)[:5])

    # all fabricated reads are well-formed mmdet key names
    assert all(k.startswith(('backbone.', 'neck.', 'bbox_head.'))
               for k in sd.keys_seen)


def test_rtmdet_converter_full_numeric(rng):
    """Full-forward numeric validation: build the mmdet-schema torch
    twin (torch_twins.TorchRTMDet), randomize, convert its state dict,
    and assert the Flax AnimeDetector reproduces every head map and
    the mask prototypes (catches transposed kernels / renamed layers
    that the structure test cannot)."""
    import torch
    from torch_twins import TorchRTMDet, randomize_

    deepen, widen = 0.33, 0.25
    tm = randomize_(TorchRTMDet(deepen, widen), seed=1).eval()
    converted = convert_rtmdet(tm.state_dict(), deepen, widen)

    x = rng.rand(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        tcls, treg, tkrn, tmask = tm(torch.from_numpy(x))

    model = AnimeDetector(deepen=deepen, widen=widen)
    jcls, jreg, jkrn, jmask = model.apply(
        converted, jnp.asarray(x.transpose(0, 2, 3, 1)))

    def chk(j, t, what):
        np.testing.assert_allclose(
            np.asarray(j), t.numpy().transpose(0, 2, 3, 1),
            rtol=1e-4, atol=1e-4, err_msg=what)

    for lv in range(3):
        chk(jcls[lv], tcls[lv], f'cls level {lv}')
        chk(jreg[lv], treg[lv], f'reg level {lv}')
        chk(jkrn[lv], tkrn[lv], f'kernel level {lv}')
    chk(jmask, tmask, 'mask prototypes')
