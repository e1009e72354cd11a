"""Tensor parallelism: Megatron-style parameter shardings for the
transformer families, driven entirely by GSPMD propagation.

The reference has no tensor parallelism at all (SURVEY.md §2.3 — its
only distributed machinery is DDP training), but this framework's
biggest single networks are transformers — BEiT-L (300M params, the
ZoeDepth backbone, models/beit.py) and the SD2 UNet (models/ldm.py)
— and serving them on a pod slice wants their weight matrices split
over ICI rather than replicated.  The TPU-native way needs no
parallel-layer classes: annotate each weight's NamedSharding and let
XLA insert the collectives.  The classic recipe (Megatron-LM,
arXiv 1909.08053) falls out of two rules:

- column-parallel for fan-out matmuls (qkv projection, MLP fc1):
  shard the OUTPUT features over 'model'; the activations come out
  sharded over heads / hidden, attention math stays local per head.
- row-parallel for fan-in matmuls (attention out-proj, MLP fc2):
  shard the INPUT features over 'model'; XLA emits one psum over
  'model' per block to rebuild the residual — the same two
  all-reduces per layer Megatron does by hand.

Everything that is per-feature on the sharded axis (biases of
column-parallel layers, the per-head relative-position bias table)
shards along with it; norms, layer-scale gammas, patch embeddings and
convolutions stay replicated.

Rules are matched on the '/'-joined parameter path, most-specific
first, so one table covers BEiT, SwinV2 and the LDM UNet attention
blocks without per-model layer rewrites.
"""
from __future__ import annotations

import re
from typing import Optional, Sequence, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


# (path regex, PartitionSpec) — first match wins; no match → replicated.
# Axis name 'model' throughout (parallel/mesh.py:make_mesh).
TRANSFORMER_TP_RULES: Tuple[Tuple[str, P], ...] = (
    # ---- BEiT / ViT attention (models/beit.py) ------------------
    # qkv packs q|k|v each (dim,); sharding the packed output axis
    # over 'model' keeps every head whole on one shard as long as
    # num_heads % model == 0 (the jnp.split at the q/k/v thirds and
    # the head reshape both preserve it).
    (r'qkv_kernel$', P(None, 'model')),
    (r'(q_bias|v_bias)$', P('model')),
    (r'rel_pos_table$', P(None, 'model')),        # (num_rel, heads)
    (r'attn/proj/kernel$', P('model', None)),     # row-parallel
    (r'attn/proj/bias$', P()),
    # ---- SwinV2 windowed attention (models/swinv2.py; shares the
    # qkv_kernel/q_bias/v_bias names with BEiT above) ---------------
    (r'logit_scale$', P('model')),                # (heads, 1, 1)
    (r'cpb_fc1/(kernel|bias)$', P()),             # tiny CPB hidden:
    (r'cpb_fc2/kernel$', P(None, 'model')),       # keep it whole, shard
    # ---- transformer MLP (beit mlp_fc*, timm/swin block fc*) ------
    (r'(mlp_fc1|mlp/fc1|fc1)/kernel$', P(None, 'model')),
    (r'(mlp_fc1|mlp/fc1|fc1)/bias$', P('model')),
    (r'(mlp_fc2|mlp/fc2|fc2)/kernel$', P('model', None)),
    (r'(mlp_fc2|mlp/fc2|fc2)/bias$', P()),
    # ---- LDM UNet/VAE attention (models/ldm.py: to_q/k/v Dense,
    # to_out row-parallel, GEGLU feed-forward ff/proj + ff/out) -----
    (r'to_(q|k|v)/kernel$', P(None, 'model')),
    (r'to_(q|k|v)/bias$', P('model')),
    (r'to_out/kernel$', P('model', None)),
    (r'to_out/bias$', P()),
    (r'ff/proj/kernel$', P(None, 'model')),       # GEGLU packed 2·inner
    (r'ff/proj/bias$', P('model')),
    (r'ff/out/kernel$', P('model', None)),
    (r'ff/out/bias$', P()),
)


def _spec_for(path: str, rules: Sequence[Tuple[str, P]],
              ndim: int) -> P:
    for pat, spec in rules:
        if re.search(pat, path):
            if len(spec) > ndim:      # defensive: rank-0 scalar etc.
                return P()
            return spec
    return P()


def tp_shardings(mesh: Mesh, params,
                 rules: Sequence[Tuple[str, P]] = TRANSFORMER_TP_RULES):
    """NamedSharding pytree for `params` under `mesh`.

    Any weight whose matched axis size does not divide by the 'model'
    axis extent falls back to replicated (so a mixed net — conv stem
    + transformer blocks — shards only where it can)."""
    msize = mesh.shape['model']

    def one(path, x):
        name = '/'.join(str(getattr(k, 'key', getattr(k, 'idx', k)))
                        for k in path)
        spec = _spec_for(name, rules, x.ndim)
        for ax, s in enumerate(spec):
            if s == 'model' and x.shape[ax] % msize != 0:
                spec = P()
                break
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(one, params)


def shard_params(mesh: Mesh, params,
                 rules: Sequence[Tuple[str, P]] = TRANSFORMER_TP_RULES):
    """Place a host/replicated param pytree with TP shardings."""
    return jax.device_put(params, tp_shardings(mesh, params, rules))


def tp_bench_block(n_model: int, depth: int = 1, img: int = 384,
                   repeats: int = 3) -> dict:
    """One REAL BEiT-L-config block (dim 1024, 16 heads, fc 4096 —
    the ZoeDepth-backbone shape, models/beit.py defaults; reference
    torch.hub core: depth_modules/zoedepth/models/base_models/
    midas.py:333-346) forwarded under the Megatron rules on a
    (1, n_model) mesh. Returns config + sharded fraction + best
    forward seconds. bench.py calls this when >1 real device is
    present; the realistic-shape CPU-mesh TP test reuses it."""
    import time

    import numpy as np_
    import jax.numpy as jnp

    from ..models.beit import BeitBackbone
    from ..utils.env import jit_init
    model = BeitBackbone(img_size=(img, img), depth=depth,
                         hooks=(depth - 1,))
    entropy = np_.random.default_rng()      # fresh values: the TPU
    # runtime memoizes identical-input executions across processes
    x = jnp.asarray(entropy.random((1, img, img, 3)), jnp.float32)
    variables = jit_init(model, jax.random.PRNGKey(0), x)
    devs = np_.array(jax.devices()[:n_model]).reshape(1, n_model)
    mesh = Mesh(devs, ('data', 'model'))
    frac = tp_sharded_fraction(mesh, variables)
    v_tp = shard_params(mesh, variables)
    fwd = jax.jit(model.apply)
    touch = jax.jit(lambda a: a.sum())
    jax.block_until_ready(fwd(v_tp, x))     # compile
    jax.block_until_ready(touch(x))
    best = float('inf')
    for _ in range(repeats):
        xi = jnp.asarray(entropy.random((1, img, img, 3)),
                         jnp.float32)
        # device_put/asarray is LAZY through the TPU tunnel — force
        # the H2D to complete BEFORE the timed region so fwd_s is
        # compute, not link (CLAUDE.md timing rules)
        jax.block_until_ready(touch(xi))
        t0 = time.time()
        jax.block_until_ready(fwd(v_tp, xi))
        best = min(best, time.time() - t0)
    return {'config': f'BEiT-L block dim1024 heads16 fc4096 '
                      f'img{img} depth{depth}',
            'n_model': int(n_model),
            'sharded_fraction': round(frac, 3),
            'fwd_s': round(best, 4)}


def tp_sharded_fraction(mesh: Mesh, params,
                        rules: Sequence[Tuple[str, P]] =
                        TRANSFORMER_TP_RULES) -> float:
    """Fraction of parameter COUNT that actually shards over 'model'
    — a quick sanity metric that the rules hit the big matrices."""
    sh = tp_shardings(mesh, params, rules)
    tot = hit = 0
    for x, s in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(
                        sh, is_leaf=lambda t: isinstance(t, NamedSharding))):
        n = int(getattr(x, 'size', 0))
        tot += n
        if any(ax == 'model' for ax in jax.tree_util.tree_leaves(
                tuple(s.spec))):
            hit += n
    return hit / max(tot, 1)
