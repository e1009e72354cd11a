"""Depth-estimation + mask-refinement training (data-parallel).

Parity targets:
- ZoeDepth trainer losses (reference depth_modules/zoedepth/trainers/
  loss.py + zoedepth_trainer.py:39-148): scale-invariant log (SILog)
  loss with variance focus 0.85, optional multi-scale gradient-L1
  loss; DDP rank-averaging is replaced by batch sharding over the
  'data' mesh axis (base_trainer.py:34,149,230 → XLA collectives).
- Mask-refine training (animeseg_refine/__init__.py:86-148 +
  isnet.py:44-76): multi-side BCE fusion with loss0_weight=5, F1/MAE
  validation metrics.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax


# ---------------------------------------------------------------------------
# losses
# ---------------------------------------------------------------------------

def silog_loss(pred: jnp.ndarray, target: jnp.ndarray,
               mask: jnp.ndarray, beta: float = 0.15) -> jnp.ndarray:
    """SILog = 10·sqrt(Var[g] + β·E[g]²), g = log(pred+α) −
    log(gt+α), α=1e-7, over valid pixels. Var is torch.var's
    UNBIASED estimator (÷ n−1) — reference loss.py:42-84 semantics,
    pinned by tests/test_reference_source_parity.py::
    test_reference_losses."""
    alpha = 1e-7
    m = mask.astype(pred.dtype)
    # where-select (not multiply) keeps masked-OUT garbage out of the
    # sums; VALID pixels must satisfy pred+alpha > 0 — that is the
    # caller's contract (make_zoe_train_step clips preds; a custom
    # apply_fn that emits pred <= -alpha at a valid pixel NaNs here,
    # same as the reference's torch.log would)
    g = jnp.where(m > 0,
                  jnp.log(pred + alpha) - jnp.log(target + alpha), 0.0)
    n = jnp.maximum(m.sum(), 2.0)
    mean_g = g.sum() / n
    var_g = (jnp.where(m > 0, (g - mean_g) ** 2, 0.0)).sum() / (n - 1.0)
    return 10.0 * jnp.sqrt(var_g + beta * mean_g ** 2)


def grad_l1_loss(pred: jnp.ndarray, target: jnp.ndarray,
                 mask: jnp.ndarray) -> jnp.ndarray:
    """Gradient-magnitude + gradient-angle L1 on the shared [1:, 1:]
    grid (reference loss.py:96-135 grad/grad_mask/GradL1Loss):
    mag = dx² + dy², angle = atan(dy/(dx+1e-10)), both L1-averaged
    over grad_mask(mask) = mask∧mask_left∧mask_up."""
    m = (mask[..., 1:, 1:, :] * mask[..., 1:, :-1, :]
         * mask[..., :-1, 1:, :]).astype(pred.dtype)

    def g(x):
        dx = x[..., 1:, 1:, :] - x[..., 1:, :-1, :]
        dy = x[..., 1:, 1:, :] - x[..., :-1, 1:, :]
        # sanitize masked-OUT pixels before the division: 0/0 there
        # would make a NaN that the later multiply-by-mask cannot
        # remove (0*nan = nan, and grads leak through where). The
        # reference never computes these (boolean indexing); valid
        # pixels are untouched.
        safe_dx = jnp.where(m > 0, dx, 1.0)
        safe_dy = jnp.where(m > 0, dy, 0.0)
        return dx * dx + dy * dy, jnp.arctan(
            safe_dy / (safe_dx + 1e-10))

    mag_p, ang_p = g(pred)
    mag_t, ang_t = g(target)
    n = jnp.maximum(m.sum(), 1.0)
    return ((jnp.abs(mag_p - mag_t) * m).sum()
            + (jnp.abs(ang_p - ang_t) * m).sum()) / n


def multi_side_bce(sides, target: jnp.ndarray,
                   loss0_weight: float = 5.0) -> jnp.ndarray:
    """ISNet/U2Net fusion loss: BCE on every side output, the primary
    side weighted (isnet.py:44-61 muti_loss_fusion)."""
    t = target[..., None] if target.ndim == sides[0].ndim - 1 else target
    total = 0.0
    for i, s in enumerate(sides):
        bce = optax.sigmoid_binary_cross_entropy(s, t).mean()
        total = total + (loss0_weight if i == 0 else 1.0) * bce
    return total


def f1_mae(pred_prob: jnp.ndarray, target: jnp.ndarray,
           thr: float = 0.5) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Validation metrics of the refine trainer
    (animeseg_refine/__init__.py:44-59)."""
    p = (pred_prob > thr).astype(jnp.float32)
    t = (target > 0.5).astype(jnp.float32)
    tp = (p * t).sum()
    prec = tp / jnp.maximum(p.sum(), 1.0)
    rec = tp / jnp.maximum(t.sum(), 1.0)
    f1 = 2 * prec * rec / jnp.maximum(prec + rec, 1e-9)
    mae = jnp.abs(pred_prob - target).mean()
    return f1, mae


# ---------------------------------------------------------------------------
# train steps (generic over the model apply fn)
# ---------------------------------------------------------------------------

class SimpleState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def make_depth_train_step(apply_fn: Callable, tx, w_si: float = 1.0,
                          w_grad: float = 0.0):
    """apply_fn(params, images) → depth (B, H, W, 1). Batch sharded
    over 'data' → XLA inserts the gradient all-reduce."""

    @jax.jit
    def step(state: SimpleState, batch: Dict):
        def loss_fn(p):
            pred = apply_fn(p, batch['images'])
            mask = batch['mask']
            l_si = silog_loss(pred, batch['depth'], mask)
            loss = w_si * l_si
            metrics = {'l_si': l_si}
            if w_grad > 0:
                l_g = grad_l1_loss(pred, batch['depth'], mask)
                loss = loss + w_grad * l_g
                metrics['l_grad'] = l_g
            metrics['loss'] = loss
            return loss, metrics

        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state,
                                       state.params)
        params = optax.apply_updates(state.params, updates)
        return SimpleState(params, opt_state, state.step + 1), metrics

    return step


def make_refine_train_step(apply_fn: Callable, tx,
                           loss0_weight: float = 5.0):
    """apply_fn(params, x) → tuple of side logits (ISNet/U2Net)."""

    @jax.jit
    def step(state: SimpleState, batch: Dict):
        def loss_fn(p):
            sides = apply_fn(p, batch['input'])
            loss = multi_side_bce(sides, batch['target'], loss0_weight)
            f1, mae = f1_mae(jax.nn.sigmoid(sides[0][..., 0]),
                             batch['target'])
            return loss, {'loss': loss, 'f1': f1, 'mae': mae}

        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state,
                                       state.params)
        params = optax.apply_updates(state.params, updates)
        return SimpleState(params, opt_state, state.step + 1), metrics

    return step


# ---------------------------------------------------------------------------
# ZoeDepth-specific training pieces
# ---------------------------------------------------------------------------

def zoe_optimizer(lr: float = 1.6e-4, core_lr_factor: float = 10.0,
                  wd: float = 0.01, warmup_steps: int = 300,
                  total_steps: int = 30000):
    """Optimizer matching ZoeDepth's recipe (zoedepth trainers: AdamW,
    one-cycle LR, MiDaS core at lr/core_lr_factor via param groups —
    here an optax.multi_transform over the 'core' subtree)."""
    import optax as _optax

    def sched(peak):
        return _optax.warmup_cosine_decay_schedule(
            0.0, peak, warmup_steps, total_steps)

    def label_fn(params):
        return jax.tree_util.tree_map_with_path(
            lambda path, _: 'core'
            if any(getattr(k, 'key', None) == 'core' for k in path)
            else 'rest', params)

    return _optax.multi_transform(
        {'core': _optax.adamw(sched(lr / core_lr_factor),
                              weight_decay=wd),
         'rest': _optax.adamw(sched(lr), weight_decay=wd)},
        label_fn)


def make_zoe_nk_train_step(model, tx, w_si: float = 1.0,
                           w_domain: float = 100.0,
                           w_grad: float = 0.0):
    """Training step for models/zoedepth.ZoeDepthNK (reference
    zoedepth_nk_trainer.py:47-113): SILog on the routed metric depth
    plus a cross-entropy domain-classification loss on the router
    logits (config_zoedepth_nk.json: w_si=1, w_domain=100). The batch
    carries a scalar 'domain' label (0=nyu, 1=kitti) — the reference
    guarantees whole-batch domain homogeneity via the round-robin
    mixed loader."""
    from ..utils import resize_bilinear_ac

    @jax.jit
    def step(state: SimpleState, batch: Dict):
        def loss_fn(p):
            out = model.apply({'params': p}, batch['images'])
            pred = out['metric_depth']
            H, W = batch['images'].shape[1:3]
            pred = resize_bilinear_ac(pred, H, W)
            mask = batch['mask']
            l_si = silog_loss(pred, batch['depth'], mask)
            labels = jnp.full((out['domain_logits'].shape[0],),
                              batch['domain'], jnp.int32)
            l_dom = optax.softmax_cross_entropy_with_integer_labels(
                out['domain_logits'], labels).mean()
            loss = w_si * l_si + w_domain * l_dom
            metrics = {'l_si': l_si, 'l_domain': l_dom}
            if w_grad > 0:
                l_g = grad_l1_loss(pred, batch['depth'], mask)
                loss = loss + w_grad * l_g
                metrics['l_grad'] = l_g
            metrics['loss'] = loss
            return loss, metrics

        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state,
                                       state.params)
        params = optax.apply_updates(state.params, updates)
        return SimpleState(params, opt_state, state.step + 1), metrics

    return step


def make_zoe_train_step(model, tx, min_depth: float = 1e-3,
                        max_depth: float = 10.0):
    """Training step for models/zoedepth.ZoeDepth: the model predicts
    at half resolution, so predictions are upsampled (align-corners,
    like DepthModel.infer in the reference) to the label grid before
    the SILog loss."""
    from ..utils import resize_bilinear_ac

    def apply_fn(params, images):
        pred = model.apply({'params': params}, images)
        if isinstance(pred, dict):
            pred = pred['metric_depth']
        H, W = images.shape[1:3]
        pred = resize_bilinear_ac(pred, H, W)
        return jnp.clip(pred, min_depth, max_depth)

    return make_depth_train_step(apply_fn, tx)
