"""Data-parallel detector training step (jit over a mesh).

TPU-native counterpart of the reference's mmdet/DDP training of
RTMDet-Ins (SURVEY.md §3.5): batch sharded over the 'data' mesh axis,
params replicated, gradient all-reduce inserted by XLA over ICI —
replacing torch.distributed `reduce_mean`
(rtmdet_inshead_custom.py:118-124).

The loss is a functional RTMDet-Ins loss: classification
quality-focal BCE over all priors, GIoU on positives, mask dice on
positives via the dynamic-conv heads. Positives come from the
DynamicSoftLabelAssigner (parallel/dsla.py — the assigner mmdet uses
for the reference's RTMDet training) by default; a cheap
center-distance assigner remains available via ``assigner='center'``.

BatchNorm runs in TRAIN mode here (batch statistics over the global
jit batch → XLA cross-chip reductions = the reference's SyncBN), and
the updated running stats flow back through the aux output into
TrainState.batch_stats. This is load-bearing: with frozen init stats
nothing normalizes, intermediate activations grow to O(100), and the
dynamic-conv mask branch (which concatenates O(1) relative coords
with the mask features) plateaus at a constant prediction — the
train→mAP closure test (tests/test_train_map_closure.py) pins this.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models.rtmdet import (AnimeDetector, NUM_GEN_PARAMS, STRIDES,
                             box_iou, distance2bbox, dynamic_mask_heads,
                             level_priors)
from .dsla import dynamic_soft_label_assign


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def create_train_state(model: AnimeDetector, rng, input_hw: Tuple[int, int],
                       tx: optax.GradientTransformation) -> TrainState:
    dummy = jnp.zeros((1,) + tuple(input_hw) + (3,), jnp.float32)
    from ..utils.env import jit_init
    variables = jit_init(model, rng, dummy)
    params = variables['params']
    batch_stats = variables.get('batch_stats', {})
    return TrainState(params, batch_stats, tx.init(params),
                      jnp.zeros((), jnp.int32))


def _flatten_levels(cls_out, reg_out, krn_out, input_hw):
    scores, dists, kernels, priors, strides = [], [], [], [], []
    for lv, (c, r, k) in enumerate(zip(cls_out, reg_out, krn_out)):
        B, h, w = c.shape[0], c.shape[1], c.shape[2]
        scores.append(c.reshape(B, -1, c.shape[-1]))
        dists.append(r.reshape(B, -1, 4))
        kernels.append(k.reshape(B, -1, NUM_GEN_PARAMS))
        pr = level_priors(h, w, STRIDES[lv])
        priors.append(pr)
        strides.append(jnp.full((pr.shape[0],), float(STRIDES[lv])))
    return (jnp.concatenate(scores, 1), jnp.concatenate(dists, 1),
            jnp.concatenate(kernels, 1), jnp.concatenate(priors, 0),
            jnp.concatenate(strides, 0))


def _assign_targets(priors, strides, gt_boxes, gt_valid):
    """Center-distance assignment: each gt grabs its nearest prior on
    every level within its box; priors inside a gt box with center
    distance < 2.5 * stride are positive for that gt (nearest gt wins
    overlaps). Returns (pos_mask (A,), gt_idx (A,), iou-quality setup
    deferred to the loss)."""
    A = priors.shape[0]
    G = gt_boxes.shape[0]
    cx = (gt_boxes[:, 0] + gt_boxes[:, 2]) / 2
    cy = (gt_boxes[:, 1] + gt_boxes[:, 3]) / 2
    d2 = (priors[None, :, 0] - cx[:, None]) ** 2 + \
         (priors[None, :, 1] - cy[:, None]) ** 2          # (G, A)
    inside = ((priors[None, :, 0] >= gt_boxes[:, None, 0]) &
              (priors[None, :, 0] <= gt_boxes[:, None, 2]) &
              (priors[None, :, 1] >= gt_boxes[:, None, 1]) &
              (priors[None, :, 1] <= gt_boxes[:, None, 3]))
    near = d2 <= (2.5 * strides[None, :]) ** 2
    cand = inside & near & gt_valid[:, None]
    d2 = jnp.where(cand, d2, jnp.inf)
    gt_idx = jnp.argmin(d2, axis=0)                        # (A,)
    pos = jnp.isfinite(jnp.min(d2, axis=0))
    return pos, gt_idx


def detector_loss(model: AnimeDetector, params, batch_stats, batch,
                  mask_loss_stride: int = 4, assigner: str = 'dsla'):
    """batch: images (B,H,W,3), gt_boxes (B,G,4) xyxy, gt_valid (B,G),
    gt_masks (B,G,H,W), optional gt_ignore (B,G).

    Ignore-mask semantics (reference rtmdet_inshead_custom.py:186-248):
    instances flagged ``gt_ignore`` (bbox-only annotations, e.g.
    Manga109) participate fully in assignment / cls / bbox supervision
    but are excluded from the mask loss term.
    """
    images = batch['images']
    gt_ignore = batch.get('gt_ignore')
    if gt_ignore is None:
        gt_ignore = jnp.zeros(batch['gt_valid'].shape, bool)
    H, W = images.shape[1:3]
    variables = {'params': params}
    new_batch_stats = batch_stats
    if batch_stats:
        # train-mode BN: batch statistics over the GLOBAL jit batch
        # (XLA inserts cross-chip reductions on a sharded mesh — the
        # reference's SyncBN, mmdet norm_cfg 'SyncBN', riding ICI),
        # running stats updated for inference
        variables['batch_stats'] = batch_stats
        (cls_out, reg_out, krn_out, mask_feat), mut = model.apply(
            variables, images, train=True, mutable=['batch_stats'])
        new_batch_stats = mut['batch_stats']
    else:
        cls_out, reg_out, krn_out, mask_feat = model.apply(variables, images)
    scores, dists, kernels, priors, strides = _flatten_levels(
        cls_out, reg_out, krn_out, (H, W))

    def per_image(score, dist, kern, mfeat, gt_boxes, gt_valid, gt_masks,
                  gt_ign):
        boxes = distance2bbox(priors, dist)
        if assigner == 'dsla':
            pos, gt_idx, _ = dynamic_soft_label_assign(
                priors, strides, score, boxes, gt_boxes, gt_valid)
        elif assigner == 'center':
            pos, gt_idx = _assign_targets(priors, strides, gt_boxes,
                                          gt_valid)
        else:
            raise ValueError(f'unknown assigner: {assigner!r} '
                             "(use 'dsla' or 'center')")
        tgt_boxes = gt_boxes[gt_idx]
        # quality focal: target = IoU for positives, 0 elsewhere
        iou = jax.vmap(lambda b, t: box_iou(b[None], t[None])[0, 0])(
            boxes, tgt_boxes)
        quality = jnp.where(pos, iou, 0.0)
        logit = score[..., 0]
        p = jax.nn.sigmoid(logit)
        qfl = (jnp.abs(quality - p) ** 2) * \
            optax.sigmoid_binary_cross_entropy(logit, quality)
        n_pos = jnp.maximum(jnp.sum(pos), 1.0)
        loss_cls = jnp.sum(qfl) / n_pos

        # GIoU on positives
        giou = _giou(boxes, tgt_boxes)
        loss_box = jnp.sum(jnp.where(pos, 1.0 - giou, 0.0)) / n_pos

        # mask loss on top-K positives (static K); positives assigned
        # to ignore-mask gts supervise cls/bbox above but are excluded
        # here (reference rtmdet_inshead_custom.py:204-218)
        K = 8
        mask_ok = pos & ~gt_ign[gt_idx]
        pos_score = jnp.where(mask_ok, quality, -1.0)
        _, top = jax.lax.top_k(pos_score, K)
        sel_valid = mask_ok[top]
        logits = dynamic_mask_heads(mfeat, kern[top], priors[top],
                                    strides[top])
        mh, mw = logits.shape[1:]
        tgt = gt_masks[gt_idx[top]]
        s = mask_loss_stride
        tgt_ds = tgt[:, s // 2::s, s // 2::s]
        logits_up = jax.image.resize(
            logits, (K, H // s, W // s), method='linear')
        tgt_ds = tgt_ds[:, :H // s, :W // s].astype(jnp.float32)
        # dice loss per instance (reference rtmdet_inshead_custom.py:
        # 242-248 with mmdet DiceLoss: use_sigmoid, non-naive,
        # eps=5e-6, averaged over positives)
        probs = jax.nn.sigmoid(logits_up)
        eps = 5e-6
        inter = jnp.sum(probs * tgt_ds, axis=(1, 2))
        denom = jnp.sum(probs * probs, axis=(1, 2)) + eps \
            + jnp.sum(tgt_ds * tgt_ds, axis=(1, 2)) + eps
        dice = 1.0 - 2.0 * inter / denom
        loss_mask = jnp.sum(dice * sel_valid) / jnp.maximum(
            jnp.sum(sel_valid), 1.0)
        return loss_cls, loss_box, loss_mask

    lc, lb, lm = jax.vmap(per_image)(
        scores, dists, kernels, mask_feat, batch['gt_boxes'],
        batch['gt_valid'], batch['gt_masks'], gt_ignore)
    # reference loss weights (mmdet rtmdet-ins defaults): cls 1.0 QFL,
    # bbox 2.0 GIoU, mask 2.0 Dice
    loss = jnp.mean(lc) + 2.0 * jnp.mean(lb) + 2.0 * jnp.mean(lm)
    return loss, ({'loss': loss, 'loss_cls': jnp.mean(lc),
                   'loss_bbox': jnp.mean(lb), 'loss_mask': jnp.mean(lm)},
                  new_batch_stats)


def _giou(a, b):
    iou = jax.vmap(lambda x, y: box_iou(x[None], y[None])[0, 0])(a, b)
    lt = jnp.minimum(a[:, :2], b[:, :2])
    rb = jnp.maximum(a[:, 2:], b[:, 2:])
    area_c = jnp.maximum(rb - lt, 0).prod(-1)
    area_a = jnp.maximum(a[:, 2:] - a[:, :2], 0).prod(-1)
    area_b = jnp.maximum(b[:, 2:] - b[:, :2], 0).prod(-1)
    lt_i = jnp.maximum(a[:, :2], b[:, :2])
    rb_i = jnp.minimum(a[:, 2:], b[:, 2:])
    inter = jnp.maximum(rb_i - lt_i, 0).prod(-1)
    union = area_a + area_b - inter
    return iou - (area_c - union) / jnp.maximum(area_c, 1e-9)


def make_train_step(model: AnimeDetector, tx: optax.GradientTransformation,
                    assigner: str = 'dsla'):
    """jit-able DP train step: grads averaged across the sharded batch
    automatically (params replicated → XLA all-reduces)."""

    @jax.jit
    def train_step(state: TrainState, batch) -> Tuple[TrainState, Dict]:
        def loss_fn(p):
            return detector_loss(model, p, state.batch_stats, batch,
                                 assigner=assigner)
        (loss, (metrics, batch_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state,
                                       state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, batch_stats, opt_state,
                          state.step + 1), metrics

    return train_step


@jax.jit
def ema_update(ema_params, params, decay: jnp.ndarray):
    """Exponential moving average of the parameter pytree — the
    reference RTMDet recipe evaluates and ships EMA weights
    (mmdet ExpMomentumEMA, momentum 0.0002 ⇒ decay 0.9998; the
    published rtmdetl_e60.ckpt carries the EMA state). Warmup: pass a
    step-dependent decay min(decay, (1+step)/(10+step)) so early EMA
    is not dominated by the random init."""
    return jax.tree_util.tree_map(
        lambda e, p: e * decay + p * (1.0 - decay), ema_params, params)


def ema_decay_schedule(base_decay: float, step) -> jnp.ndarray:
    """Warmup-adjusted decay (timm/mmdet convention)."""
    step = jnp.asarray(step, jnp.float32)
    return jnp.minimum(jnp.asarray(base_decay, jnp.float32),
                       (1.0 + step) / (10.0 + step))
