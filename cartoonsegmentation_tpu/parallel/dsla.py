"""Dynamic Soft Label Assigner (DSLA) — fixed-shape JAX version.

Parity: the reference trains its RTMDet-Ins head through mmdet, whose
train_cfg for RTMDet is ``DynamicSoftLabelAssigner(topk=13)``
(the head itself is animeinsseg/models/rtmdet_inshead_custom.py; the
assigner is mmdet's, semantics reproduced here):

- candidate priors: centers strictly inside a gt box
- cost(g, a) = soft classification cost  (BCE against an IoU-soft
  label, scaled by |soft_label - p|^2)
           + 3.0 * (-log(IoU))
           + 10^(center_distance/stride - 3)
- per-gt dynamic k = clamp(int(sum of top-13 candidate IoUs), 1, ...)
- each gt takes its k lowest-cost candidates; a prior claimed by
  several gts goes to the one with the lowest cost.

TPU-first shape discipline: gts are padded to a static G with a
validity mask, "subset selection" becomes BIG-cost masking, and the
per-gt k-selection is a rank test (``argsort(argsort(cost)) < k``)
instead of boolean indexing — no dynamic shapes anywhere, so the
whole assignment jits inside the training step.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.rtmdet import box_iou

BIG = 1e8
EPS = 1e-7


def dynamic_soft_label_assign(priors: jnp.ndarray, strides: jnp.ndarray,
                              cls_logits: jnp.ndarray,
                              decoded_boxes: jnp.ndarray,
                              gt_boxes: jnp.ndarray,
                              gt_valid: jnp.ndarray,
                              gt_labels: jnp.ndarray = None,
                              topk: int = 13,
                              iou_weight: float = 3.0,
                              soft_center_radius: float = 3.0):
    """priors (A, 2) centers; strides (A,); cls_logits (A, C);
    decoded_boxes (A, 4) xyxy; gt_boxes (G, 4) xyxy (padded);
    gt_valid (G,) bool; gt_labels (G,) int (default all class 0).

    Returns (pos (A,) bool, gt_idx (A,) int32, assigned_iou (A,))."""
    A = priors.shape[0]
    G = gt_boxes.shape[0]
    C = cls_logits.shape[-1]
    if gt_labels is None:
        gt_labels = jnp.zeros((G,), jnp.int32)

    # --- candidate mask: prior center strictly inside the gt box ----
    lt = priors[None, :, :] - gt_boxes[:, None, :2]          # (G, A, 2)
    rb = gt_boxes[:, None, 2:] - priors[None, :, :]
    inside = jnp.concatenate([lt, rb], -1).min(-1) > 0       # (G, A)
    cand = inside & gt_valid[:, None]

    # --- pairwise IoU (G, A) -----------------------------------------
    iou = box_iou(gt_boxes, decoded_boxes)
    iou = jnp.where(cand, iou, 0.0)

    # --- soft center prior -------------------------------------------
    gt_cx = (gt_boxes[:, 0] + gt_boxes[:, 2]) / 2
    gt_cy = (gt_boxes[:, 1] + gt_boxes[:, 3]) / 2
    dist = jnp.sqrt((priors[None, :, 0] - gt_cx[:, None]) ** 2 +
                    (priors[None, :, 1] - gt_cy[:, None]) ** 2)
    dist = dist / strides[None, :]
    center_cost = jnp.power(10.0, dist - soft_center_radius)

    # --- soft classification cost ------------------------------------
    onehot = jax.nn.one_hot(gt_labels, C)                    # (G, C)
    soft_label = onehot[:, None, :] * iou[..., None]         # (G, A, C)
    p = jax.nn.sigmoid(cls_logits)[None]                     # (1, A, C)
    scale = jnp.abs(soft_label - p) ** 2.0
    bce = jnp.maximum(cls_logits, 0)[None] \
        - cls_logits[None] * soft_label \
        + jnp.log1p(jnp.exp(-jnp.abs(cls_logits)))[None]
    cls_cost = jnp.sum(bce * scale, -1)                      # (G, A)

    iou_cost = -jnp.log(iou + EPS) * iou_weight
    cost = cls_cost + iou_cost + center_cost
    cost = jnp.where(cand, cost, BIG)

    # --- dynamic k from the top-`topk` candidate IoUs per gt ----------
    k_iou = jax.lax.top_k(iou, min(topk, A))[0]              # (G, topk)
    dyn_k = jnp.clip(jnp.sum(k_iou, -1).astype(jnp.int32), 1, A)

    # --- per-gt k lowest-cost candidates via rank test -----------------
    order = jnp.argsort(cost, axis=1)
    rank = jnp.argsort(order, axis=1)                        # (G, A)
    match = (rank < dyn_k[:, None]) & cand & (cost < BIG)

    # --- conflict resolution: a prior keeps only its min-cost gt ------
    masked = jnp.where(match, cost, BIG)
    best_gt = jnp.argmin(masked, axis=0)                     # (A,)
    pos = jnp.min(masked, axis=0) < BIG
    match = match & (jnp.arange(G)[:, None] == best_gt[None, :])

    assigned_iou = jnp.where(pos, iou[best_gt, jnp.arange(A)], 0.0)
    return pos, best_gt.astype(jnp.int32), assigned_iou
