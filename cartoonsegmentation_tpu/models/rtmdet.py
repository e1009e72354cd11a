"""RTMDet-Ins head + full anime instance-segmentation detector.

TPU-native, static-shape re-design of the reference's mmdet pipeline
(animeinsseg/models/rtmdet_inshead_custom.py and the registry-built
RTMDet-Ins-L, SURVEY.md #3/#4):

- SepBN head: conv stacks shared across levels, per-level BN and
  per-level 1x1 prediction convs (cls / reg / kernel)
- MaskFeatModule: multi-level fusion → 8 prototype channels
- dynamic-conv mask branch: the reference runs one grouped conv2d per
  image with `groups=num_inst` (rtmdet_inshead_custom.py:253-303);
  here the per-instance generated 1x1 convs become batched einsums
  over a *padded* instance axis — fully static, MXU-friendly
- fixed-shape postprocess: topk → class-agnostic NMS (O(K²) IoU
  matrix, K static) → padded instances; replaces mmcv batched_nms
  (SURVEY.md §2.2 native-components table)
"""
from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .cspnext import CSPNeXt, CSPNeXtPAFPN, ConvBNAct

STRIDES = (8, 16, 32)
NUM_PROTOTYPES = 8
DYCONV_CHANNELS = 8
# dynamic conv parameter layout: 3 layers of 1x1 convs
# weights: (8+2)*8, 8*8, 8*1 ; biases: 8, 8, 1  → 169 params
WEIGHT_NUMS = ((NUM_PROTOTYPES + 2) * DYCONV_CHANNELS,
               DYCONV_CHANNELS * DYCONV_CHANNELS,
               DYCONV_CHANNELS * 1)
BIAS_NUMS = (DYCONV_CHANNELS, DYCONV_CHANNELS, 1)
NUM_GEN_PARAMS = sum(WEIGHT_NUMS) + sum(BIAS_NUMS)  # 169


class MaskFeatModule(nn.Module):
    """Fuse multi-level neck features into mask prototypes."""
    feat_channels: int = 256
    stacked_convs: int = 4
    num_prototypes: int = NUM_PROTOTYPES
    dtype: str | None = None

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        h0, w0 = feats[0].shape[-3], feats[0].shape[-2]
        fused = [feats[0]]
        for f in feats[1:]:
            fused.append(jax.image.resize(
                f, f.shape[:-3] + (h0, w0, f.shape[-1]), method='linear'))
        x = jnp.concatenate(fused, -1)
        # mmdet MaskFeatModule.fusion_conv: plain 1x1 conv (bias, no
        # BN/act) mapping num_levels*C back to C before the conv stack
        x = nn.Conv(feats[0].shape[-1], (1, 1), use_bias=True,
                    dtype=self.dtype, name='fusion_conv')(x)
        for i in range(self.stacked_convs):
            x = ConvBNAct(self.feat_channels, 3, dtype=self.dtype,
                          name=f'conv{i}')(x, train)
        return nn.Conv(self.num_prototypes, (1, 1), use_bias=True,
                       dtype=self.dtype, name='projection')(x)


class RTMDetInsSepBNHead(nn.Module):
    """Prediction head. Returns per-level (cls, reg, kernel) maps +
    mask prototype features."""
    num_classes: int = 1
    feat_channels: int = 256
    stacked_convs: int = 2
    dtype: str | None = None

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        nl = len(feats)
        # shared conv kernels across levels, separate BN per level:
        # instantiate level-0 convs and reuse their kernels via scope
        # sharing — implemented by creating shared nn.Conv modules.
        cls_convs = [nn.Conv(self.feat_channels, (3, 3), padding=1,
                             use_bias=False, dtype=self.dtype,
                             name=f'cls_conv{i}')
                     for i in range(self.stacked_convs)]
        reg_convs = [nn.Conv(self.feat_channels, (3, 3), padding=1,
                             use_bias=False, dtype=self.dtype,
                             name=f'reg_conv{i}')
                     for i in range(self.stacked_convs)]
        krn_convs = [nn.Conv(self.feat_channels, (3, 3), padding=1,
                             use_bias=False, dtype=self.dtype,
                             name=f'kernel_conv{i}')
                     for i in range(self.stacked_convs)]

        cls_out, reg_out, krn_out = [], [], []
        for lv, x in enumerate(feats):
            c = x
            for i in range(self.stacked_convs):
                c = cls_convs[i](c)
                c = nn.BatchNorm(use_running_average=not train,
                                 momentum=0.9, epsilon=1e-5,
                                 dtype=self.dtype,
                                 name=f'cls_bn_l{lv}_{i}')(c)
                c = nn.silu(c)
            r = x
            for i in range(self.stacked_convs):
                r = reg_convs[i](r)
                r = nn.BatchNorm(use_running_average=not train,
                                 momentum=0.9, epsilon=1e-5,
                                 dtype=self.dtype,
                                 name=f'reg_bn_l{lv}_{i}')(r)
                r = nn.silu(r)
            k = x
            for i in range(self.stacked_convs):
                k = krn_convs[i](k)
                k = nn.BatchNorm(use_running_average=not train,
                                 momentum=0.9, epsilon=1e-5,
                                 dtype=self.dtype,
                                 name=f'kernel_bn_l{lv}_{i}')(k)
                k = nn.silu(k)
            cls_out.append(nn.Conv(self.num_classes, (1, 1), use_bias=True,
                                   dtype=self.dtype,
                                   name=f'rtm_cls_l{lv}')(c))
            reg = nn.Conv(4, (1, 1), use_bias=True, dtype=self.dtype,
                          name=f'rtm_reg_l{lv}')(r)
            reg_out.append(nn.relu(reg) * STRIDES[lv])
            krn_out.append(nn.Conv(NUM_GEN_PARAMS, (1, 1), use_bias=True,
                                   dtype=self.dtype,
                                   name=f'rtm_kernel_l{lv}')(k))
        return cls_out, reg_out, krn_out


class AnimeDetector(nn.Module):
    """CSPNeXt-L + PAFPN + RTMDet-Ins head (single class)."""
    deepen: float = 1.0
    widen: float = 1.0
    dtype: str | None = None

    @nn.compact
    def __call__(self, images, train: bool = False):
        feats = CSPNeXt(self.deepen, self.widen, dtype=self.dtype,
                        name='backbone')(images, train)
        neck = CSPNeXtPAFPN(
            tuple(int(c * self.widen) for c in (256, 512, 1024)),
            int(256 * self.widen), max(round(3 * self.deepen), 1),
            dtype=self.dtype, name='neck')(feats, train)
        cls_out, reg_out, krn_out = RTMDetInsSepBNHead(
            dtype=self.dtype, name='bbox_head')(neck, train)
        mask_feat = MaskFeatModule(dtype=self.dtype,
                                   name='mask_head')(neck, train)
        # emit f32 regardless of the compute dtype: postprocess (score
        # sigmoid, box decode, NMS IoU, dynamic mask convs) runs in f32
        f32 = lambda t: jnp.asarray(t, jnp.float32)
        return (tuple(f32(c) for c in cls_out),
                tuple(f32(r) for r in reg_out),
                tuple(f32(k) for k in krn_out), f32(mask_feat))


# ---------------------------------------------------------------------------
# static-shape postprocessing
# ---------------------------------------------------------------------------

def level_priors(h: int, w: int, stride: int) -> jnp.ndarray:
    """(h*w, 2) prior centers: (x, y) = grid * stride, offset 0
    (mmdet MlvlPointGenerator with offset=0)."""
    ys = jnp.arange(h, dtype=jnp.float32) * stride
    xs = jnp.arange(w, dtype=jnp.float32) * stride
    xx, yy = jnp.meshgrid(xs, ys)
    return jnp.stack([xx.reshape(-1), yy.reshape(-1)], -1)


def distance2bbox(priors: jnp.ndarray, dist: jnp.ndarray) -> jnp.ndarray:
    """(l, t, r, b) distances → (x1, y1, x2, y2)."""
    x1 = priors[:, 0] - dist[:, 0]
    y1 = priors[:, 1] - dist[:, 1]
    x2 = priors[:, 0] + dist[:, 2]
    y2 = priors[:, 1] + dist[:, 3]
    return jnp.stack([x1, y1, x2, y2], -1)


def box_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU of xyxy boxes (N,4)x(M,4) → (N,M)."""
    area_a = jnp.maximum(a[:, 2] - a[:, 0], 0) * \
        jnp.maximum(a[:, 3] - a[:, 1], 0)
    area_b = jnp.maximum(b[:, 2] - b[:, 0], 0) * \
        jnp.maximum(b[:, 3] - b[:, 1], 0)
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    return inter / jnp.maximum(area_a[:, None] + area_b[None, :] - inter,
                               1e-9)


def nms_fixed(boxes: jnp.ndarray, scores: jnp.ndarray, iou_thr: float,
              max_out: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Class-agnostic NMS over a fixed candidate set.

    boxes (K,4) sorted by caller or not — we sort internally. Returns
    (keep_indices (max_out,), keep_mask (max_out,)). Greedy suppression
    via a lax.scan over the score-ordered list (static K iterations;
    the O(K²) IoU matrix is one MXU-friendly batched op).
    """
    K = boxes.shape[0]
    order = jnp.argsort(-scores)
    b = boxes[order]
    iou = box_iou(b, b)

    def step(alive, i):
        keep_i = alive[i]
        # suppress everything with IoU > thr against i (only if kept)
        suppress = (iou[i] > iou_thr) & keep_i
        alive = alive & (~suppress | (jnp.arange(K) <= i))
        return alive, keep_i

    alive0 = jnp.ones((K,), jnp.bool_)
    alive, kept = jax.lax.scan(step, alive0, jnp.arange(K))
    kept_scores = jnp.where(kept, scores[order], -1.0)
    top = jnp.argsort(-kept_scores)[:max_out]
    return order[top], kept[top] & (kept_scores[top] > -1.0)


def dynamic_mask_heads(mask_feat: jnp.ndarray, kernels: jnp.ndarray,
                       priors_xy: jnp.ndarray, strides: jnp.ndarray
                       ) -> jnp.ndarray:
    """Per-instance dynamic 1x1 conv stack as batched einsums.

    mask_feat: (H, W, 8); kernels: (N, 169); priors_xy: (N, 2);
    strides: (N,). Returns mask logits (N, H, W).
    Parity: rtmdet_inshead_custom.py:253-303 (_mask_predict_by_feat_
    single) — relative coords = (prior - coord)/(stride*8), then
    3 dynamic 1x1 convs with relu between.
    """
    H, W = mask_feat.shape[:2]
    coord = level_priors(H, W, STRIDES[0]).reshape(H, W, 2)
    rel = (priors_xy[:, None, None, :] - coord[None]) \
        / (strides[:, None, None, None] * 8.0)           # (N,H,W,2)
    feat = jnp.concatenate(
        [rel, jnp.broadcast_to(mask_feat[None],
                               (rel.shape[0], H, W, NUM_PROTOTYPES))], -1)

    # unpack dynamic params
    o = 0
    ws, bs = [], []
    shapes_in = (NUM_PROTOTYPES + 2, DYCONV_CHANNELS, DYCONV_CHANNELS)
    shapes_out = (DYCONV_CHANNELS, DYCONV_CHANNELS, 1)
    for wn, cin, cout in zip(WEIGHT_NUMS, shapes_in, shapes_out):
        ws.append(kernels[:, o:o + wn].reshape(-1, cout, cin))
        o += wn
    for bn, cout in zip(BIAS_NUMS, shapes_out):
        bs.append(kernels[:, o:o + bn])
        o += bn

    x = feat
    for i, (w, b) in enumerate(zip(ws, bs)):
        x = jnp.einsum('nhwc,noc->nhwo', x, w) + b[:, None, None, :]
        if i < len(ws) - 1:
            x = nn.relu(x)
    return x[..., 0]


@functools.partial(jax.jit, static_argnames=(
    'pre_topk', 'max_det', 'input_h', 'input_w'))
def postprocess(cls_out, reg_out, krn_out, mask_feat,
                score_thr: float = 0.3, iou_thr: float = 0.6,
                mask_thr: float = 0.3, pre_topk: int = 512,
                max_det: int = 16, input_h: int = 640,
                input_w: int = 640):
    """Head maps → padded instances (masks at input resolution).

    Returns dict(bboxes (D,4) xyxy, scores (D,), valid (D,),
    masks (D, input_h, input_w) bool) with D = max_det static.
    """
    scores_all, dists_all, kernels_all, priors_all, strides_all = \
        [], [], [], [], []
    for lv, (c, r, k) in enumerate(zip(cls_out, reg_out, krn_out)):
        h, w = c.shape[-3], c.shape[-2]
        scores_all.append(jax.nn.sigmoid(
            c.reshape(-1, c.shape[-1]).max(-1)))
        dists_all.append(r.reshape(-1, 4))
        kernels_all.append(k.reshape(-1, NUM_GEN_PARAMS))
        pr = level_priors(h, w, STRIDES[lv])
        priors_all.append(pr)
        strides_all.append(jnp.full((pr.shape[0],), float(STRIDES[lv])))
    scores = jnp.concatenate(scores_all)
    dists = jnp.concatenate(dists_all)
    kernels = jnp.concatenate(kernels_all)
    priors = jnp.concatenate(priors_all)
    strides = jnp.concatenate(strides_all)

    k = min(pre_topk, scores.shape[0])
    top_scores, top_idx = jax.lax.top_k(scores, k)
    boxes = distance2bbox(priors[top_idx], dists[top_idx])

    keep_idx, keep_mask = nms_fixed(boxes, top_scores, iou_thr, max_det)
    det_scores = top_scores[keep_idx] * keep_mask
    det_valid = keep_mask & (det_scores > score_thr)
    det_boxes = boxes[keep_idx] * det_valid[:, None]
    det_kernels = kernels[top_idx[keep_idx]]
    det_priors = priors[top_idx[keep_idx]]
    det_strides = strides[top_idx[keep_idx]]

    logits = dynamic_mask_heads(mask_feat[0] if mask_feat.ndim == 4
                                else mask_feat,
                                det_kernels, det_priors, det_strides)
    # upsample from stride-8 to input resolution, sigmoid, threshold
    probs = jax.nn.sigmoid(logits)
    probs = jax.image.resize(
        probs, (probs.shape[0], input_h, input_w), method='linear')
    masks = (probs > mask_thr) & det_valid[:, None, None]
    return {'bboxes': det_boxes, 'scores': det_scores,
            'valid': det_valid, 'masks': masks}
