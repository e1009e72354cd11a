"""Native Mask R-CNN (torchvision `maskrcnn_resnet50_fpn` schema).

The reference's third detector option: `detector: maskrcnn` runs the
torchvision COCO model and keeps every class above score 0.3
(`anime_3dkenburns/kenburns_effect.py:843-886` maskrcnn_forward; the
option is advertised in `configs/3dkenburns_sam.yaml`'s comments).
This is a from-scratch NHWC Flax implementation of that network plus
the proposal/detection machinery, redesigned fixed-shape for XLA:

- anchors, per-level top-k, box decoding and clipping are static
  per input-canvas bucket — no ragged tensors anywhere;
- RPN per-level NMS and the per-class detection NMS reuse the
  repo's fixed-shape greedy NMS (models/rtmdet.py nms_fixed) with
  the standard category-offset trick;
- RoIAlign (sampling_ratio 2, legacy aligned=False semantics)
  gathers from a single flattened feature pyramid, one gather for
  all ROIs — level selection is an index offset, not control flow;
- invalid slots ride along with score -inf / zero boxes and are
  masked at the end (fixed proposal capacity 1000, detection
  capacity `max_det`).

`convert_maskrcnn` maps the torchvision checkpoint state dict onto
these modules (both the legacy flat conv keys and the newer
Conv2dNormActivation `.0.` nesting are accepted).
"""
from __future__ import annotations

import math
from typing import Dict, List, Mapping, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .convert import _np, conv_w, deconv_w, lin_w
from .rtmdet import nms_fixed

# torchvision GeneralizedRCNNTransform stats (0-1 RGB input)
MRCNN_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
MRCNN_STD = np.array([0.229, 0.224, 0.225], np.float32)

ANCHOR_SIZES = (32., 64., 128., 256., 512.)
ASPECTS = (0.5, 1.0, 2.0)
FPN_STRIDES = (4, 8, 16, 32, 64)
NUM_CLASSES = 91
BBOX_XFORM_CLIP = math.log(1000.0 / 16)


class FrozenBN(nn.Module):
    """torchvision FrozenBatchNorm2d: affine with stored statistics
    folded at call time (eps 1e-5, the modern torchvision default)."""
    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        shape = (self.features,)
        w = self.param('weight', nn.initializers.ones, shape)
        b = self.param('bias', nn.initializers.zeros, shape)
        rm = self.param('running_mean', nn.initializers.zeros, shape)
        rv = self.param('running_var', nn.initializers.ones, shape)
        scale = w / jnp.sqrt(rv + self.eps)
        return x * scale + (b - rm * scale)


def _conv(f, k, s=1, name=None, bias=False):
    return nn.Conv(f, (k, k), strides=(s, s),
                   padding=[(k // 2, k // 2)] * 2, use_bias=bias,
                   name=name)


class Bottleneck(nn.Module):
    width: int
    stride: int = 1
    project: bool = False

    @nn.compact
    def __call__(self, x):
        out = _conv(self.width, 1, name='conv1')(x)
        out = jax.nn.relu(FrozenBN(self.width, name='bn1')(out))
        out = _conv(self.width, 3, self.stride, name='conv2')(out)
        out = jax.nn.relu(FrozenBN(self.width, name='bn2')(out))
        out = _conv(self.width * 4, 1, name='conv3')(out)
        out = FrozenBN(self.width * 4, name='bn3')(out)
        if self.project:
            x = _conv(self.width * 4, 1, self.stride, name='down0')(x)
            x = FrozenBN(self.width * 4, name='down1')(x)
        return jax.nn.relu(out + x)


class ResNet50(nn.Module):
    """C2..C5 feature extractor (strides 4/8/16/32)."""
    blocks: Sequence[int] = (3, 4, 6, 3)

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(64, (7, 7), strides=(2, 2),
                    padding=[(3, 3), (3, 3)], use_bias=False,
                    name='conv1')(x)
        x = jax.nn.relu(FrozenBN(64, name='bn1')(x))
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        feats = []
        for li, (n, w) in enumerate(zip(self.blocks, (64, 128, 256,
                                                      512))):
            for bi in range(n):
                x = Bottleneck(w, stride=2 if (bi == 0 and li > 0)
                               else 1, project=(bi == 0),
                               name=f'layer{li + 1}_{bi}')(x)
            feats.append(x)
        return feats


class FPN(nn.Module):
    out_ch: int = 256

    @nn.compact
    def __call__(self, feats):
        inners = [nn.Conv(self.out_ch, (1, 1), name=f'inner{i}')(f)
                  for i, f in enumerate(feats)]
        outs = [None] * len(inners)
        last = inners[-1]
        outs[-1] = last
        for i in range(len(inners) - 2, -1, -1):
            H, W = inners[i].shape[1:3]
            up = jax.image.resize(last, last.shape[:1] + (H, W)
                                  + last.shape[3:], method='nearest')
            last = inners[i] + up
            outs[i] = last
        outs = [_conv(self.out_ch, 3, name=f'layer{i}', bias=True)(o)
                for i, o in enumerate(outs)]
        p6 = nn.max_pool(outs[-1], (1, 1), strides=(2, 2))
        return outs + [p6]


class RPNHead(nn.Module):
    num_anchors: int = 3

    @nn.compact
    def __call__(self, feats):
        conv = _conv(256, 3, name='conv', bias=True)
        cls = nn.Conv(self.num_anchors, (1, 1), name='cls_logits')
        reg = nn.Conv(self.num_anchors * 4, (1, 1), name='bbox_pred')
        out = []
        for f in feats:
            h = jax.nn.relu(conv(f))
            out.append((cls(h), reg(h)))
        return out


class BoxHead(nn.Module):
    @nn.compact
    def __call__(self, roi_feats):               # (N, 7, 7, 256)
        # torchvision flattens NCHW — transpose before reshape so the
        # fc6 kernel converts index-for-index
        x = roi_feats.transpose(0, 3, 1, 2).reshape(
            roi_feats.shape[0], -1)
        x = jax.nn.relu(nn.Dense(1024, name='fc6')(x))
        x = jax.nn.relu(nn.Dense(1024, name='fc7')(x))
        cls = nn.Dense(NUM_CLASSES, name='cls_score')(x)
        reg = nn.Dense(NUM_CLASSES * 4, name='bbox_pred')(x)
        return cls, reg


class MaskHead(nn.Module):
    @nn.compact
    def __call__(self, roi_feats):               # (N, 14, 14, 256)
        x = roi_feats
        for i in range(1, 5):
            x = jax.nn.relu(_conv(256, 3, name=f'mask_fcn{i}',
                                  bias=True)(x))
        x = jax.nn.relu(nn.ConvTranspose(
            256, (2, 2), strides=(2, 2), name='conv5_mask')(x))
        return nn.Conv(NUM_CLASSES, (1, 1), name='mask_fcn_logits')(x)


# ---------------------------------------------------------------------------
# anchors / box transforms (host precompute + device math)
# ---------------------------------------------------------------------------

def cell_anchors() -> List[np.ndarray]:
    """torchvision AnchorGenerator.generate_anchors per level
    (rounded half extents)."""
    out = []
    for s in ANCHOR_SIZES:
        hr = np.sqrt(np.asarray(ASPECTS))
        wr = 1.0 / hr
        ws, hs = wr * s, hr * s
        base = np.stack([-ws, -hs, ws, hs], 1) / 2
        out.append(np.round(base).astype(np.float32))
    return out


def level_anchors(h: int, w: int, stride: int,
                  cell: np.ndarray) -> np.ndarray:
    """(h*w*A, 4) xyxy anchors, torchvision grid order (row major,
    anchor fastest)."""
    sx = np.arange(w, dtype=np.float32) * stride
    sy = np.arange(h, dtype=np.float32) * stride
    gy, gx = np.meshgrid(sy, sx, indexing='ij')
    shifts = np.stack([gx, gy, gx, gy], -1).reshape(-1, 1, 4)
    return (shifts + cell[None]).reshape(-1, 4)


def decode_boxes(anchors: jnp.ndarray, deltas: jnp.ndarray,
                 weights=(1., 1., 1., 1.)) -> jnp.ndarray:
    """torchvision BoxCoder.decode_single."""
    aw = anchors[:, 2] - anchors[:, 0]
    ah = anchors[:, 3] - anchors[:, 1]
    ax = anchors[:, 0] + 0.5 * aw
    ay = anchors[:, 1] + 0.5 * ah
    dx, dy, dw, dh = [deltas[..., i] / weights[i] for i in range(4)]
    dw = jnp.minimum(dw, BBOX_XFORM_CLIP)
    dh = jnp.minimum(dh, BBOX_XFORM_CLIP)
    cx = dx * aw + ax
    cy = dy * ah + ay
    bw = jnp.exp(dw) * aw
    bh = jnp.exp(dh) * ah
    return jnp.stack([cx - bw / 2, cy - bh / 2,
                      cx + bw / 2, cy + bh / 2], -1)


def clip_boxes(boxes: jnp.ndarray, h, w) -> jnp.ndarray:
    """h/w may be traced scalars (the real image extent inside the
    padded canvas — torchvision clips to image_sizes, not the padded
    batch shape)."""
    return jnp.stack([jnp.clip(boxes[..., 0], 0, w),
                      jnp.clip(boxes[..., 1], 0, h),
                      jnp.clip(boxes[..., 2], 0, w),
                      jnp.clip(boxes[..., 3], 0, h)], -1)


def batched_nms_fixed(boxes, scores, cats, iou_thr, max_out):
    """Category-offset NMS on a fixed candidate set: shift each
    category's boxes to a disjoint region so cross-category pairs
    never overlap (torchvision batched_nms trick)."""
    extent = jnp.max(boxes) + 1.0
    off = cats.astype(boxes.dtype) * extent
    return nms_fixed(boxes + off[:, None], scores, iou_thr, max_out)


# ---------------------------------------------------------------------------
# RoIAlign over a flattened pyramid
# ---------------------------------------------------------------------------

def roi_align_pyramid(feats: Sequence[jnp.ndarray], boxes: jnp.ndarray,
                      out: int, sampling: int = 2,
                      canonical: Tuple[int, int] = (224, 4)
                      ) -> jnp.ndarray:
    """Legacy (aligned=False) multi-scale RoIAlign.

    feats: P2..P5, each (H_l, W_l, C); boxes (N, 4) xyxy image pixels.
    Level map: floor(4 + log2(sqrt(area)/224)) clamped to [2, 5]
    (torchvision LevelMapper). One gather serves all ROIs: levels are
    flattened into a single (sum H_l*W_l, C) table and the level
    choice becomes a row offset.
    """
    C = feats[0].shape[-1]
    flat = jnp.concatenate([f.reshape(-1, C) for f in feats], 0)
    sizes = np.array([f.shape[:2] for f in feats])          # (L, 2)
    offsets = np.concatenate([[0], np.cumsum(sizes[:, 0]
                                             * sizes[:, 1])])[:4]
    strides = np.asarray(FPN_STRIDES[:4], np.float32)

    area = jnp.maximum(boxes[:, 2] - boxes[:, 0], 0) \
        * jnp.maximum(boxes[:, 3] - boxes[:, 1], 0)
    k = jnp.floor(canonical[1] + jnp.log2(
        jnp.sqrt(area) / canonical[0] + 1e-6))
    lvl = jnp.clip(k, 2, 5).astype(jnp.int32) - 2            # (N,)

    scale = 1.0 / jnp.asarray(strides)[lvl]                  # (N,)
    Hl = jnp.asarray(sizes[:, 0])[lvl]
    Wl = jnp.asarray(sizes[:, 1])[lvl]
    base = jnp.asarray(offsets, jnp.int32)[lvl]

    x1 = boxes[:, 0] * scale
    y1 = boxes[:, 1] * scale
    rw = jnp.maximum(boxes[:, 2] * scale - x1, 1.0)
    rh = jnp.maximum(boxes[:, 3] * scale - y1, 1.0)
    bin_w = rw / out
    bin_h = rh / out

    g = out * sampling
    # sample grid: bin i, sub k → (i*sampling + k + 0.5) * bin/sampling
    idx = (jnp.arange(g) + 0.5) / sampling                   # (g,)
    ys = y1[:, None] + idx[None] * bin_h[:, None]            # (N, g)
    xs = x1[:, None] + idx[None] * bin_w[:, None]

    def bilinear(ys, xs, Hn, Wn, base):
        # torchvision roi_align: outside [-1, size] → 0; else clamp
        oob = (ys[:, :, None] < -1.0) | (ys[:, :, None] > Hn[:, None,
                                                             None]) \
            | (xs[:, None, :] < -1.0) | (xs[:, None, :] > Wn[:, None,
                                                             None])
        y = jnp.clip(ys, 0.0, None)
        x = jnp.clip(xs, 0.0, None)
        y0 = jnp.minimum(y.astype(jnp.int32), (Hn - 1)[:, None])
        x0 = jnp.minimum(x.astype(jnp.int32), (Wn - 1)[:, None])
        y1i = jnp.minimum(y0 + 1, (Hn - 1)[:, None])
        x1i = jnp.minimum(x0 + 1, (Wn - 1)[:, None])
        # torchvision: y_low >= H-1 collapses both taps to H-1 with
        # fractional weight 0 (not clip-to-1)
        ly = jnp.where(y1i > y0, jnp.clip(y - y0, 0.0, 1.0), 0.0)
        lx = jnp.where(x1i > x0, jnp.clip(x - x0, 0.0, 1.0), 0.0)

        def g2(yi, xi):                     # (N,g),(N,g) → (N,g,g,C)
            rows = base[:, None, None] + yi[:, :, None] * Wn[:, None,
                                                             None] \
                + xi[:, None, :]
            return flat[rows]
        v = g2(y0, x0) * ((1 - ly)[:, :, None] * (1 - lx)[:, None, :]
                          )[..., None] \
            + g2(y0, x1i) * ((1 - ly)[:, :, None] * lx[:, None, :]
                             )[..., None] \
            + g2(y1i, x0) * (ly[:, :, None] * (1 - lx)[:, None, :]
                             )[..., None] \
            + g2(y1i, x1i) * (ly[:, :, None] * lx[:, None, :]
                              )[..., None]
        return jnp.where(oob[..., None], 0.0, v)

    v = bilinear(ys, xs, Hl, Wl, base)                # (N, g, g, C)
    N = boxes.shape[0]
    v = v.reshape(N, out, sampling, out, sampling, C)
    return v.mean(axis=(2, 4))                         # (N, out, out, C)


# ---------------------------------------------------------------------------
# full model
# ---------------------------------------------------------------------------

class MaskRCNN(nn.Module):
    """One jitted program per canvas: image → fixed-capacity
    detections (boxes, labels, scores, 28x28 mask logits)."""
    pre_nms_top: int = 1000
    post_nms_top: int = 1000
    rpn_nms_thr: float = 0.7
    box_score_thr: float = 0.05
    box_nms_thr: float = 0.5
    max_det: int = 100
    box_candidates: int = 2048

    def setup(self):
        self.body = ResNet50()
        self.fpn = FPN()
        self.rpn_head = RPNHead()
        self.box_head = BoxHead()
        self.mask_head = MaskHead()

    def features(self, x):
        return self.fpn(self.body(x))

    def propose(self, feats, img_h, img_w):
        """RPN inference: per-level top-k → decode → clip → per-level
        NMS → global top post_nms_top (torchvision RegionProposal
        Network.filter_proposals)."""
        outs = self.rpn_head(feats)
        cell = cell_anchors()
        all_boxes, all_scores, all_lvl = [], [], []
        for lv, ((cls, reg), f) in enumerate(zip(outs, feats)):
            H, W = f.shape[1:3]
            anch = jnp.asarray(level_anchors(
                H, W, FPN_STRIDES[lv], cell[lv]))
            obj = cls.reshape(-1)
            delt = reg.reshape(-1, 4)
            k = min(self.pre_nms_top, obj.shape[0])
            top_obj, top = jax.lax.top_k(obj, k)
            boxes = decode_boxes(anch[top], delt[top])
            boxes = clip_boxes(boxes, img_h, img_w)
            ws = boxes[:, 2] - boxes[:, 0]
            hs = boxes[:, 3] - boxes[:, 1]
            score = jax.nn.sigmoid(top_obj)
            score = jnp.where((ws >= 1e-3) & (hs >= 1e-3), score,
                              -jnp.inf)
            all_boxes.append(boxes)
            all_scores.append(score)
            all_lvl.append(jnp.full((k,), lv, jnp.int32))
        boxes = jnp.concatenate(all_boxes)
        scores = jnp.concatenate(all_scores)
        lvls = jnp.concatenate(all_lvl)
        keep, mask = batched_nms_fixed(boxes, scores, lvls,
                                       self.rpn_nms_thr,
                                       self.post_nms_top)
        return boxes[keep], jnp.where(mask, scores[keep], -jnp.inf)

    def detect_boxes(self, feats, proposals, prop_scores,
                     img_h, img_w):
        """Fast R-CNN branch on the fixed proposal set."""
        roi = roi_align_pyramid([f[0] for f in feats[:4]], proposals,
                                out=7)
        cls, reg = self.box_head(roi)
        probs = jax.nn.softmax(cls, -1)
        P = proposals.shape[0]
        reg = reg.reshape(P, NUM_CLASSES, 4)
        boxes = decode_boxes(
            jnp.repeat(proposals, NUM_CLASSES, 0),
            reg.reshape(-1, 4), weights=(10., 10., 5., 5.))
        boxes = clip_boxes(boxes, img_h, img_w).reshape(
            P, NUM_CLASSES, 4)
        # drop background column; flatten (P * (C-1)) candidates
        boxes = boxes[:, 1:].reshape(-1, 4)
        scores = probs[:, 1:].reshape(-1)
        labels = jnp.tile(jnp.arange(1, NUM_CLASSES), (P,))
        valid_prop = (prop_scores > -jnp.inf)
        valid = jnp.repeat(valid_prop, NUM_CLASSES - 1)
        ws = boxes[:, 2] - boxes[:, 0]
        hs = boxes[:, 3] - boxes[:, 1]
        scores = jnp.where(valid & (scores > self.box_score_thr)
                           & (ws >= 1e-2) & (hs >= 1e-2),
                           scores, -jnp.inf)
        k = min(self.box_candidates, scores.shape[0])
        top_s, top = jax.lax.top_k(scores, k)
        keep, mask = batched_nms_fixed(boxes[top], top_s, labels[top],
                                       self.box_nms_thr, self.max_det)
        sel = top[keep]
        return (boxes[sel], labels[sel],
                jnp.where(mask, top_s[keep], 0.0), mask)

    def detect_masks(self, feats, boxes, labels):
        roi = roi_align_pyramid([f[0] for f in feats[:4]], boxes,
                                out=14)
        logits = self.mask_head(roi)              # (N, 28, 28, 91)
        pick = jax.nn.one_hot(labels, NUM_CLASSES,
                              dtype=logits.dtype)
        return jnp.einsum('nhwc,nc->nhw', logits, pick)

    def __call__(self, x, image_hw=None):
        """x (1, H, W, 3) normalized; image_hw optional traced (2,)
        array with the un-padded image extent (torchvision clips
        proposals/detections to image_sizes, not the /32 canvas).
        Returns dict with fixed-shape boxes (D,4) xyxy, labels (D,),
        scores (D,), mask logits (D, 28, 28), valid (D,)."""
        H, W = x.shape[1:3]
        if image_hw is None:
            ih, iw = H, W
        else:
            ih, iw = image_hw[0], image_hw[1]
        feats = self.features(x)
        proposals, pscores = self.propose(feats, ih, iw)
        boxes, labels, scores, mask = self.detect_boxes(
            feats, proposals, pscores, ih, iw)
        mlog = self.detect_masks(feats, boxes, labels)
        return {'boxes': boxes, 'labels': labels, 'scores': scores,
                'masks': mlog, 'valid': mask & (scores > 0)}


# ---------------------------------------------------------------------------
# mask pasting (host-side, numpy — once per image)
# ---------------------------------------------------------------------------

def expand_boxes(boxes: np.ndarray, M: int) -> np.ndarray:
    """torchvision roi_heads.expand_boxes + the .to(torch.int64) that
    follows it in paste_masks_in_image: scale each box by (M+2)/M
    about its center, then TRUNCATE toward zero (int64 cast — not
    round; a fractional part >= 0.5 still floors)."""
    scale = (M + 2.0) / M
    cx = (boxes[:, 0] + boxes[:, 2]) * 0.5
    cy = (boxes[:, 1] + boxes[:, 3]) * 0.5
    hw = (boxes[:, 2] - boxes[:, 0]) * 0.5 * scale
    hh = (boxes[:, 3] - boxes[:, 1]) * 0.5 * scale
    return np.stack([cx - hw, cy - hh, cx + hw, cy + hh],
                    1).astype(np.int64)


def paste_masks(mask_logits: np.ndarray, boxes: np.ndarray,
                h: int, w: int, thr: float = 0.5) -> np.ndarray:
    """torchvision paste_masks_in_image: pad the 28x28 probability by
    one cell, expand the box by (M+2)/M, bilinear to box size,
    paste clipped."""
    import cv2
    N, M = mask_logits.shape[:2]
    out = np.zeros((N, h, w), bool)
    eb = expand_boxes(boxes, M)
    prob = 1.0 / (1.0 + np.exp(-mask_logits.astype(np.float64)))
    for i in range(N):
        x1, y1, x2, y2 = eb[i]
        bw, bh = max(x2 - x1 + 1, 1), max(y2 - y1 + 1, 1)
        p = np.pad(prob[i], 1)
        m = cv2.resize(p.astype(np.float32), (bw, bh),
                       interpolation=cv2.INTER_LINEAR) > thr
        xs, xe = max(x1, 0), min(x2 + 1, w)
        ys, ye = max(y1, 0), min(y2 + 1, h)
        if xs < xe and ys < ye:
            out[i, ys:ye, xs:xe] = m[ys - y1:ye - y1, xs - x1:xe - x1]
    return out


# ---------------------------------------------------------------------------
# converter (torchvision maskrcnn_resnet50_fpn state dict)
# ---------------------------------------------------------------------------

def _bn_p(sd, pre):
    return {'weight': _np(sd[pre + '.weight']),
            'bias': _np(sd[pre + '.bias']),
            'running_mean': _np(sd[pre + '.running_mean']),
            'running_var': _np(sd[pre + '.running_var'])}


def _conv_p(sd, pre):
    out = {'kernel': conv_w(sd[pre + '.weight'])}
    if pre + '.bias' in sd:
        out['bias'] = _np(sd[pre + '.bias'])
    return out


def _dense_p(sd, pre):
    return {'kernel': lin_w(sd[pre + '.weight']),
            'bias': _np(sd[pre + '.bias'])}


def _flex_conv(sd, *candidates):
    """First candidate key present wins (legacy flat convs vs
    Conv2dNormActivation '.0' nesting across torchvision versions)."""
    for pre in candidates:
        if pre + '.weight' in sd:
            return _conv_p(sd, pre)
    raise KeyError(candidates)


def convert_maskrcnn(sd: Mapping) -> Dict:
    sd = dict(sd)
    body: Dict = {'conv1': _conv_p(sd, 'backbone.body.conv1'),
                  'bn1': _bn_p(sd, 'backbone.body.bn1')}
    for li, n in enumerate((3, 4, 6, 3)):
        for bi in range(n):
            pre = f'backbone.body.layer{li + 1}.{bi}'
            blk = {}
            for j in (1, 2, 3):
                blk[f'conv{j}'] = _conv_p(sd, f'{pre}.conv{j}')
                blk[f'bn{j}'] = _bn_p(sd, f'{pre}.bn{j}')
            if f'{pre}.downsample.0.weight' in sd:
                blk['down0'] = _conv_p(sd, f'{pre}.downsample.0')
                blk['down1'] = _bn_p(sd, f'{pre}.downsample.1')
            body[f'layer{li + 1}_{bi}'] = blk

    fpn = {}
    for i in range(4):
        fpn[f'inner{i}'] = _flex_conv(
            sd, f'backbone.fpn.inner_blocks.{i}',
            f'backbone.fpn.inner_blocks.{i}.0')
        fpn[f'layer{i}'] = _flex_conv(
            sd, f'backbone.fpn.layer_blocks.{i}',
            f'backbone.fpn.layer_blocks.{i}.0')

    rpn = {'conv': _flex_conv(sd, 'rpn.head.conv',
                              'rpn.head.conv.0.0'),
           'cls_logits': _conv_p(sd, 'rpn.head.cls_logits'),
           'bbox_pred': _conv_p(sd, 'rpn.head.bbox_pred')}

    boxh = {'fc6': _dense_p(sd, 'roi_heads.box_head.fc6'),
            'fc7': _dense_p(sd, 'roi_heads.box_head.fc7'),
            'cls_score': _dense_p(sd, 'roi_heads.box_predictor'
                                  '.cls_score'),
            'bbox_pred': _dense_p(sd, 'roi_heads.box_predictor'
                                  '.bbox_pred')}

    # legacy flat keys (mask_fcnN) vs newer torchvision nesting (N.0)
    maskh = {f'mask_fcn{i}': _flex_conv(
        sd, f'roi_heads.mask_head.mask_fcn{i}',
        f'roi_heads.mask_head.{i - 1}.0') for i in range(1, 5)}
    maskh['conv5_mask'] = {
        'kernel': deconv_w(
            sd['roi_heads.mask_predictor.conv5_mask.weight']),
        'bias': _np(sd['roi_heads.mask_predictor.conv5_mask.bias'])}
    maskh['mask_fcn_logits'] = _conv_p(
        sd, 'roi_heads.mask_predictor.mask_fcn_logits')

    return {'params': {'body': body, 'fpn': fpn, 'rpn_head': rpn,
                       'box_head': boxh, 'mask_head': maskh}}
