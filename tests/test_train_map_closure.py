"""Train→mAP closure: the tiny detector trained on a fixed synthetic
set must reach a real COCO AP through the REAL inference decode.

This is the missing end-to-end guarantee on top of the loss-halving
test (test_parallel.py): DSLA assignment → losses → gradients →
postprocess (NMS, dynamic-conv mask decode) → data/metrics.py COCO
protocol all agree — a box-format mismatch, a stride bug in decode,
or a mask-threshold seam would train fine and still score ~0 here.
Reference recipe: rtmdet_inshead_custom.py:38-248 +
pycocotools-protocol evaluation.
"""
import numpy as np
import optax
import pytest

import jax
import jax.numpy as jnp

from cartoonsegmentation_tpu.data.metrics import coco_map
from cartoonsegmentation_tpu.models.rtmdet import (AnimeDetector,
                                                   postprocess)
from cartoonsegmentation_tpu.parallel import (create_train_state,
                                              make_train_step)


def _make_dataset(rng, B=4, H=64, W=64, G=2):
    """Visually learnable scenes: bright filled rectangles on a dark
    textured background."""
    images = (rng.rand(B, H, W, 3) * 0.15).astype(np.float32)
    boxes = np.zeros((B, G, 4), np.float32)
    masks = np.zeros((B, G, H, W), bool)
    for b in range(B):
        for g in range(G):
            w = rng.randint(14, 28)
            h = rng.randint(14, 28)
            x1 = rng.randint(0, W - w)
            y1 = rng.randint(0, H - h) if g == 0 else \
                rng.randint(0, H - h)
            x2, y2 = x1 + w, y1 + h
            color = 0.5 + 0.5 * rng.rand(3)
            images[b, y1:y2, x1:x2] = color
            boxes[b, g] = [x1, y1, x2, y2]
            masks[b, g, y1:y2, x1:x2] = True
    return {
        'images': images,
        'gt_boxes': boxes,
        'gt_valid': np.ones((B, G), bool),
        'gt_masks': masks,
    }


@pytest.mark.slow
def test_train_to_map_closure(rng):
    H = W = 64
    data = _make_dataset(rng)
    model = AnimeDetector(deepen=0.33, widen=0.125)
    tx = optax.adamw(optax.cosine_decay_schedule(2e-3, 500))
    state = create_train_state(model, jax.random.PRNGKey(0), (H, W), tx)
    batch = {k: jnp.asarray(v) for k, v in data.items()}
    step = make_train_step(model, tx)

    for _ in range(500):
        state, metrics = step(state, batch)
    assert np.isfinite(float(metrics['loss']))

    # REAL inference decode (the path AnimeInsSeg.infer runs)
    variables = {'params': state.params}
    if state.batch_stats:
        variables['batch_stats'] = state.batch_stats
    cls_out, reg_out, krn_out, mask_feat = model.apply(
        variables, batch['images'])

    preds, gts = [], []
    for b in range(len(data['images'])):
        out = postprocess(
            tuple(t[b:b + 1] for t in cls_out),
            tuple(t[b:b + 1] for t in reg_out),
            tuple(t[b:b + 1] for t in krn_out), mask_feat[b:b + 1],
            score_thr=0.05, mask_thr=0.3, pre_topk=256, max_det=8,
            input_h=H, input_w=W)
        out = jax.device_get(out)
        valid = np.asarray(out['valid'])
        bx = np.asarray(out['bboxes'])[valid]          # xyxy
        sc = np.asarray(out['scores'])[valid]
        mk = np.asarray(out['masks'])[valid]
        preds.append({
            'bboxes': np.stack([bx[:, 0], bx[:, 1],
                                bx[:, 2] - bx[:, 0],
                                bx[:, 3] - bx[:, 1]], -1)
            if len(bx) else np.zeros((0, 4)),           # xywh
            'scores': sc,
            'masks': [m.astype(bool) for m in mk],
        })
        gb = data['gt_boxes'][b]
        gts.append({
            'bboxes': np.stack([gb[:, 0], gb[:, 1],
                                gb[:, 2] - gb[:, 0],
                                gb[:, 3] - gb[:, 1]], -1),
            'masks': [m for m in data['gt_masks'][b]],
        })

    box = coco_map(preds, gts, iou_type='bbox')
    seg = coco_map(preds, gts, iou_type='segm')
    # train-set closure: the whole chain must actually localize
    assert box['mAP_50'] >= 0.5, box
    assert seg['mAP_50'] >= 0.5, seg
