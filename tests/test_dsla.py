"""DynamicSoftLabelAssigner vs a loop-based numpy oracle of mmdet's
semantics (candidate = center inside gt; cost = soft-BCE + 3*(-log
IoU) + 10^(dist/stride - 3); dynamic k = clamp(int(sum top-13 IoU),
1); per-gt k lowest-cost; conflicts -> min-cost gt)."""
import numpy as np
import jax.numpy as jnp
import optax

from cartoonsegmentation_tpu.parallel.dsla import dynamic_soft_label_assign


def np_iou(a, b):
    area_a = np.maximum(a[:, 2] - a[:, 0], 0) * np.maximum(
        a[:, 3] - a[:, 1], 0)
    area_b = np.maximum(b[:, 2] - b[:, 0], 0) * np.maximum(
        b[:, 3] - b[:, 1], 0)
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.maximum(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    return inter / np.maximum(area_a[:, None] + area_b[None] - inter,
                              1e-9)


def oracle_dsla(priors, strides, logits, boxes, gts, valid,
                topk=13, iou_w=3.0, radius=3.0):
    A, G = priors.shape[0], gts.shape[0]
    pos = np.zeros(A, bool)
    gt_idx = np.zeros(A, np.int64)
    cost = np.full((G, A), np.inf)
    iou = np_iou(gts, boxes)
    # build per-pair costs over candidates
    for g in range(G):
        if not valid[g]:
            continue
        for a in range(A):
            inside = (priors[a, 0] > gts[g, 0] and priors[a, 0] < gts[g, 2]
                      and priors[a, 1] > gts[g, 1]
                      and priors[a, 1] < gts[g, 3])
            if not inside:
                continue
            pij = iou[g, a]
            cx, cy = (gts[g, 0] + gts[g, 2]) / 2, (gts[g, 1] + gts[g, 3]) / 2
            d = np.hypot(priors[a, 0] - cx, priors[a, 1] - cy) / strides[a]
            center = 10.0 ** (d - radius)
            sl = pij                               # single class soft label
            p = 1 / (1 + np.exp(-logits[a, 0]))
            bce = max(logits[a, 0], 0) - logits[a, 0] * sl + np.log1p(
                np.exp(-abs(logits[a, 0])))
            cls_c = bce * abs(sl - p) ** 2
            cost[g, a] = cls_c - iou_w * np.log(pij + 1e-7) + center

    # dynamic-k matching
    match = np.zeros((G, A), bool)
    for g in range(G):
        cand = np.isfinite(cost[g])
        if not cand.any():
            continue
        cious = np.where(cand, iou[g], 0.0)
        k = max(int(np.sort(cious)[::-1][:topk].sum()), 1)
        order = np.argsort(cost[g])
        match[g, order[:k]] = np.isfinite(cost[g, order[:k]])
    for a in range(A):
        gs = np.where(match[:, a])[0]
        if len(gs) == 0:
            continue
        best = gs[np.argmin(cost[gs, a])]
        pos[a] = True
        gt_idx[a] = best
    return pos, gt_idx


def test_dsla_matches_oracle(rng):
    A, G = 120, 5
    priors = rng.rand(A, 2).astype(np.float32) * 64
    strides = rng.choice([8.0, 16.0, 32.0], A).astype(np.float32)
    logits = (rng.randn(A, 1) * 2).astype(np.float32)
    # decoded boxes around the priors
    wh = rng.rand(A, 2).astype(np.float32) * 30 + 4
    boxes = np.concatenate([priors - wh / 2, priors + wh / 2], -1)
    gts = []
    for _ in range(G):
        x1, y1 = rng.rand(2) * 40
        gts.append([x1, y1, x1 + 8 + rng.rand() * 20,
                    y1 + 8 + rng.rand() * 20])
    gts = np.asarray(gts, np.float32)
    valid = np.array([1, 1, 1, 0, 1], bool)

    pos, idx, aiou = dynamic_soft_label_assign(
        jnp.asarray(priors), jnp.asarray(strides), jnp.asarray(logits),
        jnp.asarray(boxes), jnp.asarray(gts), jnp.asarray(valid))
    opos, oidx = oracle_dsla(priors, strides, logits, boxes, gts, valid)

    np.testing.assert_array_equal(np.asarray(pos), opos)
    np.testing.assert_array_equal(np.asarray(idx)[opos], oidx[opos])
    assert np.all(np.asarray(aiou)[np.asarray(pos)] >= 0)
    assert not np.any(np.asarray(idx)[opos] == 3)   # invalid gt unused


def test_dsla_no_valid_gt(rng):
    A = 40
    priors = rng.rand(A, 2).astype(np.float32) * 32
    pos, idx, aiou = dynamic_soft_label_assign(
        jnp.asarray(priors), jnp.full((A,), 8.0),
        jnp.zeros((A, 1)), jnp.zeros((A, 4)),
        jnp.zeros((3, 4)), jnp.zeros((3,), bool))
    assert not bool(np.asarray(pos).any())


def test_train_step_with_dsla(rng):
    """The default train step now assigns via DSLA and still produces
    finite decreasing-ish losses."""
    import jax
    from cartoonsegmentation_tpu.models.rtmdet import AnimeDetector
    from cartoonsegmentation_tpu.parallel import (
        create_train_state, make_train_step)

    model = AnimeDetector(deepen=0.33, widen=0.125)
    tx = optax.adamw(1e-3)
    state = create_train_state(model, jax.random.PRNGKey(0), (64, 64), tx)
    batch = {
        'images': rng.rand(2, 64, 64, 3).astype(np.float32),
        'gt_boxes': np.array([[[4, 4, 40, 40], [20, 30, 60, 62]],
                              [[8, 8, 30, 50], [0, 0, 0, 0]]], np.float32),
        'gt_valid': np.array([[1, 1], [1, 0]], bool),
        'gt_masks': np.ones((2, 2, 64, 64), bool),
    }
    step = make_train_step(model, tx, assigner='dsla')
    state2, metrics = step(state, batch)
    assert np.isfinite(float(metrics['loss']))
    assert float(metrics['loss_bbox']) > 0
