"""Detector tests: structure, NMS parity vs torchvision, dynamic mask
head parity vs an explicit torch grouped-conv computation."""
import numpy as np
import jax
import jax.numpy as jnp
import torch

from cartoonsegmentation_tpu.models.rtmdet import (
    AnimeDetector, NUM_GEN_PARAMS, box_iou, distance2bbox,
    dynamic_mask_heads, level_priors, nms_fixed, postprocess,
)


def _np_iou(a, b):
    area_a = np.maximum(a[:, 2] - a[:, 0], 0) * np.maximum(
        a[:, 3] - a[:, 1], 0)
    area_b = np.maximum(b[:, 2] - b[:, 0], 0) * np.maximum(
        b[:, 3] - b[:, 1], 0)
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.maximum(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    return inter / np.maximum(area_a[:, None] + area_b[None] - inter, 1e-9)


def _np_nms(boxes, scores, thr):
    """Greedy NMS oracle (torchvision semantics: score order, strict
    > thr suppression)."""
    order = np.argsort(-scores)
    keep = []
    while order.size:
        i = order[0]
        keep.append(i)
        iou = _np_iou(boxes[i:i + 1], boxes[order[1:]])[0]
        order = order[1:][iou <= thr]
    return np.array(keep)


def test_box_iou_and_nms_vs_oracle(rng):
    K = 64
    ctr = rng.rand(K, 2).astype(np.float32) * 100
    wh = rng.rand(K, 2).astype(np.float32) * 30 + 5
    boxes = np.concatenate([ctr - wh / 2, ctr + wh / 2], 1)
    scores = rng.rand(K).astype(np.float32)

    iou = np.asarray(box_iou(jnp.asarray(boxes), jnp.asarray(boxes)))
    np.testing.assert_allclose(iou, _np_iou(boxes, boxes), rtol=1e-5,
                               atol=1e-6)

    keep_idx, keep_mask = nms_fixed(jnp.asarray(boxes), jnp.asarray(scores),
                                    0.5, K)
    got = np.asarray(keep_idx)[np.asarray(keep_mask)]
    want = _np_nms(boxes, scores, 0.5)
    np.testing.assert_array_equal(got, want)


def test_dynamic_mask_heads_vs_torch_grouped_conv(rng):
    """The padded-einsum formulation must equal per-instance grouped
    1x1 convs (the reference's parse_dynamic_params + F.conv2d with
    groups=N, rtmdet_inshead_custom.py:280-294)."""
    N, H, W = 5, 12, 16
    mask_feat = rng.rand(H, W, 8).astype(np.float32)
    kernels = (rng.rand(N, NUM_GEN_PARAMS).astype(np.float32) - 0.5)
    priors = rng.rand(N, 2).astype(np.float32) * 64
    strides = np.full((N,), 8.0, np.float32)

    got = np.asarray(dynamic_mask_heads(
        jnp.asarray(mask_feat), jnp.asarray(kernels), jnp.asarray(priors),
        jnp.asarray(strides)))

    # torch reference computation
    coord = np.asarray(level_priors(H, W, 8)).reshape(H, W, 2)
    rel = (priors[:, None, None, :] - coord[None]) / (
        strides[:, None, None, None] * 8.0)
    feat = np.concatenate(
        [rel, np.broadcast_to(mask_feat[None], (N, H, W, 8))], -1)
    x = torch.from_numpy(feat.transpose(0, 3, 1, 2).reshape(1, -1, H, W))
    o = 0
    wsplit, bsplit = [], []
    for wn, cin, cout in (((8 + 2) * 8, 10, 8), (64, 8, 8), (8, 8, 1)):
        wsplit.append(torch.from_numpy(
            kernels[:, o:o + wn].reshape(N * cout, cin, 1, 1)))
        o += wn
    for bn in (8, 8, 1):
        bsplit.append(torch.from_numpy(kernels[:, o:o + bn].reshape(-1)))
        o += bn
    with torch.no_grad():
        for i, (w, b) in enumerate(zip(wsplit, bsplit)):
            x = torch.nn.functional.conv2d(x, w, bias=b, groups=N)
            if i < 2:
                x = torch.relu(x)
    want = x.numpy().reshape(N, H, W)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_detector_forward_and_postprocess(rng):
    """Tiny-width detector end to end on a small canvas."""
    det = AnimeDetector(deepen=0.33, widen=0.25)
    img = jnp.asarray(rng.rand(1, 128, 128, 3).astype(np.float32))
    variables = det.init(jax.random.PRNGKey(0), img)
    cls_out, reg_out, krn_out, mask_feat = det.apply(variables, img)

    assert [c.shape[-3] for c in cls_out] == [16, 8, 4]
    assert cls_out[0].shape[-1] == 1
    assert reg_out[0].shape[-1] == 4
    assert krn_out[0].shape[-1] == NUM_GEN_PARAMS

    out = postprocess(tuple(cls_out), tuple(reg_out), tuple(krn_out),
                      mask_feat, score_thr=0.0, pre_topk=64, max_det=8,
                      input_h=128, input_w=128)
    assert out['bboxes'].shape == (8, 4)
    assert out['masks'].shape == (8, 128, 128)
    assert out['masks'].dtype == jnp.bool_
    # random init → sigmoid scores ~0.5 > 0.0 thr: some valid dets
    assert int(out['valid'].sum()) > 0


def test_detector_bf16_matches_f32(rng):
    """The bf16 inference path (AnimeDetector(dtype='bfloat16'), the
    2.3x-throughput option benched in bench.py) must compute the same
    function as f32 within bf16 rounding: same winning detection, box
    coordinates within ~1px, high mask IoU. Params stay f32 (flax
    `dtype` is the computation dtype only)."""
    det32 = AnimeDetector(deepen=0.33, widen=0.25)
    det16 = AnimeDetector(deepen=0.33, widen=0.25, dtype='bfloat16')
    img = jnp.asarray(rng.rand(1, 128, 128, 3).astype(np.float32))
    variables = det32.init(jax.random.PRNGKey(0), img)

    outs = {}
    for name, det in (('f32', det32), ('bf16', det16)):
        cls_out, reg_out, krn_out, mask_feat = det.apply(variables, img)
        assert cls_out[0].dtype == jnp.float32  # heads cast back
        outs[name] = postprocess(
            tuple(cls_out), tuple(reg_out), tuple(krn_out), mask_feat,
            score_thr=0.0, pre_topk=64, max_det=8,
            input_h=128, input_w=128)

    a, b = outs['f32'], outs['bf16']
    va = np.asarray(a['valid'])
    assert va.any()
    # top detection agrees
    np.testing.assert_allclose(np.asarray(a['scores'])[0],
                               np.asarray(b['scores'])[0], atol=0.02)
    np.testing.assert_allclose(np.asarray(a['bboxes'])[0],
                               np.asarray(b['bboxes'])[0], atol=1.5)
    ma = np.asarray(a['masks'])[0]
    mb = np.asarray(b['masks'])[0]
    inter = (ma & mb).sum()
    union = max((ma | mb).sum(), 1)
    assert inter / union > 0.95


def test_distance2bbox():
    priors = jnp.asarray([[10.0, 20.0]])
    dist = jnp.asarray([[1.0, 2.0, 3.0, 4.0]])
    np.testing.assert_allclose(np.asarray(distance2bbox(priors, dist)),
                               [[9, 18, 13, 24]])
