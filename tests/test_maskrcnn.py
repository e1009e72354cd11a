"""Native Mask R-CNN vs the torchvision-schema twin + numpy oracles.

Networks (frozen-BN ResNet50, FPN, RPN head, box/mask heads) are
compared numerically against tests/torch_twins.py::TorchMaskRCNNNets
through `convert_maskrcnn` — converter and layer numerics in one
shot. The data-flow machinery (RoIAlign with the legacy
aligned=False edge semantics, level mapping, box decode, mask
pasting) is pinned by direct numpy transcriptions of the torchvision
CUDA/C++ semantics, the house pattern for non-network parity
(tests/oracles.py)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip('torch')

from cartoonsegmentation_tpu.models.maskrcnn import (  # noqa: E402
    FPN_STRIDES, MaskRCNN)
from cartoonsegmentation_tpu.models import maskrcnn as M  # noqa: E402
from torch_twins import TorchMaskRCNNNets, randomize_  # noqa: E402


@pytest.fixture(scope='module')
def twin_pair():
    twin = randomize_(TorchMaskRCNNNets(), seed=3, scale=0.1).eval()
    variables = M.convert_maskrcnn(twin.state_dict())
    return twin, variables


def test_backbone_fpn_parity(twin_pair, rng):
    twin, variables = twin_pair
    x = rng.randn(1, 64, 64, 3).astype(np.float32) * 0.5
    with torch.no_grad():
        tf = twin.features(torch.tensor(x).permute(0, 3, 1, 2))
    model = MaskRCNN()
    jf = model.apply(variables, jnp.asarray(x),
                     method=lambda m, v: m.features(v))
    assert len(jf) == 5
    for a, b in zip(jf, tf):
        np.testing.assert_allclose(
            np.asarray(a), b.permute(0, 2, 3, 1).numpy(),
            rtol=2e-4, atol=2e-4)


def test_rpn_head_parity(twin_pair, rng):
    twin, variables = twin_pair
    x = rng.randn(1, 64, 64, 3).astype(np.float32) * 0.5
    model = MaskRCNN()
    with torch.no_grad():
        tfeats = twin.features(torch.tensor(x).permute(0, 3, 1, 2))
        touts = twin.rpn_outputs(tfeats)
    jf = model.apply(variables, jnp.asarray(x),
                     method=lambda m, v: m.features(v))
    jouts = model.apply(variables, jf,
                        method=lambda m, f: m.rpn_head(f))
    for (jc, jr), (tc, tr) in zip(jouts, touts):
        np.testing.assert_allclose(
            np.asarray(jc), tc.permute(0, 2, 3, 1).numpy(),
            rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(
            np.asarray(jr), tr.permute(0, 2, 3, 1).numpy(),
            rtol=2e-4, atol=2e-4)


def test_box_and_mask_head_parity(twin_pair, rng):
    twin, variables = twin_pair
    model = MaskRCNN()
    roi7 = rng.randn(5, 7, 7, 256).astype(np.float32) * 0.3
    roi14 = rng.randn(5, 14, 14, 256).astype(np.float32) * 0.3
    with torch.no_grad():
        tc, tr = twin.box_outputs(
            torch.tensor(roi7).permute(0, 3, 1, 2))
        tm = twin.mask_outputs(
            torch.tensor(roi14).permute(0, 3, 1, 2))
    jc, jr = model.apply(variables, jnp.asarray(roi7),
                         method=lambda m, r: m.box_head(r))
    jm = model.apply(variables, jnp.asarray(roi14),
                     method=lambda m, r: m.mask_head(r))
    # fc6 is a 12.5k-term dot product; f32 reassociation noise is
    # ~1e-3 absolute on +-50 magnitudes (a layout bug would be O(1))
    np.testing.assert_allclose(np.asarray(jc), tc.numpy(),
                               rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(jr), tr.numpy(),
                               rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(jm), tm.permute(0, 2, 3, 1).numpy(),
        rtol=1e-3, atol=2e-3)


# ---------------------------------------------------------------------------
# numpy oracles for the machinery
# ---------------------------------------------------------------------------

def _bilinear_point(f, y, x):
    """torchvision roi_align bilinear_interpolate semantics."""
    H, W, C = f.shape
    if y < -1.0 or y > H or x < -1.0 or x > W:
        return np.zeros(C, np.float64)
    y, x = max(y, 0.0), max(x, 0.0)
    y0, x0 = int(y), int(x)
    if y0 >= H - 1:
        y0 = y1 = H - 1
        ly = 0.0
    else:
        y1, ly = y0 + 1, y - y0
    if x0 >= W - 1:
        x0 = x1 = W - 1
        lx = 0.0
    else:
        x1, lx = x0 + 1, x - x0
    return (f[y0, x0] * (1 - ly) * (1 - lx) + f[y0, x1] * (1 - ly) * lx
            + f[y1, x0] * ly * (1 - lx) + f[y1, x1] * ly * lx)


def roi_align_oracle(feats, boxes, out, sampling=2):
    N, C = len(boxes), feats[0].shape[2]
    res = np.zeros((N, out, out, C), np.float32)
    for n, b in enumerate(boxes):
        area = max(b[2] - b[0], 0) * max(b[3] - b[1], 0)
        k = int(np.floor(4 + np.log2(np.sqrt(area) / 224 + 1e-6)))
        lv = min(max(k, 2), 5) - 2
        f = feats[lv].astype(np.float64)
        scale = 1.0 / FPN_STRIDES[lv]
        x1, y1 = b[0] * scale, b[1] * scale
        rw = max(b[2] * scale - x1, 1.0)
        rh = max(b[3] * scale - y1, 1.0)
        bw, bh = rw / out, rh / out
        for i in range(out):
            for j in range(out):
                acc = np.zeros(C, np.float64)
                for ky in range(sampling):
                    yy = y1 + (i + (ky + 0.5) / sampling) * bh
                    for kx in range(sampling):
                        xx = x1 + (j + (kx + 0.5) / sampling) * bw
                        acc += _bilinear_point(f, yy, xx)
                res[n, i, j] = acc / sampling ** 2
    return res


def test_roi_align_pyramid_oracle(rng):
    """All 4 levels exercised (box sizes spanning the level mapper),
    including out-of-bounds and bottom-edge sample bands."""
    feats = [rng.randn(64 // s, 96 // s, 8).astype(np.float32)
             for s in FPN_STRIDES[:4]]
    boxes = np.array([
        [5., 4., 60., 50.],          # small → P2
        [0., 0., 250., 180.],        # ~P3/P4
        [-10., -10., 500., 400.],    # big + oob samples
        [2., 2., 3.5, 3.5],          # tiny (min roi size 1 clamps)
        [80., 40., 700., 600.],      # → P5, beyond feature extent
    ], np.float32)
    want = roi_align_oracle(feats, boxes, out=7)
    got = np.asarray(M.roi_align_pyramid(
        [jnp.asarray(f) for f in feats], jnp.asarray(boxes), out=7))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_decode_boxes_oracle(rng):
    anchors = np.abs(rng.randn(20, 2)) * 50
    anchors = np.concatenate([anchors, anchors + 20
                              + np.abs(rng.randn(20, 2)) * 80],
                             1).astype(np.float32)
    deltas = (rng.randn(20, 4) * 0.5).astype(np.float32)
    deltas[:3, 2:] = 10.0                        # exercises the clamp
    w = (10., 10., 5., 5.)
    aw = anchors[:, 2] - anchors[:, 0]
    ah = anchors[:, 3] - anchors[:, 1]
    ax, ay = anchors[:, 0] + aw / 2, anchors[:, 1] + ah / 2
    dx, dy = deltas[:, 0] / w[0], deltas[:, 1] / w[1]
    dw = np.minimum(deltas[:, 2] / w[2], np.log(1000. / 16))
    dh = np.minimum(deltas[:, 3] / w[3], np.log(1000. / 16))
    cx, cy = dx * aw + ax, dy * ah + ay
    bw, bh = np.exp(dw) * aw, np.exp(dh) * ah
    want = np.stack([cx - bw / 2, cy - bh / 2,
                     cx + bw / 2, cy + bh / 2], 1)
    got = np.asarray(M.decode_boxes(jnp.asarray(anchors),
                                    jnp.asarray(deltas), w))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_cell_anchors_torchvision_values():
    """First-level anchors must equal torchvision's rounded set for
    size 32, aspects (0.5, 1, 2)."""
    a = M.cell_anchors()[0]
    want = np.array([[-23., -11., 23., 11.],
                     [-16., -16., 16., 16.],
                     [-11., -23., 11., 23.]], np.float32)
    np.testing.assert_array_equal(np.sort(a, 0), np.sort(want, 0))


def test_paste_masks_semantics():
    """A saturated 28x28 logit pasted into a box covers exactly the
    box interior (padding ring + expansion cancel), clipped at the
    image border."""
    logits = np.full((1, 28, 28), 12.0, np.float32)
    boxes = np.array([[10., 6., 30., 22.]], np.float32)
    out = M.paste_masks(logits, boxes, 28, 40)
    ys, xs = np.where(out[0])
    assert xs.min() >= 9 and xs.max() <= 31
    assert ys.min() >= 5 and ys.max() <= 23
    assert out[0, 14, 20]                        # interior filled
    # clipping: box partially outside
    boxes2 = np.array([[-10., -10., 15., 15.]], np.float32)
    out2 = M.paste_masks(logits, boxes2, 28, 40)
    assert out2[0, 0, 0] and not out2[0, 27, 39]


def test_full_detect_contract(rng):
    """Random-weight full pipeline on a small canvas: fixed-capacity
    outputs, valid mask coherent, one jitted program."""
    model = MaskRCNN(pre_nms_top=200, post_nms_top=100,
                     box_candidates=256, max_det=10)
    x = rng.randn(1, 64, 64, 3).astype(np.float32) * 0.3
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = jax.jit(model.apply)(variables, jnp.asarray(x))
    assert out['boxes'].shape == (10, 4)
    assert out['masks'].shape == (10, 28, 28)
    v = np.asarray(out['valid'])
    s = np.asarray(out['scores'])
    assert (s[v] > 0.05).all()
    lbl = np.asarray(out['labels'])
    assert ((lbl[v] >= 1) & (lbl[v] < 91)).all()


def test_maskrcnn_detector_wrapper(rng):
    """Pipeline detector contract at a small canvas: Instances with
    fixed capacity, xywh boxes inside the image, masks at image res,
    invalid slots empty; second same-aspect call reuses the jitted
    program."""
    from cartoonsegmentation_tpu.pipeline.maskrcnn_det import \
        MaskRCNNDetector
    det = MaskRCNNDetector(
        capacity=6, min_size=64, max_size=96,
        model=MaskRCNN(pre_nms_top=100, post_nms_top=50,
                       box_candidates=128, max_det=8))
    img = (rng.rand(80, 100, 3) * 255).astype(np.uint8)
    ins = det.infer(img, pred_score_thr=0.0)
    assert ins.masks.shape == (6, 80, 100)
    v = np.asarray(ins.valid)
    xywh = np.asarray(ins.bboxes)
    assert (xywh[v][:, 2:] >= 0).all()
    assert (xywh[v][:, 0] + xywh[v][:, 2] <= 100 + 1e-3).all()
    inval = ~v
    assert not np.asarray(ins.masks)[inval].any()
    assert len(det._jit) == 1
    det.infer(img, pred_score_thr=0.0)
    assert len(det._jit) == 1                    # program reused


def test_pipeline_maskrcnn_wiring():
    from cartoonsegmentation_tpu.config import build_kenburns_cfg
    from cartoonsegmentation_tpu.pipeline import KenBurnsPipeline
    from cartoonsegmentation_tpu.pipeline.maskrcnn_det import \
        MaskRCNNDetector
    cfg = build_kenburns_cfg('configs/3dkenburns.yaml')
    pipe = KenBurnsPipeline(cfg.replace(detector='maskrcnn',
                                        max_size=64))
    pipe.ensure_detector()
    assert isinstance(pipe._detector, MaskRCNNDetector)
    assert pipe._detector.capacity == cfg.max_instances


# ---------------------------------------------------------------------------
# COMPOSED full-model parity: twin networks + independently written
# numpy machinery (anchors→top-k→decode→NMS→RoIAlign→heads→per-class
# NMS) vs our single jitted __call__. Catches seam bugs (clip extent,
# score/ordering handoffs, box-coder weights) that per-subnet parity
# and random-weight contract checks cannot see.
# ---------------------------------------------------------------------------

def _iou_np(a, b):
    area_a = np.maximum(a[:, 2] - a[:, 0], 0) \
        * np.maximum(a[:, 3] - a[:, 1], 0)
    area_b = np.maximum(b[:, 2] - b[:, 0], 0) \
        * np.maximum(b[:, 3] - b[:, 1], 0)
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.maximum(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    return inter / np.maximum(area_a[:, None] + area_b[None] - inter,
                              1e-9)


def _nms_np(boxes, scores, thr):
    order = list(np.argsort(-scores))
    keep = []
    while order:
        i = order.pop(0)
        keep.append(i)
        if not order:
            break
        rest = np.asarray(order)
        iou = _iou_np(boxes[i:i + 1], boxes[rest])[0]
        order = [j for j, ok in zip(rest, iou <= thr) if ok]
    return keep


def _decode_np(anchors, deltas, w):
    aw = anchors[:, 2] - anchors[:, 0]
    ah = anchors[:, 3] - anchors[:, 1]
    ax, ay = anchors[:, 0] + aw / 2, anchors[:, 1] + ah / 2
    dx, dy = deltas[:, 0] / w[0], deltas[:, 1] / w[1]
    dw = np.minimum(deltas[:, 2] / w[2], np.log(1000. / 16))
    dh = np.minimum(deltas[:, 3] / w[3], np.log(1000. / 16))
    cx, cy = dx * aw + ax, dy * ah + ay
    bw, bh = np.exp(dw) * aw, np.exp(dh) * ah
    return np.stack([cx - bw / 2, cy - bh / 2,
                     cx + bw / 2, cy + bh / 2], 1)


def _clip_np(b, h, w):
    return np.stack([b[:, 0].clip(0, w), b[:, 1].clip(0, h),
                     b[:, 2].clip(0, w), b[:, 3].clip(0, h)], 1)


def _reference_detect(twin, x_nhwc, ih, iw, pre, post, cand, max_det):
    """torchvision inference data flow, written independently in
    numpy on top of the twin's torch networks."""
    with torch.no_grad():
        tfeats = twin.features(
            torch.tensor(x_nhwc).permute(0, 3, 1, 2))
        rpn = twin.rpn_outputs(tfeats)
    feats_np = [f[0].permute(1, 2, 0).numpy() for f in tfeats[:4]]
    cell = M.cell_anchors()

    boxes_all, scores_all, lvl_all = [], [], []
    for lv, (cls, reg) in enumerate(rpn):
        obj = cls[0].permute(1, 2, 0).numpy().reshape(-1)
        dlt = reg[0].permute(1, 2, 0).numpy().reshape(-1, 4)
        H, W = cls.shape[-2:]
        anch = M.level_anchors(H, W, M.FPN_STRIDES[lv], cell[lv])
        k = min(pre, obj.size)
        top = np.argsort(-obj)[:k]
        b = _clip_np(_decode_np(anch[top], dlt[top], (1, 1, 1, 1)),
                     ih, iw)
        s = 1 / (1 + np.exp(-obj[top]))
        okw = (b[:, 2] - b[:, 0] >= 1e-3) & (b[:, 3] - b[:, 1] >= 1e-3)
        boxes_all.append(b[okw])
        scores_all.append(s[okw])
        lvl_all.append(np.full(okw.sum(), lv))
    boxes = np.concatenate(boxes_all)
    scores = np.concatenate(scores_all)
    lvls = np.concatenate(lvl_all)
    keep = []
    for lv in range(5):                       # per-level NMS
        idx = np.where(lvls == lv)[0]
        keep += [idx[i] for i in _nms_np(boxes[idx], scores[idx], 0.7)]
    keep = np.asarray(keep)
    keep = keep[np.argsort(-scores[keep])][:post]
    props = boxes[keep]

    roi = roi_align_oracle(feats_np, props, out=7)
    with torch.no_grad():
        cls, reg = twin.box_outputs(
            torch.tensor(roi).permute(0, 3, 1, 2))
        probs = torch.softmax(cls, -1).numpy()
        reg = reg.numpy().reshape(len(props), 91, 4)
    cand_boxes, cand_scores, cand_labels = [], [], []
    for c in range(1, 91):
        b = _clip_np(_decode_np(props, reg[:, c], (10, 10, 5, 5)),
                     ih, iw)
        s = probs[:, c]
        ok = (s > 0.05) & (b[:, 2] - b[:, 0] >= 1e-2) \
            & (b[:, 3] - b[:, 1] >= 1e-2)
        cand_boxes.append(b[ok])
        cand_scores.append(s[ok])
        cand_labels.append(np.full(ok.sum(), c))
    b = np.concatenate(cand_boxes)
    s = np.concatenate(cand_scores)
    l = np.concatenate(cand_labels)
    top = np.argsort(-s)[:cand]
    b, s, l = b[top], s[top], l[top]
    keep = []
    for c in np.unique(l):                    # per-class NMS
        idx = np.where(l == c)[0]
        keep += [idx[i] for i in _nms_np(b[idx], s[idx], 0.5)]
    keep = np.asarray(keep, int)
    keep = keep[np.argsort(-s[keep])][:max_det]
    det_b, det_s, det_l = b[keep], s[keep], l[keep]

    mroi = roi_align_oracle(feats_np, det_b, out=14)
    with torch.no_grad():
        mlog = twin.mask_outputs(
            torch.tensor(mroi).permute(0, 3, 1, 2)).numpy()
    msel = np.stack([mlog[i, det_l[i]] for i in range(len(det_l))]) \
        if len(det_l) else np.zeros((0, 28, 28), np.float32)
    return det_b, det_s, det_l, msel


def test_composed_full_model_parity(twin_pair, rng):
    """Whole image→detections chain, clipped to a 56x60 image inside
    a 64x64 canvas (exercises the image-extent clipping, not the
    padded canvas)."""
    twin, variables = twin_pair
    x = (rng.randn(1, 64, 64, 3) * 0.4).astype(np.float32)
    ih, iw = 56, 60
    pre, post, cand, max_det = 100, 50, 256, 10
    wb, ws, wl, wm = _reference_detect(twin, x, ih, iw, pre, post,
                                       cand, max_det)

    model = MaskRCNN(pre_nms_top=pre, post_nms_top=post,
                     box_candidates=cand, max_det=max_det)
    out = model.apply(variables, jnp.asarray(x),
                      jnp.asarray([ih, iw], jnp.float32))
    v = np.asarray(out['valid'])
    gb = np.asarray(out['boxes'])[v]
    gs = np.asarray(out['scores'])[v]
    gl = np.asarray(out['labels'])[v]
    gm = np.asarray(out['masks'])[v]

    assert len(gs) == len(ws), (len(gs), len(ws))
    # both sides are already score-ordered by their NMS keep lists
    np.testing.assert_allclose(gs, ws, rtol=1e-3, atol=1e-4)
    np.testing.assert_array_equal(gl, wl)
    np.testing.assert_allclose(gb, wb, rtol=1e-3, atol=5e-3)
    np.testing.assert_allclose(gm, wm, rtol=2e-3, atol=3e-3)


def test_normalize_pad_zero_after_normalize(rng):
    """torchvision normalizes FIRST, then batch_images zero-pads: the
    /32 band must be 0.0 post-normalization, with the reference's
    (R, B, G) channel quirk applied to the image region."""
    from cartoonsegmentation_tpu.pipeline.maskrcnn_det import \
        normalize_pad
    canvas = np.zeros((32, 64, 3), np.uint8)
    canvas[:20, :40] = (rng.rand(20, 40, 3) * 255).astype(np.uint8)
    out = np.asarray(normalize_pad(jnp.asarray(canvas),
                                   jnp.asarray([20, 40], np.float32)))
    x = canvas[:20, :40].astype(np.float32) / 255.0
    exp = (x[..., [2, 0, 1]] - M.MRCNN_MEAN) / M.MRCNN_STD
    np.testing.assert_allclose(out[:20, :40], exp, rtol=1e-5,
                               atol=1e-6)
    assert (out[20:] == 0.0).all() and (out[:, 40:] == 0.0).all()


def test_expand_boxes_truncates_like_torchvision():
    """paste_masks_in_image does expand_boxes(...).to(torch.int64):
    truncation toward zero, NOT rounding — fractional parts >= 0.5
    still floor. box [10.7, 6.3, 30.7, 22.3], M=28: expansion scale
    30/28 gives (9.985, 5.729, 31.414, 22.871) -> (9, 5, 31, 22);
    np.round would give (10, 6, 31, 23)."""
    eb = M.expand_boxes(
        np.array([[10.7, 6.3, 30.7, 22.3]], np.float32), 28)
    assert eb.tolist() == [[9, 5, 31, 22]]
