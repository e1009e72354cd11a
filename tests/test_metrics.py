"""COCO mAP evaluator tests: sanity cases, frozen hand-derived
12-number fixtures, and a randomized cross-check against
tests/pycoco_oracle.py (a literal single-category transcription of
pycocotools COCOeval, structured like the original rather than like
the vectorized implementation under test)."""
import math

import numpy as np

from cartoonsegmentation_tpu.data.metrics import (AnimeMangaMetric,
                                                  bbox_iou_xywh, coco_map,
                                                  coco_summary)
from pycoco_oracle import coco_summary_oracle


def test_bbox_iou_xywh():
    a = np.array([[0, 0, 10, 10]], float)
    b = np.array([[5, 5, 10, 10], [0, 0, 10, 10]], float)
    iou = bbox_iou_xywh(a, b)
    assert abs(iou[0, 0] - 25 / 175) < 1e-9
    assert iou[0, 1] == 1.0


def test_perfect_predictions_ap1():
    gts, preds = [], []
    rng = np.random.RandomState(0)
    for _ in range(4):
        boxes = rng.rand(3, 4) * 50 + np.array([0, 0, 10, 10])
        gts.append({'bboxes': boxes})
        preds.append({'bboxes': boxes.copy(),
                      'scores': np.array([0.9, 0.8, 0.7])})
    res = coco_map(preds, gts, 'bbox')
    assert abs(res['mAP'] - 1.0) < 1e-6
    assert abs(res['mAP_50'] - 1.0) < 1e-6


def test_half_matched_ap():
    gt = {'bboxes': np.array([[0, 0, 10, 10], [50, 50, 10, 10]], float)}
    pred = {'bboxes': np.array([[0, 0, 10, 10], [100, 100, 10, 10]],
                               float),
            'scores': np.array([0.9, 0.8])}
    res = coco_map([pred], [gt], 'bbox')
    # one TP at recall 0.5 with precision 1, then FP
    assert 0.45 < res['mAP_50'] <= 0.51


def test_segm_map_and_split_metric():
    h = w = 32
    m1 = np.zeros((h, w), bool); m1[:10, :10] = True
    m2 = np.zeros((h, w), bool); m2[20:, 20:] = True
    gt = {'bboxes': np.array([[0, 0, 10, 10], [20, 20, 12, 12]], float),
          'masks': [m1, m2]}
    pred = {'bboxes': gt['bboxes'].copy(),
            'scores': np.array([0.9, 0.8]),
            'masks': [m1.copy(), m2.copy()]}
    res = coco_map([pred], [gt], 'segm')
    assert abs(res['mAP'] - 1.0) < 1e-6

    metric = AnimeMangaMetric(manga_ids={7})
    metric.update(1, pred, gt)
    metric.update(7, pred, gt)
    out = metric.compute()
    assert abs(out['animeins_segm']['mAP'] - 1.0) < 1e-6
    assert abs(out['manga109_bbox']['mAP'] - 1.0) < 1e-6


def _assert_summary(preds, gts, expected, iou_type='bbox'):
    """Both the implementation AND the oracle must reproduce the
    hand-derived 12-number table exactly (1e-9)."""
    for fn in (coco_summary, coco_summary_oracle):
        got = fn(preds, gts, iou_type)
        for k, v in expected.items():
            if math.isnan(v):
                assert math.isnan(got[k]), (fn.__name__, k, got[k])
            else:
                assert abs(got[k] - v) < 1e-9, (fn.__name__, k, got[k], v)


def test_fixture_crowd_reclaim():
    """F1 (hand-derived): a crowd gt absorbs a high-scoring det at
    IoU<=0.6 (crowd IoU = inter/det_area = 0.64) and releases it as an
    FP ranked ABOVE the true positive at stricter thresholds, so
    AP = (3*1.0 + 7*0.5)/10. AR_1 = 0 because the per-image top-1 det
    is the crowd-absorbed one at every threshold."""
    gts = [{'bboxes': np.array([[0, 0, 10, 10], [100, 100, 10, 10]],
                               float),
            'iscrowd': np.array([0, 1], bool)}]
    preds = [{'bboxes': np.array([[102, 102, 10, 10], [0, 0, 10, 10]],
                                 float),
              'scores': np.array([0.9, 0.8])}]
    nan = float('nan')
    _assert_summary(preds, gts, {
        'AP': 0.65, 'AP_50': 1.0, 'AP_75': 0.5,
        'AP_small': 0.65, 'AP_medium': nan, 'AP_large': nan,
        'AR_1': 0.0, 'AR_10': 1.0, 'AR_100': 1.0,
        'AR_small': 1.0, 'AR_medium': nan, 'AR_large': nan})


def test_fixture_area_ranges_maxdets():
    """F2 (hand-derived): 2 images, gts in all three area bands, dets
    whose IoUs step out at known thresholds (1.0 / 0.81 / 0.9 / 0.9),
    one always-FP. Exercises: per-band gt ignore, unmatched-det
    area-ignore (the 9000-px det is *medium*, 96^2=9216), dets claiming
    out-of-band gts (ignored, not FP), the empty-kept-slice guard
    (AP_large @0.95 has npig=1 but zero kept dets), and maxDets=1
    per-image truncation. All 12 numbers derived by hand:
    AP = (7*(96/101) + 2*(173/303) + 26/101)/10 = 244/303."""
    gts = [{'bboxes': np.array([[0, 0, 20, 20], [50, 50, 50, 50],
                                [200, 200, 100, 100]], float)},
           {'bboxes': np.array([[10, 10, 40, 40]], float)}]
    preds = [{'bboxes': np.array([[0, 0, 20, 20], [50, 50, 45, 45],
                                  [200, 200, 100, 90], [300, 0, 30, 30]],
                                 float),
              'scores': np.array([0.95, 0.9, 0.85, 0.8])},
             {'bboxes': np.array([[10, 10, 40, 36]], float),
              'scores': np.array([0.7])}]
    _assert_summary(preds, gts, {
        'AP': 244 / 303, 'AP_50': 96 / 101, 'AP_75': 96 / 101,
        'AP_small': 1.0, 'AP_medium': 758 / 1010, 'AP_large': 0.9,
        'AR_1': 0.475, 'AR_10': 0.875, 'AR_100': 0.875,
        'AR_small': 1.0, 'AR_medium': 0.8, 'AR_large': 0.9})


def _random_scene(rng, n_images=4, segm=False):
    """Random crowds, tied (quantized) scores, areas spanning all three
    COCO bands, empty images - every protocol trap at once."""
    preds, gts = [], []
    for _ in range(n_images):
        G = rng.randint(0, 6)
        sizes = rng.choice([8, 20, 40, 70, 120], size=G)
        xy = rng.rand(G, 2) * 200
        gt_boxes = np.concatenate(
            [xy, sizes[:, None] * (0.8 + 0.4 * rng.rand(G, 2))], axis=1)
        iscrowd = rng.rand(G) < 0.3
        D = rng.randint(0, 8)
        det_boxes = []
        for _d in range(D):
            if G and rng.rand() < 0.7:
                base = gt_boxes[rng.randint(G)].copy()
                base[:2] += rng.randn(2) * base[2:] * 0.1
                base[2:] *= 1 + rng.randn(2) * 0.15
                det_boxes.append(np.abs(base))
            else:
                s = rng.choice([10, 30, 80])
                det_boxes.append(np.array(
                    [rng.rand() * 200, rng.rand() * 200,
                     s * (0.8 + 0.4 * rng.rand()),
                     s * (0.8 + 0.4 * rng.rand())]))
        det_boxes = np.array(det_boxes).reshape(D, 4)
        scores = np.round(rng.rand(D) * 4) / 4  # ties -> mergesort
        gt = {'bboxes': gt_boxes, 'iscrowd': iscrowd}
        pred = {'bboxes': det_boxes, 'scores': scores}
        if segm:
            def to_mask(b):
                m = np.zeros((256, 256), bool)
                x, y, w, h = [int(max(0, min(255, v))) for v in b]
                m[y:y + max(1, h), x:x + max(1, w)] = True
                return m
            gt['masks'] = [to_mask(b) for b in gt_boxes]
            pred['masks'] = [to_mask(b) for b in det_boxes]
        preds.append(pred)
        gts.append(gt)
    return preds, gts


def test_randomized_cross_check_vs_pycoco_oracle():
    """40 random scenes (alternating bbox/segm): the vectorized
    implementation must agree with the literal COCOeval transcription
    on every number of the 12-number summary to 1e-9. This caught a
    real double-permute bug in segm det areas."""
    for seed in range(40):
        rng = np.random.RandomState(seed)
        segm = seed % 2 == 1
        preds, gts = _random_scene(rng, segm=segm)
        it = 'segm' if segm else 'bbox'
        got = coco_summary(preds, gts, it)
        orc = coco_summary_oracle(preds, gts, it)
        for k, ov in orc.items():
            gv = got[k]
            same = (math.isnan(gv) and math.isnan(ov)) \
                or abs(gv - ov) < 1e-9
            assert same, (seed, it, k, gv, ov)
