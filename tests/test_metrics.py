"""COCO mAP evaluator sanity tests."""
import numpy as np

from cartoonsegmentation_tpu.data.metrics import (AnimeMangaMetric,
                                                  bbox_iou_xywh, coco_map)


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
