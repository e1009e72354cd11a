"""COCO protocol validation for data/metrics.py.

pycocotools is not installed in this image, so the golden is a direct
line-by-line TRANSCRIPTION of pycocotools COCOeval.evaluateImg /
accumulate (single category, area 'all') — structured like the
original's per-image loops, unlike the vectorized implementation
under test — plus analytic hand-computed cases. The sharp edges the
VERDICT called out are all exercised: 101-point interpolation,
maxDets capping, crowd handling, stable tie-breaking.
"""
import numpy as np
import pytest

from cartoonsegmentation_tpu.data.metrics import (IOU_THRS, REC_THRS,
                                                  bbox_iou_xywh,
                                                  coco_map)


def _crowd_iou(dt, gt):
    dx2, dy2 = dt[:, 0] + dt[:, 2], dt[:, 1] + dt[:, 3]
    gx2, gy2 = gt[:, 0] + gt[:, 2], gt[:, 1] + gt[:, 3]
    ix = np.maximum(0, np.minimum(dx2[:, None], gx2[None]) -
                    np.maximum(dt[:, None, 0], gt[None, :, 0]))
    iy = np.maximum(0, np.minimum(dy2[:, None], gy2[None]) -
                    np.maximum(dt[:, None, 1], gt[None, :, 1]))
    return ix * iy / np.maximum((dt[:, 2] * dt[:, 3])[:, None], 1e-9)


def cocoeval_oracle(preds, gts, max_dets=100, area_rng=None):
    """Transcribed COCOeval (bbox, one category). ``area_rng``
    reproduces the areaRng machinery: gt outside the range get
    _ignore set (pycocotools _prepare + evaluateImg), unmatched dt
    outside the range are marked dtIg. Returns (ap (T,), recall (T,))
    like accumulate's precision/recall slices."""
    T = len(IOU_THRS)
    ev = []
    for pred, gt in zip(preds, gts):
        scores = np.asarray(pred.get('scores', []), float)
        dt_b = np.asarray(pred.get('bboxes', np.zeros((0, 4))), float)
        gt_b = np.asarray(gt.get('bboxes', np.zeros((0, 4))), float)
        crowd = np.asarray(gt.get('iscrowd',
                                  np.zeros(len(gt_b))), bool)
        if area_rng is not None and len(gt_b):
            ga = gt_b[:, 2] * gt_b[:, 3]
            gt_ig = crowd | (ga < area_rng[0]) | (ga > area_rng[1])
        else:
            gt_ig = crowd.copy()
        # dt sorted by score (stable), capped at maxDets
        dind = np.argsort(-scores, kind='mergesort')[:max_dets]
        dt_b, scores = dt_b[dind] if len(dt_b) else dt_b, scores[dind]
        # gt sorted combined-ignore-last (stable); iscrowd keeps the
        # annotation order mapping
        gind = np.argsort(gt_ig, kind='mergesort')
        gt_b = gt_b[gind] if len(gt_b) else gt_b
        gt_ig, crowd = gt_ig[gind], crowd[gind]

        ious = bbox_iou_xywh(dt_b, gt_b)
        if len(dt_b) and crowd.any():
            ious = np.where(crowd[None], _crowd_iou(dt_b, gt_b), ious)

        D, G = len(dt_b), len(gt_b)
        gtm = np.zeros((T, G), int) - 1
        dtm = np.zeros((T, D), int) - 1
        dt_igf = np.zeros((T, D), bool)
        for tind, t in enumerate(IOU_THRS):
            for d in range(D):
                iou = min(t, 1 - 1e-10)
                m = -1
                for g in range(G):
                    # pycocotools: continue tests ISCROWD only
                    if gtm[tind, g] >= 0 and not crowd[g]:
                        continue
                    # the sorted break tests the combined ignore
                    if m > -1 and not gt_ig[m] and gt_ig[g]:
                        break
                    if ious[d, g] < iou:
                        continue
                    iou = ious[d, g]
                    m = g
                if m == -1:
                    continue
                dtm[tind, d] = m
                gtm[tind, m] = d
                dt_igf[tind, d] = gt_ig[m]
        if area_rng is not None and D:
            da = dt_b[:, 2] * dt_b[:, 3]
            d_out = (da < area_rng[0]) | (da > area_rng[1])
            dt_igf = dt_igf | ((dtm < 0) & d_out[None, :])
        ev.append({'scores': scores, 'dtm': dtm, 'dtIg': dt_igf,
                   'npig': int((~gt_ig).sum())})

    npig = sum(e['npig'] for e in ev)
    if npig == 0:
        return np.full(T, np.nan), np.full(T, np.nan)
    scores = np.concatenate([e['scores'] for e in ev])
    dtm = np.concatenate([e['dtm'] for e in ev], axis=1)
    dt_ig = np.concatenate([e['dtIg'] for e in ev], axis=1)
    inds = np.argsort(-scores, kind='mergesort')
    dtm, dt_ig = dtm[:, inds], dt_ig[:, inds]

    tps = (dtm >= 0) & ~dt_ig
    fps = (dtm < 0) & ~dt_ig
    ap = np.zeros(T)
    rec = np.zeros(T)
    for t in range(T):
        tp = np.cumsum(tps[t]).astype(float)
        fp = np.cumsum(fps[t]).astype(float)
        rc = tp / npig
        rec[t] = rc[-1] if len(rc) else 0.0
        pr = tp / (fp + tp + np.spacing(1))
        q = np.zeros(len(REC_THRS))
        pr = pr.tolist()
        for i in range(len(pr) - 1, 0, -1):
            if pr[i] > pr[i - 1]:
                pr[i - 1] = pr[i]
        inds2 = np.searchsorted(rc, REC_THRS, side='left')
        for ri, pi in enumerate(inds2):
            try:
                q[ri] = pr[pi]
            except IndexError:
                pass
        ap[t] = q.mean()
    return ap, rec


def _rand_scene(rng, n_img=8, crowd=False, ties=False):
    preds, gts = [], []
    for _ in range(n_img):
        G = rng.randint(0, 5)
        gt_b = np.stack([rng.rand(G) * 80, rng.rand(G) * 80,
                         5 + rng.rand(G) * 30, 5 + rng.rand(G) * 30],
                        1) if G else np.zeros((0, 4))
        iscrowd = (rng.rand(G) < 0.3) if (crowd and G) else \
            np.zeros(G, bool)
        D = rng.randint(0, 8)
        dt = []
        for d in range(D):
            if G and rng.rand() < 0.7:
                base = gt_b[rng.randint(G)]
                jit = rng.randn(4) * np.array([4, 4, 3, 3])
                b = base + jit
                b[2:] = np.maximum(b[2:], 2)
            else:
                b = np.array([rng.rand() * 80, rng.rand() * 80,
                              5 + rng.rand() * 30, 5 + rng.rand() * 30])
            dt.append(b)
        dt_b = np.stack(dt) if D else np.zeros((0, 4))
        scores = rng.rand(D)
        if ties and D >= 2:
            scores[:D // 2] = 0.5  # exercise stable tie-breaking
        preds.append({'bboxes': dt_b, 'scores': scores})
        gts.append({'bboxes': gt_b, 'iscrowd': iscrowd})
    return preds, gts


@pytest.mark.parametrize('seed,crowd,ties,max_dets', [
    (0, False, False, 100), (1, False, True, 100),
    (2, True, False, 100), (3, True, True, 100),
    (4, False, False, 3), (5, True, True, 3),
])
def test_coco_map_matches_cocoeval_transcription(seed, crowd, ties,
                                                 max_dets):
    rng = np.random.RandomState(seed)
    preds, gts = _rand_scene(rng, crowd=crowd, ties=ties)
    got = coco_map(preds, gts, 'bbox', max_dets=max_dets)
    want, want_rec = cocoeval_oracle(preds, gts, max_dets=max_dets)
    np.testing.assert_allclose(np.asarray(got['AP_per_iou']), want,
                               rtol=0, atol=1e-9)
    np.testing.assert_allclose(got['mAP'], np.nanmean(want), atol=1e-9)
    np.testing.assert_allclose(got['AR'], want_rec.mean(), atol=1e-9)


def test_coco_map_analytic_cases():
    # one det with IoU 0.6 against one gt: TP for thr .5/.55/.6 (AP 1
    # each), FP above → mAP = 3/10
    gt = [{'bboxes': np.array([[0., 0., 10., 10.]])}]
    pred = [{'bboxes': np.array([[0., 0., 10., 6.]]),
             'scores': np.array([0.9])}]
    # iou = 60/100
    assert float(bbox_iou_xywh(pred[0]['bboxes'],
                               gt[0]['bboxes'])[0, 0]) == pytest.approx(0.6)
    out = coco_map(pred, gt, 'bbox')
    assert out['mAP_50'] == pytest.approx(1.0)
    assert out['mAP_75'] == pytest.approx(0.0)
    assert out['mAP'] == pytest.approx(0.3)

    # a det matching only a crowd gt is neither TP nor FP: with one
    # real gt missed and one crowd-matched det, every threshold has
    # zero TP at nonzero recall → AP 0, but the crowd det must NOT
    # count as FP for the other image's perfect detection
    gts = [{'bboxes': np.array([[0., 0., 10., 10.]]),
            'iscrowd': np.array([True])},
           {'bboxes': np.array([[20., 20., 10., 10.]])}]
    preds = [{'bboxes': np.array([[1., 1., 8., 8.]]),
              'scores': np.array([0.95])},     # inside the crowd
             {'bboxes': np.array([[20., 20., 10., 10.]]),
              'scores': np.array([0.5])}]      # perfect match
    out = coco_map(preds, gts, 'bbox')
    # the crowd-matched det is ignored → precision stays 1.0
    assert out['mAP'] == pytest.approx(1.0)


def _sized_scene(rng, n_img=8, crowd=True):
    """Scene with small/medium/large objects spanning the COCO area
    boundaries (32^2, 96^2)."""
    preds, gts = [], []
    for _ in range(n_img):
        G = rng.randint(0, 6)
        sizes = rng.choice([8.0, 20.0, 40.0, 70.0, 120.0], size=(G, 2))
        gt_b = np.concatenate(
            [rng.rand(G, 2) * 100, sizes], 1) if G else np.zeros((0, 4))
        iscrowd = (rng.rand(G) < 0.25) if (crowd and G) else \
            np.zeros(G, bool)
        D = rng.randint(0, 9)
        dt = []
        for d in range(D):
            if G and rng.rand() < 0.7:
                b = gt_b[rng.randint(G)] + rng.randn(4) * 3
                b[2:] = np.maximum(b[2:], 2)
            else:
                b = np.array([rng.rand() * 100, rng.rand() * 100,
                              2 + rng.rand() * 130,
                              2 + rng.rand() * 130])
            dt.append(b)
        dt_b = np.stack(dt) if D else np.zeros((0, 4))
        preds.append({'bboxes': dt_b, 'scores': rng.rand(D)})
        gts.append({'bboxes': gt_b, 'iscrowd': iscrowd})
    return preds, gts


@pytest.mark.parametrize('seed,area,max_dets', [
    (0, 'small', 100), (1, 'medium', 100), (2, 'large', 100),
    (3, 'small', 100), (4, 'medium', 3), (5, 'all', 1),
    (6, 'all', 10),
])
def test_coco_map_area_ranges_match_transcription(seed, area,
                                                  max_dets):
    from cartoonsegmentation_tpu.data.metrics import AREA_RNG
    rng = np.random.RandomState(100 + seed)
    preds, gts = _sized_scene(rng)
    got = coco_map(preds, gts, 'bbox', max_dets=max_dets,
                   area_rng=area)
    want, want_rec = cocoeval_oracle(preds, gts, max_dets=max_dets,
                                     area_rng=AREA_RNG[area])
    np.testing.assert_allclose(np.asarray(got['AP_per_iou']), want,
                               rtol=0, atol=1e-9)
    np.testing.assert_allclose(got['AR'], np.nanmean(want_rec),
                               atol=1e-9)


def test_coco_summary_structure_and_split():
    """Pure-small gt scene: AP_small == AP, AP_large is NaN (no gt in
    range), AR@1 <= AR@100."""
    from cartoonsegmentation_tpu.data.metrics import coco_summary
    gt = [{'bboxes': np.array([[0., 0., 10., 10.],
                               [50., 50., 12., 12.]])}]
    pred = [{'bboxes': np.array([[0., 0., 10., 10.],
                                 [50., 50., 12., 12.]]),
             'scores': np.array([0.9, 0.8])}]
    s = coco_summary(pred, gt, 'bbox')
    assert set(s) == {'AP', 'AP_50', 'AP_75', 'AP_small', 'AP_medium',
                      'AP_large', 'AR_1', 'AR_10', 'AR_100',
                      'AR_small', 'AR_medium', 'AR_large'}
    assert s['AP'] == pytest.approx(1.0)
    assert s['AP_small'] == pytest.approx(1.0)
    assert np.isnan(s['AP_large'])        # no large gt anywhere
    assert s['AR_1'] == pytest.approx(0.5)  # one det allowed, two gts
    assert s['AR_100'] == pytest.approx(1.0)
