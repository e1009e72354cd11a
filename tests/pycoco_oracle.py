"""A literal transcription of pycocotools COCOeval (single category)
used ONLY as a test oracle for data/metrics.py.

Structured like the original (per-image evaluateImg dicts →
accumulate over a (T, R, A, M) tensor → summarize), NOT like the
vectorized implementation under test, so agreement is meaningful
cross-validation of the protocol: greedy claiming with the crowd
re-claim `continue` and the ignored-tail `break`, combined
ignore flags, unmatched-det area-ignore, mergesort tie handling,
101-point interpolation with the searchsorted quirk, and the
-1 sentinel for empty slices.

Protocol source: pycocotools/cocoeval.py (evaluateImg:258-330,
accumulate:332-411, summarize:413-465); the reference consumes it
through mmdet's CocoMetric (animeinsseg/data/metrics.py:88-199).
"""
from __future__ import annotations

import numpy as np

IOU_THRS = np.round(np.arange(0.5, 1.0, 0.05), 2)
REC_THRS = np.linspace(0.0, 1.0, 101)
AREA_RNG = {'all': (0.0, 1e10), 'small': (0.0, 32.0 ** 2),
            'medium': (32.0 ** 2, 96.0 ** 2),
            'large': (96.0 ** 2, 1e10)}


def _iou_single(dt_box, gt_box, crowd):
    dx1, dy1, dw, dh = dt_box
    gx1, gy1, gw, gh = gt_box
    ix = max(0.0, min(dx1 + dw, gx1 + gw) - max(dx1, gx1))
    iy = max(0.0, min(dy1 + dh, gy1 + gh) - max(dy1, gy1))
    inter = ix * iy
    if crowd:
        union = dw * dh
    else:
        union = dw * dh + gw * gh - inter
    return inter / union if union > 0 else 0.0


def _mask_iou_single(dt_m, gt_m, crowd):
    dt_m = dt_m.astype(bool)
    gt_m = gt_m.astype(bool)
    inter = float(np.logical_and(dt_m, gt_m).sum())
    if crowd:
        union = float(dt_m.sum())
    else:
        union = float(dt_m.sum()) + float(gt_m.sum()) - inter
    return inter / union if union > 0 else 0.0


def compute_ious(pred, gt, iou_type):
    """maskUtils.iou semantics: ious[d, g]; crowd gt → inter/dt_area."""
    crowd = list(np.asarray(
        gt.get('iscrowd', np.zeros(len(gt.get('bboxes', [])), bool))
    ).astype(bool))
    if iou_type == 'bbox':
        dts = list(np.asarray(pred.get('bboxes', np.zeros((0, 4)))))
        gts = list(np.asarray(gt.get('bboxes', np.zeros((0, 4)))))
        fn = _iou_single
    else:
        dts = list(pred.get('masks', []) or [])
        gts = list(gt.get('masks', []) or [])
        fn = _mask_iou_single
    ious = np.zeros((len(dts), len(gts)))
    for d in range(len(dts)):
        for g in range(len(gts)):
            ious[d, g] = fn(dts[d], gts[g], crowd[g])
    return ious


def _dt_areas(pred, iou_type):
    """loadRes: detection area = bbox w*h (bbox) / mask area (segm),
    unless explicitly given."""
    if pred.get('areas') is not None:
        return list(np.asarray(pred['areas'], float))
    if iou_type == 'bbox':
        b = np.asarray(pred.get('bboxes', np.zeros((0, 4))), float)
        return list(b[:, 2] * b[:, 3]) if len(b) else []
    return [float(np.sum(m)) for m in (pred.get('masks') or [])]


def _gt_areas(gt, iou_type):
    if gt.get('areas') is not None:
        return list(np.asarray(gt['areas'], float))
    if iou_type == 'bbox':
        b = np.asarray(gt.get('bboxes', np.zeros((0, 4))), float)
        return list(b[:, 2] * b[:, 3]) if len(b) else []
    return [float(np.sum(m)) for m in (gt.get('masks') or [])]


def evaluate_img(pred, gt, ious, aRng, maxDet, iou_type):
    """COCOeval.evaluateImg, single category."""
    gt_area = _gt_areas(gt, iou_type)
    crowd = list(np.asarray(
        gt.get('iscrowd', np.zeros(len(gt_area), bool))).astype(bool))
    G = len(gt_area)
    gts = [{'area': gt_area[g], 'iscrowd': bool(crowd[g]),
            'ignore': bool(crowd[g]), 'idx': g} for g in range(G)]
    for g in gts:
        g['_ignore'] = int(g['ignore'] or g['area'] < aRng[0]
                           or g['area'] > aRng[1])
    gtind = np.argsort([g['_ignore'] for g in gts], kind='mergesort')
    gts = [gts[i] for i in gtind]

    scores = np.asarray(pred.get('scores', []), float)
    dtind = np.argsort(-scores, kind='mergesort')[:maxDet]
    dt_area_all = _dt_areas(pred, iou_type)
    dts = [{'score': float(scores[i]), 'area': dt_area_all[i],
            'idx': int(i)} for i in dtind]

    T = len(IOU_THRS)
    D = len(dts)
    gtm = np.zeros((T, G)) - 1
    dtm = np.zeros((T, D)) - 1
    gtIg = np.array([g['_ignore'] for g in gts])
    dtIg = np.zeros((T, D))
    if len(ious):
        ious = ious[:, gtind] if G else ious
    for t, thr in enumerate(IOU_THRS):
        for d, dt in enumerate(dts):
            iou = min(thr, 1 - 1e-10)
            m = -1
            for g in range(G):
                # gt already matched, and not a crowd → can't claim
                if gtm[t, g] >= 0 and not gts[g]['iscrowd']:
                    continue
                # best match so far is a real gt and this gt starts
                # the ignored tail → stop, keep the real match
                if m > -1 and gtIg[m] == 0 and gtIg[g] == 1:
                    break
                if ious[dt['idx'], g] < iou:
                    continue
                iou = ious[dt['idx'], g]
                m = g
            if m == -1:
                continue
            dtIg[t, d] = gtIg[m]
            dtm[t, d] = m
            gtm[t, m] = d
    # unmatched dts outside the area range are ignored
    a = np.array([dt['area'] < aRng[0] or dt['area'] > aRng[1]
                  for dt in dts]).reshape(1, -1)
    dtIg = np.logical_or(dtIg, np.logical_and(dtm < 0,
                                              np.repeat(a, T, 0)))
    return {'dtMatches': dtm, 'dtIgnore': dtIg,
            'dtScores': [dt['score'] for dt in dts],
            'num_gt': int(np.count_nonzero(gtIg == 0))}


def accumulate(per_image):
    """COCOeval.accumulate for one (aRng, maxDet) slice. Returns
    (precision (T, R), recall (T,)) with -1 where npig == 0."""
    T, R = len(IOU_THRS), len(REC_THRS)
    precision = -np.ones((T, R))
    recall = -np.ones(T)
    dtScores = np.concatenate(
        [np.asarray(e['dtScores']) for e in per_image]) \
        if per_image else np.zeros(0)
    inds = np.argsort(-dtScores, kind='mergesort')
    dtm = np.concatenate([e['dtMatches'] for e in per_image], axis=1)[
        :, inds] if per_image else np.zeros((T, 0))
    dtIg = np.concatenate([e['dtIgnore'] for e in per_image], axis=1)[
        :, inds] if per_image else np.zeros((T, 0))
    npig = sum(e['num_gt'] for e in per_image)
    if npig == 0:
        return precision, recall
    tps = np.logical_and(dtm >= 0, np.logical_not(dtIg))
    fps = np.logical_and(dtm < 0, np.logical_not(dtIg))
    tp_sum = np.cumsum(tps, axis=1).astype(float)
    fp_sum = np.cumsum(fps, axis=1).astype(float)
    for t in range(T):
        tp = tp_sum[t]
        fp = fp_sum[t]
        nd = len(tp)
        rc = tp / npig
        pr = tp / (fp + tp + np.spacing(1))
        q = np.zeros(R)
        recall[t] = rc[-1] if nd else 0
        pr = pr.tolist()
        for i in range(nd - 1, 0, -1):
            if pr[i] > pr[i - 1]:
                pr[i - 1] = pr[i]
        inds_r = np.searchsorted(rc, REC_THRS, side='left')
        try:
            for ri, pi in enumerate(inds_r):
                q[ri] = pr[pi]
        except IndexError:
            pass
        precision[t] = np.array(q)
    return precision, recall


def _summ_ap(precision):
    p = precision[precision > -1]
    return float(np.mean(p)) if p.size else float('nan')


def _summ_ar(recall):
    r = recall[recall > -1]
    return float(np.mean(r)) if r.size else float('nan')


def coco_summary_oracle(predictions, gts, iou_type='bbox'):
    """The 12-number COCOeval.summarize table, keyed like
    data/metrics.py coco_summary."""
    ious = [compute_ious(p, g, iou_type)
            for p, g in zip(predictions, gts)]

    def run(aRng, maxDet):
        per_image = [
            evaluate_img(p, g, i, aRng, maxDet, iou_type)
            for p, g, i in zip(predictions, gts, ious)]
        return accumulate(per_image)

    out = {}
    prec_all, rec_all = run(AREA_RNG['all'], 100)
    out['AP'] = _summ_ap(prec_all)
    out['AP_50'] = _summ_ap(prec_all[0])
    out['AP_75'] = _summ_ap(prec_all[5])
    out['AR_100'] = _summ_ar(rec_all)
    for name in ('small', 'medium', 'large'):
        prec, rec = run(AREA_RNG[name], 100)
        out[f'AP_{name}'] = _summ_ap(prec)
        out[f'AR_{name}'] = _summ_ar(rec)
    for k in (1, 10):
        _, rec = run(AREA_RNG['all'], k)
        out[f'AR_{k}'] = _summ_ar(rec)
    return out
