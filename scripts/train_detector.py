#!/usr/bin/env python
"""Detector training CLI — the TPU-native counterpart of the
reference's mmdet-driven RTMDet-Ins training (SURVEY.md §3.5: the
reference ships no train script; its recipe lives in the checkpoint
meta / mmdet configs).

Ties the training stack together end to end:
  MixedDetDataset (COCO jsons, ignore-mask aware, mosaic/mixup)
  → DP train step over an all-device (data,) mesh (XLA grad
    all-reduce over ICI)
  → AdamW + warmup/cosine, grad clip
  → periodic msgpack checkpoints, viz hook, COCO-mAP validation.

Example:
  python scripts/train_detector.py \
    --ann data/annotations/train.json=data/train \
    --val-ann data/annotations/val.json=data/val \
    --size s --steps 2000 --batch 8 --ckpt-out workspace/det.msgpack
"""
import argparse
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

SIZES = {  # RTMDet deepen/widen factors
    'nano': (0.33, 0.125),  # test/smoke size
    'tiny': (0.167, 0.375), 's': (0.33, 0.5), 'm': (0.67, 0.75),
    'l': (1.0, 1.0),
}


def parse_sources(specs):
    from cartoonsegmentation_tpu.data.dataset import CocoSource
    out = []
    for spec in specs:
        ann, _, root = spec.partition('=')
        out.append(CocoSource(ann, root or osp.dirname(ann)))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--ann', action='append', required=True,
                    help='train COCO json, as path.json=img_root '
                         '(repeatable; sources are concatenated)')
    ap.add_argument('--val-ann', default='',
                    help='validation COCO json, same format')
    ap.add_argument('--size', default='l', choices=sorted(SIZES))
    ap.add_argument('--img-size', type=int, default=640)
    ap.add_argument('--batch', type=int, default=8)
    ap.add_argument('--steps', type=int, default=1000)
    ap.add_argument('--lr', type=float, default=4e-3)
    ap.add_argument('--weight-decay', type=float, default=0.05)
    ap.add_argument('--warmup', type=int, default=100)
    ap.add_argument('--clip-norm', type=float, default=10.0)
    ap.add_argument('--ema-decay', type=float, default=0.9998,
                    help='EMA decay for the shipped weights (the '
                         'reference RTMDet recipe; 0 disables)')
    ap.add_argument('--max-instances', type=int, default=16)
    ap.add_argument('--mosaic-prob', type=float, default=0.5)
    ap.add_argument('--mixup-prob', type=float, default=0.3)
    ap.add_argument('--ckpt-out', default='workspace/detector.msgpack')
    ap.add_argument('--save-every', type=int, default=500)
    ap.add_argument('--resume', default='')
    ap.add_argument('--log-every', type=int, default=20)
    ap.add_argument('--val-every', type=int, default=0,
                    help='0 = validate only at the end')
    ap.add_argument('--val-max-images', type=int, default=100)
    ap.add_argument('--viz-dir', default='',
                    help='directory of sample images for the '
                         'visualization hook')
    ap.add_argument('--run-dir', default='',
                    help='experiment dir for metrics.jsonl + viz '
                         'grids (default: <ckpt-out dir>/run)')
    ap.add_argument('--wandb', action='store_true',
                    help='also mirror scalars to wandb when it is '
                         'importable (never required)')
    ap.add_argument('--seed', type=int, default=0)
    args = ap.parse_args()

    import jax
    import numpy as np
    import optax
    from cartoonsegmentation_tpu.data.dataset import MixedDetDataset
    from cartoonsegmentation_tpu.models.rtmdet import AnimeDetector
    from cartoonsegmentation_tpu.parallel import (
        TrainState, create_train_state, ema_decay_schedule, ema_update,
        make_mesh, make_train_step, shard_batch)
    from cartoonsegmentation_tpu.utils import LOGGER
    from cartoonsegmentation_tpu.utils.checkpoint import (load_params,
                                                          save_params)

    ndev = len(jax.devices())
    if args.batch % ndev:
        raise SystemExit(f'--batch {args.batch} must divide the '
                         f'{ndev} devices of the data mesh')
    mesh = make_mesh(data=ndev, model=1)
    LOGGER.info(f'training on {ndev} device(s), '
                f'{args.batch // ndev} samples/device')

    deepen, widen = SIZES[args.size]
    model = AnimeDetector(deepen=deepen, widen=widen)
    sched = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, args.warmup, max(args.steps, args.warmup + 1))
    tx = optax.chain(optax.clip_by_global_norm(args.clip_norm),
                     optax.adamw(sched, weight_decay=args.weight_decay))
    state = create_train_state(model, jax.random.PRNGKey(args.seed),
                               (args.img_size, args.img_size), tx)
    resumed_ema = None
    if args.resume:
        LOGGER.info(f'resuming params from {args.resume}')
        try:
            restored = load_params(
                args.resume,
                {'params': state.params, 'raw_params': state.params,
                 'batch_stats': state.batch_stats})
            raw = restored['raw_params']
            resumed_ema = restored['params']
        except Exception:
            restored = load_params(args.resume,
                                   {'params': state.params,
                                    'batch_stats': state.batch_stats})
            raw = restored['params']
        state = TrainState(raw, restored['batch_stats'],
                           state.opt_state, state.step)

    ds = MixedDetDataset(parse_sources(args.ann),
                         img_size=args.img_size,
                         mosaic_prob=args.mosaic_prob,
                         mixup_prob=args.mixup_prob,
                         max_instances=args.max_instances, train=True)
    LOGGER.info(f'train dataset: {len(ds)} images '
                f'({len(args.ann)} source(s))')
    step_fn = make_train_step(model, tx)

    ema_params = None
    if args.ema_decay > 0:
        ema_params = resumed_ema if resumed_ema is not None \
            else state.params

    from cartoonsegmentation_tpu.utils.tracking import ExperimentTracker
    run_dir = args.run_dir or osp.join(
        osp.dirname(args.ckpt_out) or '.', 'run')
    tracker = ExperimentTracker(run_dir, config=vars(args),
                                name='detector', use_wandb=args.wandb)

    viz = None
    if args.viz_dir:
        from cartoonsegmentation_tpu.parallel.hooks import \
            InstanceSegVisualizationHook
        viz = InstanceSegVisualizationHook(
            args.viz_dir, out_dir=osp.join(run_dir, 'images'),
            log_fn=None if not args.wandb else tracker.log_image)

    def save(tag=''):
        path = args.ckpt_out if not tag else \
            args.ckpt_out.replace('.msgpack', f'_{tag}.msgpack')
        # 'params' = the EMA weights (what inference loads — the
        # reference checkpoints carry EMA state); 'raw_params' = the
        # raw trajectory, so --resume continues training unsmoothed
        p = ema_params if ema_params is not None else state.params
        save_params(path, {'params': p, 'raw_params': state.params,
                           'batch_stats': state.batch_stats})
        LOGGER.info(f'saved {path}')

    _seg_cache = []

    def make_infer():
        # one AnimeInsSeg reused across validations — its jitted
        # forward stays compiled; only the variables are refreshed
        from cartoonsegmentation_tpu.pipeline import AnimeInsSeg
        if not _seg_cache:
            seg = AnimeInsSeg(det_size=args.img_size,
                              max_instances=args.max_instances)
            seg.model = model
            _seg_cache.append(seg)
        seg = _seg_cache[0]
        p = ema_params if ema_params is not None else state.params
        seg.load_variables({'params': p,
                            'batch_stats': state.batch_stats})
        return seg

    def validate(step):
        if not args.val_ann:
            if viz is not None:
                viz.before_val(make_infer(), step)
            return
        import cv2
        from cartoonsegmentation_tpu.data.metrics import AnimeMangaMetric
        src = parse_sources([args.val_ann])[0]
        seg = make_infer()
        metric = AnimeMangaMetric()
        n = min(len(src), args.val_max_images)
        for i in range(n):
            s = src.load(i)
            ins = seg.infer(s['image'])
            valid = np.asarray(jax.device_get(ins.valid))
            pred = {
                'bboxes': np.asarray(ins.bboxes)[valid],
                'scores': np.asarray(ins.scores)[valid],
                'masks': list(np.asarray(ins.masks)[valid]),
            }
            gt_xywh = s['boxes'].copy()
            gt_xywh[:, 2:] -= gt_xywh[:, :2]
            gt = {'bboxes': gt_xywh, 'masks': list(s['masks'])}
            metric.update(s['image_id'], pred, gt)
        res = metric.compute()
        for k, v in res.items():
            LOGGER.info(f'step {step} val {k}: '
                        f"mAP={v['mAP']:.4f} mAP50={v['mAP_50']:.4f}")
            tracker.log(v, step, prefix=f'Metrics/{k}/')
        if viz is not None:
            viz.before_val(seg, step)

    t0 = time.time()
    with mesh:
        for i, batch in enumerate(ds.batches(args.batch, args.steps)):
            batch = shard_batch(mesh, batch)
            state, metrics = step_fn(state, batch)
            if ema_params is not None:
                ema_params = ema_update(
                    ema_params, state.params,
                    ema_decay_schedule(args.ema_decay, state.step))
            step = i + 1
            if step % args.log_every == 0 or step == args.steps:
                m = {k: float(jax.device_get(v))
                     for k, v in metrics.items()}
                rate = step * args.batch / (time.time() - t0)
                LOGGER.info(
                    f'step {step}/{args.steps} '
                    + ' '.join(f'{k}={v:.4f}' for k, v in m.items())
                    + f' ({rate:.1f} img/s)')
                tracker.log({**m, 'img_per_s': rate}, step,
                            prefix='Train/')
            if args.save_every and step % args.save_every == 0 \
                    and step < args.steps:
                save(tag=f'step{step}')
            if args.val_every and step % args.val_every == 0 \
                    and step < args.steps:
                validate(step)
    save()
    validate(args.steps)
    tracker.close()


if __name__ == '__main__':
    main()
