#!/usr/bin/env python
"""ZoeDepth training CLI — the TPU-native counterpart of the
reference's `depth_modules/zoedepth/trainers/` entry points
(zoedepth_trainer.py for the single-head N model, zoedepth_nk_
trainer.py for the two-headed router model over the mixed
NYU+KITTI round-robin stream).

Example (N model on an nyu-style tree):
  python scripts/train_zoedepth.py \
    --data-path data/nyu --gt-path data/nyu --split splits/nyu.txt \
    --dataset nyu --epochs 2 --batch 8 --ckpt-out workspace/zoe.msgpack

NK variant (router + dual heads, domain CE loss):
  python scripts/train_zoedepth.py --variant nk \
    --data-path data/nyu --gt-path data/nyu --split splits/nyu.txt \
    --kitti-data-path data/kitti --kitti-gt-path data/kitti \
    --kitti-split splits/kitti.txt ...
"""
import argparse
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--variant', default='n', choices=('n', 'nk'))
    ap.add_argument('--data-path', required=True)
    ap.add_argument('--gt-path', required=True)
    ap.add_argument('--split', required=True,
                    help='split file: "image_rel depth_rel focal" '
                         'lines (reference format)')
    ap.add_argument('--dataset', default='nyu',
                    choices=('nyu', 'kitti'))
    ap.add_argument('--kitti-data-path', default='')
    ap.add_argument('--kitti-gt-path', default='')
    ap.add_argument('--kitti-split', default='')
    ap.add_argument('--img-size', type=int, nargs=2,
                    default=(384, 512), metavar=('H', 'W'))
    ap.add_argument('--batch', type=int, default=8)
    ap.add_argument('--epochs', type=int, default=5)
    ap.add_argument('--max-steps', type=int, default=0,
                    help='stop after N steps (0 = run the epochs)')
    ap.add_argument('--lr', type=float, default=1.6e-4)
    ap.add_argument('--warmup', type=int, default=300)
    ap.add_argument('--min-depth', type=float, default=1e-3)
    ap.add_argument('--max-depth', type=float, default=10.0)
    ap.add_argument('--ckpt-out', default='workspace/zoe.msgpack')
    ap.add_argument('--resume', default='')
    ap.add_argument('--eval-split', default='',
                    help='validation split file (same tree); runs the '
                         'nine-metric eval at the end')
    ap.add_argument('--eval-max-images', type=int, default=50)
    ap.add_argument('--log-every', type=int, default=20)
    ap.add_argument('--run-dir', default='',
                    help='experiment dir for metrics.jsonl '
                         '(default: <ckpt-out dir>/run)')
    ap.add_argument('--wandb', action='store_true',
                    help='also mirror scalars to wandb when it is '
                         'importable (never required)')
    ap.add_argument('--seed', type=int, default=0)
    # tiny-model knobs for smoke tests
    ap.add_argument('--tiny', action='store_true',
                    help='miniature BEiT core (smoke tests only)')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from cartoonsegmentation_tpu.data.depth_mono import (
        MixedNYUKITTILoader, MonoDepthSource, MonoDepthTrainLoader,
        evaluate_depth)
    from cartoonsegmentation_tpu.models.zoedepth import (ZoeDepth,
                                                         ZoeDepthNK)
    from cartoonsegmentation_tpu.parallel import (SimpleState,
                                                  make_mesh,
                                                  shard_batch,
                                                  zoe_optimizer)
    from cartoonsegmentation_tpu.parallel.depth_train import (
        make_zoe_nk_train_step, make_zoe_train_step)
    from cartoonsegmentation_tpu.utils import LOGGER, resize_bilinear_ac
    from cartoonsegmentation_tpu.utils.checkpoint import (load_params,
                                                          save_params)

    ndev = len(jax.devices())
    if args.batch % ndev:
        raise SystemExit(f'--batch {args.batch} must divide the '
                         f'{ndev} devices of the data mesh')
    mesh = make_mesh(data=ndev, model=1)
    h, w = args.img_size

    tiny_kw = {}
    if args.tiny:
        tiny_kw = dict(bin_embedding_dim=32,
                       core_features=32,
                       core_out_channels=(32, 64, 96, 96),
                       core_dim=64, core_depth=8, core_heads=4,
                       core_hooks=(1, 3, 5, 7), btlnck_features=48)
        if args.variant == 'nk':
            # NK sizes its per-domain heads via bin_conf, not n_bins
            tiny_kw['bin_conf'] = (('nyu', 16, 1e-3, 10.0),
                                   ('kitti', 16, 1e-3, 80.0))
        else:
            tiny_kw['n_bins'] = 16
    cls = ZoeDepthNK if args.variant == 'nk' else ZoeDepth
    # the model consumes images at img_size and predicts at half res;
    # the train step upsamples predictions to the label grid
    model = cls(img_size=(h, w), **tiny_kw)

    src = MonoDepthSource(args.data_path, args.gt_path, args.split,
                          dataset=args.dataset,
                          do_kb_crop=args.dataset == 'kitti')
    loader = MonoDepthTrainLoader(src, args.batch, (h, w),
                                  seed=args.seed,
                                  min_depth=args.min_depth,
                                  max_depth=args.max_depth)
    if args.variant == 'nk':
        if not args.kitti_split:
            raise SystemExit('--variant nk needs the kitti '
                             '--kitti-data-path/--kitti-gt-path/'
                             '--kitti-split stream')
        ksrc = MonoDepthSource(args.kitti_data_path, args.kitti_gt_path,
                               args.kitti_split, dataset='kitti',
                               do_kb_crop=True)
        kloader = MonoDepthTrainLoader(ksrc, args.batch, (h, w),
                                       seed=args.seed,
                                       min_depth=args.min_depth,
                                       max_depth=80.0)
        loader = MixedNYUKITTILoader(loader, kloader)

    steps_per_epoch = max(len(src) // args.batch, 1)
    if args.variant == 'nk':
        # the round-robin mixed loader yields TWO batches (nyu+kitti)
        # per round, n_rounds = max of the two stream lengths
        steps_per_epoch = 2 * max(steps_per_epoch,
                                  max(len(ksrc) // args.batch, 1))
    total = args.max_steps or args.epochs * steps_per_epoch
    warmup = min(args.warmup, max(total // 10, 1))
    tx = zoe_optimizer(lr=args.lr, warmup_steps=warmup,
                       total_steps=max(total, warmup + 1))

    rng = jax.random.PRNGKey(args.seed)
    from cartoonsegmentation_tpu.utils.env import jit_init
    variables = jit_init(model, rng,
                         jnp.zeros((1, h, w, 3), jnp.float32))
    params = variables['params']
    if args.resume:
        LOGGER.info(f'resuming params from {args.resume}')
        params = load_params(args.resume, params)
    state = SimpleState(params, tx.init(params),
                        jnp.zeros((), jnp.int32))

    if args.variant == 'nk':
        step_fn = make_zoe_nk_train_step(model, tx)
    else:
        step_fn = make_zoe_train_step(model, tx,
                                      min_depth=args.min_depth,
                                      max_depth=args.max_depth)

    from cartoonsegmentation_tpu.utils.tracking import ExperimentTracker
    run_dir = args.run_dir or osp.join(
        osp.dirname(args.ckpt_out) or '.', 'run')
    tracker = ExperimentTracker(run_dir, config=vars(args),
                                name=f'zoe_{args.variant}',
                                use_wandb=args.wandb)

    t0 = time.time()
    step = 0
    with mesh:
        for ep in range(args.epochs):
            for batch in loader.epoch(ep):
                sharded = shard_batch(mesh, batch)
                state, metrics = step_fn(state, sharded)
                step += 1
                if step % args.log_every == 0 or step == total:
                    m = {k: float(jax.device_get(v))
                         for k, v in metrics.items()}
                    rate = step * args.batch / (time.time() - t0)
                    LOGGER.info(f'epoch {ep} step {step}/{total} '
                                + ' '.join(f'{k}={v:.4f}'
                                           for k, v in m.items())
                                + f' ({rate:.1f} img/s)')
                    tracker.log({**m, 'img_per_s': rate,
                                 'epoch': ep}, step, prefix='Train/')
                if step >= total:
                    break
            if step >= total:
                break
    save_params(args.ckpt_out, state.params)
    LOGGER.info(f'saved {args.ckpt_out}')

    if args.eval_split:
        esrc = MonoDepthSource(args.data_path, args.gt_path,
                               args.eval_split, dataset=args.dataset)

        import functools

        @functools.partial(jax.jit, static_argnums=2)
        def pred_fn(p, img, out_hw):
            small = jax.image.resize(img[None], (1, h, w, 3), 'linear')
            out = model.apply({'params': p}, small)
            if isinstance(out, dict):
                out = out['metric_depth']
            return resize_bilinear_ac(out, *out_hw)[0, ..., 0]

        def predict(im):
            H, W = im.shape[:2]
            return pred_fn(state.params, jnp.asarray(im), (H, W))

        res = evaluate_depth(
            predict, esrc,
            indices=range(min(len(esrc), args.eval_max_images)),
            garg_crop=args.dataset == 'kitti',
            eigen_crop=args.dataset != 'kitti',
            min_depth_eval=args.min_depth,
            max_depth_eval=args.max_depth)
        LOGGER.info('eval: ' + ' '.join(f'{k}={v:.4f}'
                                        for k, v in res.items()))
        tracker.log(res, step, prefix='Metrics/')
    tracker.close()


if __name__ == '__main__':
    main()
