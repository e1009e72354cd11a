#!/usr/bin/env python
"""3D Ken Burns CLI (parity: reference run_kenburns.py).

Example:
  python scripts/run_kenburns.py --cfg configs/3dkenburns.yaml \
      --input-img examples/kenburns_lion.png --save-dir /tmp/kb --verbose
"""
import argparse
import os
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--cfg', default='configs/3dkenburns.yaml')
    ap.add_argument('--input-img', required=True)
    ap.add_argument('--save-dir', default='workspace/output')
    ap.add_argument('--verbose', action='store_true',
                    help='dump intermediate stages (depth, inpaint)')
    ap.add_argument('--no-depth-field', action='store_true')
    ap.add_argument('--no-detector', action='store_true',
                    help='skip instance segmentation (the reference '
                         'always segments; without converted weights '
                         'masks are random — use this to opt out)')
    ap.add_argument('--profile', action='store_true',
                    help='print the per-stage wall-time table when done')
    ap.add_argument('--trace-dir', default='',
                    help='also dump a jax.profiler trace here '
                         '(view with xprof/tensorboard)')
    args = ap.parse_args()

    import cv2
    import numpy as np
    from cartoonsegmentation_tpu.config import build_kenburns_cfg
    from cartoonsegmentation_tpu.pipeline import (KenBurnsPipeline,
                                                  write_video)

    cfg = build_kenburns_cfg(args.cfg)
    if args.no_depth_field:
        cfg = cfg.replace(depth_field=False)
    if args.no_detector:
        cfg = cfg.replace(detector='none')
    pipe = KenBurnsPipeline(cfg)
    pipe.ensure_detector()

    os.makedirs(args.save_dir, exist_ok=True)
    name = osp.splitext(osp.basename(args.input_img))[0]

    from cartoonsegmentation_tpu.utils.profiling import trace
    with trace(args.trace_dir):
        state = pipe.generate_state(args.input_img)
        obj_from, obj_to = pipe.autozoom(state)
        frames = pipe.process_kenburns(state, obj_from, obj_to)
    if args.verbose:
        pipe.save_stages(args.save_dir, name)
    if args.profile:
        print(pipe.timer.report())

    out_path = osp.join(args.save_dir, f'{name}.mp4')
    write_video(frames, out_path, playback=cfg.playback)
    print(f'saved {len(frames)} frames -> {out_path}')


if __name__ == '__main__':
    main()
