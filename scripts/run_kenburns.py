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

    import numpy as np
    from cartoonsegmentation_tpu.config import build_kenburns_cfg
    from cartoonsegmentation_tpu.pipeline import KenBurnsPipeline

    cfg = build_kenburns_cfg(args.cfg)
    if args.no_depth_field:
        cfg = cfg.replace(depth_field=False)
    if args.no_detector:
        cfg = cfg.replace(detector='none')
    pipe = KenBurnsPipeline(cfg)
    # stage previews cost a full-frame D2H each; only --verbose
    # (save_stages) consumes them
    pipe.stage_previews = args.verbose
    pipe.ensure_detector()

    os.makedirs(args.save_dir, exist_ok=True)
    name = osp.splitext(osp.basename(args.input_img))[0]
    out_path = osp.join(args.save_dir, f'{name}.mp4')

    from cartoonsegmentation_tpu.utils.profiling import trace
    with trace(args.trace_dir):
        # the streaming renderer overlaps each chunk's device→host
        # I420 copy + mp4 encode with the next chunk's render — the
        # tunnel-bound transfer otherwise serializes after the render
        # (~20 s at 1024). Same stage sequence as pipe.run().
        state = pipe.generate_state(args.input_img)
        obj_from, obj_to = pipe.autozoom(state)
        state = pipe.inpaint_extremes(state, obj_from, obj_to)
        steps = np.linspace(0.0, 1.0, cfg.num_frame)
        with pipe.timer.time('render_stream+encode'):
            frames = pipe.render_frames_stream(state, obj_from, obj_to,
                                               steps, out_path)
    if args.verbose:
        pipe.save_stages(args.save_dir, name)
    if args.profile:
        print(pipe.timer.report())
    print(f'saved {len(frames)} frames -> {out_path}')


if __name__ == '__main__':
    main()
