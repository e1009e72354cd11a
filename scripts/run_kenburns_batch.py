#!/usr/bin/env python
"""Batch 3D Ken Burns over a directory (parity: reference
run_kenburns_batch.py). State-generation compiles once per image
shape bucket; subsequent images of the same size reuse the jits."""
import argparse
import os
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--cfg', default='configs/3dkenburns.yaml')
    ap.add_argument('--input-dir', required=True)
    ap.add_argument('--save-dir', default='workspace/output')
    ap.add_argument('--no-detector', action='store_true',
                    help='skip instance segmentation (the reference '
                         'always segments)')
    args = ap.parse_args()

    from cartoonsegmentation_tpu.config import build_kenburns_cfg
    from cartoonsegmentation_tpu.pipeline import KenBurnsPipeline

    cfg = build_kenburns_cfg(args.cfg)
    if args.no_detector:
        cfg = cfg.replace(detector='none')
    pipe = KenBurnsPipeline(cfg)
    # batch mode never dumps stage previews; skip their per-stage D2H
    pipe.stage_previews = False
    pipe.ensure_detector()

    os.makedirs(args.save_dir, exist_ok=True)
    imgs = sorted(
        osp.join(args.input_dir, f) for f in os.listdir(args.input_dir)
        if f.lower().endswith(('.jpg', '.jpeg', '.png', '.webp')))
    for p in imgs:
        name = osp.splitext(osp.basename(p))[0]
        out = osp.join(args.save_dir, f'{name}.mp4')
        # run(img, path) takes the streaming route: device→host I420
        # transfer + mp4 encode overlapped with the next chunk's render
        frames = pipe.run(p, out)
        print(f'{p} -> {out} ({len(frames)} frames)')


if __name__ == '__main__':
    main()
