#!/usr/bin/env python
"""Standalone depth-estimation CLI (the upstream 3D-Ken-Burns depth
tool).

Parity: anime_3dkenburns/depthestim.py:60-78 — for the 'default'
estimator the chain is transcribed exactly:

  disparity_estimation(image)                      # <=512 internal grid
  disparity_refinement(resize(image, grid*4), d)   # 4x-upscaled guide
  resize(d, image_size) * (max(H, W) / 256.0)      # grid-scale factor
  depth = focal * baseline / (disparity + 1e-7)    # focal = max/2,
                                                   # baseline = 40

and the outputs match the reference tool's: `<out>.npy` holds the
float32 depth, and the sibling .png holds disparity / baseline * 255
clipped to uint8. No instance adjustment runs (depthestim.py imports
disparity-adjustment but never calls it).

Other estimators (leres / leres_boost / zoe / zoe_nk / marigold) are
a convenience beyond the reference tool: their disparity is already
at image resolution, and is taken through the PIPELINE's depth
conversion (normalize to baseline, depth = focal*baseline/(d+1e-5) —
pipeline/kenburns.py _prepare_state) so the saved depth means the
same thing a Ken Burns run would see.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

BASELINE = 40.0


def depthestim(pipe, img_bgr):
    """Reference depthestim.py chain on a BGR uint8 image →
    (disparity f32 (H, W), depth f32 (H, W)), both at image
    resolution. `pipe.cfg.depth_est` selects the estimator; only
    'default' uses the reference tool's 4x-guide + max/256 scaling."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    H, W = img_bgr.shape[:2]
    image = jnp.asarray(img_bgr.astype(np.float32) / 255.0)
    focal = max(H, W) / 2.0

    if pipe.cfg.depth_est == 'default':
        disp = pipe._est_default(image)            # (dh, dw, 1)
        dh, dw = disp.shape[:2]
        # depthestim.py:68 upsamples the IMAGE to 4x the disparity
        # grid as the refinement guide (the pipeline instead guides
        # with the max_size image; kenburns_effect.py:618-622)
        guide = jax.image.resize(image, (dh * 4, dw * 4, 3),
                                 method='linear', antialias=False)
        disp = pipe._refine_disparity(guide, disp)
        disp = jax.image.resize(disp, (H, W, 1), method='linear',
                                antialias=False)
        disp = disp * (max(H, W) / 256.0)          # depthestim.py:69
        depth = (focal * BASELINE) / (disp + 1e-7)  # depthestim.py:70
    else:
        disp = pipe._estimate_disparity(image)     # image-res already
        disp = disp / (jnp.max(disp) + 1e-12) * BASELINE
        depth = (focal * BASELINE) / (disp + 1e-5)
    disp = np.asarray(jax.device_get(disp))[..., 0]
    depth = np.asarray(jax.device_get(depth))[..., 0]
    return disp, depth


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split('\n')[0])
    ap.add_argument('--in', dest='input', required=True,
                    help='input image path')
    ap.add_argument('--out', default='./depthestim.npy',
                    help='output .npy path (a .png disparity preview '
                         'is written next to it)')
    ap.add_argument('--depth-est', default='default',
                    choices=['default', 'leres', 'leres_boost', 'zoe',
                             'zoe_nk', 'marigold'])
    ap.add_argument('--cfg', default=None,
                    help='optional kenburns yaml for estimator knobs')
    ap.add_argument('--disparity-ckpt', default=None)
    ap.add_argument('--refine-ckpt', default=None)
    ap.add_argument('--vgg-ckpt', default=None)
    ap.add_argument('--leres-ckpt', default=None)
    ap.add_argument('--zoe-ckpt', default=None)
    args = ap.parse_args(argv)

    import cv2
    import numpy as np

    from cartoonsegmentation_tpu.config import (KenBurnsConfig,
                                                build_kenburns_cfg)
    from cartoonsegmentation_tpu.pipeline import KenBurnsPipeline

    cfg = (build_kenburns_cfg(args.cfg) if args.cfg
           else KenBurnsConfig())
    cfg = cfg.replace(depth_est=args.depth_est, detector='none')
    pipe = KenBurnsPipeline(cfg)
    if args.disparity_ckpt or args.refine_ckpt or args.vgg_ckpt:
        pipe.load_torch_checkpoints(disparity=args.disparity_ckpt,
                                    refine=args.refine_ckpt,
                                    vgg=args.vgg_ckpt)
    if args.leres_ckpt:
        pipe.load_leres_checkpoint(args.leres_ckpt)
    if args.zoe_ckpt:
        pipe.load_zoe_checkpoint(args.zoe_ckpt)

    img = cv2.imread(args.input, cv2.IMREAD_COLOR)
    if img is None:
        raise SystemExit(f'cannot read {args.input}')
    disp, depth = depthestim(pipe, img)
    npy, png = save_outputs(disp, depth, args.out)
    print(f'wrote {npy} and {png} '
          f'(depth range {depth.min():.3f}..{depth.max():.3f})')


def save_outputs(disp, depth, out):
    """depthestim.py:75-77 output convention: float depth to <out>
    (.npy), disparity/baseline*255 uint8 preview to the sibling .png."""
    import cv2
    import numpy as np
    png = out.replace('.npy', '.png') if out.endswith('.npy') \
        else out + '.png'
    cv2.imwrite(png, np.clip(disp / BASELINE * 255.0, 0.0,
                             255.0).astype(np.uint8))
    np.save(out, depth)
    return out if out.endswith('.npy') else out + '.npy', png


if __name__ == '__main__':
    main()
