#!/usr/bin/env python
"""Golden acceptance artifacts — the repo's notebook-with-outputs.

The reference ships ``run_segmentation.ipynb`` committed WITH its cell
outputs, which acts as a de-facto acceptance test: re-running it on the
three ``examples/`` images and eyeballing the rendered masks is how a
change was validated (Parity: /root/reference/run_segmentation.ipynb,
/root/reference/run_in_colab.ipynb). This repo's equivalent is

    this script  →  committed PNGs in tests/goldens/
    tests/test_goldens.py  →  re-runs the identical small-res CPU
                              pipeline and compares pixel-wise

Weights are the deterministic seeded random init (no published
checkpoints exist in this environment), so the artifacts freeze the
pipeline's STRUCTURE — letterbox geometry, the 512-grid disparity
flow, instance-overlay drawing, the splat → discfill → bokeh render —
rather than visual quality. Any unintended numeric change in a stage
surfaces as a golden diff; an intended change regenerates with

    JAX_PLATFORMS=cpu python scripts/make_goldens.py
"""
import os
import os.path as osp
import sys

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, REPO)

EXAMPLES = ('kenburns_lion.png', '612989.jpg', '1562990.jpg')
EXAMPLE_DIR = '/root/reference/examples'
GOLDEN_DIR = osp.join(REPO, 'tests', 'goldens')

# Small-res CPU configuration: every stage family of the shipped
# default remains in the path (RTMDet detector + ISNet refine +
# instance depth adjust + autozoom + DoF render), only sizes shrink
# so the acceptance test runs in seconds on the test CPU backend.
GOLDEN_CFG = dict(
    detector='animeinsseg', det_size=320, max_instances=16,
    refine_method='refinenet_isnet', refine_size=160,
    depth_est='default', max_size=224, num_frame=5,
    depth_field=True, auto_zoom=True)


def build_pipeline():
    from cartoonsegmentation_tpu.config import KenBurnsConfig
    from cartoonsegmentation_tpu.pipeline import KenBurnsPipeline
    pipe = KenBurnsPipeline(KenBurnsConfig(**GOLDEN_CFG))
    pipe.ensure_detector()
    return pipe


def generate_goldens(pipe, img_path):
    """One example image → dict of stage-name → BGR uint8 artifact."""
    import cv2
    import numpy as np
    img = cv2.imread(img_path)
    assert img is not None, img_path
    state = pipe.generate_state(img)
    out = {k: np.ascontiguousarray(v) for k, v in pipe.stages.items()}
    obj_from, obj_to = pipe.autozoom(state)
    steps = np.asarray([0.0, 0.5, 1.0], np.float32)
    frames = pipe.render_frames(state, obj_from, obj_to, steps)
    for name, frame in zip(('frame_start', 'frame_mid', 'frame_end'),
                           np.asarray(frames)):
        out[name] = frame
    return out


def main():
    # force the CPU backend for byte-stable artifacts (the container
    # sitecustomize pins JAX_PLATFORMS=axon before argv is seen)
    import jax
    jax.config.update('jax_platforms', 'cpu')
    import cv2
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    pipe = build_pipeline()
    for ex in EXAMPLES:
        stem = osp.splitext(ex)[0]
        arts = generate_goldens(pipe, osp.join(EXAMPLE_DIR, ex))
        for stage, im in arts.items():
            path = osp.join(GOLDEN_DIR, f'{stem}_{stage}.png')
            cv2.imwrite(path, im)
            print(f'wrote {path} {im.shape}')


if __name__ == '__main__':
    main()
