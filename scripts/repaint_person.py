#!/usr/bin/env python
"""Per-person repaint CLI — the older lineart-anime variant of the
style editor (parity: reference repaint_person.py). Same engine as
run_style.py with lineart-oriented defaults (single-instance inpaint
focus, no background repaint)."""
import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--img_path', required=True)
    ap.add_argument('--prompt', default='')
    ap.add_argument('--nprompt', default='')
    ap.add_argument('--url',
                    default='http://127.0.0.1:7860/sdapi/v1/img2img')
    ap.add_argument('--resolution', type=int, default=640)
    ap.add_argument('--steps', type=int, default=24)
    ap.add_argument('--denoising_strength', type=float, default=0.75)
    ap.add_argument('--save_dir', default='repaint_output')
    ap.add_argument('--detector_ckpt', default='')
    args = ap.parse_args()

    import cv2
    from pathlib import Path
    from cartoonsegmentation_tpu.pipeline import AnimeInsSeg
    from cartoonsegmentation_tpu.pipeline.style import (StyleConfig,
                                                        StyleEditor)

    detector = AnimeInsSeg()
    if args.detector_ckpt:
        detector.load_torch_checkpoint(args.detector_ckpt)

    cfg = StyleConfig(
        url=args.url, style_prompt=args.prompt,
        global_nprompt=args.nprompt, long_side=args.resolution,
        niter=1, apply_bg_tagger=False, apply_fg_tagger=True,
        denoising_strength=args.denoising_strength,
        save_dir=args.save_dir,
        sd_params={'steps': args.steps, 'seed': 0,
                   'alwayson_scripts': {'controlnet': {'args': [{}]}}})
    editor = StyleEditor(cfg, detector=detector, tagger=None)
    img = cv2.imread(args.img_path)
    saved = editor.repaint(img, Path(args.img_path).stem)
    print(f'{args.img_path} -> {saved}')


if __name__ == '__main__':
    main()
