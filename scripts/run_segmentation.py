#!/usr/bin/env python
"""Instance segmentation CLI (parity: reference run_segmentation
notebook / AnimeInsSeg.infer with visualization + COCO export)."""
import argparse
import os
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--input', required=True, help='image file or dir')
    ap.add_argument('--save-dir', default='workspace/output')
    ap.add_argument('--ckpt', default='',
                    help='torch rtmdetl checkpoint to convert+load')
    ap.add_argument('--score-thr', type=float, default=0.3)
    ap.add_argument('--det-size', type=int, default=640)
    ap.add_argument('--detector', default='animeinsseg',
                    choices=('animeinsseg', 'sam', 'maskrcnn'),
                    help="'sam' re-masks AnimeInsSeg boxes with the "
                         'native SAM; maskrcnn is the COCO model')
    ap.add_argument('--sam-ckpt', default='',
                    help='official sam_vit_*.pth to convert+load')
    ap.add_argument('--save-json', default='',
                    help='write COCO-style annotations here')
    args = ap.parse_args()

    import cv2
    import numpy as np
    from cartoonsegmentation_tpu.pipeline import AnimeInsSeg
    from cartoonsegmentation_tpu.data.coco_export import instances_to_coco

    if args.detector == 'maskrcnn':
        from cartoonsegmentation_tpu.pipeline import MaskRCNNDetector
        seg = MaskRCNNDetector()
        if args.ckpt:
            seg.load_torch_checkpoint(args.ckpt)
    else:
        seg = AnimeInsSeg(det_size=args.det_size)
        if args.ckpt:
            seg.load_torch_checkpoint(args.ckpt)
        if args.detector == 'sam':
            from cartoonsegmentation_tpu.pipeline import SamDetector
            seg = SamDetector(seg)
            if args.sam_ckpt:
                seg.sam.load_torch_checkpoint(args.sam_ckpt)

    if osp.isdir(args.input):
        imgs = sorted(
            osp.join(args.input, f) for f in os.listdir(args.input)
            if f.lower().endswith(('.jpg', '.jpeg', '.png', '.webp')))
    else:
        imgs = [args.input]

    os.makedirs(args.save_dir, exist_ok=True)
    images_meta, annotations = [], []
    for ii, p in enumerate(imgs):
        img = cv2.imread(p)
        ins = seg.infer(img, pred_score_thr=args.score_thr)
        drawn = ins.draw(img)
        out = osp.join(args.save_dir, osp.basename(p))
        cv2.imwrite(out, drawn)
        n = int(np.asarray(ins.count()))
        print(f'{p}: {n} instances -> {out}')
        if args.save_json:
            im_meta, anns = instances_to_coco(ins, ii, osp.basename(p),
                                              img.shape[:2],
                                              obj_id_start=len(annotations))
            images_meta.append(im_meta)
            annotations.extend(anns)

    if args.save_json:
        import json
        from cartoonsegmentation_tpu.utils.constants import CATEGORIES
        with open(args.save_json, 'w') as f:
            json.dump({'info': {}, 'licenses': [], 'images': images_meta,
                       'annotations': annotations,
                       'categories': CATEGORIES}, f)
        print(f'annotations -> {args.save_json}')


if __name__ == '__main__':
    main()
