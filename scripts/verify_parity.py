#!/usr/bin/env python
"""Weights-given acceptance harness (VERDICT r4 item 3).

The one-command path to close BASELINE.md's north star the moment
real checkpoints exist. No checkpoints ship in this environment, so
quality parity with the reference has never been *measured* — this
script stands ready so that

    python scripts/verify_parity.py --weights-dir models/AnimeInstanceSegmentation

(the reference's own download layout: readme.md:37-48 clones
HF dreMaz/AnimeInstanceSegmentation into models/) produces the full
parity report in one run:

- converts EVERY model family found in the directory (recursive scan
  by the reference's published filenames; see FAMILIES below),
- runs instance segmentation on the three reference examples/ images
  (drawn masks + COCO json — the run_segmentation.ipynb acceptance
  surface, reference inference entry animeinsseg/__init__.py:401),
- runs the full Ken Burns stage chain on kenburns_lion.png
  (stage PNGs + mp4 — the run_kenburns.py --verbose golden surface),
- optionally compares every artifact against committed REAL-weight
  goldens via SSIM (--goldens DIR; write them first with
  --regen-goldens on a trusted run),
- writes parity_report.json + REPORT.md into --out.

tests/test_verify_parity.py runs this end-to-end and auto-skips when
no weights directory is present.
"""
import argparse
import json
import os
import os.path as osp
import re
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

EXAMPLES = ('612989.jpg', '1562990.jpg', 'kenburns_lion.png')

# filename pattern → family key. Sources: reference
# utils/constants.py:79-82 (rtmdetl_e60 / kenburns_depth_refinenet /
# kenburns_inpaintnet / ZoeD_M12_N), animeseg_refine/__init__.py:
# 158-163 (refine_last, isnetis), leres/__init__.py:22 (res101.pth),
# pix2pix merge net latest_net_G.pth, torch.hub VGG19-bn and
# sniklaus network-disparity for the kenburns semantics/disparity
# nets (models/__init__.py:39), SwinV2 tagger onnx, SAM vit ckpts.
FAMILIES = (
    (r'rtmdetl.*\.ckpt$', 'detector'),
    (r'kenburns_depth_refinenet\.ckpt$', 'kb_refine'),
    (r'kenburns_inpaintnet\.ckpt$', 'kb_inpaint'),
    (r'^refine.*\.ckpt$', 'refine_isnet'),
    (r'isnetis\.ckpt$', 'animeseg_isnet'),
    (r'network-disparity\.pytorch$', 'kb_disparity'),
    (r'vgg19_bn.*\.pth$', 'kb_vgg'),
    (r'ZoeD_M12_NK\.pt$', 'zoe_nk'),
    (r'ZoeD_M12_N\.pt$', 'zoe'),
    (r'res101\.pth$', 'leres'),
    (r'latest_net_G\.pth$', 'pix2pix'),
    (r'(swinv2|tagger).*\.(onnx|pth|ckpt)$', 'tagger'),
    (r'sam_vit.*\.pth$', 'sam'),
    (r'modnet.*\.ckpt$', 'modnet'),
    (r'u2net.*\.pth$', 'u2net'),
)


def discover(weights_dir):
    """Recursive scan: family key → first matching path."""
    found = {}
    for root, _dirs, files in os.walk(weights_dir):
        for f in sorted(files):
            p = osp.join(root, f)
            for pat, fam in FAMILIES:
                if fam not in found and re.search(pat, f, re.I):
                    found[fam] = p
                    break
    return found


def ssim(a, b):
    """Mean SSIM over 8-bit images (windowed, Gaussian 11x1.5 — the
    standard Wang et al. settings), pure cv2/numpy (no skimage in the
    environment)."""
    import cv2
    import numpy as np
    if a.shape != b.shape:
        b = cv2.resize(b, (a.shape[1], a.shape[0]))
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    C1, C2 = (0.01 * 255) ** 2, (0.03 * 255) ** 2
    blur = lambda x: cv2.GaussianBlur(x, (11, 11), 1.5)  # noqa: E731
    mu_a, mu_b = blur(a), blur(b)
    s_aa = blur(a * a) - mu_a * mu_a
    s_bb = blur(b * b) - mu_b * mu_b
    s_ab = blur(a * b) - mu_a * mu_b
    m = ((2 * mu_a * mu_b + C1) * (2 * s_ab + C2)) / (
        (mu_a ** 2 + mu_b ** 2 + C1) * (s_aa + s_bb + C2))
    return float(m.mean())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--weights-dir', required=True,
                    help='directory holding the reference checkpoints '
                         '(scanned recursively by published filenames)')
    ap.add_argument('--out', default='workspace/parity',
                    help='report + artifact directory')
    ap.add_argument('--examples', default='/root/reference/examples',
                    help='reference examples dir (the 3 images)')
    ap.add_argument('--goldens', default='tests/goldens_real',
                    help='REAL-weight golden artifacts to SSIM against '
                         '(skipped when absent)')
    ap.add_argument('--regen-goldens', action='store_true',
                    help='write the produced artifacts INTO --goldens '
                         'as the new real-weight goldens')
    ap.add_argument('--ssim-thr', type=float, default=0.9)
    ap.add_argument('--max-size', type=int, default=1024)
    ap.add_argument('--num-frame', type=int, default=25,
                    help='frames for the kenburns chain (25 keeps the '
                         'harness quick; the bench covers 75)')
    args = ap.parse_args()

    import cv2
    import numpy as np

    from cartoonsegmentation_tpu.utils.env import enable_compilation_cache
    enable_compilation_cache()

    found = discover(args.weights_dir)
    report = {'weights_dir': osp.abspath(args.weights_dir),
              'found': found, 'families': {}, 'artifacts': [],
              'ssim': {}, 'started': time.strftime('%F %T')}
    os.makedirs(args.out, exist_ok=True)
    print(f'families found: {sorted(found)}')
    if not found:
        sys.exit(f'no known checkpoints under {args.weights_dir} '
                 f'(expected names like rtmdetl_e60.ckpt — '
                 f'readme.md:37-48)')

    def mark(fam, status, err=None):
        report['families'][fam] = {'ckpt': found.get(fam),
                                   'status': status,
                                   **({'error': str(err)} if err else {})}
        print(f'  {fam}: {status}' + (f' ({err})' if err else ''))

    # ---- 1. segmentation on the three examples ----------------------
    seg = None
    if 'detector' in found:
        from cartoonsegmentation_tpu.pipeline import AnimeInsSeg
        try:
            seg = AnimeInsSeg(det_size=640)
            seg.load_torch_checkpoint(found['detector'])
            mark('detector', 'converted')
        except Exception as e:  # noqa: BLE001 — per-family isolation
            seg = None
            mark('detector', 'convert_failed', e)
    if seg is not None and 'refine_isnet' in found:
        try:
            seg.set_refine_method('refinenet_isnet')
            seg.refine.load_torch_checkpoint(found['refine_isnet'])
            mark('refine_isnet', 'converted')
        except Exception as e:  # noqa: BLE001
            mark('refine_isnet', 'convert_failed', e)

    from cartoonsegmentation_tpu.data.coco_export import instances_to_coco
    from cartoonsegmentation_tpu.utils.constants import CATEGORIES
    images_meta, annotations = [], []
    if seg is not None:
        for ii, name in enumerate(EXAMPLES):
            p = osp.join(args.examples, name)
            img = cv2.imread(p)
            if img is None:
                continue
            ins = seg.infer(img, pred_score_thr=0.3)
            drawn = ins.draw(img)
            out = osp.join(args.out, f'seg_{name}.png')
            cv2.imwrite(out, drawn)
            report['artifacts'].append(out)
            n = int(np.asarray(ins.count()))
            print(f'  segmentation {name}: {n} instances -> {out}')
            im_meta, anns = instances_to_coco(
                ins, ii, name, img.shape[:2],
                obj_id_start=len(annotations))
            images_meta.append(im_meta)
            annotations.extend(anns)
        cocop = osp.join(args.out, 'segmentation_coco.json')
        with open(cocop, 'w') as f:
            json.dump({'info': {}, 'licenses': [],
                       'images': images_meta,
                       'annotations': annotations,
                       'categories': CATEGORIES}, f)
        report['artifacts'].append(cocop)

    # ---- 2. the Ken Burns stage chain -------------------------------
    from cartoonsegmentation_tpu.config import build_kenburns_cfg
    from cartoonsegmentation_tpu.pipeline import KenBurnsPipeline
    repo = osp.dirname(osp.dirname(osp.abspath(__file__)))
    cfg = build_kenburns_cfg(osp.join(repo, 'configs/3dkenburns.yaml'))
    depth_est = ('zoe' if 'zoe' in found else
                 'zoe_nk' if 'zoe_nk' in found else
                 'leres' if 'leres' in found else
                 'default' if 'kb_disparity' in found else cfg.depth_est)
    cfg = cfg.replace(max_size=args.max_size,
                      num_frame=args.num_frame, depth_est=depth_est,
                      detector='animeinsseg' if seg else 'none')
    pipe = KenBurnsPipeline(cfg)
    if seg is not None:
        pipe.set_detector(seg)
    try:
        if 'kb_refine' in found or 'kb_inpaint' in found \
                or 'kb_disparity' in found or 'kb_vgg' in found:
            pipe.load_torch_checkpoints(
                disparity=found.get('kb_disparity'),
                refine=found.get('kb_refine'),
                inpaint=found.get('kb_inpaint'),
                vgg=found.get('kb_vgg'))
            for k in ('kb_refine', 'kb_inpaint', 'kb_disparity',
                      'kb_vgg'):
                if k in found:
                    mark(k, 'converted')
    except Exception as e:  # noqa: BLE001
        for k in ('kb_refine', 'kb_inpaint', 'kb_disparity', 'kb_vgg'):
            if k in found:
                mark(k, 'convert_failed', e)
    for fam, loader in (('leres', lambda: pipe.load_leres_checkpoint(
                             found['leres'])),
                        ('zoe', lambda: pipe.load_zoe_checkpoint(
                             found['zoe'])),
                        # load_zoe_checkpoint auto-detects the NK
                        # router variant from the state dict
                        ('zoe_nk', lambda: pipe.load_zoe_checkpoint(
                             found['zoe_nk'])),
                        ('pix2pix', lambda: pipe.load_pix2pix_checkpoint(
                             found['pix2pix']))):
        if fam in found:
            try:
                loader()
                mark(fam, 'converted')
            except Exception as e:  # noqa: BLE001
                mark(fam, 'convert_failed', e)

    lion = osp.join(args.examples, 'kenburns_lion.png')
    if osp.isfile(lion):
        clip = osp.join(args.out, 'kenburns_lion.mp4')
        pipe.stage_previews = True
        pipe.run(lion, clip)
        pipe.save_stages(args.out, 'kenburns_lion')
        report['artifacts'].append(clip)
        for f in sorted(os.listdir(args.out)):
            # save_stages writes tmp_stage_<stage>_kenburns_lion.png
            # (reference run_kenburns.py --verbose naming)
            if f.startswith('tmp_stage_') and f.endswith('.png'):
                report['artifacts'].append(osp.join(args.out, f))
        print(f'  kenburns chain -> {clip} + stage PNGs')

    # ---- 3. independent families smoke (converted, one forward) ----
    if 'tagger' in found:
        try:
            from cartoonsegmentation_tpu.models.tagger import Tagger
            t = Tagger(found['tagger'], strict=True)
            t.label_cv2_bgr(cv2.imread(lion))
            mark('tagger', 'converted')
        except Exception as e:  # noqa: BLE001
            mark('tagger', 'convert_failed', e)
    for fam, net_name in (('animeseg_isnet', 'isnet_is'),
                          ('modnet', 'modnet'), ('u2net', 'u2net'),
                          ('sam', None)):
        if fam not in found:
            continue
        try:
            if fam == 'sam':
                from cartoonsegmentation_tpu.pipeline import (
                    AnimeInsSeg, SamDetector)
                sd = SamDetector(seg or AnimeInsSeg(det_size=640))
                sd.sam.load_torch_checkpoint(found['sam'])
            else:
                from cartoonsegmentation_tpu.pipeline.refine import \
                    make_refiner
                ref = make_refiner(net_name)
                ref.load_torch_checkpoint(found[fam])
            mark(fam, 'converted')
        except Exception as e:  # noqa: BLE001
            mark(fam, 'convert_failed', e)

    # ---- 4. SSIM vs committed REAL-weight goldens -------------------
    if args.regen_goldens:
        import shutil
        os.makedirs(args.goldens, exist_ok=True)
        for a in report['artifacts']:
            if a.endswith('.png'):
                shutil.copy(a, args.goldens)
        print(f'real-weight goldens regenerated into {args.goldens}')
    elif osp.isdir(args.goldens):
        worst = 1.0
        for a in report['artifacts']:
            if not a.endswith('.png'):
                continue
            g = osp.join(args.goldens, osp.basename(a))
            if not osp.isfile(g):
                continue
            s = ssim(cv2.imread(a, cv2.IMREAD_GRAYSCALE),
                     cv2.imread(g, cv2.IMREAD_GRAYSCALE))
            report['ssim'][osp.basename(a)] = round(s, 4)
            worst = min(worst, s)
        report['ssim_worst'] = round(worst, 4)
        report['ssim_pass'] = worst >= args.ssim_thr
        print(f'SSIM vs goldens: worst {worst:.4f} '
              f'({"PASS" if report["ssim_pass"] else "FAIL"} '
              f'@ {args.ssim_thr})')
    else:
        report['ssim'] = 'no goldens dir (generate with '\
                         '--regen-goldens on a trusted run)'

    # ---- 5. report --------------------------------------------------
    rp = osp.join(args.out, 'parity_report.json')
    with open(rp, 'w') as f:
        json.dump(report, f, indent=1)
    ok = [k for k, v in report['families'].items()
          if v['status'] == 'converted']
    bad = [k for k, v in report['families'].items()
           if v['status'] != 'converted']
    with open(osp.join(args.out, 'REPORT.md'), 'w') as f:
        f.write('# Parity report (weights-given acceptance)\n\n'
                f'- weights: `{report["weights_dir"]}`\n'
                f'- converted: {", ".join(ok) or "none"}\n'
                f'- failed: {", ".join(bad) or "none"}\n'
                f'- artifacts: {len(report["artifacts"])} '
                f'(segmentation overlays, COCO json, kenburns stage '
                f'PNGs, mp4)\n'
                f'- ssim: {report.get("ssim_worst", "n/a")}\n')
    print(f'report -> {rp}')
    sys.exit(0 if not bad else 1)


if __name__ == '__main__':
    main()
