#!/usr/bin/env python
"""Interactive Ken Burns server CLI (parity: reference
naive_interface.py). stdlib HTTP; see serving/interface.py for
routes."""
import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--cfg', default='configs/3dkenburns.yaml')
    ap.add_argument('--host', default='0.0.0.0')
    ap.add_argument('--port', type=int, default=8080)
    ap.add_argument('--with-detector', action='store_true',
                    help='enable the /segment route + UI tab')
    ap.add_argument('--det-ckpt', default='',
                    help='torch checkpoint for the detector')
    args = ap.parse_args()

    from cartoonsegmentation_tpu.pipeline import KenBurnsPipeline
    from cartoonsegmentation_tpu.serving.interface import serve

    pipe = KenBurnsPipeline(args.cfg)
    segmentor = None
    if args.with_detector:
        from cartoonsegmentation_tpu.pipeline import AnimeInsSeg
        segmentor = AnimeInsSeg()
        if args.det_ckpt:
            segmentor.load_torch_checkpoint(args.det_ckpt)
    serve(pipe, args.host, args.port, block=True, segmentor=segmentor)


if __name__ == '__main__':
    main()
