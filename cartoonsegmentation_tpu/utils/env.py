"""Process/thread environment setup for host-side data work.

Parity: reference utils/env_utils.py:8-65 (set_multi_processing):
pins cv2/OpenBLAS/MKL thread counts so host data-loader workers don't
oversubscribe cores while the TPU does the heavy lifting, and selects
a safe multiprocessing start method.
"""
from __future__ import annotations

import os

from .logger import LOGGER


def set_multi_processing(mp_start_method: str = 'fork',
                         opencv_num_threads: int = 0,
                         omp_num_threads: int = 1,
                         mkl_num_threads: int = 1,
                         distributed: bool = False) -> None:
    import multiprocessing as mp
    try:
        mp.set_start_method(mp_start_method, force=True)
    except RuntimeError as e:  # already started
        LOGGER.warning(f'set_start_method: {e}')

    try:
        import cv2
        cv2.setNumThreads(opencv_num_threads)
    except ImportError:
        pass

    if distributed:
        os.environ.setdefault('OMP_NUM_THREADS', str(omp_num_threads))
        os.environ.setdefault('MKL_NUM_THREADS', str(mkl_num_threads))
