"""ctypes binding for the native C++ PatchMatch library (csrc/).

Parity: reference animeinsseg/inpainting/patch_match.py:31-152, which
binds an external libpatchmatch_inpaint.so. Here the C++ source ships
in-repo (csrc/patchmatch.cpp) and is compiled on first use with g++
(-O3 -shared -fPIC); no OpenCV or other native dependencies.

This is the bit-deterministic host-side inpainting backend; the
default on-TPU fill lives in ops/inpaint_fill.py.
"""
from __future__ import annotations

import ctypes
import os
import os.path as osp
import subprocess
import threading
from typing import Optional

import numpy as np

from ..utils import LOGGER

_SRC = osp.join(osp.dirname(osp.dirname(osp.dirname(
    osp.abspath(__file__)))), 'csrc', 'patchmatch.cpp')
_LIB_DIR = osp.join(osp.dirname(_SRC), 'build')
_LIB = osp.join(_LIB_DIR, 'libpatchmatch_inpaint.so')

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None


def build_library(force: bool = False) -> str:
    """Compile csrc/patchmatch.cpp → build/libpatchmatch_inpaint.so."""
    if osp.exists(_LIB) and not force \
            and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
        return _LIB
    os.makedirs(_LIB_DIR, exist_ok=True)
    cmd = ['g++', '-O3', '-march=native', '-shared', '-fPIC',
           '-std=c++17', _SRC, '-o', _LIB]
    LOGGER.info('building native patchmatch: ' + ' '.join(cmd))
    subprocess.run(cmd, check=True, capture_output=True)
    return _LIB


def _load() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is None:
            lib = ctypes.CDLL(build_library())
            lib.pm_inpaint.argtypes = [
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.c_uint64,
                ctypes.POINTER(ctypes.c_uint8),
            ]
            lib.pm_inpaint.restype = None
            lib.pm_inpaint_regularity.argtypes = [
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.c_float,
                ctypes.c_uint64,
                ctypes.POINTER(ctypes.c_uint8),
            ]
            lib.pm_inpaint_regularity.restype = None
            _lib = lib
    return _lib


def inpaint(image: np.ndarray, mask: np.ndarray, patch_size: int = 3,
            iterations: int = 4, seed: int = 1234) -> np.ndarray:
    """uint8 image (H, W, C) + mask (H, W) (>0 = hole) → inpainted
    uint8 image. Same call shape as reference patch_match.inpaint."""
    lib = _load()
    image = np.ascontiguousarray(image, np.uint8)
    if image.ndim == 2:
        image = image[..., None]
    mask = np.ascontiguousarray((np.asarray(mask) > 0).astype(np.uint8))
    h, w, c = image.shape
    out = np.empty_like(image)
    lib.pm_inpaint(
        image.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h, w, c, patch_size, iterations, seed,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out if c > 1 else out[..., 0]


def inpaint_regularity(image: np.ndarray, mask: np.ndarray,
                       ijmap: np.ndarray, patch_size: int = 15,
                       guide_weight: float = 0.25,
                       iterations: int = 4,
                       seed: int = 1234) -> np.ndarray:
    """Guided variant (reference patch_match.py:120-152
    inpaint_regularity): a float32 (H, W, 3) guide map joins the patch
    metric with weight ``guide_weight`` so matches prefer structurally
    similar positions."""
    lib = _load()
    image = np.ascontiguousarray(image, np.uint8)
    if image.ndim == 2:
        image = image[..., None]
    assert ijmap.ndim == 3 and ijmap.dtype == np.float32, \
        'ijmap must be float32 (H, W, G)'
    ijmap = np.ascontiguousarray(ijmap)
    mask = np.ascontiguousarray((np.asarray(mask) > 0).astype(np.uint8))
    h, w, c = image.shape
    out = np.empty_like(image)
    lib.pm_inpaint_regularity(
        image.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ijmap.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        h, w, c, ijmap.shape[2], patch_size, iterations,
        guide_weight, seed,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out if c > 1 else out[..., 0]
