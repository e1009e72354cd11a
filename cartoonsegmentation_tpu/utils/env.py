"""Process/thread environment setup for host-side data work.

Parity: reference utils/env_utils.py:8-65 (set_multi_processing):
pins cv2/OpenBLAS/MKL thread counts so host data-loader workers don't
oversubscribe cores while the TPU does the heavy lifting, and selects
a safe multiprocessing start method.
"""
from __future__ import annotations

import os

from .logger import LOGGER


_CACHE_ENABLED = False


def enable_compilation_cache(path: str = '') -> bool:
    """Turn on jax's persistent on-disk compilation cache for this
    process (idempotent). First compiles of the big pipeline graphs
    take 4-15 min through a remote-TPU tunnel; with the cache a
    subsequent process skips them entirely. The reference has no
    analogue (CUDA kernels ship precompiled); here it is the
    difference between a 20-min and a 1-min CLI cold start.

    Default location: $CARTOONSEG_JAX_CACHE, else .jax_cache/ under
    the repo root (kept out of git). Returns True when enabled.
    Never raises: an unwritable cache dir only costs compile time."""
    global _CACHE_ENABLED
    if _CACHE_ENABLED:
        return True
    try:
        import jax
        cache = path or os.environ.get('CARTOONSEG_JAX_CACHE') or \
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.dirname(os.path.abspath(__file__)))),
                '.jax_cache')
        os.makedirs(cache, exist_ok=True)
        jax.config.update('jax_compilation_cache_dir', cache)
        jax.config.update('jax_persistent_cache_min_compile_time_secs',
                          1.0)
        jax.config.update('jax_persistent_cache_min_entry_size_bytes',
                          0)
        _CACHE_ENABLED = True
        return True
    except Exception as e:  # cache is an optimization, never a blocker
        LOGGER.warning(f'compilation cache unavailable: {e}')
        return False


def jit_init(module, key, *args):
    """``module.init`` as ONE jitted XLA program.

    Un-jitted Flax init dispatches every weight-init op individually —
    hundreds of round trips on a remote-TPU tunnel (measured: 155 s for
    the RTMDet tower at det_size=320 vs ~10 s jitted-and-compiled and
    <1 s on a persistent-cache hit). The jitted init is also written to
    the persistent compilation cache, so later processes skip even the
    compile. Pass only prng-key/array arguments; close over python
    scalars at the call site."""
    import jax
    return jax.jit(module.init)(key, *args)


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
