"""Marigold diffusion-depth adapter.

Parity: reference utils/apply_marigold.py:8-49 — the reference pulls
MarigoldPipeline from a git submodule (empty in the snapshot) and
runs LCM 4-step inference with ensemble 5. Here the adapter targets
the diffusers MarigoldDepthPipeline when diffusers is importable;
this image ships without diffusers, so the adapter raises a clear
error (and the KenBurns config falls back to leres with a warning).
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from ..utils import LOGGER

_PIPE = None


def apply_marigold(img_rgb: np.ndarray,
                   checkpoint: str = 'prs-eth/marigold-lcm-v1-0',
                   denoise_steps: int = 4, ensemble_size: int = 5,
                   seed: int = 0, **kwargs) -> np.ndarray:
    """img RGB uint8 → depth float in [0, 1] (affine-invariant)."""
    global _PIPE
    try:
        import diffusers  # noqa: F401
    except ImportError as e:
        raise RuntimeError(
            'marigold depth requires the diffusers package (not in '
            'this image); use depth_est leres/zoe/default instead'
        ) from e
    import torch
    from diffusers import MarigoldDepthPipeline
    if _PIPE is None:
        LOGGER.info(f'loading Marigold pipeline {checkpoint}')
        _PIPE = MarigoldDepthPipeline.from_pretrained(checkpoint)
    gen = torch.Generator().manual_seed(seed)
    out = _PIPE(img_rgb, num_inference_steps=denoise_steps,
                ensemble_size=ensemble_size, generator=gen, **kwargs)
    return np.asarray(out.prediction[0], np.float32)
