"""Image resize / pad utilities.

Host-side (numpy/cv2) versions mirror the reference semantics
(utils/io_utils.py:226-325: scaledown_maxsize, resize_pad,
square_pad_resize, pad2divisior); device-side versions (jnp) are used
inside jitted pipelines where the shape is static.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover - cv2 is present in the image
    cv2 = None

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# host-side (numpy) — shape planning happens on host, compute on device
# ---------------------------------------------------------------------------

def scaledown_size(h: int, w: int, max_size: int,
                   divisor: Optional[int] = None) -> Tuple[int, int]:
    """Target (h, w) after scaling the long side down to ``max_size``.

    Never upscales. Matches reference scaledown_maxsize rounding.
    """
    ratio = max_size / max(h, w)
    if ratio < 1:
        if h > w:
            h, w = max_size, max(1, int(round(w * ratio)))
        else:
            h, w = max(1, int(round(h * ratio))), max_size
    if divisor is not None:
        h = int(np.ceil(h / divisor) * divisor)
        w = int(np.ceil(w / divisor) * divisor)
    return h, w


def scaledown_maxsize(img: np.ndarray, max_size: int,
                      divisor: Optional[int] = None) -> np.ndarray:
    """Scale image so its long side is <= max_size (host-side, linear)."""
    h0, w0 = img.shape[:2]
    h, w = scaledown_size(h0, w0, max_size, divisor)
    if (h, w) == (h0, w0):
        return img
    if cv2 is not None:
        return cv2.resize(img, (w, h), interpolation=cv2.INTER_LINEAR)
    return np.asarray(
        jax.image.resize(jnp.asarray(img), (h, w) + img.shape[2:], 'linear'))


def resize_pad(img: np.ndarray, tgt_size: int, pad_value=0):
    """Downscale long side to tgt_size, pad bottom/right to a square.

    Returns (img, (pad_top, pad_bottom, pad_left, pad_right)).
    """
    img = scaledown_maxsize(img, tgt_size)
    h, w = img.shape[:2]
    padb, padr = tgt_size - h, tgt_size - w
    if padb > 0 or padr > 0:
        pad_width = [(0, padb), (0, padr)] + [(0, 0)] * (img.ndim - 2)
        img = np.pad(img, pad_width, constant_values=pad_value)
    return img, (0, padb, 0, padr)


def square_pad_resize(img: np.ndarray, tgt_size: int, pad_value: int = 114):
    """Pad bottom/right to square then resize to (tgt_size, tgt_size)."""
    h, w = img.shape[:2]
    pad_h, pad_w = 0, 0
    if w < h:
        pad_w = h - w
        w += pad_w
    elif h < w:
        pad_h = w - h
        h += pad_h
    pad_size = tgt_size - h
    if pad_size > 0:
        pad_h += pad_size
        pad_w += pad_size
    if pad_h > 0 or pad_w > 0:
        pad_width = [(0, pad_h), (0, pad_w)] + [(0, 0)] * (img.ndim - 2)
        img = np.pad(img, pad_width, constant_values=pad_value)
    scale = tgt_size / img.shape[0]
    if scale < 1:
        if cv2 is not None:
            img = cv2.resize(img, (tgt_size, tgt_size),
                             interpolation=cv2.INTER_AREA)
        else:
            img = np.asarray(jax.image.resize(
                jnp.asarray(img), (tgt_size, tgt_size) + img.shape[2:],
                'linear'))
    return img, scale, pad_h, pad_w


def pad2divisor(img: np.ndarray, divisor: int, value=0):
    h, w = img.shape[:2]
    pad_h = int(np.ceil(h / divisor)) * divisor - h
    pad_w = int(np.ceil(w / divisor)) * divisor - w
    if pad_h or pad_w:
        pad_width = [(0, pad_h), (0, pad_w)] + [(0, 0)] * (img.ndim - 2)
        img = np.pad(img, pad_width, constant_values=value)
    return img, (pad_h, pad_w)


# ---------------------------------------------------------------------------
# device-side (jnp) — for use inside jit
# ---------------------------------------------------------------------------

def resize_bilinear(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Bilinear resize of (..., H, W, C) to (..., h, w, C) on device.

    antialias=False makes this the exact twin of torch's
    interpolate(mode='bilinear', align_corners=False): both sample a
    plain 2-tap triangle at half-pixel centers. jax's default
    (antialias=True) widens the kernel on MINIFICATION, which torch
    never does — caught by tests/test_composed_pipeline.py.
    """
    shape = x.shape[:-3] + (h, w, x.shape[-1])
    return jax.image.resize(x, shape, method='linear', antialias=False)


def resize_bilinear_ac(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Bilinear resize with align_corners=True semantics (used by the
    reference's refine-mask upsample, animeinsseg/__init__.py:659).

    Sample positions: src = dst * (S-1)/(D-1). Expressed through
    scale_and_translate: scale s = (D-1)/(S-1), translate t = 0.5 -
    0.5*s (derived from out[o] = in((o + 0.5 - t)/s - 0.5))."""
    H, W = x.shape[-3], x.shape[-2]
    sy = (h - 1) / max(H - 1, 1)
    sx = (w - 1) / max(W - 1, 1)
    return jax.image.scale_and_translate(
        x, x.shape[:-3] + (h, w, x.shape[-1]), method='linear',
        scale=jnp.array([sy, sx], jnp.float32),
        translation=jnp.array([0.5 - 0.5 * sy, 0.5 - 0.5 * sx],
                              jnp.float32),
        spatial_dims=(x.ndim - 3, x.ndim - 2))


def crop_center_resize(frame: jnp.ndarray, crop_h: int, crop_w: int,
                       out_h: int, out_w: int) -> jnp.ndarray:
    """Center crop (crop_h, crop_w) then resize to (out_h, out_w).

    Device-side replacement for the reference's per-frame
    cv2.getRectSubPix + cv2.resize (kenburns_effect.py:1069-1070) —
    keeps the frame loop on the TPU.
    """
    H, W = frame.shape[-3], frame.shape[-2]
    # Exact twin of the reference's two cv2 calls
    # (kenburns_effect.py:1069-1070), kept as TWO interpolations —
    # fusing them into one sampling uses narrower effective taps and
    # visibly diverges (caught by tests/test_composed_pipeline.py):
    #   1. getRectSubPix(patch=(cw,ch), center=(W/2, H/2)):
    #      patch[j] = src[x0 + j],  x0 = W/2 - (cw-1)/2.  cv2 treats
    #      W/2 as a PIXEL-INDEX center, so the crop sits a half pixel
    #      right/below the geometric center — reproduced, not
    #      corrected.  jax samples in(o) = (o + 0.5 - t)/s - 0.5, so
    #      at s=1 the translate is t = -x0.  When x0 is integral this
    #      collapses to a slice (and one interpolation total, exactly
    #      like cv2).
    #   2. resize INTER_LINEAR to (out_h, out_w): plain (antialias
    #      off) bilinear at half-pixel centers.
    y0 = (H - crop_h + 1) / 2.0
    x0 = (W - crop_w + 1) / 2.0
    if y0 == int(y0) and x0 == int(x0):
        patch = frame[..., int(y0):int(y0) + crop_h,
                      int(x0):int(x0) + crop_w, :]
    else:
        patch = jax.image.scale_and_translate(
            frame, frame.shape[:-3] + (crop_h, crop_w, frame.shape[-1]),
            method='linear',
            scale=jnp.array([1.0, 1.0], jnp.float32),
            translation=jnp.array([-y0, -x0], jnp.float32),
            spatial_dims=(frame.ndim - 3, frame.ndim - 2))
    if (crop_h, crop_w) == (out_h, out_w):
        return patch
    return jax.image.resize(
        patch, patch.shape[:-3] + (out_h, out_w, patch.shape[-1]),
        method='linear', antialias=False)


def to_float_chw(img: np.ndarray) -> np.ndarray:
    """uint8 HWC -> float32 HWC in [0,1] (we keep NHWC on TPU)."""
    return img.astype(np.float32) / 255.0


@jax.jit
def bgr_to_i420(frames: jnp.ndarray) -> jnp.ndarray:
    """(T, H, W, 3) BGR uint8 → (T, H*3/2, W) uint8 in I420 layout.

    Device-side chroma subsampling for the video transfer path: mp4
    stores YUV 4:2:0 anyway, so converting BEFORE the device→host
    copy halves the bytes moved (1.5 B/px vs 3) with zero loss in the
    encoded output. Bit-exact re-implementation of OpenCV's
    COLOR_BGR2YUV_I420 (limited-range BT.601, chroma from the
    top-left pixel of each 2x2 block), using OpenCV's 20-bit
    fixed-point ITU-R BT.601 constants (modules/imgproc/src/
    color_yuv.simd.hpp) so the output is byte-identical to cv2's.

    Layout per frame: H rows of Y, then the (H/2, W/2) U plane packed
    row-major into H/4 rows of width W, then V likewise. Requires
    H % 4 == 0 and W % 2 == 0 (use the plain BGR path otherwise).
    Host-side inverse: cv2.cvtColor(yuv, cv2.COLOR_YUV2BGR_I420).
    """
    T, H, W = frames.shape[:3]
    assert H % 4 == 0 and W % 2 == 0, (H, W)
    b = frames[..., 0].astype(jnp.int32)
    g = frames[..., 1].astype(jnp.int32)
    r = frames[..., 2].astype(jnp.int32)
    SH, HALF = 20, 1 << 19
    CRY, CGY, CBY = 269484, 528482, 102760
    CRU, CGU, CBU = -155188, -305135, 460324
    CGV, CBV = -385875, -74701
    y = (CRY * r + CGY * g + CBY * b + (16 << SH) + HALF) >> SH
    # chroma from the top-left pixel of each 2x2 block (cv2 strides,
    # it does not average)
    rs, gs, bs = r[:, ::2, ::2], g[:, ::2, ::2], b[:, ::2, ::2]
    u = (CRU * rs + CGU * gs + CBU * bs + (128 << SH) + HALF) >> SH
    v = (CBU * rs + CGV * gs + CBV * bs + (128 << SH) + HALF) >> SH
    out = jnp.concatenate([
        y.astype(jnp.uint8),
        u.astype(jnp.uint8).reshape(T, H // 4, W),
        v.astype(jnp.uint8).reshape(T, H // 4, W),
    ], axis=1)
    return out


def i420_to_bgr_host(yuv: np.ndarray) -> np.ndarray:
    """(T, H*3/2, W) uint8 I420 → (T, H, W, 3) BGR uint8 (host cv2)."""
    import cv2
    return np.stack([cv2.cvtColor(f, cv2.COLOR_YUV2BGR_I420)
                     for f in np.asarray(yuv)])
