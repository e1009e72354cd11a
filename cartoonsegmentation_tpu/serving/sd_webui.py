"""stable-diffusion-webui HTTP adapter (out-of-process service seam).

Parity: reference animeinsseg/inpainting/ldm_inpaint.py:310-353
(ldm_inpaint_webui), utils/io_utils.py:425-467 (img2b64 /
submit_request) and run_style.py:25-40 (run_sdinpaint). The retry
loop is bounded here (the reference retries forever and exit()s the
process — io_utils.py:444-467).
"""
from __future__ import annotations

import base64
import io
import json
import time
from typing import Dict, Optional, Tuple

import numpy as np

from ..utils import LOGGER
from ..utils.io import b64_2img  # noqa: F401 — re-exported seam
from ..utils.io import img2b64 as _io_img2b64


def img2b64(img) -> str:
    """ndarray (RGB or L) or PIL image → base64 PNG string (the
    ndarray path is utils/io.py's single implementation)."""
    if isinstance(img, np.ndarray):
        return _io_img2b64(img)
    buf = io.BytesIO()
    img.save(buf, format='PNG')
    return base64.b64encode(buf.getvalue()).decode('utf-8')


def submit_request(url: str, data: str, auth: Optional[Tuple[str, str]]
                   = None, retries: int = 5, wait_time: float = 5.0):
    import requests
    last = None
    for attempt in range(retries):
        try:
            resp = requests.post(url, data=data, auth=auth, timeout=600)
            resp.raise_for_status()
            return resp
        except Exception as e:  # noqa: BLE001 — network seam
            last = e
            LOGGER.warning(f'sd-webui request failed '
                           f'({attempt + 1}/{retries}): {e}; '
                           f'retrying in {wait_time}s')
            time.sleep(wait_time)
    raise RuntimeError(f'sd-webui unreachable at {url}: {last}')


# the reference style tab's hardcoded sampler choices
# (Web_UI/Component/Component_Style_Editing.py:2196-2218) — served as
# the fallback when the sd-webui server cannot be reached
SAMPLER_FALLBACK = [
    'Euler a', 'Euler', 'LMS', 'Heun', 'DPM2', 'DPM2 a',
    'DPM++ 2S a', 'DPM++ 2M', 'DPM++ SDE', 'DPM fast', 'DPM adaptive',
    'LMS Karras', 'DPM2 Karras', 'DPM2 a Karras',
    'DPM++ 2S a Karras', 'DPM++ 2M Karras', 'DPM++ SDE Karras',
    'DDIM',
]


def api_base(url: str) -> str:
    """Server base from any sd-webui endpoint URL (the style configs
    store the full img2img route, e.g. .../sdapi/v1/img2img)."""
    i = url.find('/sdapi/')
    return url[:i] if i >= 0 else url.rstrip('/')


def _get_json(url: str, auth=None, timeout: float = 10.0):
    import requests
    resp = requests.get(url, auth=auth, timeout=timeout)
    resp.raise_for_status()
    return resp.json()


def list_samplers(url: str, auth=None):
    """Sampler names from GET /sdapi/v1/samplers (the live-server
    upgrade of the reference's hardcoded List_Sampler dropdown,
    Web_UI/Component/Component_Style_Editing.py:980-986, 2196-2218);
    falls back to that hardcoded list when the server is down."""
    try:
        out = _get_json(f'{api_base(url)}/sdapi/v1/samplers', auth)
        names = [s['name'] for s in out if s.get('name')]
        return names or SAMPLER_FALLBACK
    except Exception as e:  # noqa: BLE001 — network seam
        LOGGER.debug(f'sampler enumeration unavailable: {e}')
        return list(SAMPLER_FALLBACK)


def list_sd_models(url: str, auth=None):
    """Checkpoint titles from GET /sdapi/v1/sd-models (reference
    dropdown source: Web_UI/Common/Utility_Model.py:1-79 scans a model
    directory; against a live server the API enumeration is
    authoritative). Empty list when unreachable."""
    try:
        out = _get_json(f'{api_base(url)}/sdapi/v1/sd-models', auth)
        return [m['title'] for m in out if m.get('title')]
    except Exception as e:  # noqa: BLE001 — network seam
        LOGGER.debug(f'model enumeration unavailable: {e}')
        return []


def current_sd_model(url: str, auth=None) -> Optional[str]:
    """Active checkpoint title from GET /sdapi/v1/options."""
    try:
        out = _get_json(f'{api_base(url)}/sdapi/v1/options', auth)
        return out.get('sd_model_checkpoint')
    except Exception:  # noqa: BLE001 — network seam
        return None


def set_sd_model(url: str, title: str, auth=None) -> bool:
    """Switch the server's active checkpoint via POST
    /sdapi/v1/options {sd_model_checkpoint} (what selecting a model in
    the reference's dropdown amounts to). Returns success."""
    import requests
    try:
        resp = requests.post(f'{api_base(url)}/sdapi/v1/options',
                             data=json.dumps(
                                 {'sd_model_checkpoint': title}),
                             auth=auth, timeout=600)
        resp.raise_for_status()
        return True
    except Exception as e:  # noqa: BLE001 — network seam
        LOGGER.warning(f'sd model switch failed: {e}')
        return False


def ldm_inpaint_webui(img: np.ndarray, mask: np.ndarray, resolution: int,
                      url: str, prompt: str = '', neg_prompt: str = '',
                      **options) -> np.ndarray:
    """img2img inpaint at aspect-kept, /32-rounded resolution.

    img: RGB uint8 (the reference converts from BGR before calling)."""
    im_h, im_w = img.shape[:2]
    if im_h > im_w:
        W = resolution
        H = int((im_h / im_w * resolution) // 32 * 32)
    else:
        H = resolution
        W = int((im_w / im_h * resolution) // 32 * 32)

    auth = None
    if options.get('username'):
        auth = (options.pop('username'),
                options.pop('password', ''))
    options.pop('username', None)
    options.pop('password', None)

    data = {
        'init_images': [img2b64(img)],
        'mask': img2b64(mask),
        'prompt': prompt,
        'negative_prompt': neg_prompt,
        'width': W,
        'height': H,
        **options,
    }
    resp = submit_request(url, json.dumps(data), auth=auth)
    out = b64_2img(resp.json()['images'][0])
    if out.shape[:2] != (im_h, im_w):
        from PIL import Image
        out = np.array(Image.fromarray(out).resize(
            (im_w, im_h), resample=Image.Resampling.LANCZOS))
    return out


def run_img2img_all(img_b64: str, data: Dict, prompt: str, nprompt: str,
                    url: str, auth=None,
                    controlnet_input: Optional[str] = None):
    """img2img round with optional ControlNet conditioning — returns
    EVERY generated image (b64 list). The webui's Batch Count /
    Batch Size sliders (reference Web_UI/Component/Component_AIS.py:
    366-385) map to the payload's n_iter / batch_size; when more than
    one image is requested the server may prepend a grid composite to
    `images`, which is trimmed here so callers always get exactly the
    generated variants."""
    data = dict(data)
    data['init_images'] = [img_b64]
    data['prompt'] = prompt
    data['negative_prompt'] = nprompt
    cn = data.get('alwayson_scripts', {}).get('controlnet')
    if cn and cn.get('args'):
        # deep-copy the nested block before writing the (multi-MB)
        # conditioning image — the shallow dict(data) copy must not
        # leak it into the caller's reusable request template
        import copy
        data['alwayson_scripts'] = copy.deepcopy(
            data['alwayson_scripts'])
        cn = data['alwayson_scripts']['controlnet']
        cn['args'][0]['input_image'] = (controlnet_input or img_b64)
    resp = submit_request(url, json.dumps(data), auth=auth)
    imgs = resp.json()['images']
    n = int(data.get('n_iter', 1)) * int(data.get('batch_size', 1))
    if n > 1 and len(imgs) == n + 1:
        imgs = imgs[1:]
    return imgs


def run_img2img(img_b64: str, data: Dict, prompt: str, nprompt: str,
                url: str, auth=None, controlnet_input: Optional[str] = None
                ) -> str:
    """Single-output img2img (run_style.py:25-40 semantics)."""
    return run_img2img_all(img_b64, data, prompt, nprompt, url, auth,
                           controlnet_input)[0]


def run_sdinpaint_all(img_b64: str, mask: np.ndarray, data: Dict,
                      prompt: str, nprompt: str, url: str, auth=None):
    data = dict(data)
    data['mask'] = img2b64(mask)
    return run_img2img_all(img_b64, data, prompt, nprompt, url, auth,
                           controlnet_input=img_b64)


def run_sdinpaint(img_b64: str, mask: np.ndarray, data: Dict,
                  prompt: str, nprompt: str, url: str, auth=None) -> str:
    return run_sdinpaint_all(img_b64, mask, data, prompt, nprompt,
                             url, auth)[0]
