"""Typed configuration for the Ken Burns / segmentation pipelines.

One config system (dataclass + YAML), replacing the reference's four
overlapping ones (OmegaConf→dataclass with a legacy string-alias table,
mmengine Config, ZoeDepth EasyDict, argparse — see SURVEY.md §5.6).
Static pipeline *state* lives in pipeline/state.py as a pytree, not
here: config is hashable and jit-static, state is device arrays.

Field parity: reference anime_3dkenburns/kenburns_effect.py:207-374
(KenBurnsConfig, build_kenburns_cfg) and configs/3dkenburns.yaml.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field, fields
from typing import Any, Dict, Union


@dataclass(frozen=True)
class LDMInpaintOptions:
    """Options forwarded to the sd-webui img2img API (out-of-process)."""
    steps: int = 32
    cfg_scale: float = 7
    sample_name: str = 'DPM++ 2M Karras'
    denoising_strength: float = 0.75
    inpainting_fill: int = 0
    seed: int = 0
    subseed: int = 0
    username: str = ''
    password: str = ''


@dataclass(frozen=True)
class KenBurnsConfig:
    """Immutable, hashable pipeline configuration (jit-static)."""

    # --- detector ---
    detector: str = 'animeinsseg'   # animeinsseg | sam | maskrcnn | none
    det_ckpt: str = 'models/AnimeInstanceSegmentation/rtmdetl_e60.ckpt'
    det_size: int = 640
    pred_score_thr: float = 0.3
    mask_thr: float = 0.3
    # static instance capacity — the reference's infer() caps at 100
    # (animeinsseg/__init__.py:417). Lower it as a speed knob: refine
    # cost already scales with detections (not capacity), but the
    # detector postprocess / mask-resize and the per-clip instance
    # scans are proportional to this.
    max_instances: int = 100
    refine_method: str = 'refinenet_isnet'  # refinenet_isnet | animeseg | none
    refine_size: int = 720

    # --- depth ---
    depth_est: str = 'leres'                # leres | leres_boost | zoe | default | marigold
    depth_est_size: int = 640
    depthest_use_medium: bool = False
    default_depth_refine: bool = False      # run the Refine net
    refine_crf: bool = False                # CPU CRF refinement path
    scale_depth: bool = False
    # marigold diffusion depth (reference marigold_kwargs defaults,
    # utils/apply_marigold.py:8)
    marigold_steps: int = 4
    marigold_ensemble: int = 5
    marigold_res: int = 768
    marigold_scheduler: str = 'lcm'         # lcm | ddim

    # --- ken burns camera / render ---
    num_frame: int = 75
    playback: bool = True
    auto_zoom: bool = True
    focal: float = 512.0
    baseline: float = 40.0
    max_size: int = 1024                    # output video long side
    autozoom_shift: float = 100.0
    autozoom_zoom: float = 1.25
    # coverage-search miniature stride: the 16x16 candidate search
    # scores each shift on every stride-th cloud point rendered at a
    # 1/stride raster (a true downsampled render, so the coverage
    # fraction is preserved). 2 = default, 12.9 s -> 1.7 s per clip
    # at 1024 (measured r4); 1 = the exact reference search
    # (common.py:86-141).
    autozoom_stride: int = 2
    crop_ratio: float = 0.97

    # --- depth of field ---
    # reference default is True (configs/3dkenburns.yaml:16 and the
    # KenBurnsConfig dataclass in kenburns_effect.py)
    depth_field: bool = True
    dof_speed: float = 50.0
    depth_factor: int = 1
    lightness_factor: int = 13
    dof_num_samples: int = 32

    # --- inpainting ---
    inpaint_type: str = 'default'           # default | patchmatch | ldm | ldm_native
    point_capacity_factor: float = 2.0      # P_max = factor * H * W
    discfill_max_steps: int = 128           # ray-march cap (exact fill)
    discfill_mode: str = 'fast'             # fast (shear-scan) | exact
    render_payload_dtype: str = 'bfloat16'  # splat accumulation dtype

    # --- ldm (out-of-process sd-webui adapter) ---
    sd_img2img_url: str = 'http://127.0.0.1:7860/sdapi/v1/img2img'
    ldm_inpaint_size: int = 1024
    ldm_inpaint_options: LDMInpaintOptions = field(default_factory=LDMInpaintOptions)

    # --- runtime ---
    # depth-net inference dtype: 'auto' = bf16 on an accelerator
    # (MXU-native; head output returns to f32 before postprocess),
    # f32 on CPU so torch-twin tests stay bit-exact. 'float32' forces
    # full precision everywhere.
    dtype: str = 'auto'
    donate_state: bool = True

    def replace(self, **kw) -> 'KenBurnsConfig':
        return dataclasses.replace(self, **kw)


def load_yaml(path_or_dict: Union[str, Dict[str, Any]]) -> Dict[str, Any]:
    if isinstance(path_or_dict, dict):
        return dict(path_or_dict)
    import yaml
    with open(path_or_dict, 'r', encoding='utf8') as f:
        return yaml.safe_load(f) or {}


# aliases so reference yaml configs load unchanged
_KEY_ALIASES = {
    'mask_refine_kwargs': None,   # expanded below
    'ldm_inpaint_options': None,  # expanded below
    'int_height': None, 'int_width': None,  # runtime state, not config
    'marigold_kwargs': None,
    'depth_est_device': None, 'depth_refinement': None,
    'inpaint_type': 'inpaint_type',
}


def build_kenburns_cfg(src: Union[str, Dict[str, Any], KenBurnsConfig, None]
                       ) -> KenBurnsConfig:
    """Build a config from YAML / dict, accepting reference-format yaml
    (configs/3dkenburns.yaml) including nested mask_refine_kwargs and
    ldm_inpaint_options blocks."""
    if src is None:
        return KenBurnsConfig()
    if isinstance(src, KenBurnsConfig):
        return src
    raw = load_yaml(src)

    kw: Dict[str, Any] = {}
    names = {f.name for f in fields(KenBurnsConfig)}
    for k, v in raw.items():
        if k == 'mask_refine_kwargs' and isinstance(v, dict):
            if 'refine_method' in v:
                kw['refine_method'] = v['refine_method']
            if 'refine_size' in v:
                kw['refine_size'] = int(v['refine_size'])
        elif k == 'marigold_kwargs' and isinstance(v, dict):
            _mk = {'denoise_steps': 'marigold_steps',
                   'ensemble_size': 'marigold_ensemble',
                   'processing_res': 'marigold_res'}
            for ok, ov in v.items():
                if ok in _mk:
                    kw[_mk[ok]] = int(ov)
            # checkpoint name selects the sampler family:
            # marigold-v1-0 ships DDIM, marigold-lcm-v1-0 ships LCM
            # (reference apply_marigold.py:8 default is the lcm one)
            ckpt = str(v.get('checkpoint', ''))
            if ckpt:
                kw['marigold_scheduler'] = \
                    'lcm' if 'lcm' in ckpt.lower() else 'ddim'
        elif k == 'ldm_inpaint_options' and isinstance(v, dict):
            opt_names = {f.name for f in fields(LDMInpaintOptions)}
            kw['ldm_inpaint_options'] = LDMInpaintOptions(
                **{ok: ov for ok, ov in v.items() if ok in opt_names})
        elif k in names:
            kw[k] = v
        # unknown keys are ignored (reference behavior: filtered fieldSet)
    return KenBurnsConfig(**kw)
