"""KenBurnsPipeline — the flagship seg→depth→inpaint→render path.

TPU re-design of reference anime_3dkenburns/kenburns_effect.py
(KenBurnsPipeline). Key structural changes (SURVEY.md §7.0):

- all pipeline state is a device pytree (`KenBurnsState`), the point
  cloud has fixed capacity with masked append instead of torch.cat
  growth (kenburns_effect.py:472-512)
- the 75-frame loop is ONE `lax.scan` (frames leave the device once
  as a (T,H,W,3) uint8 batch) instead of a python loop with a
  GPU→CPU copy + cv2 crop per frame (kenburns_effect.py:1015-1072)
- autozoom's 16×16 python search (common.py:86-141) is a vmapped
  coverage program
- inpainting runs the Flax Inpaint net whose forward embeds the
  scatter splat; 'patchmatch'/'ldm' variants hook in as host-side
  adapters at the same seam (kenburns_effect.py:441-514)
"""
from __future__ import annotations

import math
import time as _time
from typing import Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..config import KenBurnsConfig, build_kenburns_cfg
from ..instances import Instances
from ..models.kenburns import DisparityEstimator, Inpaint, Refine
from ..ops.bokeh import bokeh_blur
from ..ops.camera import (autozoom, compute_shift, depth_range,
                          shift_points)
from ..ops.discfill import fill_disocclusion
from ..ops.discfill3 import fill_disocclusion_fast3
from ..ops.filters import valid_depth_mask
from ..ops.pointcloud import depth_to_points, render_pointcloud
from ..utils import LOGGER, crop_center_resize, scaledown_maxsize
from .depth import (adjust_disparity_by_instances, colorize_gray_r,
                    masked_median_u8)
from .state import KenBurnsState, PointCloud


class KenBurnsPipeline:

    def __init__(self, cfg: Union[KenBurnsConfig, str, dict, None] = None,
                 seed: int = 0):
        self.cfg = build_kenburns_cfg(cfg)
        self._seed = seed
        # persistent XLA compile cache: a second process (CLI, server
        # restart, bench re-run) skips the multi-minute tunnel
        # compiles of the big pipeline graphs entirely
        from ..utils.env import enable_compilation_cache
        enable_compilation_cache()
        from ..models.leres import LeReS
        self._disparity_net = DisparityEstimator()
        # cfg.dtype='auto': the inpaint conv stack runs bf16 on an
        # accelerator (geometry + splat + heads stay f32 inside the
        # module); params are stored f32 so converters are unaffected
        self._inpaint_net = Inpaint(dtype=self._net_dtype())
        self._refine_net = Refine()
        self._leres_net = LeReS()
        self._disparity_vars = None
        self._inpaint_vars = None
        self._refine_vars = None
        self._leres_vars = None
        self._detector = None
        self._jit_cache: Dict = {}
        # verbose-mode stage artifacts (parity: the reference's
        # tmp_stage_* dumps, run_kenburns.py:25-39 — its de-facto
        # regression mechanism)
        self.stages: Dict[str, np.ndarray] = {}
        # stage previews cost a full-frame device→host transfer each
        # (colorized depth x3, inpainted frame x2, instance overlay) —
        # the interactive server and --verbose need them, the headline
        # clip does not; CLIs/bench flip this off unless dumping stages
        self.stage_previews: bool = True
        # per-stage wall timings (SURVEY §5.1 profiling subsystem);
        # print with `pipe.timer.report()` or run_kenburns --profile
        from ..utils.profiling import StageTimer
        self.timer = StageTimer()

    def _net_dtype(self):
        """Resolve cfg.dtype for depth-net inference: 'auto' → bf16 on
        an accelerator (the detector's precedent — MXU-native, ~2x),
        f32 on CPU so the torch-twin tests stay bit-exact. Returns
        None for f32 (no cast)."""
        d = self.cfg.dtype
        if d == 'auto':
            return None if jax.default_backend() == 'cpu' \
                else jnp.bfloat16
        return None if d in ('float32', 'f32') else jnp.dtype(d)

    # -- weights -------------------------------------------------------
    def _vars(self, which: str):
        net = getattr(self, f'_{which}_net')
        attr = f'_{which}_vars'
        if getattr(self, attr) is None:
            LOGGER.warning(f'kenburns {which} net: RANDOM init '
                           '(no checkpoint loaded)')
            from ..utils.env import jit_init
            key = jax.random.PRNGKey(self._seed)
            if which == 'disparity':
                dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
                v = jit_init(net, key, dummy)
            elif which == 'refine':
                v = jit_init(net, key, jnp.zeros((1, 64, 64, 3)),
                             jnp.zeros((1, 16, 16, 1)))
            elif which == 'leres':
                v = jit_init(net, key, jnp.zeros((1, 64, 64, 3)))
            else:
                # focal/baseline closed over (python scalars stay static)
                v = jax.jit(lambda k, a, b, c: net.init(
                    k, a, b, c, 16.0, 40.0))(
                    key, jnp.zeros((32, 32, 3)),
                    jnp.ones((32, 32, 1)), jnp.zeros((3,)))
            setattr(self, attr, v)
        return getattr(self, attr)

    def load_torch_checkpoints(self, disparity: Optional[str] = None,
                               refine: Optional[str] = None,
                               inpaint: Optional[str] = None,
                               vgg: Optional[str] = None) -> None:
        from ..models import convert as C
        if disparity or vgg:
            params = {}
            stats = {}
            if disparity:
                params['disparity'] = C.convert_disparity(
                    C.load_torch_ckpt(disparity))
            if vgg:
                p, s = C.convert_semantics(C.load_torch_ckpt(vgg))
                params['semantics'] = p
                stats['semantics'] = s
            self._disparity_vars = {'params': params,
                                    'batch_stats': stats}
        if refine:
            self._refine_vars = {
                'params': C.convert_refine(C.load_torch_ckpt(refine))}
        if inpaint:
            self._inpaint_vars = {
                'params': C.convert_inpaint(C.load_torch_ckpt(inpaint))}

    def load_detector_checkpoints(self, det: Optional[str] = None,
                                  sam: Optional[str] = None) -> None:
        """Route detector weights to the configured family:
        animeinsseg (rtmdetl ckpt), sam (rtmdetl + sam_vit_*.pth),
        or maskrcnn (torchvision COCO pth)."""
        self.ensure_detector()
        d = self._detector
        if d is None:
            raise ValueError("no detector configured (cfg.detector "
                             "is 'none')")
        from .maskrcnn_det import MaskRCNNDetector
        from .sam import SamDetector
        if isinstance(d, SamDetector):
            d.load_torch_checkpoints(det_ckpt=det, sam_ckpt=sam)
        elif isinstance(d, MaskRCNNDetector):
            if det:
                d.load_torch_checkpoint(det)
        elif det:
            d.load_torch_checkpoint(det)

    def load_leres_checkpoint(self, path: str) -> None:
        """res101.pth (ckpt['depth_model'], 'module.'-prefixed)."""
        from ..models.convert import load_torch_ckpt
        from ..models.leres import convert_leres
        import torch
        ckpt = torch.load(path, map_location='cpu', weights_only=False)
        sd = ckpt.get('depth_model', ckpt)
        self._leres_vars = convert_leres(sd)
        self._boost = None  # rebuild the boost driver with new weights

    def set_detector(self, detector) -> None:
        """Install an AnimeInsSeg instance, a detector name from the
        config ('animeinsseg'/'none'), or any img→Instances callable.
        Parity: kenburns_effect.py:831-846."""
        if isinstance(detector, str):
            if detector in ('none', ''):
                self._detector = None
                return
            if detector == 'animeinsseg':
                from .segment import AnimeInsSeg
                seg = AnimeInsSeg(det_size=self.cfg.det_size,
                                  mask_thr=self.cfg.mask_thr,
                                  max_instances=self.cfg.max_instances)
                if self.cfg.refine_method not in ('none', ''):
                    seg.set_refine_method(self.cfg.refine_method,
                                          self.cfg.refine_size)
                self._detector = seg
                return
            if detector == 'maskrcnn':
                # the reference's COCO torchvision model
                # (kenburns_effect.py:843-845, 874-886) — native here
                from .maskrcnn_det import MaskRCNNDetector
                self._detector = MaskRCNNDetector(
                    capacity=self.cfg.max_instances)
                return
            if detector == 'sam':
                # configs/3dkenburns_sam.yaml — AnimeInsSeg boxes
                # re-masked by the NATIVE Flax SAM (models/sam.py; the
                # reference shells out to the external
                # segment_anything package, kenburns_effect.py:848-860)
                from .sam import SamDetector
                from .segment import AnimeInsSeg
                seg = AnimeInsSeg(det_size=self.cfg.det_size,
                                  mask_thr=self.cfg.mask_thr,
                                  max_instances=self.cfg.max_instances)
                self._detector = SamDetector(seg)
                return
            raise NotImplementedError(f'Invalid detector: {detector}')
        self._detector = detector

    def ensure_detector(self) -> None:
        """Instantiate the configured detector if none installed."""
        if self._detector is None and self.cfg.detector not in ('none', ''):
            self.set_detector(self.cfg.detector)

    # -- stage 1: state generation --------------------------------------
    def generate_state(self, img: Union[str, np.ndarray],
                       instances: Optional[Instances] = None
                       ) -> KenBurnsState:
        """Image → full device state (segmentation + depth + points).

        Parity: kenburns_effect.py:898-951 (generate_kenburns_config).
        """
        import cv2
        if isinstance(img, str):
            img = cv2.imread(img)
        cfg = self.cfg

        if instances is None and self._detector is not None:
            with self.timer.time('detector'):
                instances = self._detector.infer(img, cfg.pred_score_thr)
                jax.block_until_ready(instances.masks)

        img = scaledown_maxsize(img, cfg.max_size)
        # fresh image: drop the previous image's stage previews — the
        # inpainted_N entries are keyed by cloud count and would both
        # leak (one full-res frame each) and show up as stale steps in
        # the serving stage list
        self.stages.clear()
        self.stages['input'] = np.ascontiguousarray(img)
        H, W = img.shape[:2]
        if instances is None:
            instances = Instances.empty(cfg.max_instances, H, W)
        else:
            instances = instances.resize(H, W)

        image = jnp.asarray(img.astype(np.float32) / 255.0)

        # each stage blocks before its timer closes — dispatch is
        # async, so without a barrier the whole depth chain would be
        # billed to whichever later stage first syncs (the preview
        # device_get used to be that accidental barrier)
        with self.timer.time('depth_estimate'):
            disparity_raw = self._estimate_disparity(image)
            jax.block_until_ready(disparity_raw)
            self._stage_depth('depth_coarse', disparity_raw)
        with self.timer.time('depth_adjust'):
            disparity_raw = self._adjust_disparity(image, disparity_raw,
                                                   instances)
            jax.block_until_ready(disparity_raw)
            self._stage_depth('depth_adjusted', disparity_raw)
        # final refinement (kenburns_effect.py:618-622): Refine net or
        # the CPU/TPU-hybrid CRF path, both optional
        with self.timer.time('depth_refine'):
            disparity_raw = self._refine_stage(img, image,
                                               disparity_raw, instances)
            jax.block_until_ready(disparity_raw)
            self._stage_depth('depth_final', disparity_raw)
        if self._detector is not None and self.stage_previews:
            self.stages['instances'] = instances.draw(img)
        with self.timer.time('prepare_state'):
            state = self._prepare_state(image, disparity_raw, instances)
            jax.block_until_ready(state.cloud.points)
        return state

    def _refine_stage(self, img: np.ndarray, image: jnp.ndarray,
                      disparity_raw: jnp.ndarray,
                      instances: Instances) -> jnp.ndarray:
        """Final depth refinement at image resolution: Refine net or
        the CPU/TPU-hybrid CRF path, both optional; the 'default'
        estimator's half-of-512 grid must reach _prepare_state at
        image res either way. Parity: kenburns_effect.py:618-622.
        Shared by generate_state and the Web UI's per-stage stepping
        route (serving/interface.py)."""
        cfg = self.cfg
        H, W = img.shape[:2]
        if cfg.default_depth_refine:
            disparity_raw = self._refine_disparity(image, disparity_raw)
        elif cfg.refine_crf:
            from .crf_refine import refine_depth_crf
            if disparity_raw.shape[:2] != (H, W):
                disparity_raw = jax.image.resize(
                    disparity_raw, (H, W, 1), method='linear',
                    antialias=False)
            ins_mask = np.asarray(
                jax.device_get(instances.compose_masks()))
            refined = refine_depth_crf(
                img,
                np.asarray(jax.device_get(disparity_raw[..., 0])),
                ins_mask if ins_mask.any() else None)
            disparity_raw = jnp.asarray(refined)[..., None]
        if disparity_raw.shape[:2] != (H, W):
            disparity_raw = jax.image.resize(
                disparity_raw, (H, W, 1), method='linear',
                antialias=False)
        return disparity_raw

    def _stage_depth(self, name: str, disparity) -> None:
        if not self.stage_previews:
            return
        self.stages[name] = np.asarray(
            jax.device_get(colorize_gray_r(disparity[..., 0]))
        ).astype(np.uint8)

    def save_stages(self, save_dir: str, name: str) -> None:
        """Write the verbose stage dumps (tmp_stage_<stage>_<name>.png
        parity with reference run_kenburns.py --verbose)."""
        import cv2
        import os
        os.makedirs(save_dir, exist_ok=True)
        for stage, img in self.stages.items():
            cv2.imwrite(f'{save_dir}/tmp_stage_{stage}_{name}.png', img)

    def _adjust_disparity(self, image, disparity, instances):
        """Instance depth adjustment at IMAGE resolution, returned at
        the disparity's own grid — the reference upsamples a
        coarser-grid disparity to the image, adjusts against the
        masks there, and downsamples back (kenburns_effect.py:49-92,
        the resized=True branch). The 'default' estimator hands a
        half-of-512 grid through here; all others are already at
        image resolution and skip both resizes."""
        H, W = image.shape[:2]
        dh, dw = disparity.shape[:2]
        key = ('adjust', H, W, dh, dw, self.cfg.depthest_use_medium)
        if key not in self._jit_cache:
            use_med = self.cfg.depthest_use_medium

            @jax.jit
            def fn(disparity, instances):
                d = disparity
                if (dh, dw) != (H, W):
                    d = jax.image.resize(d, (H, W, 1), method='linear',
                                         antialias=False)
                adj = adjust_disparity_by_instances(
                    d[..., 0], instances, use_med)[..., None]
                if (dh, dw) != (H, W):
                    adj = jax.image.resize(adj, (dh, dw, 1),
                                           method='linear',
                                           antialias=False)
                return adj
            self._jit_cache[key] = fn
        return self._jit_cache[key](disparity, instances)

    def _refine_disparity(self, image, disparity):
        """Refine net: image at full res, disparity at its native
        grid — the reference's disparity_refinement passes the
        estimation grid straight through (models/__init__.py:13-14);
        Refine aligns it to the image pyramid internally
        (disparity_refinement.py:113-119). Output is at image res."""
        H, W = image.shape[:2]
        dh, dw = disparity.shape[:2]
        key = ('refine', H, W, dh, dw)
        if key not in self._jit_cache:
            net = self._refine_net

            @jax.jit
            def fn(variables, img, disp):
                return net.apply(variables, img[None], disp[None])[0]
            self._jit_cache[key] = fn
        return self._jit_cache[key](self._vars('refine'), image,
                                    disparity)

    def _estimate_disparity(self, image: jnp.ndarray) -> jnp.ndarray:
        """Run the configured depth estimator → (H, W, 1) disparity at
        image resolution. All five reference estimators are native:
        'leres' (shipped default), 'leres_boost', 'default'
        (3D-Ken-Burns disparity net), 'zoe'/'zoe_nk', 'marigold'."""
        cfg = self.cfg
        if cfg.depth_est == 'default':
            return self._est_default(image)
        if cfg.depth_est == 'zoe':
            return self._est_zoe(image)
        if cfg.depth_est == 'zoe_nk':
            return self._est_zoe(image, nk=True)
        if cfg.depth_est == 'leres_boost':
            return self._est_leres_boost(image)
        if cfg.depth_est == 'marigold':
            return self._est_marigold(image)
        if cfg.depth_est not in ('leres',):
            LOGGER.warning(f'unknown depth_est={cfg.depth_est}; '
                           'using leres')
        return self._est_leres(image)

    def _est_marigold(self, image: jnp.ndarray) -> jnp.ndarray:
        """Marigold latent-diffusion depth (native, models/marigold.py)
        → disparity. Parity: kenburns_effect.py:554-561 — depth∈[0,1],
        zeros→min positive, disp=(1-depth)*255. The reference feeds
        its BGR ndarray to PIL unconverted (apply_marigold.py:32);
        we convert to the RGB the model was trained on."""
        self._ensure_marigold()
        img_u8 = np.asarray(
            jnp.clip(image[..., ::-1], 0, 1) * 255).astype(np.uint8)
        depth = self._marigold(img_u8)            # (H, W) in [0, 1]
        pos = depth[depth > 0]
        if pos.size:
            depth = np.where(depth == 0, pos.min(), depth)
        disp = (1.0 - depth) * 255.0
        return jnp.asarray(disp[..., None].astype(np.float32))

    def _ensure_marigold(self):
        """Lazy single construction point — checkpoint loading and
        inference must build the model from the same config knobs."""
        from ..models.marigold import MarigoldDepth
        cfg = self.cfg
        if getattr(self, '_marigold', None) is None:
            self._marigold = MarigoldDepth(
                processing_res=cfg.marigold_res,
                denoise_steps=cfg.marigold_steps,
                ensemble_size=cfg.marigold_ensemble,
                scheduler=cfg.marigold_scheduler, seed=self._seed)
        return self._marigold

    def load_marigold_checkpoint(self, unet_path: str, vae_path: str,
                                 text_path: Optional[str] = None
                                 ) -> None:
        """Load a Marigold checkpoint directory's unet/vae (and
        optionally text_encoder) torch weight files."""
        from ..models.convert import load_torch_ckpt
        from ..models.marigold import convert_marigold
        self._ensure_marigold()
        self._marigold.variables = convert_marigold(
            load_torch_ckpt(unet_path), load_torch_ckpt(vae_path),
            load_torch_ckpt(text_path) if text_path else None,
            model=self._marigold)

    def _est_leres_boost(self, image: jnp.ndarray) -> jnp.ndarray:
        """BoostingMonoDepth: LeReS double-estimation + gradient-dense
        patch refinement through the pix2pix merge net, then the
        apply_leres disparity post-processing. Parity:
        depth_modules/leres/__init__.py:112-141 (apply_leres with
        boost=True → estimateboost) — see pipeline/boost.py."""
        import jax as _jax
        from ..models.leres import LeReS
        from .boost import LeReSBoost
        if getattr(self, '_boost', None) is None:
            from ..models.pix2pix4depth import Pix2Pix4Depth
            if getattr(self, '_leres_net', None) is None:
                self._leres_net = LeReS()
            p2p = Pix2Pix4Depth()
            if getattr(self, '_p2p_vars', None) is None:
                LOGGER.warning('pix2pix merge net: RANDOM init '
                               '(no checkpoint loaded)')
                from ..utils.env import jit_init
                self._p2p_vars = jit_init(
                    p2p, jax.random.PRNGKey(self._seed),
                    jnp.zeros((1, 1024, 1024, 2), jnp.float32))
            # max_res=None → per-image max(W, H), matching the
            # reference estimateboost call (leres/__init__.py:113)
            self._boost = LeReSBoost(self._leres_net,
                                     self._vars('leres'), p2p,
                                     self._p2p_vars, max_res=None)
        img_u8 = np.asarray(
            jnp.clip(image, 0, 1) * 255).astype(np.uint8)
        depth = self._boost(img_u8)          # (H, W) raw in [0, 1]
        # apply_leres post: 16-bit normalize → u8 → invert
        from ..models.leres import leres_postprocess
        disp = np.asarray(leres_postprocess(jnp.asarray(depth)))
        pos = disp[disp > 0]
        if pos.size:
            disp = np.where(disp == 0, pos.min(), disp)
        return jnp.asarray(disp[..., None].astype(np.float32))

    def load_pix2pix_checkpoint(self, path: str) -> None:
        """latest_net_G.pth → Flax (models/pix2pix4depth.py)."""
        from ..models.convert import load_torch_ckpt
        from ..models.pix2pix4depth import convert_pix2pix4depth
        self._p2p_vars = convert_pix2pix4depth(load_torch_ckpt(path))
        self._boost = None  # rebuild with the new weights

    def _est_zoe(self, image: jnp.ndarray,
                 nk: bool = False) -> jnp.ndarray:
        """ZoeDepth metric depth at ~672px with flip TTA, converted to
        disparity. Parity: kenburns_effect.py:812-818 (_depth_est_zoe;
        img_size [672,672] set at :543). ``nk=True`` selects the
        two-headed ZoeDepthNK router model (zoedepth_nk_v1.py)."""
        from ..models.zoedepth import ZoeDepth, ZoeDepthNK, infer_zoe
        from ..utils import scaledown_size
        cfg = self.cfg
        H, W = image.shape[:2]
        zh, zw = scaledown_size(H, W, 672, divisor=32)
        # a loaded checkpoint decides the variant (load_zoe_checkpoint
        # auto-detects N vs NK from the state dict); the cfg flag only
        # picks the variant when running without weights
        ckpt = getattr(self, '_zoe_ckpt_path', None)
        want_nk = self._zoe_ckpt_is_nk if ckpt is not None else nk
        if ckpt is not None and want_nk != nk:
            LOGGER.warning(
                f"depth_est requests {'NK' if nk else 'N'} but the "
                f"loaded checkpoint is {'NK' if want_nk else 'N'} — "
                'using the checkpoint variant')
        cls = ZoeDepthNK if want_nk else ZoeDepth
        if getattr(self, '_zoe_net', None) is None \
                or self._zoe_net.img_size != (zh, zw) \
                or not isinstance(self._zoe_net, cls):
            self._zoe_net = cls(img_size=(zh, zw))
            self._zoe_vars = None
        if self._zoe_vars is None:
            if ckpt is not None:
                # re-convert for this grid size (BEiT pos-embeds are
                # interpolated per img_size at conversion time)
                LOGGER.info(f're-converting zoe checkpoint for '
                            f'({zh}, {zw})')
                self._load_zoe_vars(ckpt)
            else:
                LOGGER.warning(
                    'zoedepth: RANDOM init (no checkpoint loaded)')
                from ..utils.env import jit_init
                self._zoe_vars = jit_init(
                    self._zoe_net, jax.random.PRNGKey(self._seed),
                    jnp.zeros((1, zh, zw, 3), jnp.float32))
        # id(net) in the key: the cached fn closes over the net, so a
        # variant/size rebuild (e.g. after load_zoe_checkpoint flips
        # N<->NK) must never reuse a closure over the old module
        dt = self._net_dtype()
        key = ('zoe_nk' if want_nk else 'zoe', H, W, zh, zw, dt,
               id(self._zoe_net))
        if key not in self._jit_cache:
            net = self._zoe_net
            focal, baseline = cfg.focal, cfg.baseline

            @jax.jit
            def fn(variables, img):
                rgb = jax.image.resize(img[..., ::-1], (zh, zw, 3),
                                       method='linear', antialias=False)
                if dt is not None:
                    # cfg.dtype='auto': BEiT-L + bins heads on the MXU
                    # in bf16; metric depth returns to f32 before the
                    # disparity conversion. cfg.dtype='float32' opts
                    # out.
                    variables = jax.tree_util.tree_map(
                        lambda a: a.astype(dt)
                        if a.dtype == jnp.float32 else a, variables)
                    rgb = rgb.astype(dt)
                depth = infer_zoe(net, variables, rgb[None])[0]
                depth = jnp.maximum(depth.astype(jnp.float32), 1e-5)
                disp = (focal * baseline) / (depth + 1e-5)
                disp = jnp.nan_to_num(disp, nan=0.0, posinf=0.0,
                                      neginf=0.0)
                return jax.image.resize(disp, (H, W, 1), method='linear')
            self._jit_cache[key] = fn
        return self._jit_cache[key](self._zoe_vars, image)

    def load_zoe_checkpoint(self, path: str) -> None:
        """ZoeD_M12_N.pt / ZoeD_M12_NK.pt → Flax
        (models/convert_zoedepth.py). The variant is auto-detected
        from the state dict: NK checkpoints carry the router keys
        (patch_transformer.*, zoedepth_nk_v1.py:101-107). The path is
        retained so a later image-size change re-converts instead of
        silently falling back to random init."""
        self._zoe_ckpt_path = path
        self._load_zoe_vars(path)

    def _load_zoe_vars(self, path: str) -> None:
        from ..models.convert import load_torch_ckpt
        from ..models.convert_zoedepth import (convert_zoedepth,
                                               convert_zoedepth_nk)
        from ..models.zoedepth import ZoeDepth, ZoeDepthNK
        sd = load_torch_ckpt(path)
        is_nk = any(k.startswith('patch_transformer.') for k in sd)
        self._zoe_ckpt_is_nk = is_nk
        cls = ZoeDepthNK if is_nk else ZoeDepth
        if getattr(self, '_zoe_net', None) is None \
                or not isinstance(self._zoe_net, cls):
            self._zoe_net = cls(
                img_size=getattr(self, '_zoe_net', None).img_size
                if getattr(self, '_zoe_net', None) is not None
                else (672, 672))
        conv = convert_zoedepth_nk if is_nk else convert_zoedepth
        self._zoe_vars = conv(sd, self._zoe_net.img_size)

    def _est_default(self, image: jnp.ndarray) -> jnp.ndarray:
        """3D-Ken-Burns disparity net at its native half-of-512 grid —
        the reference's disparity_estimation has no resize-back
        (models/__init__.py:31-51); the coarse grid flows through
        adjustment and into Refine as-is."""
        H, W = image.shape[:2]
        key = ('disp', H, W)
        if key not in self._jit_cache:
            net = self._disparity_net

            @jax.jit
            def fn(variables, img):
                return net.apply(variables, img[None])[0]
            self._jit_cache[key] = fn
        return self._jit_cache[key](self._vars('disparity'), image)

    def _est_leres(self, image: jnp.ndarray) -> jnp.ndarray:
        """LeReS at depth_est_size (/32-padded), apply_leres post
        (normalize/invert), resized back to image resolution.
        Parity: kenburns_effect.py:563-581 (_depth_est_leres)."""
        from ..models.leres import leres_postprocess
        from ..utils import scaledown_size
        cfg = self.cfg
        H, W = image.shape[:2]
        dh, dw = scaledown_size(H, W, cfg.depth_est_size, divisor=32)
        dt = self._net_dtype()
        key = ('leres', H, W, dh, dw, dt)
        if key not in self._jit_cache:
            net = self._leres_net

            @jax.jit
            def fn(variables, img):
                small = jax.image.resize(img, (dh, dw, 3),
                                         method='linear')
                rgb = small[..., ::-1]  # pipeline images are BGR
                if dt is not None:
                    # cfg.dtype='auto': bf16 weights+activations on the
                    # MXU; the head output returns to f32 BEFORE the
                    # 16-bit-range postprocess (65535 scaling would
                    # drown in bf16's 8-bit mantissa)
                    variables = jax.tree_util.tree_map(
                        lambda a: a.astype(dt)
                        if a.dtype == jnp.float32 else a, variables)
                    rgb = rgb.astype(dt)
                d = net.apply(variables, rgb[None])[0]
                d = d.astype(jnp.float32)
                disp = leres_postprocess(d[..., 0])
                disp = jax.image.resize(disp, (H, W), method='linear')
                # zeros → min positive (kenburns_effect.py:577)
                pos_min = jnp.min(jnp.where(disp > 0, disp, jnp.inf))
                disp = jnp.where(disp == 0, pos_min, disp)
                return disp[..., None]
            self._jit_cache[key] = fn
        return self._jit_cache[key](self._vars('leres'), image)

    def _prepare_state(self, image, disparity_raw, instances
                       ) -> KenBurnsState:
        cfg = self.cfg
        H, W = image.shape[:2]
        P = int(cfg.point_capacity_factor * H * W)
        key = ('prep', H, W, P)
        if key not in self._jit_cache:
            focal, baseline = cfg.focal, cfg.baseline

            @jax.jit
            def fn(image, disparity, instances):
                disparity = disparity / (jnp.max(disparity) + 1e-12) \
                    * baseline
                depth = (focal * baseline) / (disparity + 1e-5)
                valid = valid_depth_mask(disparity)
                pts = depth_to_points((depth * valid)[..., 0], focal)
                pts = pts.reshape(-1, 3)
                dr = depth_range(depth[..., 0])
                cloud = PointCloud.with_capacity(P)
                cloud = cloud.append_masked(
                    pts, image.reshape(-1, 3),
                    disparity.reshape(-1), depth.reshape(-1),
                    jnp.ones((H * W,), jnp.bool_))
                return KenBurnsState(
                    image=image, disparity=disparity, depth=depth,
                    raw_points=pts, depth_min=dr.min_val,
                    depth_min_u=dr.min_u, depth_min_v=dr.min_v,
                    cloud=cloud, instances=instances)
            self._jit_cache[key] = fn
        return self._jit_cache[key](image, disparity_raw, instances)

    # -- stage 2: autozoom ----------------------------------------------
    def autozoom(self, state: KenBurnsState) -> Tuple[Dict, Dict]:
        """Compute objFrom/objTo camera boxes (host dicts with static
        crop sizes). Parity: kenburns_effect.py:953-967."""
        cfg = self.cfg
        H, W = state.hw
        obj_from = {
            'center_u': W / 2.0, 'center_v': H / 2.0,
            'crop_w': int(math.floor(cfg.crop_ratio * W)),
            'crop_h': int(math.floor(cfg.crop_ratio * H)),
        }
        if not cfg.auto_zoom:
            # no content-aware search: a plain centered Ken Burns
            # zoom-in by autozoom_zoom (the flag exists but is dead
            # in the reference, kenburns_effect.py:233 — here it
            # actually skips the coverage search)
            return obj_from, {
                'center_u': obj_from['center_u'],
                'center_v': obj_from['center_v'],
                'crop_w': int(round(obj_from['crop_w']
                                    / cfg.autozoom_zoom)),
                'crop_h': int(round(obj_from['crop_h']
                                    / cfg.autozoom_zoom)),
            }
        # block inside the timer so it reads true device time
        # (StageTimer sections elsewhere end with a device_get for
        # the same reason)
        with self.timer.time('autozoom'):
            best_u, best_v, crop_w_to, crop_h_to = autozoom(
                state.raw_points, state.depth_range, W, H, cfg.focal,
                cfg.baseline, cfg.autozoom_shift, cfg.autozoom_zoom,
                cfg.crop_ratio, stride=cfg.autozoom_stride)
            best_u, best_v = jax.block_until_ready((best_u, best_v))
        obj_to = {
            'center_u': obj_from['center_u'] + float(best_u),
            'center_v': obj_from['center_v'] + float(best_v),
            'crop_w': crop_w_to, 'crop_h': crop_h_to,
        }
        return obj_from, obj_to

    # -- stage 3: inpaint passes ----------------------------------------
    def _camera_params(self, t: float, obj_from, obj_to, state):
        """Per-step camera interpolation (kenburns_effect.py:1017-1026).
        Returns (shift_u, shift_v, depth_from_scale, crop_w, crop_h)
        as python floats (traced arrays enter through state)."""
        H, W = state.hw
        fr, to = 1.0 - t, t
        shift_u = fr * obj_from['center_u'] + to * obj_to['center_u'] \
            - W / 2.0
        shift_v = fr * obj_from['center_v'] + to * obj_to['center_v'] \
            - H / 2.0
        crop_w = fr * obj_from['crop_w'] + to * obj_to['crop_w']
        crop_h = fr * obj_from['crop_h'] + to * obj_to['crop_h']
        max_cw = max(obj_from['crop_w'], obj_to['crop_w'])
        depth_scale = crop_w / max_cw
        return shift_u, shift_v, depth_scale, crop_w, crop_h

    def _inpaint_forward(self, state: KenBurnsState, shift_u, shift_v,
                         depth_scale):
        """Inpaint-net forward at a camera extreme → (out dict, shift)."""
        cfg = self.cfg
        H, W = state.hw
        key = ('inpaint_fwd', H, W)
        if key not in self._jit_cache:
            focal, baseline = cfg.focal, cfg.baseline
            net = self._inpaint_net

            @jax.jit
            def fn(variables, state, shift_u, shift_v, depth_scale):
                dr = state.depth_range
                shift = compute_shift(
                    dr, shift_u, shift_v, dr.min_val,
                    dr.min_val * depth_scale, W, H, focal)
                shift = 1.1 * shift  # kenburns_effect.py:1012
                segmask = state.instances.compose_masks()[..., None] \
                    .astype(jnp.float32)
                out = net.apply(variables, state.image, state.disparity,
                                shift, focal, baseline, segmasks=segmask)
                return out, shift
            self._jit_cache[key] = fn
        return self._jit_cache[key](self._vars('inpaint'), state,
                                    jnp.float32(shift_u),
                                    jnp.float32(shift_v),
                                    jnp.float32(depth_scale))

    def _inpaint_append(self, state: KenBurnsState, image, disparity,
                        existing, shift) -> KenBurnsState:
        """Unproject the hallucinated pixels and append the hole ones
        (kenburns_effect.py:453-512)."""
        cfg = self.cfg
        H, W = state.hw
        key = ('inpaint_app', H, W, state.cloud.capacity)
        if key not in self._jit_cache:
            focal, baseline = cfg.focal, cfg.baseline

            @jax.jit
            def fn(state, image, disparity, existing, shift):
                new_depth = (focal * baseline) / (disparity + 1e-7)
                valid = valid_depth_mask(disparity)
                pts = depth_to_points((new_depth * valid)[..., 0], focal)
                pts = pts.reshape(-1, 3) - shift[None, :]
                hole = (existing[..., 0] == 0.0).reshape(-1)
                cloud = state.cloud.append_masked(
                    pts, image.reshape(-1, 3),
                    disparity.reshape(-1), new_depth.reshape(-1), hole)
                return state.replace(cloud=cloud)
            self._jit_cache[key] = fn
        return self._jit_cache[key](state, image, disparity, existing,
                                    shift)

    def inpaint_pass(self, state: KenBurnsState, shift_u: float,
                     shift_v: float, depth_scale: float) -> KenBurnsState:
        """One inpainting pass at a camera extreme. inpaint_type
        'default' keeps everything on device; 'patchmatch' routes the
        hallucinated image through the native C++ PatchMatch library;
        'ldm' posts it to the sd-webui API. Parity:
        kenburns_effect.py:441-514."""
        cfg = self.cfg
        out, shift = self._inpaint_forward(state, shift_u, shift_v,
                                           depth_scale)
        image = out['image']

        if self.stage_previews:
            self.stages[
                f'inpainted_{int(jax.device_get(state.cloud.count))}'] = \
                np.asarray(jnp.clip(out['image'], 0, 1) * 255
                           ).astype(np.uint8)

        if cfg.inpaint_type in ('patchmatch', 'ldm', 'ldm_native'):
            import cv2
            H, W = state.hw
            hole = np.asarray(jax.device_get(
                out['existing'][..., 0] == 0.0))
            mask = (hole * 255).astype(np.uint8)
            seg = out.get('segmasks')
            if seg is not None:
                seg_np = np.asarray(jax.device_get(seg[..., 0] > 0))
                mask = np.bitwise_or(mask, seg_np.astype(np.uint8) * 255)
            img_u8 = np.asarray(jnp.clip(image, 0, 1) * 255
                                ).astype(np.uint8)
            if cfg.inpaint_type == 'patchmatch':
                from ..ops import patchmatch_native
                filled = patchmatch_native.inpaint(img_u8, mask,
                                                   patch_size=3)
            elif cfg.inpaint_type == 'ldm_native':
                # in-process latent-diffusion inpainting (the
                # reference's commented-out GuidedLDM, runnable here —
                # models/ldm_inpaint.py); load weights via
                # pipe._ldm_native.load_checkpoint(...)
                if getattr(self, '_ldm_native', None) is None:
                    from ..models.ldm_inpaint import LDMInpainter
                    o = cfg.ldm_inpaint_options
                    self._ldm_native = LDMInpainter(
                        steps=o.steps, guidance=o.cfg_scale,
                        seed=o.seed)
                res = cfg.ldm_inpaint_size or cfg.max_size
                # same 5px ellipse dilation as the webui ldm branch —
                # diffusion must repaint past the aliased hole border
                e = 5
                el = cv2.getStructuringElement(
                    cv2.MORPH_ELLIPSE, (2 * e + 1, 2 * e + 1))
                filled = self._ldm_native(img_u8, cv2.dilate(mask, el),
                                          res=res)
            else:
                from ..serving.sd_webui import ldm_inpaint_webui
                e = 5
                el = cv2.getStructuringElement(
                    cv2.MORPH_ELLIPSE, (2 * e + 1, 2 * e + 1))
                mask_d = cv2.dilate(mask, el)
                prompt = 'high quality, masterpiece, no_humans'
                neg = ('cat, human, single, person, girl, 1girl, '
                       'creature, animal, alien, robot, body')
                res = cfg.ldm_inpaint_size or cfg.max_size
                opts = {k: getattr(cfg.ldm_inpaint_options, k)
                        for k in ('steps', 'cfg_scale', 'sample_name',
                                  'denoising_strength',
                                  'inpainting_fill', 'seed', 'subseed')}
                filled = ldm_inpaint_webui(
                    img_u8[..., ::-1], mask_d, res, cfg.sd_img2img_url,
                    prompt, neg, **opts)[..., ::-1]
            image = jnp.asarray(filled.astype(np.float32) / 255.0)

        return self._inpaint_append(state, image, out['disparity'],
                                    out['existing'], shift)

    # -- stage 4: frame rendering ----------------------------------------
    def render_frames(self, state: KenBurnsState, obj_from: Dict,
                      obj_to: Dict, steps: np.ndarray,
                      depth_field: Optional[bool] = None,
                      return_device: bool = False,
                      mesh=None) -> np.ndarray:
        """Render all frames in one scan; returns (T, H, W, 3) uint8
        (BGR). Parity: kenburns_effect.py:1015-1072.

        With ``mesh`` (a jax Mesh with a 'data' axis) the frame loop
        is sharded over devices via shard_map: the point cloud is
        replicated (it is identical for every frame) and each chip
        scans its T/N slice of the camera path — frame-parallel
        rendering with zero collectives. T is padded to a multiple of
        the axis size by repeating the last camera; the pad frames
        are dropped after the scan."""
        cfg = self.cfg
        if depth_field is None:
            depth_field = cfg.depth_field
        H, W = state.hw
        T = len(steps)
        max_cw = max(obj_from['crop_w'], obj_to['crop_w'])
        max_ch = max(obj_from['crop_h'], obj_to['crop_h'])

        # per-step camera scalars (host → device arrays)
        cams = np.stack([
            np.asarray(self._camera_params(float(t), obj_from, obj_to,
                                           state)[:3], np.float32)
            for t in steps])  # (T, 3): shift_u, shift_v, depth_scale

        n_shards = int(mesh.shape['data']) if mesh is not None else 1
        T_pad = -(-T // n_shards) * n_shards

        # key on the mesh object itself (hashable), not just its
        # size: two same-size meshes over different devices must not
        # share a compiled shard_map
        key = ('frames', H, W, state.cloud.capacity, T_pad, max_cw,
               max_ch, bool(depth_field), cfg.discfill_max_steps,
               cfg.discfill_mode, cfg.render_payload_dtype, mesh)
        if key not in self._jit_cache:
            focal_planes, scan_frames = self._render_builders(
                max_cw, max_ch, bool(depth_field), H, W)

            if mesh is None:
                @jax.jit
                def fn(state, cams):
                    fp_start, fp_end = focal_planes(state, cams)
                    return scan_frames(state, cams, fp_start, fp_end)
            else:
                shard_map = getattr(jax, 'shard_map', None)
                if shard_map is None:  # older jax
                    from jax.experimental.shard_map import shard_map
                from jax.sharding import PartitionSpec as PS
                sharded_scan = shard_map(
                    scan_frames, mesh=mesh,
                    in_specs=(PS(), PS('data'), PS(), PS()),
                    out_specs=PS('data'))

                @jax.jit
                def fn(state, cams):
                    # focal planes come from the GLOBAL first frame —
                    # computed replicated, outside the shard so every
                    # chip blurs against the same plane
                    fp_start, fp_end = focal_planes(state, cams)
                    return sharded_scan(state, cams, fp_start, fp_end)
            self._jit_cache[key] = fn

        cams_t = np.concatenate(
            [cams, np.asarray(steps, np.float32)[:, None]], 1)
        if T_pad != T:
            cams_t = np.concatenate(
                [cams_t, np.repeat(cams_t[-1:], T_pad - T, axis=0)], 0)
        frames = self._jit_cache[key](state, jnp.asarray(cams_t))
        frames = frames[:T]
        if return_device:
            return frames
        return np.asarray(jax.device_get(frames))

    def _render_builders(self, max_cw, max_ch, depth_field, H, W):
        """The per-frame render program pieces shared by
        render_frames (single scan / shard_map) and
        render_frames_stream (chunked): ``focal_planes(state, cams)``
        and ``scan_frames(state, cams, fp_start, fp_end)``."""
        cfg = self.cfg
        focal, baseline = cfg.focal, cfg.baseline
        dcfg = (cfg.dof_num_samples, cfg.lightness_factor,
                cfg.depth_factor, cfg.dof_speed)
        max_steps = cfg.discfill_max_steps
        if cfg.discfill_mode == 'fast':
            fill = lambda im, d: fill_disocclusion_fast3(im, d)
        else:
            fill = lambda im, d: fill_disocclusion(
                im, d, max_steps=max_steps)

        def render_one(state, cam, focal_planes):
            shift_u, shift_v, depth_scale, t = (cam[0], cam[1],
                                                cam[2], cam[3])
            dr = state.depth_range
            shift = compute_shift(dr, shift_u, shift_v, dr.min_val,
                                  dr.min_val * depth_scale, W, H,
                                  focal)
            pts = shift_points(state.cloud.points, shift)
            data = jnp.concatenate(
                [state.cloud.colors, state.cloud.depth[:, None]], 1)
            render, existing = render_pointcloud(
                pts, data, H, W, focal, baseline,
                payload_dtype=cfg.render_payload_dtype)
            filled = fill(
                render, render[..., 3] * (existing[..., 0] > 0))
            frame = filled[..., :3]
            if depth_field:
                ns, lf, dfac, dof_speed = dcfg
                depth_r = colorize_gray_r(filled[..., 3])
                fp_start, fp_end = focal_planes
                focal_int = 1.0 / (1.0 + jnp.exp(
                    (0.5 - t) * dof_speed))
                fp = focal_int * fp_end + (1 - focal_int) * fp_start
                frame = bokeh_blur(jnp.clip(frame, 0.0, 1.0),
                                   depth_r, ns, lf, dfac,
                                   focal_plane=fp)
            frame = jnp.clip(frame, 0.0, 1.0)
            frame = crop_center_resize(frame, max_ch, max_cw, H, W)
            return (jnp.clip(frame, 0.0, 1.0) * 255.0 + 0.5
                    ).astype(jnp.uint8)

        def focal_planes(state, cams):
            # focal planes from the t=0 frame (reference computes
            # them at frame_idx==0; kenburns_effect.py:1045-1059)
            if depth_field:
                shift = compute_shift(
                    state.depth_range, cams[0, 0], cams[0, 1],
                    state.depth_min, state.depth_min * cams[0, 2],
                    W, H, focal)
                pts = shift_points(state.cloud.points, shift)
                data = jnp.concatenate(
                    [state.cloud.colors, state.cloud.depth[:, None]],
                    1)
                render, existing = render_pointcloud(
                    pts, data, H, W, focal, baseline)
                filled = fill(
                    render, render[..., 3] * (existing[..., 0] > 0))
                depth_r = colorize_gray_r(filled[..., 3])
                has_ins = state.instances.count() > 0
                # median depth per instance (histogram matmul — at
                # the 100-instance reference capacity, 100 vmapped
                # O(HW log HW) sorts would dominate the once-per-clip
                # focal-plane setup); take the max
                meds = masked_median_u8(depth_r,
                                        state.instances.masks,
                                        state.instances.valid)
                fp_end = jnp.where(has_ins, jnp.max(meds), 255.0)
                fp_start = jnp.where(
                    has_ins,
                    jnp.where(jnp.abs(255.0 - fp_end)
                              > jnp.abs(fp_end), 255.0, 0.0),
                    0.0)
            else:
                fp_start = jnp.float32(0.0)
                fp_end = jnp.float32(255.0)
            return fp_start, fp_end

        def scan_frames(state, cams, fp_start, fp_end):
            # NOTE: the state is closed over (a scan *constant*),
            # not carried — carrying the ~40MB pytree made XLA
            # copy it every iteration (~200ms/frame at 1024).
            def step(carry, cam):
                return carry, render_one(state, cam,
                                         (fp_start, fp_end))
            _, frames = jax.lax.scan(step, 0, cams)
            return frames

        return focal_planes, scan_frames

    def render_frames_stream(self, state: KenBurnsState, obj_from: Dict,
                             obj_to: Dict, steps: np.ndarray,
                             video_path: str,
                             depth_field: Optional[bool] = None,
                             chunk: int = 16, fps: int = 25,
                             yuv420: bool = True) -> np.ndarray:
        """Chunked render with device→host transfer and mp4 encode
        OVERLAPPED with the rendering of the next chunk.

        `render_frames` scans all T frames in one program, so the
        (tunnel-bound) transfer can only start after the whole clip is
        rendered — at 1024 the transfer takes ~2x the render time
        (BENCH_r02). Here the camera path is cut into fixed-size
        chunks compiled once (one scan of length `chunk`); as soon as
        chunk k's scan is dispatched its I420 copy starts
        (copy_to_host_async) while chunk k+1 renders — the link and
        the chip work concurrently. Focal planes still come from the
        GLOBAL first frame (kenburns_effect.py:1045-1059), computed
        once before the chunk loop. Returns all frames on host (BGR)."""
        import cv2
        cfg = self.cfg
        if depth_field is None:
            depth_field = cfg.depth_field
        H, W = state.hw
        T = len(steps)
        max_cw = max(obj_from['crop_w'], obj_to['crop_w'])
        max_ch = max(obj_from['crop_h'], obj_to['crop_h'])
        cams = np.stack([
            np.asarray(self._camera_params(float(t), obj_from, obj_to,
                                           state)[:3], np.float32)
            for t in steps])
        cams_t = np.concatenate(
            [cams, np.asarray(steps, np.float32)[:, None]], 1)

        use_i420 = yuv420 and H % 4 == 0 and W % 2 == 0
        if use_i420:
            from ..utils.image import i420_to_bgr_host
        fns = self._stream_fns(state, max_cw, max_ch, bool(depth_field),
                               chunk, use_i420)
        fp_fn, chunk_fn = fns
        fp_start, fp_end = fp_fn(state, jnp.asarray(cams_t[:1]))

        n_chunks = -(-T // chunk)
        t_dispatch = _time.time()
        dev_chunks = []
        for ci in range(n_chunks):
            sl = cams_t[ci * chunk:(ci + 1) * chunk]
            if len(sl) < chunk:
                sl = np.concatenate(
                    [sl, np.repeat(sl[-1:], chunk - len(sl), 0)], 0)
            # the I420 pack runs INSIDE chunk_fn (one dispatch per
            # chunk instead of two — each un-fused dispatch is a
            # tunnel round trip)
            frames_c = chunk_fn(state, jnp.asarray(sl), fp_start, fp_end)
            try:
                frames_c.copy_to_host_async()
            except Exception:
                pass
            dev_chunks.append(frames_c)
        # attribution seam: computation done (transfers already in
        # flight via copy_to_host_async, so this block costs no wall
        # time when the link is the bottleneck)
        jax.block_until_ready(dev_chunks)
        self.timer.add('stream_render', _time.time() - t_dispatch)

        # decode (i420→BGR) + mp4 encode in a worker thread so the
        # host CPU encodes chunk k while the tunnel pulls chunk k+1 —
        # the pulls in the main loop are pure link time, giving both
        # overlap and clean {render, transfer, encode} attribution
        # (VERDICT r4 item 1)
        import queue
        import threading
        vw = cv2.VideoWriter(video_path,
                             cv2.VideoWriter_fourcc(*'mp4v'), fps,
                             (W, H))
        host: list = [None] * n_chunks
        q: 'queue.Queue' = queue.Queue(maxsize=4)
        enc_s = [0.0]
        enc_err: list = []

        def encoder():
            sentinel_seen = False
            try:
                while True:
                    item = q.get()
                    if item is None:
                        sentinel_seen = True
                        break
                    ci, arr = item
                    t0 = _time.time()
                    if use_i420:
                        arr = i420_to_bgr_host(arr)
                    if ci == n_chunks - 1:
                        arr = arr[:T - ci * chunk]
                    host[ci] = arr
                    for f in arr:
                        vw.write(f)
                    enc_s[0] += _time.time() - t0
                if cfg.playback:
                    # the palindrome tail (reference npyframes2video
                    # playback, kenburns_effect.py:1086-1090) stays in
                    # the worker so its encode time is attributed to
                    # stream_encode rather than vanishing into the
                    # phase total
                    t0 = _time.time()
                    flat = [f for c in host for f in c]
                    for f in flat[::-1][1:-1]:
                        vw.write(f)
                    enc_s[0] += _time.time() - t0
            except Exception as e:  # noqa: BLE001 — surfaced below
                enc_err.append(e)
                # keep draining UNTIL the sentinel: the queue is
                # BOUNDED (maxsize=4), so a dead consumer would
                # deadlock the producer's q.put forever instead of
                # letting join()+re-raise run. If the error came from
                # the palindrome tail the sentinel was already
                # consumed — draining then would block on an empty
                # queue forever (the r5 review's second deadlock).
                while not sentinel_seen:
                    if q.get() is None:
                        sentinel_seen = True

        th = threading.Thread(target=encoder, daemon=True)
        th.start()
        xfer = 0.0
        try:
            for ci, c in enumerate(dev_chunks):
                t0 = _time.time()
                arr = np.asarray(c)     # blocks on the async D2H copy
                xfer += _time.time() - t0
                q.put((ci, arr))
        finally:
            # always deliver the sentinel, reap the worker and close
            # the writer — a producer-side error (D2H pull failing)
            # would otherwise leak the encoder thread blocked on
            # q.get() and leave the mp4 handle open
            q.put(None)
            th.join()
            self.timer.add('stream_transfer', xfer)
            self.timer.add('stream_encode', enc_s[0])
            vw.release()
        if enc_err:
            raise enc_err[0]
        frames = np.concatenate(host) if host else \
            np.zeros((0, H, W, 3), np.uint8)
        return frames

    def _stream_fns(self, state, max_cw, max_ch, depth_field,
                    chunk, pack_i420: bool = False):
        """Compiled (focal_planes, chunk_scan) pair for the streaming
        renderer — the chunk scan takes the focal planes as inputs so
        one compilation serves every chunk. With ``pack_i420`` the
        device-side BGR→I420 packing is fused into the same program
        (one dispatch per chunk instead of two)."""
        cfg = self.cfg
        H, W = state.hw
        key = ('stream', H, W, state.cloud.capacity, chunk, max_cw,
               max_ch, depth_field, cfg.discfill_max_steps,
               cfg.discfill_mode, cfg.render_payload_dtype, pack_i420)
        if key not in self._jit_cache:
            # reuse render_frames' builders by compiling a T=chunk
            # variant: build the same closures with the right statics
            builders = self._render_builders(max_cw, max_ch,
                                             depth_field, H, W)
            focal_planes, scan_frames = builders
            fp_fn = jax.jit(focal_planes)
            if pack_i420:
                from ..utils.image import bgr_to_i420

                def scan_i420(state, cams, fp_s, fp_e):
                    return bgr_to_i420(
                        scan_frames(state, cams, fp_s, fp_e))
                chunk_fn = jax.jit(scan_i420)
            else:
                chunk_fn = jax.jit(scan_frames)
            self._jit_cache[key] = (fp_fn, chunk_fn)
        return self._jit_cache[key]

    # -- orchestration -----------------------------------------------------
    def inpaint_extremes(self, state: KenBurnsState, obj_from: Dict,
                         obj_to: Dict) -> KenBurnsState:
        """The inpaint protocol of the flagship path: one inpaint pass
        at each camera extreme (t = 0, 1 — kenburns_effect.py:990-1012
        pre-passes), then compact the grown cloud to a snug capacity.
        Shared by process_kenburns, run() and the serving stepping
        route so the pass schedule lives in exactly one place."""
        with self.timer.time('inpaint_passes'):
            for t in (0.0, 1.0):
                su, sv, ds, _, _ = self._camera_params(
                    t, obj_from, obj_to, state)
                state = self.inpaint_pass(state, su, sv, ds)
            jax.block_until_ready(state.cloud.points)
        return self.compact_state(state)

    def process_kenburns(self, state: KenBurnsState, obj_from: Dict,
                         obj_to: Dict, steps=None, inpaint: bool = True,
                         return_device: bool = False,
                         mesh=None) -> np.ndarray:
        cfg = self.cfg
        if steps is None:
            steps = np.linspace(0.0, 1.0, cfg.num_frame)
        if inpaint:
            state = self.inpaint_extremes(state, obj_from, obj_to)
        else:
            state = self.compact_state(state)
        with self.timer.time('render_frames'):
            frames = self.render_frames(state, obj_from, obj_to, steps,
                                        return_device=True, mesh=mesh)
            jax.block_until_ready(frames)
        if return_device:
            return frames
        with self.timer.time('host_transfer'):
            return np.asarray(jax.device_get(frames))

    def compact_state(self, state: KenBurnsState) -> KenBurnsState:
        """Shrink the point cloud to a snug static capacity (bucketed
        to limit recompiles) — the per-frame splat cost scales with
        buffer capacity, not live points."""
        count = int(jax.device_get(state.cloud.count))
        bucket = 1 << 16
        snug = -(-int(count * 1.02) // bucket) * bucket
        if snug < state.cloud.capacity:
            state = state.replace(cloud=state.cloud.shrink_to(snug))
        return state

    def run(self, img: Union[str, np.ndarray],
            video_path: Optional[str] = None) -> np.ndarray:
        """Full flagship path: image → frames (→ optional mp4).

        The configured detector is always installed first — the
        reference's generate_kenburns_config unconditionally runs
        instance segmentation (kenburns_effect.py:915); set
        cfg.detector='none' to opt out.

        With a video path, the device→host frame transfer is streamed
        in chunks overlapped with mp4 encoding (the tunnel-bound
        transfer otherwise serializes after the render)."""
        self.ensure_detector()
        state = self.generate_state(img)
        obj_from, obj_to = self.autozoom(state)
        if video_path:
            # inpaint+compact as in process_kenburns, then the
            # streaming renderer: chunk k's device→host I420 copy and
            # mp4 encode overlap chunk k+1's render
            state = self.inpaint_extremes(state, obj_from, obj_to)
            steps = np.linspace(0.0, 1.0, self.cfg.num_frame)
            with self.timer.time('render_stream+encode'):
                frames = self.render_frames_stream(
                    state, obj_from, obj_to, steps, video_path)
            return frames
        return self.process_kenburns(state, obj_from, obj_to)


def write_video(frames: np.ndarray, path: str, fps: int = 25,
                playback: bool = True) -> None:
    """frames (T,H,W,3) BGR uint8 → mp4 (host-side encoder).
    Parity: kenburns_effect.py:1086-1090 (palindrome playback)."""
    seq = list(frames)
    if playback:
        seq = seq + seq[::-1][1:-1]
    import cv2
    h, w = seq[0].shape[:2]
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*'mp4v'), fps,
                         (w, h))
    for f in seq:
        vw.write(f)
    vw.release()


def stream_video(frames_device, path: str, fps: int = 25,
                 playback: bool = True, chunk: int = 8,
                 yuv420: bool = True) -> np.ndarray:
    """Chunked device→host transfer overlapped with mp4 encoding.

    The axon-tunnel transfer of a full (T, H, W, 3) u8 clip is the
    slowest serial tail of the flagship path (BENCH_r01: 12.6 s for
    75 frames); starting the async copy of chunk i+1 before encoding
    chunk i hides the encode time inside the transfer (and vice versa
    on faster links). The palindrome second half reuses host frames —
    no second transfer. Returns the forward frames on host.

    With ``yuv420`` (default) frames are converted to I420 on device
    first — mp4 stores 4:2:0 chroma anyway, so this halves the bytes
    over the link (1.5 B/px vs 3) at no cost to the encoded video;
    the host converts back with one cv2.cvtColor per frame. Falls
    back to BGR transfer when the frame shape can't be I420-packed."""
    import cv2
    T, h, w = frames_device.shape[:3]
    if yuv420 and h % 4 == 0 and w % 2 == 0 and T > 0:
        from ..utils.image import bgr_to_i420, i420_to_bgr_host
        frames_device = bgr_to_i420(frames_device)  # module-level jit
        decode = i420_to_bgr_host
    else:
        decode = lambda arr: arr
    chunks = [frames_device[i:i + chunk] for i in range(0, T, chunk)]
    for c in chunks:
        try:
            c.copy_to_host_async()
        except Exception:
            break  # backend without async copies: plain device_get
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*'mp4v'), fps,
                         (w, h))
    host_chunks = []
    for c in chunks:
        arr = decode(np.asarray(c))
        host_chunks.append(arr)
        for f in arr:
            vw.write(f)
    frames = np.concatenate(host_chunks) if host_chunks else \
        np.zeros((0, h, w, 3), np.uint8)
    if playback:
        for f in list(frames)[::-1][1:-1]:
            vw.write(f)
    vw.release()
    return frames
