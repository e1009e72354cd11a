"""AnimeInsSeg — anime instance segmentation pipeline (TPU-native).

Equivalent of reference animeinsseg/__init__.py (AnimeInsSeg): detect
→ score filter → (optional) second-stage mask refinement → Instances.
The mmdet test pipeline (Resize keep-ratio to det_size + Pad to
square + BGR normalization) is reproduced host-side; the forward +
fixed-shape postprocess is one jitted XLA program per image-shape
bucket.
"""
from __future__ import annotations

import functools
from typing import Dict, List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..config import KenBurnsConfig
from ..instances import Instances
from ..models.rtmdet import AnimeDetector, postprocess
from ..utils import LOGGER

# RTMDet data_preprocessor constants (BGR order, bgr_to_rgb=False)
_MEAN = np.array([103.53, 116.28, 123.675], np.float32)
_STD = np.array([57.375, 57.12, 58.395], np.float32)
_PAD_VAL = 114.0


def normalize_canvas(x):
    """(x - mean) / std on DEVICE (f32, IEEE — bit-identical to the
    former host-numpy normalization). Keeping this inside the jitted
    programs lets the host ship the letterboxed canvas as uint8:
    1.2 MB over the tunnel instead of 4.9 MB of pre-normalized f32
    per 640x640 image — the H2D transfer is a visible slice of the
    per-image latency on this link."""
    return (x.astype(jnp.float32) - jnp.asarray(_MEAN)) \
        / jnp.asarray(_STD)


class AnimeInsSeg:
    """Detector wrapper with lazy jit per input bucket.

    Without a converted checkpoint the detector runs with random
    weights (useful for benchmarking / integration); call
    ``load_torch_checkpoint`` to install published weights.
    """

    def __init__(self, det_size: int = 640, mask_thr: float = 0.3,
                 max_instances: int = 100,
                 dtype: Optional[str] = 'auto', seed: int = 0):
        from ..utils.env import enable_compilation_cache
        enable_compilation_cache()
        self.det_size = det_size
        self.mask_thr = mask_thr
        self.max_instances = max_instances
        if dtype == 'auto':
            # accelerator → bf16 compute (the reference runs its test
            # pipeline in fp16 — the custom head carries an fp16 NaN
            # guard, rtmdet_inshead_custom.py:30-31; bf16 is the TPU
            # analogue and 2.3x faster, heads emit f32 either way);
            # CPU (tests) → full f32.
            dtype = None if jax.default_backend() == 'cpu' \
                else 'bfloat16'
        self.model = AnimeDetector(dtype=dtype)
        self._variables = None
        self._seed = seed
        self.refine = None  # installed by set_refine_method
        self.tagger = None  # installed by init_tagger

    # ------------------------------------------------------------------
    def _ensure_variables(self):
        if self._variables is None:
            LOGGER.warning('AnimeInsSeg: initializing RANDOM detector '
                           'weights (no checkpoint loaded)')
            dummy = jnp.zeros((1, self.det_size, self.det_size, 3),
                              jnp.float32)
            from ..utils.env import jit_init
            self._variables = jit_init(
                self.model, jax.random.PRNGKey(self._seed), dummy)
        return self._variables

    def load_variables(self, variables) -> None:
        self._variables = variables

    # ------------------------------------------------------------------
    def _preprocess(self, img_bgr: np.ndarray):
        """Keep-ratio resize to det_size + bottom/right pad.

        Returns (batched UNNORMALIZED canvas — uint8 when the input is
        uint8, f32 otherwise; normalize_canvas runs on device inside
        the jitted forward — , scale, (nh, nw))."""
        import cv2
        h, w = img_bgr.shape[:2]
        scale = self.det_size / max(h, w)
        nh, nw = int(round(h * scale)), int(round(w * scale))
        resized = cv2.resize(img_bgr, (nw, nh),
                             interpolation=cv2.INTER_LINEAR)
        dt = np.uint8 if img_bgr.dtype == np.uint8 else np.float32
        canvas = np.full((self.det_size, self.det_size, 3),
                         dt(_PAD_VAL), dt)
        canvas[:nh, :nw] = resized.astype(dt)
        return canvas[None], scale, (nh, nw)

    def _run_device(self, x: np.ndarray, score_thr: float = None):
        """Fixed-det_size forward + postprocess — compiled ONCE and
        shared across every input resolution. With score_thr given,
        valid/masks are score-filtered outside jit (2 extra
        dispatches — callers on the hot path use _rescale instead,
        which folds the filter into its own program)."""
        variables = self._ensure_variables()
        if getattr(self, '_compiled', None) is None:
            det_size, max_det, mask_thr = \
                self.det_size, self.max_instances, self.mask_thr

            @jax.jit
            def fn(variables, x):
                cls_out, reg_out, krn_out, mask_feat = self.model.apply(
                    variables, normalize_canvas(x))
                return postprocess(
                    tuple(cls_out), tuple(reg_out), tuple(krn_out),
                    mask_feat, score_thr=0.0, mask_thr=mask_thr,
                    pre_topk=512, max_det=max_det,
                    input_h=det_size, input_w=det_size)
            self._compiled = fn
        out = self._compiled(variables, jnp.asarray(x))
        if score_thr is None:
            return out
        valid = out['valid'] & (out['scores'] > score_thr)
        return {**out, 'valid': valid,
                'masks': out['masks'] & valid[:, None, None]}

    def _rescale(self, out, h: int, w: int, nh: int, nw: int,
                 scale: float, score_thr: float):
        """Score filter + mask un-letterbox resize + bbox rescale as
        one jitted program per output resolution.

        This chain used to run op-by-op outside jit; on the tunneled
        TPU every un-jitted op is a dispatch round trip (~50-200 ms),
        which dominated the detector stage's steady seconds. One
        small program per (h, w) = one dispatch — and the expensive
        forward above stays compiled once for ALL resolutions (a
        per-resolution detector recompile would cost minutes per new
        image size in a mixed-size batch)."""
        key = ('rescale', h, w, nh, nw)
        if not hasattr(self, '_jit_cache'):
            self._jit_cache = {}
        if key not in self._jit_cache:

            @jax.jit
            def fn(masks, bboxes, scores, valid, thr):
                valid = valid & (scores > thr)
                masks = masks[:, :nh, :nw] & valid[:, None, None]
                masks = jax.image.resize(
                    masks.astype(jnp.float32),
                    (masks.shape[0], h, w), method='linear') > 0.5
                bboxes = bboxes / scale
                bboxes = jnp.clip(
                    bboxes, jnp.zeros((4,)),
                    jnp.asarray([w, h, w, h], jnp.float32))
                xywh = jnp.concatenate(
                    [bboxes[:, :2], bboxes[:, 2:] - bboxes[:, :2]], 1)
                return (masks, jnp.round(xywh), scores, valid)
            self._jit_cache[key] = fn
        return self._jit_cache[key](out['masks'], out['bboxes'],
                                    out['scores'], out['valid'],
                                    jnp.float32(score_thr))

    # ------------------------------------------------------------------
    def infer(self, img: Union[str, np.ndarray],
              pred_score_thr: float = 0.3,
              output_type: str = 'instances',
              remove_duplicated: bool = False) -> Instances:
        """Run detection on one image (path or BGR array).

        Parity: animeinsseg/__init__.py:401-504 (infer/_det_forward/
        _infer_simple); per-instance tags via infer_tags below.
        """
        import cv2
        if isinstance(img, str):
            img = cv2.imread(img)
        h, w = img.shape[:2]
        x, scale, (nh, nw) = self._preprocess(img)
        # fixed-size forward (compiled once) + per-size fused rescale
        # to image space (xyxy → xywh like the reference _det_forward)
        out = self._run_device(x)
        masks, xywh, scores, valid = self._rescale(
            out, h, w, nh, nw, scale, pred_score_thr)
        ins = Instances(masks=masks, bboxes=xywh,
                        scores=scores, valid=valid)
        if remove_duplicated:
            # overlap dedup (anime_instances.py:84-127 semantics)
            ins = ins.remove_duplicated()
        if self.refine is not None:
            ins = self.refine(ins, img)
        return ins

    def set_refine_method(self, refine_method: str = 'none',
                          refine_size: int = 720) -> None:
        """Parity: animeinsseg/__init__.py:623-636."""
        from .refine import make_refiner
        self.refine = make_refiner(refine_method, refine_size,
                                   self.mask_thr)

    # ------------------------------------------------------------------
    def infer_batch(self, imgs, pred_score_thr: float = 0.3,
                    mesh=None) -> List[Instances]:
        """Data-parallel batch inference: images sharded over the
        'data' mesh axis, one pjit forward+postprocess for the whole
        batch (TPU-native counterpart of the reference's sequential
        tqdm loop, animeinsseg/__init__.py:485-499)."""
        import cv2
        from ..parallel.mesh import batch_sharding, make_mesh

        imgs = [cv2.imread(p) if isinstance(p, str) else p for p in imgs]
        pre = [self._preprocess(im) for im in imgs]
        xs = np.concatenate([p[0] for p in pre], axis=0)
        n = len(imgs)
        if mesh is None:
            mesh = make_mesh(model=1)
        nd = mesh.devices.size
        pad = (-n) % nd
        if pad:
            xs = np.concatenate([xs, np.repeat(xs[-1:], pad, 0)], 0)

        variables = self._ensure_variables()
        if getattr(self, '_batch_compiled', None) is None:
            det_size, max_det, mask_thr = \
                self.det_size, self.max_instances, self.mask_thr

            @jax.jit
            def fn(variables, x):
                cls_out, reg_out, krn_out, mask_feat = self.model.apply(
                    variables, normalize_canvas(x))

                def post_one(args):
                    c, r, k, mf = args
                    return postprocess(
                        tuple(t[None] for t in c),
                        tuple(t[None] for t in r),
                        tuple(t[None] for t in k), mf[None],
                        score_thr=0.0, mask_thr=mask_thr, pre_topk=512,
                        max_det=max_det, input_h=det_size,
                        input_w=det_size)
                return jax.vmap(lambda c0, c1, c2, r0, r1, r2, k0, k1,
                                k2, mf: post_one(((c0, c1, c2),
                                                  (r0, r1, r2),
                                                  (k0, k1, k2), mf)))(
                    *cls_out, *reg_out, *krn_out, mask_feat)
            self._batch_compiled = fn

        with mesh:
            sharded = jax.device_put(jnp.asarray(xs),
                                     batch_sharding(mesh))
            out = self._batch_compiled(variables, sharded)
        out = jax.device_get(out)

        results = []
        for i in range(n):
            h, w = imgs[i].shape[:2]
            scale, (nh, nw) = pre[i][1], pre[i][2]
            masks = jnp.asarray(out['masks'][i][:, :nh, :nw])
            masks = jax.image.resize(masks.astype(jnp.float32),
                                     (masks.shape[0], h, w),
                                     method='linear') > 0.5
            valid = jnp.asarray(out['valid'][i]) & \
                (jnp.asarray(out['scores'][i]) > pred_score_thr)
            bboxes = jnp.asarray(out['bboxes'][i]) / scale
            bboxes = jnp.clip(bboxes, jnp.zeros((4,)),
                              jnp.asarray([w, h, w, h], jnp.float32))
            xywh = jnp.concatenate(
                [bboxes[:, :2], bboxes[:, 2:] - bboxes[:, :2]], 1)
            ins = Instances(masks=masks & valid[:, None, None],
                            bboxes=jnp.round(xywh),
                            scores=jnp.asarray(out['scores'][i]),
                            valid=valid)
            if self.refine is not None:
                ins = self.refine(ins, imgs[i])
            results.append(ins)
        return results

    # ------------------------------------------------------------------
    def infer_embeddings(self, img: Union[str, np.ndarray],
                         pre_topk: int = 512):
        """Raw candidate embeddings before NMS: boxes/scores/kernels/
        priors plus the mask prototype features — the hook external
        box prompts (e.g. SAM-style UIs) use to decode masks.
        Parity: animeinsseg/__init__.py:262-337 (infer_embeddings
        hijack path)."""
        import cv2
        if isinstance(img, str):
            img = cv2.imread(img)
        x, scale, (nh, nw) = self._preprocess(img)
        variables = self._ensure_variables()

        if getattr(self, '_embed_fns', None) is None:
            self._embed_fns = {}
        if pre_topk not in self._embed_fns:
            from ..models.rtmdet import (NUM_GEN_PARAMS, STRIDES,
                                         distance2bbox, level_priors)

            @jax.jit
            def fn(variables, x):
                cls_out, reg_out, krn_out, mask_feat = self.model.apply(
                    variables, normalize_canvas(x))
                scores, dists, kernels, priors, strides = \
                    [], [], [], [], []
                for lv, (c, r, k) in enumerate(
                        zip(cls_out, reg_out, krn_out)):
                    h, w = c.shape[-3], c.shape[-2]
                    scores.append(jax.nn.sigmoid(
                        c.reshape(-1, c.shape[-1]).max(-1)))
                    dists.append(r.reshape(-1, 4))
                    kernels.append(k.reshape(-1, NUM_GEN_PARAMS))
                    pr = level_priors(h, w, STRIDES[lv])
                    priors.append(pr)
                    strides.append(jnp.full((pr.shape[0],),
                                            float(STRIDES[lv])))
                scores = jnp.concatenate(scores)
                k = min(pre_topk, scores.shape[0])
                top_scores, top = jax.lax.top_k(scores, k)
                dists = jnp.concatenate(dists)[top]
                priors_t = jnp.concatenate(priors)[top]
                return {
                    'scores': top_scores,
                    'bboxes': distance2bbox(priors_t, dists),
                    'kernels': jnp.concatenate(kernels)[top],
                    'priors': priors_t,
                    'strides': jnp.concatenate(strides)[top],
                    'mask_feat': mask_feat[0],
                }
            self._embed_fns[pre_topk] = fn
        emb = self._embed_fns[pre_topk](variables, jnp.asarray(x))
        return emb, img, scale, (nh, nw)

    def segment_with_bboxes(self, img: Union[str, np.ndarray],
                            bboxes_xyxy: np.ndarray,
                            min_iou: float = 0.05) -> Instances:
        """Decode instance masks for externally provided boxes by IoU-
        matching them to the strongest candidates and running their
        dynamic mask heads. Boxes whose best candidate IoU falls below
        ``min_iou`` come back with valid=False (a bare argmax would
        silently match a zero-overlap box to candidate 0).
        Parity: animeinsseg/__init__.py:339-393."""
        from ..models.rtmdet import box_iou, dynamic_mask_heads
        emb, img, scale, (nh, nw) = self.infer_embeddings(img)
        h, w = img.shape[:2]

        boxes = jnp.asarray(np.asarray(bboxes_xyxy, np.float32)) * scale
        iou = box_iou(boxes, emb['bboxes'])             # (Q, K)
        match = jnp.argmax(iou, axis=1)
        matched_ok = jnp.max(iou, axis=1) >= min_iou
        logits = dynamic_mask_heads(
            emb['mask_feat'], emb['kernels'][match],
            emb['priors'][match], emb['strides'][match])
        probs = jax.nn.sigmoid(logits)
        probs = jax.image.resize(
            probs, (probs.shape[0], self.det_size, self.det_size),
            method='linear')[:, :nh, :nw]
        masks = jax.image.resize(
            probs, (probs.shape[0], h, w), method='linear') > 0.5
        matched_boxes = emb['bboxes'][match] / scale
        xywh = jnp.concatenate(
            [matched_boxes[:, :2],
             matched_boxes[:, 2:] - matched_boxes[:, :2]], 1)
        ins = Instances(
            masks=masks & matched_ok[:, None, None],
            bboxes=jnp.round(xywh) * matched_ok[:, None],
            scores=emb['scores'][match] * matched_ok,
            valid=matched_ok)
        if self.refine is not None:
            ins = self.refine(ins, img)
        return ins

    # ------------------------------------------------------------------
    def load_torch_checkpoint(self, path: str) -> None:
        """Convert + install the published rtmdetl ckpt (name mapping
        in models/convert.py; exercised once real weights are on
        disk)."""
        from ..models import convert as C
        sd = C.load_torch_ckpt(path)
        from ..models.convert_rtmdet import convert_rtmdet
        variables = convert_rtmdet(sd)
        self._variables = variables


    # ------------------------------------------------------------------
    # per-instance tagging (animeinsseg/__init__.py:229-260)
    # ------------------------------------------------------------------
    def init_tagger(self, model_path: str = '', **tagger_kwargs) -> None:
        """Install the Danbooru tagger (native Flax SwinV2 backend by
        default when a non-onnx checkpoint is given; see
        models/tagger.py)."""
        from ..models.tagger import Tagger
        self.tagger = Tagger(model_path, **tagger_kwargs)

    def infer_tags(self, instances: Instances, img_bgr: np.ndarray,
                   infer_grey: bool = False):
        """Tag each valid instance from its white-backed masked crop.
        Returns (tags, character_tags): per valid instance, a
        space-joined tag string and the character-tag list —
        `simple_background` / `white_background` are dropped like the
        reference (animeinsseg/__init__.py:233-260)."""
        import cv2
        if self.tagger is None:
            self.init_tagger()
        img = img_bgr
        if infer_grey:
            img = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)[..., None]
            img = img[..., [0, 0, 0]]
        bboxes = np.asarray(jax.device_get(instances.bboxes))
        masks = np.asarray(jax.device_get(instances.masks))
        valid = np.asarray(jax.device_get(instances.valid))
        exclude = ('simple_background', 'white_background')
        tags_out, ctags_out = [], []
        for i in np.flatnonzero(valid):
            x, y, w, h = bboxes[i].astype(np.int32)
            crop = img[y:y + h, x:x + w].copy()
            m = masks[i][y:y + h, x:x + w]
            if crop.size == 0:
                tags_out.append('')
                ctags_out.append([])
                continue
            crop[~m.astype(bool)] = 255
            tags, ctags = self.tagger.label_cv2_bgr(crop)
            tags_out.append(' '.join(t for t in tags
                                     if t not in exclude))
            ctags_out.append(ctags)
        return tags_out, ctags_out
