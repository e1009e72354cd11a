"""Second-stage mask refinement (refinenet_isnet / animeseg).

Parity: reference animeinsseg/__init__.py:623-665 (set_refine_method,
_postprocess_refine) and :78-117 (animeseg_refine). The per-instance
4-channel crops are batched over the *static* instance capacity and
chunked through the ISNet in groups, one jitted program per
(capacity, refine_size) bucket.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..instances import Instances
from ..models.isnet import ISNetDIS, convert_isnet
from ..utils import LOGGER, resize_bilinear_ac, scaledown_size


class ISNetRefiner:
    """refinenet_isnet: ISNetDIS(in_ch=4: BGR + coarse mask)."""

    def __init__(self, refine_size: int = 720, mask_thr: float = 0.3,
                 chunk: int = 4, seed: int = 0,
                 dtype: Optional[str] = 'auto'):
        self.refine_size = refine_size
        self.mask_thr = mask_thr
        self.chunk = chunk
        self.net = ISNetDIS(in_ch=4)
        self._variables = None
        self._seed = seed
        self._jit_cache = {}
        if dtype == 'auto':
            # accelerator → bf16 compute for the refine forwards (the
            # output is a thresholded mask; sigmoid + threshold stay
            # f32). Same convention as pipeline/segment.py:57-64.
            dtype = None if jax.default_backend() == 'cpu' \
                else 'bfloat16'
        self.dtype = dtype

    def _vars(self):
        if self._variables is None:
            LOGGER.warning('ISNetRefiner: RANDOM init (no checkpoint)')
            s = 64
            from ..utils.env import jit_init
            self._variables = jit_init(
                self.net, jax.random.PRNGKey(self._seed),
                jnp.zeros((1, s, s, 4), jnp.float32))
        return self._variables

    def load_torch_checkpoint(self, path: str) -> None:
        from ..models.convert import load_torch_ckpt
        self._variables = convert_isnet(load_torch_ckpt(path))

    # ------------------------------------------------------------------
    def __call__(self, instances: Instances, img_bgr: np.ndarray
                 ) -> Instances:
        """Refine every VALID instance; cost is proportional to the
        number of detections, not the static capacity. Valid slots
        are packed to the front (host-side stable argsort) and a
        dynamic-trip-count fori_loop runs ceil(n_valid/chunk) ISNet
        chunks — one compiled program per (capacity, size) bucket
        regardless of how many instances an image has. The reference
        batches only actual instances the same way
        (animeinsseg/__init__.py:638-665, batch 4)."""
        if instances.is_empty_host():
            return instances
        H, W = img_bgr.shape[:2]
        S = self.refine_size
        nh, nw = scaledown_size(H, W, S)
        N = instances.capacity

        valid_h = np.asarray(jax.device_get(instances.valid))
        n_valid = int(valid_h.sum())
        if n_valid == 0:
            return instances
        # valid slots first; stable so slot order is preserved
        order = np.argsort(~valid_h, kind='stable').astype(np.int32)

        key = (N, S, H, W)
        if key not in self._jit_cache:
            net, thr = self.net, self.mask_thr
            c = min(self.chunk, N)
            cdt = jnp.bfloat16 if self.dtype == 'bfloat16' \
                else jnp.float32

            @jax.jit
            def fn(variables, image_small, masks, valid, order,
                   inv_order, n_valid):
                if cdt != jnp.float32:
                    variables = jax.tree_util.tree_map(
                        lambda p: p.astype(cdt)
                        if p.dtype == jnp.float32 else p, variables)
                # image_small: (nh, nw, 3) float; pad bottom/right to S
                img = jnp.pad(image_small,
                              ((0, S - nh), (0, S - nw), (0, 0)))
                imgb = jnp.broadcast_to(img[None], (c, S, S, 3))

                # Chunked at every full-resolution touch point so the
                # f32 full-res transients never exceed (c, H, W):
                # per-chunk gather+downsample (exactly the original
                # pattern, n_valid·H total gather rows), net forward,
                # LOW-res probs buffer, then chunked upsample+
                # threshold in the packed layout and ONE bool
                # un-permute gather — replacing the original's
                # heavier per-chunk full-res f32 upsample +
                # at[sel].set scatter. Per-image resize/threshold
                # math is unchanged → bit-identical results.
                def body(i, probs):
                    # tail chunks clamp and re-run a few done slots —
                    # idempotent, so harmless
                    sel = jax.lax.dynamic_slice(order, (i * c,), (c,))
                    m = jax.image.resize(
                        masks[sel].astype(jnp.float32), (c, nh, nw),
                        method='linear')
                    m = jnp.pad(m, ((0, 0), (0, S - nh), (0, S - nw)))
                    batch = jnp.concatenate([imgb, m[..., None]], -1)
                    sides, _ = net.apply(variables, batch.astype(cdt))
                    preds = jax.nn.sigmoid(
                        sides[0][..., 0].astype(jnp.float32))
                    preds = preds[:, :nh, :nw]
                    return jax.lax.dynamic_update_slice(
                        probs, preds, (i * c, 0, 0))

                nchunks = (n_valid + c - 1) // c
                probs = jax.lax.fori_loop(
                    0, nchunks, body,
                    jnp.zeros((N, nh, nw), jnp.float32))

                def up_body(i, out):
                    p = jax.lax.dynamic_slice(probs, (i * c, 0, 0),
                                              (c, nh, nw))
                    up = resize_bilinear_ac(p[..., None], H, W)[..., 0]
                    return jax.lax.dynamic_update_slice(
                        out, up > thr, (i * c, 0, 0))

                # still in the packed layout → detections-
                # proportional trip count; un-permute the BOOL result
                # with one cheap N·H-row gather at the end
                ordered = jax.lax.fori_loop(
                    0, nchunks, up_body,
                    jnp.zeros((N, H, W), jnp.bool_))
                return ordered[inv_order] & valid[:, None, None]
            self._jit_cache[key] = fn

        inv_order = np.empty_like(order)
        inv_order[order] = np.arange(len(order), dtype=np.int32)
        small = jax.image.resize(
            jnp.asarray(img_bgr.astype(np.float32) / 255.0),
            (nh, nw, 3), method='linear')
        new_masks = self._jit_cache[key](
            self._vars(), small, instances.masks, instances.valid,
            jnp.asarray(order), jnp.asarray(inv_order),
            jnp.int32(n_valid))
        return instances.replace(masks=new_masks)


def get_refine_net(net_name: str):
    """Whole-image segmentation net registry — parity with the
    reference's get_net (animeseg_refine/__init__.py:28-41): isnet /
    isnet_is / isnet_gt / u2net (full2) / u2netl (lite2) / modnet.

    Returns (flax module, fn(module, variables, rgb01_batch) ->
    foreground probability (B, H, W))."""
    if net_name in ('isnet', 'isnet_is'):
        net = ISNetDIS(in_ch=3)

        def run(net, variables, x):
            sides, _ = net.apply(variables, x)
            return jax.nn.sigmoid(sides[0][..., 0])
        return net, run
    if net_name == 'isnet_gt':
        from ..models.u2net import ISNetGTEncoder
        net = ISNetGTEncoder()

        def run(net, variables, x):
            # the GT encoder is single-channel (the reference trains
            # it on masks, isnet.py:436-439); project RGB to luma so
            # real 1-ch checkpoints load and apply
            luma = (0.299 * x[..., 0:1] + 0.587 * x[..., 1:2]
                    + 0.114 * x[..., 2:3])
            sides = net.apply(variables, luma)[0]
            return jax.nn.sigmoid(sides[0][..., 0])
        return net, run
    if net_name in ('u2net', 'u2netl'):
        from ..models.u2net import U2Net
        net = U2Net(lite=(net_name == 'u2netl'))

        def run(net, variables, x):
            sides, _ = net.apply(variables, x)
            return jax.nn.sigmoid(sides[0][..., 0])
        return net, run
    if net_name == 'modnet':
        from ..models.modnet import MODNet
        net = MODNet()

        def run(net, variables, x):
            # MODNet normalizes to [-1, 1] (reference inference
            # transform) and predicts the matte directly
            _, _, matte = net.apply(variables, x * 2.0 - 1.0)
            return matte[..., 0]
        return net, run
    raise ValueError(f'unknown animeseg net: {net_name!r} (expected '
                     "isnet/isnet_is/isnet_gt/u2net/u2netl/modnet)")


class AnimeSegRefiner:
    """'animeseg': whole-image segmentation-net mask intersected with
    each instance mask when the intersection keeps >30% of the area
    (animeinsseg/__init__.py:78-117). The backbone is selectable
    through ``net_name`` like the reference's get_net
    (animeseg_refine/__init__.py:28-41)."""

    def __init__(self, input_size: int = 1024, seg_thr: float = 0.5,
                 seed: int = 0, net_name: str = 'isnet_is'):
        self.input_size = input_size
        self.seg_thr = seg_thr
        self.net_name = net_name
        self.net, self._run = get_refine_net(net_name)
        self._variables = None
        self._seed = seed
        self._jit_cache = {}

    def _vars(self):
        if self._variables is None:
            LOGGER.warning('AnimeSegRefiner(%s): RANDOM init '
                           '(no checkpoint)', self.net_name)
            # isnet_gt is single-channel (its run fn feeds luma)
            in_ch = 1 if self.net_name == 'isnet_gt' else 3
            from ..utils.env import jit_init
            self._variables = jit_init(
                self.net, jax.random.PRNGKey(self._seed),
                jnp.zeros((1, 64, 64, in_ch), jnp.float32))
        return self._variables

    def load_torch_checkpoint(self, path: str) -> None:
        """Load any of the reference's selectable animeseg checkpoints
        (animeseg_refine/__init__.py:28-41): every get_net name has a
        converter."""
        from ..models.convert import load_torch_ckpt
        sd = load_torch_ckpt(path)
        if self.net_name in ('u2net', 'u2netl'):
            from ..models.u2net import convert_u2net
            self._variables = convert_u2net(sd)
        elif self.net_name == 'isnet_gt':
            from ..models.u2net import convert_isnet_gt
            self._variables = convert_isnet_gt(sd)
        elif self.net_name == 'modnet':
            from ..models.modnet import convert_modnet
            self._variables = convert_modnet(sd)
        else:
            self._variables = convert_isnet(sd)

    def __call__(self, instances: Instances, img_bgr: np.ndarray
                 ) -> Instances:
        if instances.is_empty_host():
            return instances
        H, W = img_bgr.shape[:2]
        S = self.input_size
        nh, nw = scaledown_size(H, W, S)
        key = (instances.capacity, S, H, W)
        if key not in self._jit_cache:
            net, thr, run = self.net, self.seg_thr, self._run

            @jax.jit
            def fn(variables, image_small, masks, valid):
                img = jnp.pad(image_small,
                              ((0, S - nh), (0, S - nw), (0, 0)))
                pred = run(net, variables, img[None])[0, :nh, :nw]
                pred = resize_bilinear_ac(pred[..., None][None],
                                          H, W)[0, ..., 0]
                whole = pred > thr
                refined = masks & whole[None]
                area0 = jnp.sum(masks, axis=(1, 2))
                area1 = jnp.sum(refined, axis=(1, 2))
                take = (area1 / jnp.maximum(area0, 1)) > 0.3
                out = jnp.where(take[:, None, None], refined, masks)
                return out & valid[:, None, None]
            self._jit_cache[key] = fn

        # reference converts BGR→RGB before this net
        rgb = img_bgr[..., ::-1].astype(np.float32) / 255.0
        small = jax.image.resize(jnp.asarray(rgb), (nh, nw, 3),
                                 method='linear')
        new_masks = self._jit_cache[key](
            self._vars(), small, instances.masks, instances.valid)
        return instances.replace(masks=new_masks)


def make_refiner(method: str = 'refinenet_isnet', refine_size: int = 720,
                 mask_thr: float = 0.3) -> Optional[object]:
    """Refine-method factory. Accepts the reference's
    set_refine_method names (animeinsseg/__init__.py:623-636:
    'none' / 'refinenet_isnet' / 'animeseg') plus the whole-image net
    variants of get_net (animeseg_refine/__init__.py:28-41), either
    bare ('u2net', 'u2netl', 'modnet', 'isnet', 'isnet_is',
    'isnet_gt') or as 'animeseg:<net>'."""
    if method in (None, 'none', ''):
        return None
    if method == 'refinenet_isnet':
        return ISNetRefiner(refine_size, mask_thr)
    if method == 'animeseg':
        return AnimeSegRefiner(max(refine_size, 1024))
    if method.startswith('animeseg:'):
        return AnimeSegRefiner(max(refine_size, 1024),
                               net_name=method.split(':', 1)[1])
    if method in ('isnet', 'isnet_is', 'isnet_gt', 'u2net', 'u2netl',
                  'modnet'):
        return AnimeSegRefiner(max(refine_size, 1024), net_name=method)
    raise ValueError(f'unknown refine method: {method}')
