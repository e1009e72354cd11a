"""COMPOSED end-to-end pipeline parity: a torch mini-pipeline built
from the checkpoint-schema twins + the numpy kernel oracles, mirroring
the reference's full composition

    generate_kenburns_config -> autozoom -> process_kenburns
    (kenburns_effect.py:898-951, 953-977, 979-1081)

with randomized weights transplanted through the real converters into
KenBurnsPipeline. Every seam the reference chains is crossed here:
BGR order, the 512-grid disparity estimation resize
(models/__init__.py:40-51), instance depth adjustment up/down
resampling (kenburns_effect.py:49-92), Refine placement, the
disparity->depth scaling (:928-929), the laplacian validity mask
(:931), minMaxLoc depth anchoring (:937), process_shift/autozoom
(common.py:59-141), the two 1.1x-shift inpaint passes (:441-512,
:984-1012), the per-frame splat+discfill+bokeh+crop chain
(:1015-1072). A bug in any one of them (channel swap, wrong scale,
resize order) makes the final frames diverge massively.

Known sub-LSB deviations (documented, covered by tolerance):
- frame quantization: reference truncates to uint8 BEFORE crop/bokeh
  (:1040); ours stays float on device and rounds once at the end
- the DoF depth colorize: reference quantizes through matplotlib's
  gray_r u8 LUT; ours is the continuous equivalent
- f32 conv accumulation-order noise (~1e-3 rel) can flip individual
  splat z-buffer winners near the +-1.0 err threshold, so frames are
  compared as "nearly all pixels within a few LSB", not allclose.
"""
import math

import cv2
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from oracles import (oracle_bokeh_pass, oracle_fill_disocclusion,
                     oracle_render_pointcloud)
from torch_twins import (TorchDisparity, TorchInpaintUNet, TorchRefine,
                         TorchSemanticsVGG)

from cartoonsegmentation_tpu.config import KenBurnsConfig
from cartoonsegmentation_tpu.instances import Instances
from cartoonsegmentation_tpu.models import convert as C
from cartoonsegmentation_tpu.pipeline.kenburns import KenBurnsPipeline

# W = 2H keeps every grid-net level even (no odd-dim pad/crop
# ambiguity); floor(0.97*W) keeps the getRectSubPix offsets integral.
H, W = 64, 128
FOCAL, BASELINE = 512.0, 40.0
STEPS = np.linspace(0.0, 1.0, 3)


# ---------------------------------------------------------------------------
# reference host-math transcriptions (torch / numpy)
# ---------------------------------------------------------------------------

def t_laplacian(x):
    """spatial_filter(..., 'laplacian') — models/utils.py:12-25."""
    k = torch.zeros(1, 1, 3, 3)
    k[0, 0, 0, 1] = -1.0
    k[0, 0, 0, 2] = -1.0
    k[0, 0, 1, 1] = 4.0
    k[0, 0, 1, 0] = -1.0
    k[0, 0, 2, 0] = -1.0
    return F.conv2d(F.pad(x, [1, 1, 1, 1], mode='replicate'), k)


def t_depth_to_points(depth, focal):
    """models/utils.py:43-53 — (1,1,h,w) -> (1,3,h,w)."""
    h, w = depth.shape[2], depth.shape[3]
    hor = torch.linspace(-0.5 * w + 0.5, 0.5 * w - 0.5, w).view(
        1, 1, 1, -1).repeat(1, 1, h, 1) / focal
    ver = torch.linspace(-0.5 * h + 0.5, 0.5 * h - 0.5, h).view(
        1, 1, -1, 1).repeat(1, 1, 1, w) / focal
    return torch.cat([depth * hor, depth * ver, depth], 1)


def np_median5(x):
    """spatial_filter 'median-5' (models/utils.py:32-36): reflect pad
    2, 5x5 window median (25 taps, odd, so torch/numpy agree)."""
    from numpy.lib.stride_tricks import sliding_window_view
    xp = np.pad(x, 2, mode='reflect')
    win = sliding_window_view(xp, (5, 5))
    return np.median(win.reshape(x.shape[0], x.shape[1], 25), axis=-1)


def np_minmaxloc(depth):
    """cv2.minMaxLoc over the margin crop (kenburns_effect.py:937)
    with the same small-image margin clamp as ops/camera.depth_range
    (the reference's fixed [128:-128] slice is empty below 256px)."""
    m = min(128, (H - 1) // 2, (W - 1) // 2)
    crop = depth[m:H - m, m:W - m]
    idx = int(np.argmin(crop))
    v, u = divmod(idx, crop.shape[1])
    return float(crop.reshape(-1)[idx]), float(u), float(v)


def np_shift_vec(dr, shift_u, shift_v, depth_from, depth_to):
    """The tenShift 3-vector of process_shift (common.py:59-74)."""
    d_min, u, v = dr
    closest = d_min + (depth_to - depth_from)
    to_u, to_v = u + shift_u, v + shift_v
    from_x = (u - W / 2.0) * closest / FOCAL
    from_y = (v - H / 2.0) * closest / FOCAL
    to_x = (to_u - W / 2.0) * closest / FOCAL
    to_y = (to_v - H / 2.0) * closest / FOCAL
    return np.asarray([from_x - to_x, from_y - to_y,
                       depth_to - depth_from], np.float32)


def np_shift_points(pts, shift):
    """common.py:76-81 — scale x,y by z/(z+1e-7), translate."""
    out = pts.astype(np.float32).copy()
    ratio = out[:, 2:3] / (pts[:, 2:3] + 1e-7)
    out[:, 0:1] *= ratio
    out[:, 1:2] *= ratio
    return out + shift[None, :]


def t_norm(x):
    mean = x.mean([1, 2, 3], True)
    std = x.std([1, 2, 3], False, True)
    return (x - mean) / (std + 1e-7), mean, std


def torch_depth_adjust(disp, masks):
    """depth_adjustment_animesseg (kenburns_effect.py:39-92): upsample
    to image res, per-instance feet-anchor flattening, downsample
    back."""
    resized = disp.shape[-2:] != (H, W)
    adj = F.interpolate(disp, (H, W), mode='bilinear',
                        align_corners=False) if resized else disp
    for m in masks:
        mt = torch.from_numpy(m.astype(np.float32))[None, None]
        plane = adj * mt
        if plane.sum().item() == 0:
            continue
        row = (plane.sum([3], True) > 0.0).flatten().nonzero()
        top, bottom = row[0].item(), row[-1].item()
        r0 = int(round(top + 0.97 * (bottom - top)))
        adj = (1.0 - mt) * adj + mt * plane[:, :, r0:, :].max()
    if resized:
        adj = F.interpolate(adj, disp.shape[-2:], mode='bilinear',
                            align_corners=False)
    return adj


def torch_generate_config(img_u8, masks, tsem, tdisp, tref):
    """generate_kenburns_config (kenburns_effect.py:898-951) with the
    'default' estimator + default_depth_refine."""
    with torch.no_grad():
        ten = torch.from_numpy(np.ascontiguousarray(
            img_u8.transpose(2, 0, 1)[None].astype(np.float32)
            / 255.0))                                    # BGR01
        # disparity_estimation's 512 resize (models/__init__.py:40-51)
        ratio = W / H
        w512, h512 = min(int(512 * ratio), 512), min(int(512 / ratio), 512)
        x = F.interpolate(ten, (h512, w512), mode='bilinear',
                          align_corners=False)
        disp = tdisp(x, tsem(x))
        disp = torch_depth_adjust(disp, masks)
        disp = tref(ten, disp)                            # image res
        disp = disp / disp.max() * BASELINE               # :928
        depth = (FOCAL * BASELINE) / (disp + 0.00001)     # :929
        valid = (t_laplacian(disp / disp.max()).abs() < 0.03).float()
        pts = t_depth_to_points(depth * valid, FOCAL)
    image = ten[0].numpy().transpose(1, 2, 0)             # (H,W,3) BGR
    depth_np = depth[0, 0].numpy()
    raw_pts = pts[0].numpy().reshape(3, -1).T             # (P,3)
    return {
        'image': image,
        'disparity': disp[0, 0].numpy(),
        'depth': depth_np,
        'raw_points': raw_pts,
        'drange': np_minmaxloc(depth_np),
        # the growing cloud (:944-947)
        'inpa_img': image.reshape(-1, 3).copy(),
        'inpa_disp': disp[0, 0].numpy().reshape(-1).copy(),
        'inpa_depth': depth_np.reshape(-1).copy(),
        'inpa_points': raw_pts.copy(),
    }


def torch_autozoom(cfgT):
    """autozoom + process_autozoom (kenburns_effect.py:953-967,
    common.py:86-141) with the oracle splat for coverage."""
    obj_from = {'center_u': W / 2.0, 'center_v': H / 2.0,
                'crop_w': int(math.floor(0.97 * W)),
                'crop_h': int(math.floor(0.97 * H))}
    lin = np.linspace(-100.0, 100.0, 16)
    crop_w = obj_from['crop_w'] / 1.25
    crop_h = obj_from['crop_h'] / 1.25
    depth_from = cfgT['drange'][0]
    depth_to = cfgT['drange'][0] * (crop_w / obj_from['crop_w'])
    best, best_u, best_v = 0.0, None, None
    # reference loop order: npyShiftU[intU, intV] = lin[intV] (shiftU
    # ends up the INNER index), npyShiftV[intU, intV] = lin[intU]
    for iu in range(16):
        for iv in range(16):
            su, sv = float(lin[iv]), float(lin[iu])
            if obj_from['center_u'] + su < crop_w / 2.0:
                continue
            if obj_from['center_u'] + su > W - crop_w / 2.0:
                continue
            if obj_from['center_v'] + sv < crop_h / 2.0:
                continue
            if obj_from['center_v'] + sv > H - crop_h / 2.0:
                continue
            shift = np_shift_vec(cfgT['drange'], su, sv, depth_from,
                                 depth_to)
            pts = np_shift_points(cfgT['raw_points'], shift)
            _, weight = oracle_render_pointcloud(
                pts, cfgT['image'].reshape(-1, 3), H, W, FOCAL,
                BASELINE)
            cov = float((weight > 0.0).sum())
            if best < cov:
                best, best_u, best_v = cov, su, sv
    obj_to = {'center_u': obj_from['center_u'] + best_u,
              'center_v': obj_from['center_v'] + best_v,
              'crop_w': int(round(obj_from['crop_w'] / 1.25)),
              'crop_h': int(round(obj_from['crop_h'] / 1.25))}
    return obj_from, obj_to


def camera_at(t, obj_from, obj_to):
    """Per-step camera interpolation (kenburns_effect.py:1017-1026)."""
    fr, to = 1.0 - t, t
    su = fr * obj_from['center_u'] + to * obj_to['center_u'] - W / 2.0
    sv = fr * obj_from['center_v'] + to * obj_to['center_v'] - H / 2.0
    cw = fr * obj_from['crop_w'] + to * obj_to['crop_w']
    max_cw = max(obj_from['crop_w'], obj_to['crop_w'])
    return su, sv, cw, max_cw


def torch_inpaint_pass(cfgT, obj_from, obj_to, t, tinp, masks):
    """One inpaint pass (kenburns_effect.py:441-512 'default' branch
    + the 1.1x shift from :1012), splat via the numpy oracle."""
    su, sv, cw, max_cw = camera_at(t, obj_from, obj_to)
    depth_from = cfgT['drange'][0]
    depth_to = cfgT['drange'][0] * (cw / max_cw)
    shift = 1.1 * np_shift_vec(cfgT['drange'], su, sv, depth_from,
                               depth_to)

    with torch.no_grad():
        ten_img = torch.from_numpy(
            cfgT['image'].transpose(2, 0, 1)[None].copy())
        ten_disp = torch.from_numpy(
            cfgT['disparity'][None, None].copy())
        # pointcloud_inpainting.forward (:117-204)
        depth = (FOCAL * BASELINE) / (ten_disp + 0.0000001)
        valid = (t_laplacian(ten_disp / ten_disp.max()).abs()
                 < 0.03).float()
        pts = t_depth_to_points(depth * valid, FOCAL)[0].numpy() \
            .reshape(3, -1).T
        imgN, imean, istd = t_norm(ten_img)
        dispN, dmean, dstd = t_norm(ten_disp)
        ctx = tinp.context(imgN, dispN)
        payload = torch.cat([imgN, dispN, ctx], 1)[0].numpy() \
            .reshape(68, -1).T                            # (P, 68)
        # the forward adds the shift WITHOUT the z-rescale
        # (pointcloud_inpainting.py:137: tenPoints + tenShift)
        render, weight = oracle_render_pointcloud(
            pts + shift[None, :], payload, H, W, FOCAL, BASELINE)
        existing = (weight > 0.0).astype(np.float32)
        existing = existing * np_median5(existing)
        render = render * existing[..., None]
        img_raw, disp_raw = tinp(
            torch.from_numpy(render.astype(np.float32).transpose(
                2, 0, 1)[None]),
            torch.from_numpy(existing[None, None].copy()))
        out_img = (img_raw * (istd + 1e-7) + imean).clip(0.0, 1.0)
        out_disp = F.threshold(disp_raw * (dstd + 1e-7) + dmean,
                               0.0, 0.0)
        # back in KenBurnsPipeline.inpaint (:454-458)
        out_depth = (FOCAL * BASELINE) / (out_disp + 0.0000001)
        valid2 = (t_laplacian(out_disp / out_disp.max()).abs()
                  < 0.03).float()
        pts2 = t_depth_to_points(out_depth * valid2, FOCAL)[0] \
            .numpy().reshape(3, -1).T - shift[None, :]

    hole = existing.reshape(-1) == 0.0                    # :462
    cfgT['inpa_img'] = np.concatenate(
        [cfgT['inpa_img'],
         out_img[0].numpy().transpose(1, 2, 0).reshape(-1, 3)[hole]])
    cfgT['inpa_disp'] = np.concatenate(
        [cfgT['inpa_disp'], out_disp[0, 0].numpy().reshape(-1)[hole]])
    cfgT['inpa_depth'] = np.concatenate(
        [cfgT['inpa_depth'], out_depth[0, 0].numpy().reshape(-1)[hole]])
    cfgT['inpa_points'] = np.concatenate(
        [cfgT['inpa_points'], pts2[hole]])


def np_colorize_gray_r(x):
    lo, hi = float(x.min()), float(x.max())
    return (1.0 - (x - lo) / max(hi - lo, 1e-12)) * 255.0


def torch_bokeh(frame_u8, depth_r, focal_plane, num_samples=32,
                lightness_factor=13.0, depth_factor=1.0):
    """effects.py:143-181 (bokeh_blur) via the per-pass oracle."""
    d = depth_r.astype(np.float32)
    d = d.max() - np.abs(d - focal_plane)
    d = np.power(d, depth_factor)
    d = d - d.min()
    d = d / d.max()
    d = (1.0 - d) * 0.0005
    img = frame_u8.astype(np.float64) / 255.0
    hi = np.power(img, lightness_factor)
    pi = math.pi
    vert = oracle_bokeh_pass(hi, d, 0.0, 1.0, num_samples)
    diag = oracle_bokeh_pass(vert, d, math.cos(-pi / 6),
                             math.sin(-pi / 6), num_samples)
    rhom = oracle_bokeh_pass(diag, d, math.cos(-pi * 5 / 6),
                             math.sin(-pi * 5 / 6), num_samples)
    blurred = (diag + rhom) / 2.0
    blurred = np.power(blurred, 1.0 / lightness_factor)
    return (blurred * 255.0).astype(np.uint8)


def torch_render_frames(cfgT, obj_from, obj_to, masks, depth_field,
                        dof_speed=50.0):
    """process_kenburns frame loop (kenburns_effect.py:1015-1072)."""
    frames = []
    max_cw = max(obj_from['crop_w'], obj_to['crop_w'])
    max_ch = max(obj_from['crop_h'], obj_to['crop_h'])
    data = np.concatenate([cfgT['inpa_img'],
                           cfgT['inpa_depth'][:, None]], 1)
    fp_start = fp_end = None
    for idx, t in enumerate(STEPS):
        su, sv, cw, _ = camera_at(float(t), obj_from, obj_to)
        depth_from = cfgT['drange'][0]
        depth_to = cfgT['drange'][0] * (cw / max_cw)
        shift = np_shift_vec(cfgT['drange'], su, sv, depth_from,
                             depth_to)
        pts = np_shift_points(cfgT['inpa_points'], shift)
        render, weight = oracle_render_pointcloud(
            pts, data, H, W, FOCAL, BASELINE)
        filled = oracle_fill_disocclusion(
            render, render[..., 3] * (weight > 0.0))
        frame = (filled[..., :3] * 255.0).clip(0, 255).astype(np.uint8)
        if depth_field:
            depth_r = np_colorize_gray_r(filled[..., 3])
            if idx == 0:
                fp_start, fp_end = 0.0, 255.0
                if masks:
                    fp_end = -1.0
                    for m in masks:
                        dm = float(np.median(depth_r[m]))
                        fp_end = max(fp_end, dm)
                    fp_start = 255.0 if abs(255.0 - fp_end) \
                        > abs(fp_end) else 0.0
            focal_int = 1.0 / (1.0 + np.exp((0.5 - t) * dof_speed))
            fp = focal_int * fp_end + (1.0 - focal_int) * fp_start
            frame = torch_bokeh(frame, depth_r, fp)
        frame = cv2.getRectSubPix(frame, (max_cw, max_ch),
                                  (W / 2.0, H / 2.0))
        frame = cv2.resize(frame, (W, H),
                           interpolation=cv2.INTER_LINEAR)
        frames.append(frame)
    return np.stack(frames)


# ---------------------------------------------------------------------------
# the composed run (both sides), computed once
# ---------------------------------------------------------------------------

def randomize_calibrated_(module, seed=0):
    """Unit-gain random init: flat-scale randomize_ makes the deep
    512-ch grid nets explode to ~1e21, where f32 variance overflows
    and the normalized-conv comparisons drown in rounding noise.
    Conv weights get 1/sqrt(fan_in) scale instead."""
    g = torch.Generator().manual_seed(seed)
    sd = module.state_dict()
    for k, v in sd.items():
        if k.endswith('num_batches_tracked'):
            continue
        if k.endswith('running_var'):
            sd[k] = torch.rand(v.shape, generator=g) * 0.8 + 0.2
        elif v.ndim == 4:
            fan = v.shape[1] * v.shape[2] * v.shape[3]
            sd[k] = torch.randn(v.shape, generator=g) / math.sqrt(fan)
        else:
            sd[k] = torch.randn(v.shape, generator=g) * 0.2
    module.load_state_dict(sd)
    return module


@pytest.fixture(scope='module')
def composed():
    # smooth synthetic image: keeps the laplacian validity mask and
    # the splat z-buffer away from their decision thresholds, so conv
    # accumulation-order noise flips few discrete outcomes
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    img_u8 = np.clip(np.stack([
        128 + 100 * np.sin(xx / 17) * np.cos(yy / 11),
        128 + 100 * np.cos(xx / 23 + 1.0) * np.sin(yy / 7),
        128 + 100 * np.sin((xx + yy) / 19)], -1), 0, 255).astype(np.uint8)
    # two synthetic "characters"
    m1 = np.zeros((H, W), bool)
    m1[18:58, 20:44] = True
    m2 = np.zeros((H, W), bool)
    m2[10:40, 70:102] = True
    masks = [m1, m2]
    bboxes = np.asarray([[20, 18, 24, 40], [70, 10, 32, 30]],
                        np.float32)

    tsem = randomize_calibrated_(TorchSemanticsVGG(), seed=2).eval()
    tdisp = randomize_calibrated_(TorchDisparity(), seed=3).eval()
    tref = randomize_calibrated_(TorchRefine(), seed=4).eval()
    tinp = randomize_calibrated_(TorchInpaintUNet(), seed=5).eval()

    # --- torch mini-pipeline --------------------------------------
    cfgT = torch_generate_config(img_u8, masks, tsem, tdisp, tref)
    obj_from_t, obj_to_t = torch_autozoom(cfgT)
    for t in (0.0, 1.0):                    # :990-1012
        torch_inpaint_pass(cfgT, obj_from_t, obj_to_t, t, tinp, masks)
    frames_t = torch_render_frames(cfgT, obj_from_t, obj_to_t, masks,
                                   depth_field=False)
    frames_t_dof = torch_render_frames(cfgT, obj_from_t, obj_to_t,
                                       masks, depth_field=True)

    # --- jax pipeline, weights transplanted -----------------------
    # discfill 'exact' is the oracle-bit-exact ray march; the default
    # 'fast' shear-scan is a documented approximation with its own
    # equivalence tests (tests/test_discfill_fast.py)
    # autozoom_stride=1: this is the exact-parity twin test — the
    # stride-2 miniature default has its own quality test
    # (test_camera_autozoom.py::test_autozoom_miniature_quality)
    cfg = KenBurnsConfig(max_size=W, num_frame=3, depth_est='default',
                         default_depth_refine=True, refine_crf=False,
                         detector='none', point_capacity_factor=3.3,
                         discfill_mode='exact', discfill_max_steps=192,
                         playback=False, autozoom_stride=1)
    pipe = KenBurnsPipeline(cfg)
    sem_params, sem_stats = C.convert_semantics(tsem.state_dict())
    pipe._disparity_vars = {
        'params': {'semantics': sem_params,
                   'disparity': C.convert_disparity(tdisp.state_dict())},
        'batch_stats': {'semantics': sem_stats}}
    pipe._refine_vars = {'params': C.convert_refine(tref.state_dict())}
    pipe._inpaint_vars = {'params': C.convert_inpaint(tinp.state_dict())}

    ins = Instances.from_numpy(np.stack(masks), bboxes, capacity=4)
    state = pipe.generate_state(img_u8, instances=ins)
    obj_from_j, obj_to_j = pipe.autozoom(state)
    frames_j = pipe.process_kenburns(state, obj_from_t, obj_to_t,
                                     steps=STEPS, inpaint=True)
    # re-render the SAME inpainted state with DoF (process_kenburns
    # would re-run the inpaint passes; render only)
    state2 = pipe.generate_state(img_u8, instances=ins)
    for t in (0.0, 1.0):
        su, sv, ds, _, _ = pipe._camera_params(t, obj_from_t, obj_to_t,
                                               state2)
        state2 = pipe.inpaint_pass(state2, su, sv, ds)
    state2 = pipe.compact_state(state2)
    frames_j_dof = pipe.render_frames(state2, obj_from_t, obj_to_t,
                                      STEPS, depth_field=True)

    return dict(cfgT=cfgT, state=state, pipe=pipe,
                obj_t=(obj_from_t, obj_to_t),
                obj_j=(obj_from_j, obj_to_j),
                frames_t=frames_t, frames_j=frames_j,
                frames_t_dof=frames_t_dof, frames_j_dof=frames_j_dof)


# ---------------------------------------------------------------------------
# assertions
# ---------------------------------------------------------------------------

def test_composed_state_parity(composed):
    """Disparity/depth/points after the full estimation chain (512
    resize -> adjust -> refine -> scale) agree to conv-noise level."""
    cfgT, state = composed['cfgT'], composed['state']
    disp_j = np.asarray(jax.device_get(state.disparity[..., 0]))
    np.testing.assert_allclose(disp_j, cfgT['disparity'],
                               rtol=5e-3, atol=0.2)
    # depth = f*b/(disp+1e-5) amplifies noise unboundedly where disp
    # is tiny; compare its reciprocal (equivalent information) instead
    np.testing.assert_allclose(
        1.0 / np.asarray(jax.device_get(state.depth[..., 0])),
        1.0 / cfgT['depth'], rtol=5e-3, atol=1e-5)
    # minMaxLoc anchor: same location, same value
    dr = state.depth_range
    assert (float(jax.device_get(dr.min_u)),
            float(jax.device_get(dr.min_v))) == cfgT['drange'][1:]
    np.testing.assert_allclose(float(jax.device_get(dr.min_val)),
                               cfgT['drange'][0], rtol=1e-3)


def test_composed_autozoom_parity(composed):
    """The coverage search picks the same candidate; crops match the
    reference's round(crop/zoom) exactly."""
    (obj_from_t, obj_to_t) = composed['obj_t']
    (obj_from_j, obj_to_j) = composed['obj_j']
    assert obj_from_j == obj_from_t
    assert obj_to_j['crop_w'] == obj_to_t['crop_w']
    assert obj_to_j['crop_h'] == obj_to_t['crop_h']
    assert abs(obj_to_j['center_u'] - obj_to_t['center_u']) < 1e-4
    assert abs(obj_to_j['center_v'] - obj_to_t['center_v']) < 1e-4


def _frame_agreement(a, b, lsb, frac, mean_lim):
    diff = np.abs(a.astype(np.int32) - b.astype(np.int32))
    close = float((diff <= lsb).mean())
    assert close >= frac, (
        f'only {close:.4f} of pixels within {lsb} LSB '
        f'(max diff {diff.max()}, mean {diff.mean():.2f})')
    assert diff.mean() < mean_lim, f'mean LSB diff {diff.mean():.2f}'


def test_composed_frames_no_dof(composed):
    """Final frames (splat -> discfill -> crop -> resize) agree to a
    few LSB nearly everywhere. A BGR swap, disparity mis-scale, or
    resize-order bug fails this by a mile."""
    # ~4-7% of pixels flip discretely from f32 conv noise at the
    # |laplacian|<0.03 validity threshold (a flipped point becomes a
    # hole whose discfill source then differs for every pixel in its
    # line of sight) — the budget below still fails by a mile on any
    # channel-order / scaling / resize seam bug (those push the
    # within-3-LSB fraction under 0.5)
    _frame_agreement(composed['frames_j'], composed['frames_t'],
                     lsb=3, frac=0.92, mean_lim=2.5)


def test_composed_frames_dof(composed):
    """Same with the bokeh depth-of-field chain on top (focal-plane
    selection from instance medians, 3-pass blur)."""
    _frame_agreement(composed['frames_j_dof'], composed['frames_t_dof'],
                     lsb=6, frac=0.90, mean_lim=3.5)
