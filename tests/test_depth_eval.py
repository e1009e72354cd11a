"""Benchmark eval-dataset loader zoo: build each dataset's on-disk
layout synthetically, then assert file pairing, decode scaling, the
invalidity conventions, kb-crop, and the end-to-end
evaluate_benchmark protocol."""
import numpy as np
import pytest

from cartoonsegmentation_tpu.data.depth_eval import (
    EVAL_PROTOCOL, DdadSource, DimlIndoorSource, DimlOutdoorSource,
    DiodeSource, HypersimSource, IBimsSource, SunRGBDSource,
    VKitti2Source, evaluate_benchmark, hypersim_distance_to_depth,
    kb_crop, make_eval_source)


def _write_png(path, arr):
    import cv2
    path.parent.mkdir(parents=True, exist_ok=True)
    cv2.imwrite(str(path), arr)


def _rgb(rng, h=40, w=48):
    return (rng.rand(h, w, 3) * 255).astype(np.uint8)


def test_ibims(tmp_path, rng):
    root = tmp_path / 'ibims'
    _write_png(root / 'rgb' / 'a.png', _rgb(rng))
    depth_raw = np.full((40, 48), 6554, np.uint16)     # ~5 m
    _write_png(root / 'depth' / 'a.png', depth_raw)
    invalid = np.ones((40, 48), np.uint8)
    invalid[:10] = 0
    _write_png(root / 'mask_invalid' / 'a.png', invalid)
    _write_png(root / 'mask_transp' / 'a.png',
               np.ones((40, 48), np.uint8))
    src = IBimsSource(str(root))
    assert len(src) == 1
    img, depth, _ = src.load(0)
    assert img.shape == (40, 48, 3) and img.max() <= 1.0
    np.testing.assert_allclose(depth[20, 0, 0], 6554 * 50.0 / 65535.0,
                               rtol=1e-6)
    assert (depth[:10] == -1.0).all()                  # masked invalid


def test_sunrgbd(tmp_path, rng):
    root = tmp_path / 'sun'
    _write_png(root / 'rgb' / 'rgb' / 'x.jpg', _rgb(rng))
    d = np.full((40, 48), 2500, np.uint16)             # 2.5 m
    d[0, 0] = 9000                                     # > 8 m → invalid
    _write_png(root / 'gt' / 'gt' / 'x.png', d)
    src = SunRGBDSource(str(root))
    img, depth, _ = src.load(0)
    np.testing.assert_allclose(depth[5, 5, 0], 2.5, rtol=1e-6)
    assert depth[0, 0, 0] == -1.0


def test_diml_pair_discovery(tmp_path, rng):
    root = tmp_path / 'diml_in'
    _write_png(root / 'LR' / 's1' / 'color' / 'f_c.png', _rgb(rng))
    _write_png(root / 'LR' / 's1' / 'depth_filled' / 'f_depth_filled.png',
               np.full((40, 48), 3000, np.uint16))
    src = DimlIndoorSource(str(root))
    assert len(src) == 1
    _, depth, _ = src.load(0)
    np.testing.assert_allclose(depth[0, 0, 0], 3.0, rtol=1e-6)

    root2 = tmp_path / 'diml_out'
    _write_png(root2 / 'LR' / 's1' / 'outleft' / 'g.png', _rgb(rng))
    _write_png(root2 / 'LR' / 's1' / 'depthmap' / 'g.png',
               np.full((40, 48), 25000, np.uint16))
    src2 = DimlOutdoorSource(str(root2))
    _, depth2, _ = src2.load(0)
    np.testing.assert_allclose(depth2[0, 0, 0], 25.0, rtol=1e-6)


def test_diode(tmp_path, rng):
    root = tmp_path / 'diode'
    scene = root / 'scene_0' / 'scan_0'
    _write_png(scene / 'p.png', _rgb(rng))
    np.save(scene / 'p_depth.npy', np.full((40, 48, 1), 4.0, np.float32))
    mask = np.ones((40, 48), np.float32)
    mask[:5] = 0
    np.save(scene / 'p_depth_mask.npy', mask)
    src = DiodeSource(str(root), indoor=True)
    assert src.dataset == 'diode_indoor'
    _, depth, _ = src.load(0)
    assert depth[10, 0, 0] == 4.0
    assert (depth[:5] == -1.0).all()


def test_hypersim(tmp_path, rng):
    dist = np.full((40, 48), 7.0, np.float32)
    depth = hypersim_distance_to_depth(dist)
    # center pixel: plane normal ≈ focal direction → depth ≈ distance
    assert abs(depth[20, 24] - 7.0) < 0.2
    # corners foreshortened
    assert depth[0, 0] < depth[20, 24]

    root = tmp_path / 'hyper'
    d = root / 'ai_001' / 'images' / 'scene_cam_00_final_preview' / 'f'
    _write_png(d / 'frame.0000.tonemap.jpg', _rgb(rng))
    gd = root / 'ai_001' / 'images' / 'scene_cam_00_geometry_hdf5' / 'f'
    gd.mkdir(parents=True)
    np.save(gd / 'frame.0000.depth_meters.npy', dist)
    src = HypersimSource(str(root))
    assert len(src) == 1
    _, dep, _ = src.load(0)
    assert abs(dep[20, 24, 0] - depth[20, 24]) < 1e-5

    # the real dataset ships .depth_meters.hdf5 (hypersim.py:105);
    # when present it takes precedence over the .npy fallback
    import h5py
    with h5py.File(gd / 'frame.0000.depth_meters.hdf5', 'w') as f:
        f.create_dataset('dataset', data=dist * 2.0)
    src = HypersimSource(str(root))
    _, dep2, _ = src.load(0)
    assert abs(dep2[20, 24, 0] - 2.0 * depth[20, 24]) < 1e-5


def test_vkitti2_and_kb_crop(tmp_path, rng):
    root = tmp_path / 'vk2'
    d = root / 'test' / 'Scene01' / 'clone' / 'frames'
    _write_png(d / 'rgb' / 'Camera_0' / 'rgb_00000.jpg',
               _rgb(rng, 370, 1230))
    _write_png(d / 'depth' / 'Camera_0' / 'depth_00000.png',
               np.full((370, 1230), 1500, np.uint16))  # 15 m in cm
    src = VKitti2Source(str(root))
    assert len(src) == 1
    img, depth, _ = src.load(0)
    assert img.shape == (352, 1216, 3)                 # kb-cropped
    np.testing.assert_allclose(depth[0, 0, 0], 15.0, rtol=1e-6)


def test_vkitti1(tmp_path, rng):
    from cartoonsegmentation_tpu.data.depth_eval import VKittiSource
    root = tmp_path / 'vk1'
    _write_png(root / 'test_color' / '0001' / 'f.png',
               _rgb(rng, 370, 1230))
    _write_png(root / 'test_depth' / '0001' / 'f.png',
               np.full((370, 1230), 2000, np.uint16))  # 20 m in cm
    src = VKittiSource(str(root))
    img, depth, _ = src.load(0)
    assert img.shape == (352, 1216, 3)
    np.testing.assert_allclose(depth[0, 0, 0], 20.0, rtol=1e-6)


def test_ddad(tmp_path, rng):
    root = tmp_path / 'ddad'
    root.mkdir()
    _write_png(root / '000_rgb.png', _rgb(rng, 360, 1220))
    np.save(root / '000_depth.npy',
            np.full((360, 1220), 30.0, np.float32))
    src = DdadSource(str(root))
    img, depth, _ = src.load(0)
    assert img.shape == (352, 1216, 3)
    assert depth[0, 0, 0] == 30.0


def test_kb_crop_geometry():
    a = np.arange(400 * 1300).reshape(400, 1300)
    (c,) = kb_crop(a)
    assert c.shape == (352, 1216)
    assert c[-1, 0] == a[-1, 42]                       # bottom-anchored


def test_registry_and_protocol_complete():
    for name in EVAL_PROTOCOL:
        assert make_eval_source.__doc__        # registry names match
    with pytest.raises(ValueError):
        make_eval_source('nope', '/tmp')


def test_evaluate_benchmark_end_to_end(tmp_path, rng):
    """Perfect predictor → a1 = 1.0, abs_rel ≈ 0 under the dataset's
    reference protocol."""
    root = tmp_path / 'sun'
    _write_png(root / 'rgb' / 'rgb' / 'x.jpg', _rgb(rng, 480, 640))
    gt = (rng.rand(480, 640) * 5000 + 1000).astype(np.uint16)
    _write_png(root / 'gt' / 'gt' / 'x.png', gt)
    src = SunRGBDSource(str(root))
    _, depth, _ = src.load(0)

    m = evaluate_benchmark(lambda img: depth[..., 0], 'sunrgbd',
                           str(root))
    assert m['a1'] == 1.0
    assert m['abs_rel'] < 1e-6
