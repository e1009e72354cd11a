"""Config, instances, resize-util tests."""
import numpy as np
import jax
import jax.numpy as jnp

from cartoonsegmentation_tpu.config import KenBurnsConfig, build_kenburns_cfg
from cartoonsegmentation_tpu.instances import Instances
from cartoonsegmentation_tpu.utils import (
    scaledown_size, scaledown_maxsize, resize_pad, square_pad_resize,
)


def test_config_loads_reference_yaml(tmp_path):
    yaml_text = """
inpaint_type: default
detector: animeinsseg
num_frame: 75
playback: True
dof_speed: 50
depth_field: True
max_size: 1024
ldm_inpaint_size: 1024
ldm_inpaint_options:
  steps: 32
  cfg_scale: 7
mask_refine_kwargs:
  refine_method: refinenet_isnet
  refine_size: 720
depth_est: leres
depth_est_size: 640
det_size: 640
pred_score_thr: 0.3
refine_crf: False
depth_factor: 1
unknown_key_is_ignored: whatever
"""
    p = tmp_path / 'cfg.yaml'
    p.write_text(yaml_text)
    cfg = build_kenburns_cfg(str(p))
    assert cfg.max_size == 1024
    assert cfg.depth_est == 'leres'
    assert cfg.refine_method == 'refinenet_isnet'
    assert cfg.refine_size == 720
    assert cfg.ldm_inpaint_options.steps == 32
    assert cfg.depth_field is True
    # hashable / usable as a jit static arg
    hash(cfg)


def test_config_is_jit_static():
    cfg = KenBurnsConfig()

    @jax.jit
    def f(x, cfg_static):
        return x * cfg_static.baseline

    import functools
    g = jax.jit(lambda x: x * cfg.baseline)
    assert float(g(jnp.float32(2.0))) == 80.0


def test_instances_compose_and_dedup():
    h = w = 16
    m1 = np.zeros((h, w), bool); m1[:10, :10] = True          # big
    m2 = np.zeros((h, w), bool); m2[:9, :9] = True            # inside m1
    m3 = np.zeros((h, w), bool); m3[12:, 12:] = True          # separate
    ins = Instances.from_numpy(
        np.stack([m2, m1, m3]),
        np.array([[0, 0, 9, 9], [0, 0, 10, 10], [12, 12, 4, 4]], np.float32),
        np.array([0.9, 0.8, 0.7], np.float32),
        capacity=5)
    assert int(ins.count()) == 3
    composed = np.asarray(ins.compose_masks())
    assert composed.sum() == (m1 | m2 | m3).sum()

    deduped = ins.remove_duplicated(overlap_thr=0.8)
    assert int(deduped.count()) == 2
    # survivor areas: the big mask and the separate one
    areas = sorted(np.asarray(deduped.masked_areas())[
        np.asarray(deduped.valid)].tolist())
    assert areas == [16.0, 100.0]


def test_instances_resize():
    h = w = 8
    m = np.zeros((h, w), bool); m[2:6, 2:6] = True
    ins = Instances.from_numpy(m[None], np.array([[2, 2, 4, 4]], np.float32),
                               capacity=2)
    out = ins.resize(16, 16)
    assert out.masks.shape == (2, 16, 16)
    assert np.asarray(out.bboxes)[0].tolist() == [4, 4, 8, 8]
    assert int(out.count()) == 1
    assert np.asarray(out.masks)[0].sum() > 0


def test_resize_utils_match_reference_semantics(rng):
    img = (rng.rand(300, 500, 3) * 255).astype(np.uint8)
    assert scaledown_size(300, 500, 250) == (150, 250)
    assert scaledown_size(300, 500, 600) == (300, 500)   # never upscale
    assert scaledown_size(300, 500, 250, divisor=32) == (160, 256)

    out = scaledown_maxsize(img, 250)
    assert out.shape[:2] == (150, 250)

    padded, (pt, pb, pl, pr) = resize_pad(img, 256)
    assert padded.shape[:2] == (256, 256)
    assert (pt, pl) == (0, 0) and pb > 0

    sq, scale, ph, pw = square_pad_resize(img, 256)
    assert sq.shape[:2] == (256, 256)
