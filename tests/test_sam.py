"""Native SAM vs the TorchSAM checkpoint-schema twin.

The twin (tests/torch_twins.py::TorchSAM) is an independent
transcription of the official `segment_anything` architecture with
its exact state-dict key schema; `convert_sam` maps that state dict
onto the Flax model, so one full-forward comparison covers both the
converter and every layer's numerics (the house pattern used by all
model families — CLAUDE.md conventions)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip('torch')

from cartoonsegmentation_tpu.models.sam import (  # noqa: E402
    SAM, convert_sam)
from torch_twins import TorchSAM, randomize_  # noqa: E402

TINY = dict(img_size=64, patch=16, enc_dim=32, enc_depth=2,
            enc_heads=4, window=3, global_idx=(1,), dec_dim=32,
            dec_heads=4, dec_mlp=64)


def _tiny_pair(seed=0):
    twin = randomize_(TorchSAM(**TINY), seed=seed).eval()
    model = SAM(**TINY)
    variables = convert_sam(twin.state_dict(), model)
    return twin, model, variables


@pytest.fixture(scope='module')
def pair():
    return _tiny_pair()


def test_sam_full_forward_multimask(pair, rng):
    """Full model: encoder (windowed block pads 4→6, global block) →
    box prompts → two-way decoder → best-of-3 mask selection."""
    twin, model, variables = pair
    img = rng.randn(1, 64, 64, 3).astype(np.float32)
    boxes = np.array([[4., 8., 40., 56.], [0., 0., 63., 63.],
                      [16., 20., 30., 44.]], np.float32)
    with torch.no_grad():
        tm, tiou = twin(torch.tensor(img).permute(0, 3, 1, 2),
                        torch.tensor(boxes), multimask=True)
    jm, jiou = model.apply(variables, jnp.asarray(img),
                           jnp.asarray(boxes))
    np.testing.assert_allclose(np.asarray(jiou), tiou.numpy(),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(jm), tm.numpy(),
                               rtol=2e-3, atol=2e-3)


def test_sam_single_mask_output(pair, rng):
    """multimask=False returns the dedicated single-mask token's
    output (token 0), the setting the box-prompt path ships with."""
    twin, model, variables = pair
    img = rng.randn(1, 64, 64, 3).astype(np.float32)
    boxes = np.array([[8., 8., 48., 48.]], np.float32)
    with torch.no_grad():
        tm, tiou = twin(torch.tensor(img).permute(0, 3, 1, 2),
                        torch.tensor(boxes), multimask=False)
    emb = model.apply(variables, jnp.asarray(img),
                      method=lambda m, x: m.encode(x))
    jm, jiou = model.apply(
        variables, emb[0], jnp.asarray(boxes), False,
        method=lambda m, e, b, mm: m.decode(e, b, multimask=mm))
    np.testing.assert_allclose(np.asarray(jiou), tiou.numpy(),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(jm), tm.numpy(),
                               rtol=2e-3, atol=2e-3)


def test_sam_encoder_decoder_split_matches_chained(pair, rng):
    """encode() once + decode() per prompt batch — the serving usage —
    equals the chained __call__."""
    _, model, variables = pair
    img = rng.randn(1, 64, 64, 3).astype(np.float32)
    boxes = np.array([[2., 2., 30., 30.], [10., 5., 60., 60.]],
                     np.float32)
    m1, i1 = model.apply(variables, jnp.asarray(img),
                         jnp.asarray(boxes))
    emb = model.apply(variables, jnp.asarray(img),
                      method=lambda m, x: m.encode(x))
    m2, i2 = model.apply(
        variables, emb[0], jnp.asarray(boxes), True,
        method=lambda m, e, b, mm: m.decode(e, b, multimask=mm))
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(i1), np.asarray(i2),
                               rtol=1e-5, atol=1e-5)


def test_native_sam_segment_boxes(rng):
    """Wrapper contract: BGR any-size image + N xyxy boxes → (N,H,W)
    bool masks; over-capacity boxes are sliced; the image embedding
    is computed once and reused across prompt batches."""
    from cartoonsegmentation_tpu.pipeline.sam import NativeSAM
    sam = NativeSAM(capacity=3, model=SAM(**TINY))
    img = (rng.rand(50, 70, 3) * 255).astype(np.uint8)
    boxes = np.array([[5, 5, 30, 40], [10, 2, 65, 48],
                      [0, 0, 20, 20], [33, 21, 60, 44]], np.float32)
    masks, iou = sam.segment_boxes(img, boxes)
    assert masks.shape == (4, 50, 70) and masks.dtype == bool
    assert iou.shape == (4,)
    assert not masks[3].any()          # beyond capacity → zeroed
    emb1 = sam._emb
    masks2, _ = sam.segment_boxes(img, boxes[:2])
    assert sam._emb is emb1            # embedding cache hit
    np.testing.assert_array_equal(masks2[:2], masks[:2])
    # new image → re-encode
    sam.segment_boxes(img[::-1].copy(), boxes[:1])
    assert sam._emb is not emb1


def test_sam_detector_replaces_masks(rng):
    """forward_sam parity (kenburns_effect.py:848-860): detector
    boxes kept, masks re-derived by SAM, invalid slots stay empty."""
    from cartoonsegmentation_tpu.pipeline import AnimeInsSeg
    from cartoonsegmentation_tpu.pipeline.sam import (NativeSAM,
                                                      SamDetector)
    det = AnimeInsSeg(det_size=64, max_instances=4)
    sam = SamDetector(det, NativeSAM(capacity=4, model=SAM(**TINY)))
    img = (rng.rand(48, 56, 3) * 255).astype(np.uint8)
    ins = sam.infer(img, pred_score_thr=0.0)
    base = det.infer(img, pred_score_thr=0.0)
    np.testing.assert_array_equal(np.asarray(ins.bboxes),
                                  np.asarray(base.bboxes))
    np.testing.assert_array_equal(np.asarray(ins.valid),
                                  np.asarray(base.valid))
    assert ins.masks.shape == (4, 48, 56)
    inval = ~np.asarray(ins.valid)
    assert not np.asarray(ins.masks)[inval].any()


def test_pipeline_sam_wiring():
    """detector: sam (configs/3dkenburns_sam.yaml) now constructs the
    in-process SamDetector instead of raising."""
    from cartoonsegmentation_tpu.config import build_kenburns_cfg
    from cartoonsegmentation_tpu.pipeline import KenBurnsPipeline
    from cartoonsegmentation_tpu.pipeline.sam import SamDetector
    cfg = build_kenburns_cfg('configs/3dkenburns_sam.yaml')
    assert cfg.detector == 'sam'
    pipe = KenBurnsPipeline(cfg.replace(max_size=64))
    pipe.ensure_detector()
    assert isinstance(pipe._detector, SamDetector)
    assert pipe._detector.sam.capacity == cfg.max_instances


def test_generate_state_with_sam_detector(rng):
    """Full pipeline integration: a SamDetector installed on the
    KenBurns pipeline populates the 'instances' stage preview and the
    state builds end to end (the detector: sam config path at small
    scale)."""
    from cartoonsegmentation_tpu.config import KenBurnsConfig
    from cartoonsegmentation_tpu.pipeline import (AnimeInsSeg,
                                                  KenBurnsPipeline,
                                                  NativeSAM,
                                                  SamDetector)
    cfg = KenBurnsConfig(max_size=48, num_frame=2, depth_field=False,
                         point_capacity_factor=1.2,
                         depth_est='default', playback=False,
                         detector='sam', pred_score_thr=0.0)
    pipe = KenBurnsPipeline(cfg)
    pipe.set_detector(SamDetector(
        AnimeInsSeg(det_size=64, max_instances=4),
        NativeSAM(capacity=4, model=SAM(**TINY))))
    img = (rng.rand(40, 48, 3) * 255).astype(np.uint8)
    state = pipe.generate_state(img)
    assert 'instances' in pipe.stages
    assert state.cloud.points.shape[-1] == 3


def test_load_detector_checkpoints_routing():
    """The pipeline-level loader routes to the configured family and
    refuses when no detector is configured."""
    from cartoonsegmentation_tpu.config import KenBurnsConfig
    from cartoonsegmentation_tpu.pipeline import KenBurnsPipeline
    cfg = KenBurnsConfig(max_size=48, detector='none')
    pipe = KenBurnsPipeline(cfg)
    with pytest.raises(ValueError):
        pipe.load_detector_checkpoints()
    pipe2 = KenBurnsPipeline(cfg.replace(detector='sam'))
    pipe2.load_detector_checkpoints()      # None/None: builds, no-op
    from cartoonsegmentation_tpu.pipeline.sam import SamDetector
    assert isinstance(pipe2._detector, SamDetector)


def test_normalize_pad_zero_after_normalize(rng):
    """The letterbox band must be 0.0 AFTER normalization (official
    Sam.preprocess normalizes first, then F.pad's zeros), not
    -mean/std — the ViT's global attention mixes pad tokens into
    every image token, so a wrong band corrupts the embedding."""
    from cartoonsegmentation_tpu.models.sam import SAM_MEAN, SAM_STD
    from cartoonsegmentation_tpu.pipeline.sam import normalize_pad
    canvas = np.zeros((32, 32, 3), np.uint8)
    canvas[:20, :24] = (rng.rand(20, 24, 3) * 255).astype(np.uint8)
    out = np.asarray(normalize_pad(jnp.asarray(canvas),
                                   jnp.asarray([20, 24], np.int32)))
    exp = (canvas[:20, :24].astype(np.float32) - SAM_MEAN) / SAM_STD
    np.testing.assert_allclose(out[:20, :24], exp, rtol=1e-6)
    assert (out[20:] == 0.0).all() and (out[:, 24:] == 0.0).all()
