"""AnimeInsSeg API tests: infer, embeddings, box-conditioned masks,
tagger adapter."""
import numpy as np
import pytest

cv2 = pytest.importorskip('cv2')

from cartoonsegmentation_tpu.pipeline import AnimeInsSeg
from cartoonsegmentation_tpu.models.tagger import Tagger


@pytest.fixture(scope='module')
def seg():
    return AnimeInsSeg(det_size=128, max_instances=4)


def test_infer_shapes(seg, rng):
    img = (rng.rand(100, 140, 3) * 255).astype(np.uint8)
    ins = seg.infer(img, pred_score_thr=0.0)
    assert ins.masks.shape == (4, 100, 140)
    assert ins.bboxes.shape == (4, 4)


def test_infer_embeddings_and_box_prompt(seg, rng):
    img = (rng.rand(100, 140, 3) * 255).astype(np.uint8)
    emb, _, scale, _ = seg.infer_embeddings(img, pre_topk=512)
    # det_size 128 → 336 priors total; top_k clamps
    assert emb['scores'].shape == (336,)
    assert emb['kernels'].shape[1] == 169
    assert emb['mask_feat'].shape[-1] == 8

    # min_iou=0 keeps every prompt matched (random-init candidate
    # boxes are arbitrary, so overlap isn't guaranteed here)
    ins = seg.segment_with_bboxes(
        img, np.array([[10, 10, 60, 90], [70, 20, 130, 95]]),
        min_iou=0.0)
    assert ins.masks.shape == (2, 100, 140)
    assert int(ins.count()) == 2
    # the default gate marks zero-overlap prompts invalid instead of
    # silently returning candidate 0's instance
    far = seg.segment_with_bboxes(
        img, np.array([[-500, -500, -490, -490]]), min_iou=0.05)
    assert int(far.count()) == 0
    assert not bool(far.valid[0])


def test_tagger_stub_deterministic(rng):
    t = Tagger(backend='auto', strict=False)
    assert t.backend == 'stub'
    img = np.zeros((64, 64, 3), np.uint8)
    img[..., 0] = 250  # blue-dominant in BGR
    tags, chars = t.label_cv2_bgr(img)
    assert tags == t.label_cv2_bgr(img)[0]
    assert 'blue_theme' in tags
    assert chars == []


def test_infer_batch_dp_mesh(seg, rng):
    """Batch inference sharded over the 8-device CPU mesh matches
    single-image inference."""
    imgs = [(rng.rand(90, 120, 3) * 255).astype(np.uint8)
            for _ in range(3)]
    batch = seg.infer_batch(imgs, pred_score_thr=0.0)
    assert len(batch) == 3
    single = seg.infer(imgs[0], pred_score_thr=0.0)
    np.testing.assert_allclose(
        np.asarray(batch[0].scores), np.asarray(single.scores),
        rtol=1e-4, atol=1e-5)
    agree = (np.asarray(batch[0].masks) == np.asarray(single.masks)
             ).mean()
    assert agree > 0.999, agree


def test_infer_tags_per_instance(seg, rng):
    """infer_tags: white-backed masked crops through the tagger, with
    background-tag exclusion (reference animeinsseg:233-260)."""
    from cartoonsegmentation_tpu.instances import Instances
    import jax.numpy as jnp

    img = (rng.rand(80, 100, 3) * 255).astype(np.uint8)
    ins = Instances.empty(3, 80, 100)
    masks = np.zeros((3, 80, 100), bool)
    masks[0, 10:40, 10:50] = True
    masks[1, 50:75, 60:95] = True
    ins = ins.replace(
        masks=jnp.asarray(masks),
        bboxes=jnp.asarray([[10, 10, 40, 30], [60, 50, 35, 25],
                            [0, 0, 0, 0]], jnp.float32),
        valid=jnp.asarray([True, True, False]))

    calls = []

    class FakeTagger:
        def label_cv2_bgr(self, crop):
            calls.append(crop.copy())
            return (['white_background', '1girl', 'solo'],
                    ['some_chara'])

    seg.tagger = FakeTagger()
    tags, ctags = seg.infer_tags(ins, img)
    assert tags == ['1girl solo', '1girl solo']
    assert ctags == [['some_chara'], ['some_chara']]
    assert len(calls) == 2                       # invalid slot skipped
    assert calls[0].shape == (30, 40, 3)
    # pixels outside the mask are whited out
    m0 = masks[0, 10:40, 10:50]
    assert (calls[0][~m0] == 255).all()
    assert (calls[0][m0] == img[10:40, 10:50][m0]).all()

    # grey mode: crop is 3-channel replicated luma
    tags, _ = seg.infer_tags(ins, img, infer_grey=True)
    g = calls[-1]
    assert (g[..., 0] == g[..., 1]).all() and (g[..., 1] == g[..., 2]).all()


def test_tagger_strict_by_default():
    """VERDICT r3 item 9: a Tagger with no usable backend must raise
    unless strict=False is passed explicitly (the stub is test-only)."""
    import pytest
    with pytest.raises(RuntimeError, match='strict'):
        Tagger(backend='auto')
    with pytest.raises(RuntimeError, match='strict'):
        Tagger('/nonexistent/model.ckpt', backend='flax')


def test_draw_contour_outlines(rng):
    """draw(draw_contour=True) outlines the mask boundary: pixels ON
    the boundary change, pixels well inside the mask do not (unlike
    the alpha-blended mask fill). The reference accepts
    draw_ins_contour but never renders it (anime_instances.py:135);
    here the option draws."""
    import numpy as np
    from cartoonsegmentation_tpu.instances import Instances

    h, w = 64, 64
    m = np.zeros((h, w), bool)
    m[16:48, 16:48] = True
    ins = Instances.from_numpy(
        m[None], np.array([[16, 16, 32, 32]], np.float32), capacity=2)
    img = np.full((h, w, 3), 128, np.uint8)
    out = ins.draw(img, draw_bbox=False, draw_ins_mask=False,
                   draw_contour=True)
    assert out.shape == img.shape
    # boundary marked...
    assert np.abs(out[16, 16:48].astype(int) - 128).sum() > 0
    # ...interior untouched (a mask FILL would have tinted it)
    np.testing.assert_array_equal(out[30:34, 30:34],
                                  img[30:34, 30:34])
    # default stays reference-compatible: no contour
    out2 = ins.draw(img, draw_bbox=False, draw_ins_mask=False)
    np.testing.assert_array_equal(out2, img)
