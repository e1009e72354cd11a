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

    ins = seg.segment_with_bboxes(
        img, np.array([[10, 10, 60, 90], [70, 20, 130, 95]]))
    assert ins.masks.shape == (2, 100, 140)
    assert int(ins.count()) == 2


def test_tagger_stub_deterministic(rng):
    t = Tagger(backend='auto')
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
