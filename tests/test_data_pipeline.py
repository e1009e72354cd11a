"""End-to-end data infra test: generate a tiny synthetic dataset,
load it through the mixed dataset (mosaic/mixup), feed one batch into
the DP train step, run the mask-refine dataset."""
import os
import os.path as osp

import numpy as np
import pytest

cv2 = pytest.importorskip('cv2')

from cartoonsegmentation_tpu.data.syndataset import syn_animecoco_dataset
from cartoonsegmentation_tpu.data.dataset import (CocoSource,
                                                  MaskRefineDataset,
                                                  MixedDetDataset)


@pytest.fixture(scope='module')
def tiny_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp('syn')
    fg_dir = root / 'fg'
    bg_dir = root / 'bg'
    fg_dir.mkdir(); bg_dir.mkdir()
    rng = np.random.RandomState(0)
    # 3 RGBA foregrounds (ellipse blobs), 2 backgrounds
    fgs = []
    for i in range(3):
        c = np.zeros((80, 60, 4), np.uint8)
        cv2.ellipse(c, (30, 40), (20, 35), 0, 0, 360,
                    (int(rng.randint(255)), int(rng.randint(255)),
                     int(rng.randint(255)), 255), -1)
        p = str(fg_dir / f'fg{i}.png')
        cv2.imwrite(p, c)
        fgs.append(p)
    bgs = []
    for i in range(2):
        b = (rng.rand(120, 160, 3) * 255).astype(np.uint8)
        p = str(bg_dir / f'bg{i}.jpg')
        cv2.imwrite(p, b)
        bgs.append(p)

    out = str(root / 'dataset')
    ann = syn_animecoco_dataset(bgs, fgs, out, policy='train',
                                tgt_size=96, max_syn_num=6,
                                syn_num_multiplier=2, seed=0)
    return ann, osp.join(out, 'train')


def test_syn_dataset_generated(tiny_dataset):
    import json
    ann, img_dir = tiny_dataset
    with open(ann) as f:
        coco = json.load(f)
    assert len(coco['images']) >= 3
    assert len(coco['annotations']) >= 3
    a = coco['annotations'][0]
    assert set(a) >= {'bbox', 'segmentation', 'area', 'image_id'}
    # image files exist
    for im in coco['images']:
        assert osp.exists(osp.join(img_dir, im['file_name']))


def test_mixed_dataset_and_train_batch(tiny_dataset):
    ann, img_dir = tiny_dataset
    src = CocoSource(ann, img_dir, 'animeins')
    ds = MixedDetDataset([src, src], img_size=64, mosaic_prob=1.0,
                         mixup_prob=1.0, max_instances=8)
    assert len(ds) == 2 * len(src)
    sample = ds[0]
    assert sample['images'].shape == (64, 64, 3)
    assert sample['gt_boxes'].shape == (8, 4)
    assert sample['gt_masks'].shape == (8, 64, 64)

    batch = next(ds.batches(batch_size=2, steps=1))
    assert batch['images'].shape == (2, 64, 64, 3)

    # one real train step on the batch
    import jax
    import optax
    from cartoonsegmentation_tpu.models.rtmdet import AnimeDetector
    from cartoonsegmentation_tpu.parallel import (create_train_state,
                                                  make_train_step)
    model = AnimeDetector(deepen=0.33, widen=0.125)
    tx = optax.adamw(1e-3)
    state = create_train_state(model, jax.random.PRNGKey(0), (64, 64), tx)
    step = make_train_step(model, tx)
    state2, metrics = step(state, batch)
    assert np.isfinite(float(metrics['loss']))


def test_ignore_mask_semantics(tiny_dataset):
    """Reference rtmdet_inshead_custom.py:186-248: a bbox-only
    (ignore_mask) instance supervises cls/bbox but NOT the mask loss.
    Flipping an instance's ignore flag must change loss_cls/loss_bbox
    behaviour like a real gt and must change loss_mask vs keeping it
    mask-supervised."""
    import jax
    import jax.numpy as jnp
    from cartoonsegmentation_tpu.models.rtmdet import AnimeDetector
    from cartoonsegmentation_tpu.parallel.train import detector_loss

    rng = np.random.RandomState(3)
    model = AnimeDetector(deepen=0.33, widen=0.125)
    images = jnp.asarray(rng.rand(1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), images)
    params = variables['params']
    bstats = variables.get('batch_stats', {})

    gt_boxes = jnp.asarray([[[4., 4., 40., 40.], [20., 20., 60., 60.]]])
    gt_masks = jnp.zeros((1, 2, 64, 64), jnp.float32)
    gt_masks = gt_masks.at[0, 0, 4:40, 4:40].set(1.0)
    gt_masks = gt_masks.at[0, 1, 20:60, 20:60].set(1.0)
    gt_valid = jnp.asarray([[True, True]])

    def losses(ignore, valid=gt_valid):
        _, (m, _) = detector_loss(model, params, bstats, {
            'images': images, 'gt_boxes': gt_boxes, 'gt_masks': gt_masks,
            'gt_valid': valid, 'gt_ignore': jnp.asarray([ignore])})
        return {k: float(v) for k, v in m.items()}

    m_none = losses([False, False])
    m_ign1 = losses([False, True])
    m_ign_all = losses([True, True])
    # dropping instance 1 entirely (the old broken behaviour)
    m_drop1 = losses([False, False], valid=jnp.asarray([[True, False]]))

    # ignored instances still supervise cls/bbox: identical to the
    # fully-supervised case, different from dropping them
    assert m_ign1['loss_cls'] == pytest.approx(m_none['loss_cls'])
    assert m_ign1['loss_bbox'] == pytest.approx(m_none['loss_bbox'])
    assert m_ign_all['loss_cls'] == pytest.approx(m_none['loss_cls'])
    assert m_ign1['loss_cls'] != pytest.approx(m_drop1['loss_cls'])
    # but they are excluded from the mask loss: ignoring every gt
    # leaves no mask supervision at all
    assert m_ign_all['loss_mask'] == pytest.approx(0.0, abs=1e-7)
    assert m_none['loss_mask'] > 0.0


def test_mask_refine_dataset(tiny_dataset):
    ann, img_dir = tiny_dataset
    src = CocoSource(ann, img_dir)
    ds = MaskRefineDataset(src, input_size=64)
    assert len(ds) > 0
    item = ds[0]
    assert item['input'].shape == (64, 64, 4)
    assert item['target'].shape == (64, 64)
    assert 0 <= item['input'].min() and item['input'].max() <= 1
