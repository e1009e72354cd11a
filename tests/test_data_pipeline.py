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
    batch.pop('gt_ignore')
    state2, metrics = step(state, batch)
    assert np.isfinite(float(metrics['loss']))


def test_mask_refine_dataset(tiny_dataset):
    ann, img_dir = tiny_dataset
    src = CocoSource(ann, img_dir)
    ds = MaskRefineDataset(src, input_size=64)
    assert len(ds) > 0
    item = ds[0]
    assert item['input'].shape == (64, 64, 4)
    assert item['target'].shape == (64, 64)
    assert 0 <= item['input'].min() and item['input'].max() <= 1
