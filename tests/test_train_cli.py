"""scripts/train_detector.py smoke: a 2-step run over a tiny on-disk
COCO dataset on the 8-device CPU mesh — exercises source parsing,
mixed dataset batching, the DP train step, checkpoint save and the
COCO-mAP validation path end to end."""
import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _make_coco(tmp_path, n_images=3, size=64):
    import cv2
    from cartoonsegmentation_tpu.data import rle as rle_codec
    img_dir = tmp_path / 'imgs'
    img_dir.mkdir()
    rng = np.random.RandomState(0)
    images, annotations = [], []
    aid = 1
    for i in range(n_images):
        img = (rng.rand(size, size, 3) * 255).astype(np.uint8)
        name = f'{i}.png'
        cv2.imwrite(str(img_dir / name), img)
        images.append({'id': i + 1, 'file_name': name,
                       'height': size, 'width': size})
        for _ in range(2):
            x, y = rng.randint(0, size // 2, 2)
            w, h = rng.randint(8, size // 2, 2)
            m = np.zeros((size, size), bool)
            m[y:y + h, x:x + w] = True
            annotations.append({
                'id': aid, 'image_id': i + 1, 'category_id': 1,
                'bbox': [int(x), int(y), int(w), int(h)],
                'area': int(w * h),
                'segmentation': rle_codec.encode(m), 'iscrowd': 0})
            aid += 1
    ann = {'images': images, 'annotations': annotations,
           'categories': [{'id': 1, 'name': 'character'}]}
    ann_path = tmp_path / 'train.json'
    ann_path.write_text(json.dumps(ann))
    return ann_path, img_dir


def test_train_detector_cli_smoke(tmp_path):
    ann, img_dir = _make_coco(tmp_path)
    ckpt = tmp_path / 'det.msgpack'
    env = dict(os.environ,
               JAX_PLATFORMS='cpu',
               XLA_FLAGS='--xla_force_host_platform_device_count=8')
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, 'scripts',
                                      'train_detector.py'),
         '--ann', f'{ann}={img_dir}', '--val-ann', f'{ann}={img_dir}',
         '--size', 'nano', '--img-size', '64', '--batch', '8',
         '--steps', '2', '--log-every', '1', '--val-max-images', '2',
         '--mosaic-prob', '0.5', '--ckpt-out', str(ckpt)],
        capture_output=True, text=True, timeout=900, cwd=REPO, env=env)
    assert res.returncode == 0, res.stderr[-3000:]
    assert ckpt.exists()
    log = res.stderr + res.stdout
    assert 'step 2/2' in log
    assert 'val animeins_bbox' in log

    # experiment-tracking sink (VERDICT r3 item 8): metrics.jsonl
    # holds the same scalars the log prints, train AND val
    rows = [json.loads(ln) for ln in
            (tmp_path / 'run' / 'metrics.jsonl').read_text()
            .splitlines()]
    train = [r for r in rows if 'Train/loss' in r]
    vals = [r for r in rows if any(k.startswith('Metrics/')
                                   for k in r)]
    assert len(train) == 2 and train[-1]['step'] == 2
    assert vals and any(k.endswith('/mAP') for k in vals[0])

    # resume path loads the saved checkpoint
    res2 = subprocess.run(
        [sys.executable, os.path.join(REPO, 'scripts',
                                      'train_detector.py'),
         '--ann', f'{ann}={img_dir}', '--size', 'nano',
         '--img-size', '64', '--batch', '8', '--steps', '1',
         '--log-every', '1', '--resume', str(ckpt),
         '--ckpt-out', str(tmp_path / 'det2.msgpack')],
        capture_output=True, text=True, timeout=900, cwd=REPO, env=env)
    assert res2.returncode == 0, res2.stderr[-3000:]
    assert (tmp_path / 'det2.msgpack').exists()


def _make_nyu(tmp_path, n=16, hw=(48, 64)):
    import cv2
    rng = np.random.RandomState(1)
    img_dir = tmp_path / 'rgb'
    dep_dir = tmp_path / 'gt'
    img_dir.mkdir()
    dep_dir.mkdir()
    lines = []
    for i in range(n):
        img = (rng.rand(*hw, 3) * 255).astype(np.uint8)
        dep = (rng.rand(*hw) * 4000 + 500).astype(np.uint16)
        cv2.imwrite(str(img_dir / f'{i}.png'), img)
        cv2.imwrite(str(dep_dir / f'{i}.png'), dep)
        lines.append(f'{i}.png {i}.png 518.8')
    split = tmp_path / 'train.txt'
    split.write_text('\n'.join(lines) + '\n')
    return img_dir, dep_dir, split


def test_train_zoedepth_cli_smoke(tmp_path):
    img_dir, dep_dir, split = _make_nyu(tmp_path)
    ckpt = tmp_path / 'zoe.msgpack'
    env = dict(os.environ,
               JAX_PLATFORMS='cpu',
               XLA_FLAGS='--xla_force_host_platform_device_count=8')
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, 'scripts',
                                      'train_zoedepth.py'),
         '--data-path', str(img_dir), '--gt-path', str(dep_dir),
         '--split', str(split), '--eval-split', str(split),
         '--tiny', '--img-size', '32', '32', '--batch', '8',
         '--epochs', '1', '--max-steps', '2', '--log-every', '1',
         '--eval-max-images', '2', '--ckpt-out', str(ckpt)],
        capture_output=True, text=True, timeout=900, cwd=REPO, env=env)
    assert res.returncode == 0, res.stderr[-3000:]
    assert ckpt.exists()
    log = res.stderr + res.stdout
    assert 'step 2/2' in log
    assert 'eval:' in log and 'rmse=' in log

    # tracking sink: train scalars + the nine-metric eval row
    rows = [json.loads(ln) for ln in
            (tmp_path / 'run' / 'metrics.jsonl').read_text()
            .splitlines()]
    assert any('Train/l_si' in r for r in rows)
    assert any('Metrics/rmse' in r for r in rows)


def test_train_zoedepth_nk_cli_smoke(tmp_path):
    """NK variant over the mesh: the MixedNYUKITTILoader emits a
    rank-0 'domain' label per batch, which shard_batch must place
    replicated (advisor round-2 high finding) — this runs the real
    CLI path shard_batch → make_zoe_nk_train_step on 8 devices."""
    img_dir, dep_dir, split = _make_nyu(tmp_path)
    ckpt = tmp_path / 'zoenk.msgpack'
    env = dict(os.environ,
               JAX_PLATFORMS='cpu',
               XLA_FLAGS='--xla_force_host_platform_device_count=8')
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, 'scripts',
                                      'train_zoedepth.py'),
         '--variant', 'nk',
         '--data-path', str(img_dir), '--gt-path', str(dep_dir),
         '--split', str(split),
         '--kitti-data-path', str(img_dir),
         '--kitti-gt-path', str(dep_dir),
         '--kitti-split', str(split),
         '--tiny', '--img-size', '32', '32', '--batch', '8',
         '--epochs', '1', '--max-steps', '2', '--log-every', '1',
         '--ckpt-out', str(ckpt)],
        capture_output=True, text=True, timeout=900, cwd=REPO, env=env)
    assert res.returncode == 0, res.stderr[-3000:]
    assert ckpt.exists()
    log = res.stderr + res.stdout
    assert 'step 2/2' in log
    assert 'l_domain=' in log
