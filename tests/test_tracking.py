"""ExperimentTracker / RunningAverageDict unit tests (the JSONL
experiment sink — reference logs the same scalars through wandb,
depth_modules/zoedepth/trainers/base_trainer.py:180-249)."""
import json

import numpy as np

from cartoonsegmentation_tpu.utils.tracking import (ExperimentTracker,
                                                    RunningAverageDict)


def test_running_average_dict():
    r = RunningAverageDict()
    assert not r
    r.update({'a': 1.0, 'b': 2.0})
    r.update({'a': 3.0})
    r.update(None)
    r.update({'a': np.nan, 'b': 4.0})  # non-finite values are skipped
    v = r.value()
    assert v['a'] == 2.0 and v['b'] == 3.0 and r


def test_tracker_jsonl_roundtrip(tmp_path):
    run = tmp_path / 'run'
    with ExperimentTracker(str(run), config={'lr': 1e-3,
                                             'path': tmp_path}) as t:
        t.log({'loss': np.float32(0.5), 'rate': 10.0}, step=1,
              prefix='Train/')
        t.log({'mAP': 0.25}, step=2, prefix='Metrics/')
        out = t.log_image('val_samples',
                          np.zeros((8, 8, 3), np.uint8), step=2)
    rows = [json.loads(ln) for ln in
            (run / 'metrics.jsonl').read_text().splitlines()]
    assert rows[0]['Train/loss'] == 0.5 and rows[0]['step'] == 1
    assert rows[1]['Metrics/mAP'] == 0.25
    # config written once, non-JSON values stringified
    cfg = json.loads((run / 'config.json').read_text())
    assert cfg['lr'] == 1e-3 and isinstance(cfg['path'], str)
    import os.path as osp
    assert osp.exists(out) and out.endswith('val_samples_step2.jpg')


def test_tracker_appends_across_reopen(tmp_path):
    run = tmp_path / 'run'
    with ExperimentTracker(str(run)) as t:
        t.log({'x': 1}, step=1)
    with ExperimentTracker(str(run)) as t:  # resume appends
        t.log({'x': 2}, step=2)
    rows = (run / 'metrics.jsonl').read_text().splitlines()
    assert len(rows) == 2
