"""Weights-given acceptance harness (scripts/verify_parity.py —
VERDICT r4 item 3).

Two tiers:
- `test_verify_parity_synthetic`: runs the WHOLE harness end to end
  on a synthesized weights dir (checkpoint-schema kenburns nets from
  the converter-test manifests), including the --regen-goldens →
  SSIM-compare round trip. Proves the one-command path works before
  any real weights exist.
- `test_verify_parity_real_weights`: the acceptance run proper —
  auto-skips unless a real weights directory is present
  (CARTOONSEG_WEIGHTS_DIR env var, or the reference's own layout
  models/AnimeInstanceSegmentation — readme.md:37-48).
"""
import importlib.util
import json
import os
import os.path as osp
import sys

import numpy as np
import pytest

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))


def _load_harness():
    spec = importlib.util.spec_from_file_location(
        'verify_parity', osp.join(REPO, 'scripts', 'verify_parity.py'))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _rand_sd(sd, seed=0):
    rng = np.random.RandomState(seed)
    return {k: (rng.randn(*v.shape).astype(np.float32) * 0.05
                if v.shape else v) for k, v in sd.items()}


def _fake_weights_dir(tmp_path):
    torch = pytest.importorskip('torch')
    from test_convert_kenburns import (_basic, _conv, _down, _grid,
                                       _prelu, _up)
    d = tmp_path / 'weights'
    d.mkdir()
    # kenburns refine net (schema of test_refine_converter_structure)
    sd = {}
    _basic(sd, 'netImageOne', 'conv-relu-conv', (3, 24, 24))
    _down(sd, 'netImageTwo', (24, 48, 48))
    _down(sd, 'netImageThr', (48, 96, 96))
    _basic(sd, 'netDisparityOne', 'conv-relu-conv', (1, 96, 96))
    _up(sd, 'netDisparityTwo', (192, 96, 96))
    _up(sd, 'netDisparityThr', (144, 48, 48))
    _basic(sd, 'netDisparityFou', 'conv-relu-conv', (72, 24, 24))
    _basic(sd, 'netRefine', 'conv-relu-conv', (24, 24, 1))
    torch.save(_rand_sd(sd, 1), str(d / 'kenburns_depth_refinenet.ckpt'))
    # kenburns inpaint net
    sd = {}
    _conv(sd, 'netContext.0', 64, 4)
    _prelu(sd, 'netContext.1', 64)
    _conv(sd, 'netContext.2', 64, 64)
    _prelu(sd, 'netContext.3', 64)
    _basic(sd, 'netInput', 'conv-relu-conv', (69, 32, 32))
    _grid(sd, (32, 64, 128, 256))
    _basic(sd, 'netImage', 'conv-relu-conv', (32, 32, 3))
    _basic(sd, 'netDisparity', 'conv-relu-conv', (32, 32, 1))
    torch.save(_rand_sd(sd, 2), str(d / 'kenburns_inpaintnet.ckpt'))
    return str(d)


def _run(mod, argv, monkeypatch):
    monkeypatch.setattr('sys.argv', ['verify_parity.py'] + argv)
    with pytest.raises(SystemExit) as e:
        mod.main()
    return 0 if e.value.code in (0, None) else int(e.value.code)


@pytest.mark.slow
def test_verify_parity_synthetic(tmp_path, monkeypatch):
    mod = _load_harness()
    wdir = _fake_weights_dir(tmp_path)

    # discovery maps the published filenames to families
    found = mod.discover(wdir)
    assert found.keys() == {'kb_refine', 'kb_inpaint'}

    out = str(tmp_path / 'parity')
    goldens = str(tmp_path / 'goldens_real')
    base = ['--weights-dir', wdir, '--out', out, '--goldens', goldens,
            '--max-size', '64', '--num-frame', '3']
    rc = _run(mod, base + ['--regen-goldens'], monkeypatch)
    assert rc == 0
    rep = json.load(open(osp.join(out, 'parity_report.json')))
    assert rep['families']['kb_refine']['status'] == 'converted'
    assert rep['families']['kb_inpaint']['status'] == 'converted'
    # the kenburns chain produced its artifacts
    assert any(a.endswith('.mp4') for a in rep['artifacts'])
    assert any('tmp_stage_' in a for a in rep['artifacts'])
    assert osp.isfile(osp.join(out, 'REPORT.md'))
    assert os.listdir(goldens)          # goldens regenerated

    # second run compares against the just-written goldens: the
    # pipeline is deterministic, so SSIM must pass at threshold 1-ish
    out2 = str(tmp_path / 'parity2')
    rc = _run(mod, ['--weights-dir', wdir, '--out', out2,
                    '--goldens', goldens, '--max-size', '64',
                    '--num-frame', '3', '--ssim-thr', '0.99'],
              monkeypatch)
    assert rc == 0
    rep2 = json.load(open(osp.join(out2, 'parity_report.json')))
    assert rep2['ssim_pass'] is True
    assert rep2['ssim']                  # per-artifact scores present


WEIGHTS_DIR = os.environ.get('CARTOONSEG_WEIGHTS_DIR',
                             osp.join(REPO, 'models',
                                      'AnimeInstanceSegmentation'))


@pytest.mark.skipif(not osp.isdir(WEIGHTS_DIR),
                    reason=f'no real weights at {WEIGHTS_DIR} '
                           '(set CARTOONSEG_WEIGHTS_DIR)')
def test_verify_parity_real_weights(tmp_path, monkeypatch):
    """The acceptance run: real checkpoints → full parity report.
    This is the test that closes BASELINE.md's north star when
    weights become available."""
    mod = _load_harness()
    out = str(tmp_path / 'parity_real')
    rc = _run(mod, ['--weights-dir', WEIGHTS_DIR, '--out', out],
              monkeypatch)
    rep = json.load(open(osp.join(out, 'parity_report.json')))
    bad = [k for k, v in rep['families'].items()
           if v['status'] != 'converted']
    assert rc == 0, f'families failed conversion: {bad}'
