"""On-TPU fill quality tests + style-editing pipeline against a fake
sd-webui server (local HTTP, no egress)."""
import base64
import io
import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import numpy as np
import jax.numpy as jnp

from cartoonsegmentation_tpu.ops.inpaint_fill import (inpaint,
                                                      push_pull_fill)


def test_push_pull_fill_smooth_region(rng):
    H = W = 64
    img = np.zeros((H, W, 3), np.float32)
    img[:, :, 0] = np.linspace(0, 1, W)[None, :]
    img[:, :, 1] = 0.5
    hole = np.zeros((H, W), bool)
    hole[20:40, 25:45] = True
    corrupted = img.copy()
    corrupted[hole] = 0.0

    out = np.asarray(push_pull_fill(jnp.asarray(corrupted),
                                    jnp.asarray(hole)))
    # non-hole pixels untouched
    np.testing.assert_allclose(out[~hole], img[~hole], atol=1e-6)
    # filled pixels close to the underlying gradient
    err = np.abs(out[hole] - img[hole]).mean()
    assert err < 0.06, err


def test_inpaint_uint8_api(rng):
    img = (rng.rand(48, 48, 3) * 255).astype(np.uint8)
    mask = np.zeros((48, 48), np.uint8)
    mask[10:20, 10:30] = 255
    out = inpaint(img, mask, patch_size=3)
    assert out.shape == img.shape and out.dtype == np.uint8
    # untouched outside the hole
    np.testing.assert_array_equal(out[mask == 0], img[mask == 0])


class _FakeSD(BaseHTTPRequestHandler):
    calls = []
    options = {'sd_model_checkpoint': 'anything-v5 [abc123]'}

    def _json(self, obj):
        body = json.dumps(obj).encode()
        self.send_response(200)
        self.send_header('Content-Type', 'application/json')
        self.send_header('Content-Length', str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        # the sd-webui enumeration API the style dropdowns consume
        if self.path.endswith('/sdapi/v1/samplers'):
            self._json([{'name': n} for n in
                        ('Euler a', 'DPM++ 2M Karras', 'DDIM')])
        elif self.path.endswith('/sdapi/v1/sd-models'):
            self._json([
                {'title': 'anything-v5 [abc123]',
                 'model_name': 'anything-v5'},
                {'title': 'counterfeit-v3 [def456]',
                 'model_name': 'counterfeit-v3'}])
        elif self.path.endswith('/sdapi/v1/options'):
            self._json(_FakeSD.options)
        else:
            self.send_response(404)
            self.end_headers()

    def do_POST(self):
        n = int(self.headers['Content-Length'])
        payload = json.loads(self.rfile.read(n))
        if self.path.endswith('/sdapi/v1/options'):
            _FakeSD.options.update(payload)
            self._json({})
            return
        _FakeSD.calls.append(payload)
        # echo back solid images of the requested size; like sd-webui,
        # n_iter * batch_size generations, with a grid composite
        # PREPENDED when more than one (the client must trim it)
        from PIL import Image

        def solid(color):
            img = Image.new('RGB', (payload.get('width', 64),
                                    payload.get('height', 64)), color)
            buf = io.BytesIO()
            img.save(buf, format='PNG')
            return base64.b64encode(buf.getvalue()).decode()

        count = int(payload.get('n_iter', 1)) \
            * int(payload.get('batch_size', 1))
        imgs = [solid((10, 200, 30))] * count
        if count > 1:
            imgs = [solid((200, 10, 10))] + imgs  # the grid, red
        body = json.dumps({'images': imgs}).encode()
        self.send_response(200)
        self.send_header('Content-Type', 'application/json')
        self.send_header('Content-Length', str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):
        pass


def _serve():
    srv = HTTPServer(('127.0.0.1', 0), _FakeSD)
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    return srv


def test_ldm_inpaint_webui_roundtrip(rng):
    from cartoonsegmentation_tpu.serving.sd_webui import ldm_inpaint_webui
    srv = _serve()
    url = f'http://127.0.0.1:{srv.server_port}/sdapi/v1/img2img'
    img = (rng.rand(60, 100, 3) * 255).astype(np.uint8)
    mask = np.zeros((60, 100), np.uint8)
    mask[10:30, 20:60] = 255
    out = ldm_inpaint_webui(img, mask, 64, url, prompt='bg', steps=4)
    srv.shutdown()
    assert out.shape[:2] == (60, 100)
    call = _FakeSD.calls[-1]
    # aspect-kept /32-rounded resolution: landscape → H=64? no: w>h →
    # H=64... reference: if h > w: W=res else H=res → here h<w: H=64,
    # W=(100/60*64)//32*32 = 96
    assert call['height'] == 64 and call['width'] == 96
    assert call['prompt'] == 'bg' and call['steps'] == 4


def test_style_editor_full_loop(rng, tmp_path):
    from cartoonsegmentation_tpu.pipeline.style import (StyleConfig,
                                                        StyleEditor)
    from cartoonsegmentation_tpu.instances import Instances

    class FakeDetector:
        def infer(self, img, *a, **k):
            h, w = img.shape[:2]
            m = np.zeros((h, w), bool)
            m[h // 4: h // 2, w // 4: w // 2] = True
            return Instances.from_numpy(
                m[None], np.array([[w // 4, h // 4, w // 4, h // 4]],
                                  np.float32), capacity=2)

    _FakeSD.calls.clear()
    srv = _serve()
    cfg = StyleConfig(
        url=f'http://127.0.0.1:{srv.server_port}/sdapi/v1/img2img',
        style_prompt='pixar style', long_side=64, niter=1,
        cache_masks_dir=str(tmp_path / 'cache'),
        save_dir=str(tmp_path / 'out'),
        sd_params={'steps': 2, 'alwayson_scripts':
                   {'controlnet': {'args': [{}]}}})
    editor = StyleEditor(cfg, detector=FakeDetector(),
                         tagger=lambda img: (['1girl', 'smile'], []))
    img = (rng.rand(80, 64, 3) * 255).astype(np.uint8)
    saved = editor.repaint(img, 'testimg')
    srv.shutdown()

    assert len(saved) == 1
    # bg repaint + 1 instance inpaint = 2 calls
    assert len(_FakeSD.calls) == 2
    assert 'pixar style' in _FakeSD.calls[0]['prompt']
    assert '1girl' in _FakeSD.calls[1]['prompt']
    # controlnet input was wired
    assert _FakeSD.calls[1]['alwayson_scripts']['controlnet']['args'][0][
        'input_image']
    # cache exists → second run hits cache, no detector needed
    editor2 = StyleEditor(cfg, detector=None, tagger=None)
    saved2 = None
    srv2 = _serve()
    cfg.url = f'http://127.0.0.1:{srv2.server_port}/x'
    saved2 = editor2.repaint(img, 'testimg')
    srv2.shutdown()
    assert len(saved2) == 1


def test_run_img2img_all_batch_grid_trim(rng):
    """Batch Count/Size → n_iter*batch_size variants; the grid image
    sd-webui prepends when >1 is trimmed by the client."""
    from cartoonsegmentation_tpu.serving.sd_webui import (
        img2b64, run_img2img, run_img2img_all)
    _FakeSD.calls.clear()
    srv = _serve()
    url = f'http://127.0.0.1:{srv.server_port}/sdapi/v1/img2img'
    img = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
    outs = run_img2img_all(img2b64(img),
                           {'width': 32, 'height': 32, 'n_iter': 2,
                            'batch_size': 2}, 'p', 'n', url)
    one = run_img2img(img2b64(img), {'width': 32, 'height': 32},
                      'p', 'n', url)
    srv.shutdown()
    assert len(outs) == 4          # grid trimmed: 2*2 variants remain
    from cartoonsegmentation_tpu.serving.sd_webui import b64_2img
    for o in outs:                 # every survivor is a generation
        assert tuple(b64_2img(o)[0, 0]) == (10, 200, 30)   # not grid
    assert b64_2img(one).shape[:2] == (32, 32)


def test_style_editor_batch_variants(rng, tmp_path):
    """batch_count/batch_size on the final inpaint: the chain follows
    the first output, the extra variants are saved as *_var*.png."""
    from cartoonsegmentation_tpu.pipeline.style import (StyleConfig,
                                                        StyleEditor)
    from cartoonsegmentation_tpu.instances import Instances

    class FakeDetector:
        def infer(self, img, *a, **k):
            h, w = img.shape[:2]
            m = np.zeros((h, w), bool)
            m[h // 4: h // 2, w // 4: w // 2] = True
            return Instances.from_numpy(
                m[None], np.array([[w // 4, h // 4, w // 4, h // 4]],
                                  np.float32), capacity=2)

    _FakeSD.calls.clear()
    srv = _serve()
    cfg = StyleConfig(
        url=f'http://127.0.0.1:{srv.server_port}/sdapi/v1/img2img',
        style_prompt='pixar style', long_side=64, niter=1,
        batch_count=3, batch_size=1,
        cache_masks_dir=str(tmp_path / 'cache'),
        save_dir=str(tmp_path / 'out'),
        sd_params={'steps': 2, 'alwayson_scripts':
                   {'controlnet': {'args': [{}]}}})
    editor = StyleEditor(cfg, detector=FakeDetector(),
                         tagger=lambda img: (['1girl'], []))
    img = (rng.rand(80, 64, 3) * 255).astype(np.uint8)
    saved = editor.repaint(img, 'batchimg')
    srv.shutdown()
    import os.path as osp
    assert len(saved) == 3                 # primary + 2 variants
    assert '_var' not in osp.basename(saved[0])
    assert saved[1].endswith('_var1.png') and saved[2].endswith(
        '_var2.png')
    # the bg img2img stays single; only the final inpaint batches
    assert 'n_iter' not in _FakeSD.calls[0]
    assert _FakeSD.calls[1]['n_iter'] == 3
    assert _FakeSD.calls[1]['batch_size'] == 1


def test_pack_outputs_variants(tmp_path):
    """/style and /style_apply response packing: primary = final
    chained output, variants = the last round's _var files."""
    import cv2
    from cartoonsegmentation_tpu.serving.interface import \
        KenBurnsService
    paths = []
    for name in ('a_niter0_output_0.png', 'a_niter0_output_0_var1.png',
                 'a_niter1_output_1.png', 'a_niter1_output_1_var1.png',
                 'a_niter1_output_1_var2.png'):
        p = str(tmp_path / name)
        cv2.imwrite(p, np.full((4, 4, 3), 128, np.uint8))
        paths.append(p)
    out = KenBurnsService._pack_outputs(paths)
    assert out['outputs'] == 5
    assert len(out['variants']) == 2       # only the last round's


def test_style_config_from_yaml(tmp_path):
    """Reference-format style yaml (configs/3d_pixar.yaml schema)
    loads into StyleConfig; unknown keys ignored; shipped preset
    parses."""
    from cartoonsegmentation_tpu.pipeline.style import \
        style_config_from_yaml
    cfg = style_config_from_yaml({
        'onebyone': False, 'style_prompt': 'oil painting', 'niter': 2,
        'url': 'http://x/img2img', 'long_side': 512,
        'sd_params': {'steps': 9}, 'not_a_field': 1})
    assert cfg.onebyone is False
    assert cfg.style_prompt == 'oil painting'
    assert cfg.niter == 2 and cfg.long_side == 512
    assert cfg.sd_params == {'steps': 9}
    shipped = style_config_from_yaml('configs/3d_pixar.yaml')
    assert shipped.niter == 3
    assert 'pixar' in shipped.style_prompt
    assert shipped.sd_params['sampler_name'] == 'DPM++ 2M Karras'


def test_style_editor_joint_mask_mode(rng, tmp_path):
    """onebyone=False repaints all instances in ONE inpaint call with
    the union mask and joined prompts."""
    from cartoonsegmentation_tpu.pipeline.style import (StyleConfig,
                                                        StyleEditor)
    from cartoonsegmentation_tpu.instances import Instances

    class FakeDetector:
        def infer(self, img, *a, **k):
            h, w = img.shape[:2]
            m1 = np.zeros((h, w), bool); m1[4:12, 4:12] = True
            m2 = np.zeros((h, w), bool); m2[20:30, 20:30] = True
            boxes = np.array([[4, 4, 8, 8], [20, 20, 10, 10]],
                             np.float32)
            return Instances.from_numpy(np.stack([m1, m2]), boxes,
                                        capacity=4)

    _FakeSD.calls.clear()
    srv = _serve()
    cfg = StyleConfig(
        url=f'http://127.0.0.1:{srv.server_port}/sdapi/v1/img2img',
        style_prompt='pixar style', long_side=64, niter=1,
        onebyone=False,
        cache_masks_dir=str(tmp_path / 'cache'),
        save_dir=str(tmp_path / 'out'),
        sd_params={'steps': 2, 'alwayson_scripts':
                   {'controlnet': {'args': [{}]}}})
    editor = StyleEditor(cfg, detector=FakeDetector(),
                         tagger=lambda img: (['1girl'], []))
    img = (rng.rand(80, 64, 3) * 255).astype(np.uint8)
    saved = editor.repaint(img, 'jointimg')
    srv.shutdown()
    assert len(saved) == 1
    # bg repaint + ONE joint fg inpaint (not one per instance)
    assert len(_FakeSD.calls) == 2


def test_repaint_whole_image(rng, tmp_path):
    """repaint_whole: one plain img2img at exact_size, no detection —
    the reference --onebyone False path (repaint_person.py:81-103)."""
    from cartoonsegmentation_tpu.pipeline.style import (StyleConfig,
                                                        StyleEditor)
    _FakeSD.calls.clear()
    srv = _serve()
    cfg = StyleConfig(
        url=f'http://127.0.0.1:{srv.server_port}/sdapi/v1/img2img',
        style_prompt='lineart', exact_size=(96, 64),
        save_dir=str(tmp_path / 'out'),
        sd_params={'steps': 2, 'alwayson_scripts':
                   {'controlnet': {'args': [{}]}}})
    editor = StyleEditor(cfg)           # no detector, no tagger
    img = (rng.rand(80, 70, 3) * 255).astype(np.uint8)
    saved = editor.repaint_whole(img, 'whole')
    srv.shutdown()
    assert len(saved) == 1
    assert saved[0].endswith('repaint-default-whole.png')
    assert len(_FakeSD.calls) == 1      # exactly one img2img
    call = _FakeSD.calls[0]
    # exact_size wins over aspect-kept long_side rounding
    assert call['width'] == 96 and call['height'] == 64
    assert call['prompt'] == 'lineart'
    import cv2
    out = cv2.imread(saved[0])
    assert out.shape[:2] == (64, 96)


def test_style_to_grey_tagging(rng, tmp_path):
    """to_grey: the tagger sees a 3-channel GREYSCALE crop (reference
    infer_grey, animeinsseg/__init__.py:237)."""
    from cartoonsegmentation_tpu.pipeline.style import (StyleConfig,
                                                        StyleEditor)
    from cartoonsegmentation_tpu.instances import Instances

    class FakeDetector:
        def infer(self, img, *a, **k):
            h, w = img.shape[:2]
            m = np.zeros((h, w), bool)
            m[h // 4: h // 2, w // 4: w // 2] = True
            return Instances.from_numpy(
                m[None], np.array([[w // 4, h // 4, w // 4, h // 4]],
                                  np.float32), capacity=2)

    seen = []

    def tagger(crop):
        seen.append(crop.copy())
        return (['1girl'], [])

    _FakeSD.calls.clear()
    srv = _serve()
    cfg = StyleConfig(
        url=f'http://127.0.0.1:{srv.server_port}/sdapi/v1/img2img',
        style_prompt='s', long_side=64, to_grey=True,
        cache_masks_dir=str(tmp_path / 'cache'),
        save_dir=str(tmp_path / 'out'),
        sd_params={'steps': 2, 'alwayson_scripts':
                   {'controlnet': {'args': [{}]}}})
    editor = StyleEditor(cfg, detector=FakeDetector(), tagger=tagger)
    img = (rng.rand(80, 64, 3) * 255).astype(np.uint8)
    editor.repaint(img, 'greyimg')
    srv.shutdown()
    assert seen, 'tagger never called'
    for crop in seen:   # instance crop AND background tag call
        assert crop.ndim == 3 and crop.shape[-1] == 3
        np.testing.assert_array_equal(crop[..., 0], crop[..., 1])
        np.testing.assert_array_equal(crop[..., 1], crop[..., 2])


def test_style_save_intermediate(rng, tmp_path):
    """save_intermediate: every per-instance step lands on disk, not
    just the round's final output (reference repaint_person.py
    --save_intermediate)."""
    from cartoonsegmentation_tpu.pipeline.style import (StyleConfig,
                                                        StyleEditor)
    from cartoonsegmentation_tpu.instances import Instances

    class FakeDetector:
        def infer(self, img, *a, **k):
            h, w = img.shape[:2]
            m1 = np.zeros((h, w), bool); m1[4:12, 4:12] = True
            m2 = np.zeros((h, w), bool); m2[20:30, 20:30] = True
            boxes = np.array([[4, 4, 8, 8], [20, 20, 10, 10]],
                             np.float32)
            return Instances.from_numpy(np.stack([m1, m2]), boxes,
                                        capacity=4)

    _FakeSD.calls.clear()
    srv = _serve()
    cfg = StyleConfig(
        url=f'http://127.0.0.1:{srv.server_port}/sdapi/v1/img2img',
        style_prompt='s', long_side=64, save_intermediate=True,
        cache_masks_dir=str(tmp_path / 'cache'),
        save_dir=str(tmp_path / 'out'),
        sd_params={'steps': 2, 'alwayson_scripts':
                   {'controlnet': {'args': [{}]}}})
    editor = StyleEditor(cfg, detector=FakeDetector(),
                         tagger=lambda img: (['1girl'], []))
    img = (rng.rand(80, 64, 3) * 255).astype(np.uint8)
    saved = editor.repaint(img, 'interimg')
    srv.shutdown()
    # fg0 intermediate + final output
    assert len(saved) == 2
    assert '_fg0_' in saved[0]
    assert '_output_' in saved[1]


def test_repaint_person_cli_whole_image(rng, tmp_path, monkeypatch):
    """The repaint_person CLI's --no-onebyone path end to end against
    the fake server, with the reference's full flag set parsed."""
    import importlib.util
    import os.path as osp
    spec = importlib.util.spec_from_file_location(
        'repaint_person_cli',
        osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                 'scripts', 'repaint_person.py'))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    import cv2
    imgp = str(tmp_path / 'in.png')
    cv2.imwrite(imgp, (rng.rand(40, 40, 3) * 255).astype(np.uint8))
    _FakeSD.calls.clear()
    srv = _serve()
    monkeypatch.setattr('sys.argv', [
        'repaint_person.py', '--img_path', imgp, '--no-onebyone',
        '-p', 'lineart girl', '-n', 'bad hands', '-W', '64', '-H', '64',
        '-s', '3', '-c', '7', '-S', 'DDIM', '-f', 'fill', '-b', '2',
        '-d', '0.6',
        '--save_dir', str(tmp_path / 'out'), '--to-grey',
        '--url', f'http://127.0.0.1:{srv.server_port}/sdapi/v1/img2img',
    ])
    mod.main()
    srv.shutdown()
    assert len(_FakeSD.calls) == 1
    call = _FakeSD.calls[0]
    assert call['prompt'] == 'lineart girl'
    assert call['negative_prompt'] == 'bad hands'
    assert call['steps'] == 3 and call['cfg_scale'] == 7
    assert call['sampler_name'] == 'DDIM'
    # -d reaches the whole-image payload (reference options_shared,
    # repaint_person.py:55; ADVICE r4)
    assert call['denoising_strength'] == 0.6
    cn = call['alwayson_scripts']['controlnet']['args'][0]
    assert cn['module'] == 'lineart_anime' and cn['processor_res'] == 640
    assert (tmp_path / 'out' / 'repaint-default-in.png').exists()
    # --to-grey greys the ENTIRE init image in whole-image mode
    # (reference repaint_person.py:46-47), not just tagger crops
    import base64, io
    from PIL import Image
    init = np.asarray(Image.open(io.BytesIO(
        base64.b64decode(call['init_images'][0]))))[..., :3]
    np.testing.assert_array_equal(init[..., 0], init[..., 1])
    np.testing.assert_array_equal(init[..., 1], init[..., 2])


def test_repaint_person_cli_yaml_wins(rng, tmp_path, monkeypatch):
    """--cfg yaml fields stand unless the flag is explicitly on the
    command line (reference OmegaConf merge_with semantics; ADVICE r4:
    CLI DEFAULTS must not overwrite yaml values)."""
    import importlib.util
    import os.path as osp
    spec = importlib.util.spec_from_file_location(
        'repaint_person_cli2',
        osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                 'scripts', 'repaint_person.py'))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    import cv2
    imgp = str(tmp_path / 'in.png')
    cv2.imwrite(imgp, (rng.rand(40, 40, 3) * 255).astype(np.uint8))
    yamlp = tmp_path / 'style.yaml'
    yamlp.write_text(
        'style_prompt: from yaml\n'
        'denoising_strength: 0.33\n'
        f'save_dir: {tmp_path / "yamlout"}\n'
        'mask_blur: 9\n'
        'sd_params:\n  steps: 5\n')
    _FakeSD.calls.clear()
    srv = _serve()
    monkeypatch.setattr('sys.argv', [
        'repaint_person.py', '--img_path', imgp, '--no-onebyone',
        '--cfg', str(yamlp), '-W', '64', '-H', '64',
        '-b', '2',  # explicit → wins over yaml's 9
        '--url', f'http://127.0.0.1:{srv.server_port}/sdapi/v1/img2img',
    ])
    mod.main()
    srv.shutdown()
    call = _FakeSD.calls[0]
    # yaml values survive despite the CLI having defaults for them
    assert call['prompt'] == 'from yaml'
    assert call['denoising_strength'] == 0.33
    assert call['steps'] == 5
    assert (tmp_path / 'yamlout' / 'repaint-default-in.png').exists()

    # EXPLICIT CLI flags beat the yaml — including sd_params keys
    # (-s) and the attached short-option form (-d0.6), which the
    # presence scan resolves through argparse's own option table
    _FakeSD.calls.clear()
    srv2 = _serve()
    monkeypatch.setattr('sys.argv', [
        'repaint_person.py', '--img_path', imgp, '--no-onebyone',
        '--cfg', str(yamlp), '-W', '64', '-H', '64',
        '-s', '12', '-d0.6',
        '--url',
        f'http://127.0.0.1:{srv2.server_port}/sdapi/v1/img2img',
    ])
    mod.main()
    srv2.shutdown()
    call = _FakeSD.calls[0]
    assert call['steps'] == 12                    # -s beats yaml's 5
    assert call['denoising_strength'] == 0.6      # -d0.6 attached
    assert call['prompt'] == 'from yaml'          # untouched field


def test_repaint_person_cli_directory_and_bad_path(rng, tmp_path,
                                                   monkeypatch):
    """Directory input iterates every image (reference find_all_imgs);
    an unreadable path fails fast with a clear message (ADVICE r4)."""
    import importlib.util
    import os.path as osp
    import pytest
    spec = importlib.util.spec_from_file_location(
        'repaint_person_cli3',
        osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                 'scripts', 'repaint_person.py'))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    import cv2
    d = tmp_path / 'imgs'
    d.mkdir()
    for name in ('a.png', 'b.jpg'):
        cv2.imwrite(str(d / name),
                    (rng.rand(40, 40, 3) * 255).astype(np.uint8))
    _FakeSD.calls.clear()
    srv = _serve()
    base = ['repaint_person.py', '--no-onebyone', '-W', '64',
            '-H', '64', '--save_dir', str(tmp_path / 'out'), '--url',
            f'http://127.0.0.1:{srv.server_port}/sdapi/v1/img2img']
    monkeypatch.setattr('sys.argv', base + ['--img_path', str(d)])
    mod.main()
    assert len(_FakeSD.calls) == 2      # one img2img per image
    assert (tmp_path / 'out' / 'repaint-default-a.png').exists()
    assert (tmp_path / 'out' / 'repaint-default-b.png').exists()

    monkeypatch.setattr('sys.argv',
                        base + ['--img_path', str(tmp_path / 'nope.png')])
    with pytest.raises(SystemExit, match='cannot read image'):
        mod.main()
    srv.shutdown()
