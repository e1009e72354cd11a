"""Interactive server test: real HTTP round-trips against the
pipeline (tiny image, random weights)."""
import json

import numpy as np
import pytest

cv2 = pytest.importorskip('cv2')
requests = pytest.importorskip('requests')

from cartoonsegmentation_tpu.config import KenBurnsConfig
from cartoonsegmentation_tpu.pipeline import KenBurnsPipeline
from cartoonsegmentation_tpu.serving.interface import serve


def test_server_roundtrip(rng):
    cfg = KenBurnsConfig(max_size=48, num_frame=3, depth_field=False,
                         point_capacity_factor=1.2, depth_est='default',
                         playback=False)
    pipe = KenBurnsPipeline(cfg)
    srv = serve(pipe, '127.0.0.1', 0, block=False)
    port = srv.server_address[1]
    base = f'http://127.0.0.1:{port}'
    try:
        r = requests.get(f'{base}/health')
        h = r.json()
        assert h['ok'] is True and h['loaded'] is False
        assert h['config']['depth_est'] == 'default'

        img = (rng.rand(40, 48, 3) * 255).astype(np.uint8)
        ok, enc = cv2.imencode('.png', img)
        r = requests.post(f'{base}/load_image', data=enc.tobytes())
        meta = r.json()
        assert meta['height'] == 40 and meta['width'] == 48
        assert 'objFrom' in meta and 'objTo' in meta

        r = requests.get(f'{base}/get_live?fltTime=0.5')
        assert r.status_code == 200
        frame = cv2.imdecode(np.frombuffer(r.content, np.uint8),
                             cv2.IMREAD_COLOR)
        assert frame.shape == (40, 48, 3)

        # move camera → cache invalidated, still renders
        r = requests.post(f'{base}/update_to', data=json.dumps(
            {'center_u': 30.0, 'center_v': 20.0}))
        assert r.json() == {'ok': True}
        r = requests.get(f'{base}/get_live?fltTime=0.5')
        assert r.status_code == 200

        # error path: live frame before load on a fresh service
        r = requests.get(f'{base}/nope')
        assert r.status_code == 404
    finally:
        srv.shutdown()


def test_webui_page_and_segment(rng):
    """GET / serves the browser UI; POST /segment runs the detector
    and returns instances + overlay."""
    import base64

    from cartoonsegmentation_tpu.pipeline import AnimeInsSeg

    cfg = KenBurnsConfig(max_size=48, num_frame=3, depth_field=False,
                         point_capacity_factor=1.2, playback=False)
    pipe = KenBurnsPipeline(cfg)
    seg = AnimeInsSeg(det_size=64, max_instances=4)
    srv = serve(pipe, '127.0.0.1', 0, block=False, segmentor=seg)
    base = f'http://127.0.0.1:{srv.server_address[1]}'
    try:
        r = requests.get(f'{base}/')
        assert r.status_code == 200
        assert 'text/html' in r.headers['Content-Type']
        for needle in ('kbLoad', '/segment', '/get_live',
                       'CartoonSegmentation',
                       # stepping-tab interactions: click-to-place
                       # camera centers + the information tab
                       'kbPlace', 'nfoLoad', 'pane_nfo'):
            assert needle in r.text

        img = (rng.rand(60, 80, 3) * 255).astype(np.uint8)
        ok, enc = cv2.imencode('.png', img)
        r = requests.post(f'{base}/segment', data=enc.tobytes())
        out = r.json()
        assert 'instances' in out and isinstance(out['instances'], list)
        overlay = cv2.imdecode(np.frombuffer(
            base64.b64decode(out['overlay']), np.uint8), cv2.IMREAD_COLOR)
        assert overlay is not None and overlay.shape[-1] == 3

        # draw-options box (reference Component_AIS.py:1881-1916):
        # bbox/mask off + alpha → still a decodable overlay; tags on
        # with no usable tagger checkpoint degrades to a note, not a
        # 500 (the strict tagger raises inside, segment catches it)
        r = requests.post(
            f'{base}/segment?draw_bbox=0&draw_mask=0&mask_alpha=0.2'
            '&draw_tags=1', data=enc.tobytes())
        out2 = r.json()
        assert r.status_code == 200 and 'overlay' in out2
        plain = cv2.imdecode(np.frombuffer(
            base64.b64decode(out2['overlay']), np.uint8),
            cv2.IMREAD_COLOR)
        # nothing drawn → overlay is the (resized) input, unmarked
        assert plain is not None
        if out2['instances']:
            assert 'note' in out2   # tagger unavailable in tests
        # contour-only mode: outlines drawn, nothing else — the
        # overlay must differ from the plain (undrawn) one exactly
        # when instances were detected
        r = requests.post(
            f'{base}/segment?draw_bbox=0&draw_mask=0&draw_contour=1',
            data=enc.tobytes())
        assert r.status_code == 200
        contoured = cv2.imdecode(np.frombuffer(
            base64.b64decode(r.json()['overlay']), np.uint8),
            cv2.IMREAD_COLOR)
        if out2['instances']:
            assert np.abs(contoured.astype(int)
                          - plain.astype(int)).sum() > 0

        # the page exposes the option controls
        page = requests.get(f'{base}/').text
        for needle in ('seg_bbox', 'seg_tags', 'seg_alpha',
                       'seg_contour', 'cfg_az', 'cfg_verbose'):
            assert needle in page

        # garbage upload → clean error json
        r = requests.post(f'{base}/segment', data=b'not an image')
        assert r.status_code == 500 and 'error' in r.json()
    finally:
        srv.shutdown()


def test_segment_route_without_segmentor(rng):
    cfg = KenBurnsConfig(max_size=48, num_frame=3, playback=False)
    pipe = KenBurnsPipeline(cfg)
    srv = serve(pipe, '127.0.0.1', 0, block=False)
    base = f'http://127.0.0.1:{srv.server_address[1]}'
    try:
        img = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
        ok, enc = cv2.imencode('.png', img)
        r = requests.post(f'{base}/segment', data=enc.tobytes())
        assert r.status_code == 500
        assert 'no segmentor' in r.json()['error']
    finally:
        srv.shutdown()


def test_style_route(rng, tmp_path):
    """POST /style drives StyleEditor end to end through a fake
    sd-webui server (reference capability:
    Web_UI/Component_Style_Editing.py style tab)."""
    import base64
    from test_style_and_fill import _FakeSD, _serve
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
    sd = _serve()
    cfg = KenBurnsConfig(max_size=48, num_frame=3, depth_field=False,
                         playback=False)
    pipe = KenBurnsPipeline(cfg)
    srv = serve(pipe, '127.0.0.1', 0, block=False,
                segmentor=FakeDetector())
    base = f'http://127.0.0.1:{srv.server_address[1]}'
    try:
        # the page advertises the tab
        r = requests.get(f'{base}/')
        assert '/style' in r.text and 'styRun' in r.text

        img = (rng.rand(80, 64, 3) * 255).astype(np.uint8)
        ok, enc = cv2.imencode('.png', img)
        payload = {
            'image': base64.b64encode(enc.tobytes()).decode(),
            'style_prompt': 'pixar style', 'long_side': 64,
            'steps': 2,
            'url': f'http://127.0.0.1:{sd.server_port}/sdapi/v1/img2img',
        }
        r = requests.post(f'{base}/style', data=json.dumps(payload))
        out = r.json()
        assert r.status_code == 200, out
        assert out['outputs'] == 1
        dec = cv2.imdecode(np.frombuffer(
            base64.b64decode(out['image']), np.uint8), cv2.IMREAD_COLOR)
        assert dec is not None and dec.shape[-1] == 3
        # bg repaint + one instance inpaint hit the sd server
        assert len(_FakeSD.calls) == 2
        assert 'pixar style' in _FakeSD.calls[0]['prompt']
    finally:
        srv.shutdown()
        sd.shutdown()


def test_mjpeg_live_stream(rng):
    """GET /get_live without fltTime is the reference's
    multipart/x-mixed-replace MJPEG stream (naive_interface.py:
    131-173): frames arrive continuously, per-t cache fills, and
    /update_mode switches automatic/manual playback."""
    cfg = KenBurnsConfig(max_size=48, num_frame=3, depth_field=False,
                         point_capacity_factor=1.2, playback=False)
    pipe = KenBurnsPipeline(cfg)
    srv = serve(pipe, '127.0.0.1', 0, block=False)
    base = f'http://127.0.0.1:{srv.server_address[1]}'
    try:
        img = (rng.rand(40, 48, 3) * 255).astype(np.uint8)
        ok, enc = cv2.imencode('.png', img)
        requests.post(f'{base}/load_image', data=enc.tobytes())

        r = requests.post(f'{base}/update_mode',
                          data=json.dumps({'mode': 'manual'}))
        assert r.json() == {'ok': True}

        r = requests.get(f'{base}/get_live', stream=True, timeout=120)
        assert 'multipart/x-mixed-replace' in r.headers['Content-Type']
        buf = b''
        for chunk in r.iter_content(4096):
            buf += chunk
            if buf.count(b'--frame') >= 3:
                break
        r.close()
        parts = [p for p in buf.split(b'--frame') if p.strip()]
        assert len(parts) >= 2
        head, _, jpeg = parts[0].partition(b'\r\n\r\n')
        assert b'image/jpeg' in head
        frame = cv2.imdecode(
            np.frombuffer(jpeg.rstrip(b'\r\n'), np.uint8),
            cv2.IMREAD_COLOR)
        assert frame is not None and frame.shape == (40, 48, 3)
        # manual mode holds t=0 → the per-t cache has one entry
        assert len(srv.service.frame_cache) == 1

        # bad mode → clean error
        r = requests.post(f'{base}/update_mode',
                          data=json.dumps({'mode': 'warp'}))
        assert r.status_code == 500

        # box update snaps the stream index and clears the cache
        requests.post(f'{base}/update_to',
                      data=json.dumps({'center_u': 30.0}))
        assert srv.service.int_time == 2
        assert len(srv.service.frame_cache) == 0
    finally:
        srv.shutdown()


def test_stepping_routes(rng):
    """Per-stage stepping (reference stepping-demonstration tab,
    Web_UI/Component/Component_AIS.py:493-787): /stages lists the
    recorded intermediates, /stage serves each preview,
    /autozoom_preview draws the camera crop boxes, /step_inpaint runs
    the inpaint passes and keeps the state for /get_result."""
    cfg = KenBurnsConfig(max_size=48, num_frame=3, depth_field=False,
                         point_capacity_factor=1.2, depth_est='default',
                         playback=False)
    pipe = KenBurnsPipeline(cfg)
    srv = serve(pipe, '127.0.0.1', 0, block=False)
    base = f'http://127.0.0.1:{srv.server_address[1]}'
    try:
        img = (rng.rand(40, 48, 3) * 255).astype(np.uint8)
        ok, enc = cv2.imencode('.png', img)
        meta = requests.post(f'{base}/load_image',
                             data=enc.tobytes()).json()
        names = requests.get(f'{base}/stages').json()['stages']
        assert meta['stages'] == names
        for needle in ('input', 'depth_coarse', 'depth_adjusted',
                       'depth_final'):
            assert needle in names, names
        # pipeline order, not alphabetical: input first, then the
        # depth stages coarse -> adjusted -> final
        assert names.index('input') == 0
        assert (names.index('depth_coarse')
                < names.index('depth_adjusted')
                < names.index('depth_final'))

        r = requests.get(f'{base}/stage?name=depth_final')
        assert r.status_code == 200
        im = cv2.imdecode(np.frombuffer(r.content, np.uint8),
                          cv2.IMREAD_COLOR)
        assert im.shape == (40, 48, 3)
        # unknown stage → clean error
        r = requests.get(f'{base}/stage?name=nope')
        assert r.status_code == 500 and 'no stage' in r.json()['error']

        r = requests.get(f'{base}/autozoom_preview')
        im = cv2.imdecode(np.frombuffer(r.content, np.uint8),
                          cv2.IMREAD_COLOR)
        assert im is not None and im.shape == (40, 48, 3)

        # prime the live-frame cache, then check step_inpaint drops it
        # (cached frames were rendered from the pre-inpaint cloud)
        requests.get(f'{base}/get_live?fltTime=0.5')
        assert srv.service.frame_cache
        out = requests.post(f'{base}/step_inpaint', data=b'{}').json()
        assert out['ok'] is True
        assert any(s.startswith('inpainted_') for s in out['stages'])
        assert srv.service.inpainted is True
        assert not srv.service.frame_cache
        # inpainted stages step AFTER the depth stages, in cloud order
        inp = [s for s in out['stages'] if s.startswith('inpainted_')]
        assert out['stages'].index(inp[0]) \
            > out['stages'].index('depth_final')
        assert inp == sorted(inp, key=lambda s: int(s.split('_')[1]))
        r = requests.get(f'{base}/stage?name=' + inp[0])
        assert r.status_code == 200

        # inpaint=0 export (reference IsInpainting checkbox,
        # Component_AIS.py:2185): still a playable mp4
        r = requests.get(f'{base}/get_result?inpaint=0')
        assert r.status_code == 200 and len(r.content) > 0

        # result reuses the inpainted state; box update invalidates
        # AND restores the pristine (pre-inpaint) cloud so the new
        # extremes don't stack passes onto stale inpainted points
        r = requests.get(f'{base}/get_result')
        assert r.status_code == 200 and len(r.content) > 0
        assert srv.service.state is not srv.service.pristine_state
        requests.post(f'{base}/update_to',
                      data=json.dumps({'center_u': 30.0}))
        assert srv.service.inpainted is False
        assert srv.service.state is srv.service.pristine_state

        # a fresh image resets the stage dict: no stale inpainted_N
        # previews from the previous image may survive
        img2 = (rng.rand(40, 48, 3) * 255).astype(np.uint8)
        ok, enc2 = cv2.imencode('.png', img2)
        meta2 = requests.post(f'{base}/load_image',
                              data=enc2.tobytes()).json()
        assert not any(s.startswith('inpainted_')
                       for s in meta2['stages'])
    finally:
        srv.shutdown()


def test_path_overlay_route(rng):
    """Camera-path scrub preview (VERDICT r4 item 10; reference
    stepping tab, Component_AIS.py:1424-1696): /path_overlay draws
    the from/to boxes + trajectory + the interpolated crop rectangle
    at t, centralise-clamped into the image."""
    from cartoonsegmentation_tpu.serving.interface import (
        _center_to_corner, _centralise_box)

    # the math helpers mirror the reference exactly
    assert _center_to_corner(10, 8, 6, 4) == (7, 6, 13, 10)
    # out-of-bounds left/top → shifted right/down to touch the edge
    assert _centralise_box(1, 1, 6, 4, 48, 40) == (3, 2)
    # out-of-bounds right/bottom → shifted back inside
    assert _centralise_box(47, 39, 6, 4, 48, 40) == (45, 38)
    # already inside → unchanged
    assert _centralise_box(24, 20, 6, 4, 48, 40) == (24, 20)

    cfg = KenBurnsConfig(max_size=48, num_frame=3, depth_field=False,
                         point_capacity_factor=1.2, depth_est='default',
                         playback=False)
    pipe = KenBurnsPipeline(cfg)
    srv = serve(pipe, '127.0.0.1', 0, block=False)
    base = f'http://127.0.0.1:{srv.server_address[1]}'
    try:
        # before an image is loaded → clean error
        r = requests.get(f'{base}/path_overlay?fltTime=0.5')
        assert r.status_code == 500 and 'no image' in r.json()['error']

        img = (rng.rand(40, 48, 3) * 255).astype(np.uint8)
        ok, enc = cv2.imencode('.png', img)
        requests.post(f'{base}/load_image', data=enc.tobytes())
        # give the path a nontrivial trajectory + zoom
        requests.post(f'{base}/update_to', data=json.dumps(
            {'center_u': 34.0, 'center_v': 26.0,
             'crop_w': 20, 'crop_h': 16}))

        def overlay(t):
            r = requests.get(f'{base}/path_overlay?fltTime={t}')
            assert r.status_code == 200
            im = cv2.imdecode(np.frombuffer(r.content, np.uint8),
                              cv2.IMREAD_COLOR)
            assert im is not None and im.shape == (40, 48, 3)
            return im

        o0, o5, o1 = overlay(0.0), overlay(0.5), overlay(1.0)
        # scrubbing moves the interpolated rectangle: each position
        # renders a different overlay
        assert (o0 != o5).any() and (o5 != o1).any()
        # out-of-range t clamps instead of erroring
        r = requests.get(f'{base}/path_overlay?fltTime=7')
        assert r.status_code == 200

        # the browser page wires the toggle to the route
        page = requests.get(f'{base}/').text
        assert '/path_overlay' in page and 'kb_path' in page

        # camera-views gallery (reference "Generate Camera View"
        # batched output, Component_AIS.py:1052-1262): n stepped
        # frames as b64 JPEGs, served through the per-t frame cache
        g = requests.get(f'{base}/frames_gallery?n=3').json()
        assert g['count'] == 3 and len(g['frames']) == 3
        import base64 as _b64
        for fr in g['frames']:
            im = cv2.imdecode(np.frombuffer(_b64.b64decode(fr),
                                            np.uint8), cv2.IMREAD_COLOR)
            assert im is not None and im.shape == (40, 48, 3)
        assert len(srv.service.frame_cache) >= 3   # cache populated
        # n clamps to [2, 16]
        assert requests.get(
            f'{base}/frames_gallery?n=99').json()['count'] == 16
        assert '/frames_gallery' in page and 'kbViews' in page
    finally:
        srv.shutdown()


def test_style_prepare_apply(rng):
    """Per-instance style editing round-trip (reference interaction:
    Web_UI/Component/Component_Style_Editing.py:1345-2219):
    /style_prepare returns editable per-instance masks + prompts;
    /style_apply repaints with the (edited) rows."""
    import base64
    from test_style_and_fill import _FakeSD, _serve
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
    sd = _serve()
    cfg = KenBurnsConfig(max_size=48, num_frame=3, depth_field=False,
                         playback=False)
    pipe = KenBurnsPipeline(cfg)
    srv = serve(pipe, '127.0.0.1', 0, block=False,
                segmentor=FakeDetector())
    base = f'http://127.0.0.1:{srv.server_address[1]}'
    try:
        # the page ships the editing UI
        r = requests.get(f'{base}/')
        for needle in ('/style_prepare', '/style_apply', 'styApply',
                       'makeRow', '/step_inpaint', 'autozoom_preview'):
            assert needle in r.text, needle

        img = (rng.rand(80, 64, 3) * 255).astype(np.uint8)
        ok, enc = cv2.imencode('.png', img)
        payload = {
            'image': base64.b64encode(enc.tobytes()).decode(),
            'style_prompt': 'pixar style', 'long_side': 64,
            'steps': 2,
            'url': f'http://127.0.0.1:{sd.server_port}'
                   '/sdapi/v1/img2img',
        }
        prep = requests.post(f'{base}/style_prepare',
                             data=json.dumps(payload)).json()
        assert len(prep['instances']) == 1
        mask = cv2.imdecode(np.frombuffer(
            base64.b64decode(prep['instances'][0]['mask']), np.uint8),
            cv2.IMREAD_GRAYSCALE)
        assert mask.max() == 255 and mask.min() == 0

        # user edits: change the instance prompt, keep the mask
        apply_payload = dict(payload)
        apply_payload.update({
            'image': prep['image'], 'bg': prep['bg'],
            'mask_fg': prep['mask_fg'],
            'bg_prompt': 'edited background tags',
            'instances': [{'mask': prep['instances'][0]['mask'],
                           'prompt': 'edited instance tags'}],
        })
        out = requests.post(f'{base}/style_apply',
                            data=json.dumps(apply_payload)).json()
        assert out.get('error') is None, out
        assert out['outputs'] == 1
        dec = cv2.imdecode(np.frombuffer(
            base64.b64decode(out['image']), np.uint8),
            cv2.IMREAD_COLOR)
        assert dec is not None and dec.shape[-1] == 3
        # bg repaint + the edited instance inpaint hit the sd server,
        # with the EDITED prompts
        assert len(_FakeSD.calls) == 2
        assert 'edited instance tags' in _FakeSD.calls[1]['prompt']
    finally:
        srv.shutdown()
        sd.shutdown()


def test_webui_js_static_integrity():
    """The served page's inline JS: balanced brackets, every
    getElementById target present in the markup, every onclick/
    onchange handler defined. No browser exists in this image, so
    this (plus the route tests mirroring each fetch sequence) is the
    UI-regression net."""
    import re

    from cartoonsegmentation_tpu.serving.webui import PAGE_HTML
    blocks = re.findall(r'<script[^>]*>(.*?)</script>', PAGE_HTML,
                        re.S)
    assert blocks, 'no <script> block found in PAGE_HTML'
    js = '\n'.join(blocks)
    for o, c in (('{', '}'), ('(', ')'), ('[', ']')):
        assert js.count(o) == js.count(c), \
            f'unbalanced {o}{c}: {js.count(o)} vs {js.count(c)}'
    ids_used = set(re.findall(r"getElementById\('([\w-]+)'\)", js))
    ids_defined = set(re.findall(r'id="([\w-]+)"', PAGE_HTML))
    dynamic = {i for i in ids_used if i.startswith('ins_')}
    missing = ids_used - ids_defined - dynamic
    assert not missing, f'JS references missing ids: {missing}'
    handlers = set(re.findall(r'on(?:click|change)="(\w+)\(',
                              PAGE_HTML))
    defined = set(re.findall(r'(?:async )?function (\w+)', js))
    assert handlers <= defined, \
        f'undefined handlers: {handlers - defined}'


def test_style_options_model_and_batch(rng, tmp_path):
    """The style tab's sd-webui enumeration (models + samplers into
    dropdowns, reference Web_UI/Common/Utility_Model.py:1-79 /
    Utility_Sampler.py:1-31), model switching, and batch-directory
    processing (reference run_style.py directory input) — VERDICT r4
    item 6, against the fake sd server."""
    from test_style_and_fill import _FakeSD, _serve

    _FakeSD.calls.clear()
    _FakeSD.options = {'sd_model_checkpoint': 'anything-v5 [abc123]'}
    sd = _serve()
    sd_url = f'http://127.0.0.1:{sd.server_port}/sdapi/v1/img2img'
    cfg = KenBurnsConfig(max_size=48, num_frame=3, depth_field=False,
                         playback=False)
    pipe = KenBurnsPipeline(cfg)
    srv = serve(pipe, '127.0.0.1', 0, block=False)
    base = f'http://127.0.0.1:{srv.server_address[1]}'
    try:
        # the page exposes the dropdowns + batch controls
        page = requests.get(f'{base}/').text
        for needle in ('sty_model', 'sty_sampler', 'styOptions',
                       'styModel', 'sty_bdir', 'styBatch'):
            assert needle in page

        # live enumeration against the fake server
        r = requests.get(f'{base}/style_options?url={sd_url}')
        j = r.json()
        assert j['live'] is True
        assert j['samplers'] == ['Euler a', 'DPM++ 2M Karras', 'DDIM']
        assert j['models'] == ['anything-v5 [abc123]',
                               'counterfeit-v3 [def456]']
        assert j['current_model'] == 'anything-v5 [abc123]'

        # model switch round-trips into the sd server's options
        r = requests.post(f'{base}/style_model', data=json.dumps(
            {'url': sd_url, 'model': 'counterfeit-v3 [def456]'}))
        assert r.json()['ok'] is True
        assert _FakeSD.options['sd_model_checkpoint'] == \
            'counterfeit-v3 [def456]'

        # unreachable server → graceful fallback, not a 500
        r = requests.get(f'{base}/style_options?url='
                         'http://127.0.0.1:1/sdapi/v1/img2img')
        j = r.json()
        assert j['live'] is False and j['models'] == []
        from cartoonsegmentation_tpu.serving.sd_webui import \
            SAMPLER_FALLBACK
        assert j['samplers'] == SAMPLER_FALLBACK

        # batch-directory processing (whole-image mode: no detector
        # needed) — one img2img per image, outputs in save_dir
        d = tmp_path / 'batch'
        d.mkdir()
        for name in ('x.png', 'y.jpg'):
            cv2.imwrite(str(d / name),
                        (rng.rand(40, 40, 3) * 255).astype(np.uint8))
        (d / 'notes.txt').write_text('skip me')
        r = requests.post(f'{base}/style_batch', data=json.dumps(
            {'dir': str(d), 'whole_image': True, 'url': sd_url,
             'style_prompt': 'pixar', 'steps': 2,
             'save_dir': str(tmp_path / 'out')}))
        j = r.json()
        assert r.status_code == 200, j
        assert j['count'] == 2
        assert all('saved' in x for x in j['results'])
        assert (tmp_path / 'out' / 'repaint-default-x.png').exists()
        assert (tmp_path / 'out' / 'repaint-default-y.png').exists()
        assert len(_FakeSD.calls) == 2

        # error paths: bad dir → clean error; per-instance mode
        # without a segmentor → clear message
        r = requests.post(f'{base}/style_batch', data=json.dumps(
            {'dir': str(tmp_path / 'nope')}))
        assert r.status_code == 500
        assert 'not a directory' in r.json()['error']
        r = requests.post(f'{base}/style_batch', data=json.dumps(
            {'dir': str(d), 'url': sd_url}))
        assert r.status_code == 500
        assert 'no segmentor' in r.json()['error']
    finally:
        srv.shutdown()
        sd.shutdown()


def test_config_marigold_rebuild():
    """Changing a marigold_* knob through set_config must rebuild the
    estimator from the new cfg while transferring loaded weights
    (advisor round-2 medium finding: the old object carried its baked
    sampler knobs across the rebuild)."""
    from cartoonsegmentation_tpu.serving.interface import \
        KenBurnsService

    cfg = KenBurnsConfig(max_size=48, num_frame=3, depth_field=False,
                         playback=False)
    pipe = KenBurnsPipeline(cfg)
    svc = KenBurnsService(pipe)
    m = pipe._ensure_marigold()
    m.variables = {'sentinel': np.zeros(1)}
    out = svc.set_config({'marigold_steps': 7})
    assert 'marigold_steps' in out['changed']
    m2 = svc.pipe._marigold
    assert m2 is not m
    assert m2.denoise_steps == 7
    assert m2.variables is m.variables      # weights carried over

    # non-marigold knob keeps the object untouched
    svc.set_config({'num_frame': 2})
    assert svc.pipe._marigold is m2


def test_config_route_switches_pipeline(rng):
    """POST /config rebuilds the pipeline with new knobs, keeps
    loaded weights, and drops the cached image state."""
    cfg = KenBurnsConfig(max_size=48, num_frame=3, depth_field=False,
                         point_capacity_factor=1.2,
                         depth_est='default', playback=False)
    pipe = KenBurnsPipeline(cfg)
    sentinel_vars = {'marker': np.zeros(1)}
    pipe._leres_vars = sentinel_vars
    srv = serve(pipe, '127.0.0.1', 0, block=False)
    port = srv.server_address[1]
    base = f'http://127.0.0.1:{port}'
    try:
        img = (rng.rand(40, 48, 3) * 255).astype(np.uint8)
        ok, enc = cv2.imencode('.png', img)
        requests.post(f'{base}/load_image', data=enc.tobytes())
        assert requests.get(f'{base}/health').json()['loaded'] is True

        r = requests.post(f'{base}/config', data=json.dumps(
            {'depth_field': True, 'num_frame': 2,
             'dof_num_samples': 8, 'depth_factor': 2,
             'unknown_key': 1}))
        body = r.json()
        assert body['ok'] is True
        assert set(body['changed']) == {'depth_field', 'num_frame',
                                        'dof_num_samples',
                                        'depth_factor'}
        h = requests.get(f'{base}/health').json()
        assert h['loaded'] is False            # state dropped
        assert h['config']['depth_field'] is True
        assert h['config']['num_frame'] == 2
        assert h['config']['depth_factor'] == 2

        # weights carried to the rebuilt pipeline; it still serves
        requests.post(f'{base}/load_image', data=enc.tobytes())
        r = requests.get(f'{base}/get_live?fltTime=0.5')
        assert r.status_code == 200

        # detector switch: carried while unchanged, dropped when the
        # family changes (rebuilds lazily via ensure_detector)
        svc = srv.service
        sentinel = object()
        svc.pipe._detector = sentinel
        requests.post(f'{base}/config',
                      data=json.dumps({'num_frame': 3}))
        assert svc.pipe._detector is sentinel
        r = requests.post(f'{base}/config',
                          data=json.dumps({'detector': 'maskrcnn'}))
        assert 'detector' in r.json()['changed']
        assert svc.pipe.cfg.detector == 'maskrcnn'
        assert svc.pipe._detector is not sentinel

        # stage_previews (the Setting tab's Verbose): a LIVE pipeline
        # attribute toggle — no rebuild, reflected in /health
        before = svc.pipe
        r = requests.post(f'{base}/config',
                          data=json.dumps({'stage_previews': False}))
        assert r.json()['changed'] == ['stage_previews']
        assert svc.pipe is before            # same pipeline object
        assert svc.pipe.stage_previews is False
        h = requests.get(f'{base}/health').json()
        assert h['config']['stage_previews'] is False

        # COMBINED payload: stage_previews together with a rebuild key
        # (exactly what the webui cfgApply sends) — the rebuilt
        # pipeline must keep the toggle, not reset it to the default
        # (ADVICE r4 medium finding)
        r = requests.post(f'{base}/config', data=json.dumps(
            {'stage_previews': False, 'num_frame': 4}))
        assert 'num_frame' in r.json()['changed']
        assert svc.pipe is not before        # rebuilt
        assert svc.pipe.stage_previews is False
        # and flipping it back ON alongside a rebuild key works too
        r = requests.post(f'{base}/config', data=json.dumps(
            {'stage_previews': True, 'num_frame': 5}))
        assert svc.pipe.stage_previews is True

        # auto_zoom off through /config: next load uses the plain
        # centered-zoom path (objTo center == objFrom center)
        requests.post(f'{base}/config',
                      data=json.dumps({'auto_zoom': False}))
        r = requests.post(f'{base}/load_image', data=enc.tobytes())
        j = r.json()
        assert j['objTo']['center_u'] == j['objFrom']['center_u']
        assert j['objTo']['center_v'] == j['objFrom']['center_v']
        assert j['objTo']['crop_w'] < j['objFrom']['crop_w']
    finally:
        srv.shutdown()


def test_config_detector_switch_carries_box_weights():
    """Switching the detector FAMILY at runtime transfers the loaded
    AnimeInsSeg box-detector weights into the new family (both
    'animeinsseg' and 'sam' carry one) instead of silently falling
    back to random init."""
    from cartoonsegmentation_tpu.pipeline import AnimeInsSeg
    from cartoonsegmentation_tpu.pipeline.sam import SamDetector
    from cartoonsegmentation_tpu.serving.interface import \
        KenBurnsService
    cfg = KenBurnsConfig(max_size=48, num_frame=2, depth_field=False,
                         point_capacity_factor=1.2,
                         depth_est='default', playback=False,
                         detector='animeinsseg')
    pipe = KenBurnsPipeline(cfg)
    pipe.ensure_detector()
    marker = {'params': 'sentinel'}
    pipe._detector.load_variables(marker)
    svc = KenBurnsService(pipe)

    svc.set_config({'detector': 'sam'})
    d = svc.pipe._detector
    assert isinstance(d, SamDetector)
    assert d.box_detector._variables is marker

    svc.set_config({'detector': 'animeinsseg'})
    d2 = svc.pipe._detector
    assert isinstance(d2, AnimeInsSeg)
    assert d2._variables is marker

    # maskrcnn has no AnimeInsSeg inside: switch must still work
    svc.set_config({'detector': 'maskrcnn'})
    from cartoonsegmentation_tpu.pipeline.maskrcnn_det import \
        MaskRCNNDetector
    assert isinstance(svc.pipe._detector, MaskRCNNDetector)
