"""Pipeline integration tests (small shapes, CPU, random weights)."""
import numpy as np
import jax.numpy as jnp

from cartoonsegmentation_tpu.config import KenBurnsConfig
from cartoonsegmentation_tpu.instances import Instances
from cartoonsegmentation_tpu.pipeline import (
    KenBurnsPipeline, PointCloud, adjust_disparity_by_instances,
)


def test_pointcloud_append_masked():
    pc = PointCloud.with_capacity(8)
    pts = np.arange(18, dtype=np.float32).reshape(6, 3) + 1
    cols = pts.copy()
    mask = np.array([1, 0, 1, 1, 0, 1], bool)
    pc = pc.append_masked(jnp.asarray(pts), jnp.asarray(cols),
                          jnp.asarray(pts[:, 0]), jnp.asarray(pts[:, 1]),
                          jnp.asarray(mask))
    assert int(pc.count) == 4
    got = np.asarray(pc.points[:4])
    np.testing.assert_allclose(got, pts[mask])
    # overflow is dropped, count saturates
    pc2 = pc.append_masked(jnp.asarray(pts), jnp.asarray(cols),
                           jnp.asarray(pts[:, 0]), jnp.asarray(pts[:, 1]),
                           jnp.ones(6, bool))
    assert int(pc2.count) == 8
    np.testing.assert_allclose(np.asarray(pc2.points[4:8]), pts[:4])


def test_adjust_disparity_feet_anchor():
    H = W = 20
    disp = np.tile(np.linspace(1, 2, H)[:, None], (1, W)).astype(np.float32)
    mask = np.zeros((H, W), bool)
    mask[5:15, 5:15] = True  # bottom row 14 → value = disp[14] region max
    ins = Instances.from_numpy(mask[None], np.array([[5, 5, 10, 10]],
                                                    np.float32), capacity=2)
    out = np.asarray(adjust_disparity_by_instances(jnp.asarray(disp), ins))
    # inside the mask: flattened to the max over rows >= 5+0.97*9≈14
    inside = out[mask]
    assert np.allclose(inside, inside[0])
    assert np.isclose(inside[0], disp[14, 5])
    # outside unchanged
    assert np.allclose(out[~mask], disp[~mask])


def test_kenburns_end_to_end_tiny(rng):
    """Full run (random weights) on a tiny image: state → autozoom →
    inpaint passes → scan render. Checks shapes/dtypes/finiteness."""
    cfg = KenBurnsConfig(max_size=64, num_frame=5, depth_field=False,
                         point_capacity_factor=1.5, discfill_max_steps=16,
                         auto_zoom=True)
    pipe = KenBurnsPipeline(cfg)
    img = (rng.rand(48, 64, 3) * 255).astype(np.uint8)

    state = pipe.generate_state(img)
    assert state.image.shape == (48, 64, 3)
    assert int(state.cloud.count) == 48 * 64

    obj_from, obj_to = pipe.autozoom(state)
    assert obj_to['crop_w'] == int(round(obj_from['crop_w'] / 1.25))

    frames = pipe.process_kenburns(state, obj_from, obj_to)
    assert frames.shape == (5, 48, 64, 3)
    assert frames.dtype == np.uint8
    # frame 0 (no shift beyond autozoom midpoint...) should be a real
    # image, not all black
    assert frames[0].mean() > 1.0


def test_kenburns_run_video_path(rng, tmp_path):
    """KenBurnsPipeline.run with a video path — the flagship
    image→mp4 route bench.py's clip_wall_s times (generate_state →
    autozoom → inpaint passes → compact → streaming render+encode).
    Parity: the whole of reference run_kenburns.py:19-41."""
    import cv2
    cfg = KenBurnsConfig(max_size=64, num_frame=4, depth_field=False,
                         point_capacity_factor=1.5, detector='none',
                         discfill_max_steps=16, playback=False)
    pipe = KenBurnsPipeline(cfg)
    img = (rng.rand(48, 64, 3) * 255).astype(np.uint8)
    path = str(tmp_path / 'clip.mp4')
    frames = pipe.run(img, video_path=path)
    assert frames.shape == (4, 48, 64, 3)
    assert frames.dtype == np.uint8
    assert frames[0].mean() > 1.0
    cap = cv2.VideoCapture(path)
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 4
    cap.release()
    # inpaint+render stages were actually timed
    assert pipe.timer.seconds.get('inpaint_passes', 0) > 0
    assert pipe.timer.seconds.get('render_stream+encode', 0) > 0
    # the streaming route attributes its {render, transfer, encode}
    # phases (VERDICT r4 item 1); the threaded encoder must have
    # actually encoded (encode time accrues in the worker thread)
    for k in ('stream_render', 'stream_transfer', 'stream_encode'):
        assert k in pipe.timer.seconds, k
    assert pipe.timer.seconds['stream_encode'] > 0


def test_kenburns_depth_field_path(rng):
    cfg = KenBurnsConfig(max_size=48, num_frame=2, depth_field=True,
                         dof_num_samples=8, point_capacity_factor=1.2,
                         discfill_max_steps=16)
    pipe = KenBurnsPipeline(cfg)
    img = (rng.rand(32, 48, 3) * 255).astype(np.uint8)
    state = pipe.generate_state(img)
    obj_from, obj_to = pipe.autozoom(state)
    frames = pipe.process_kenburns(state, obj_from, obj_to, inpaint=False)
    assert frames.shape == (2, 32, 48, 3)
    assert np.isfinite(frames.astype(np.float32)).all()


def test_kenburns_patchmatch_inpaint_type(rng):
    """'patchmatch' inpaint routes through the native C++ library."""
    cfg = KenBurnsConfig(max_size=48, num_frame=2, depth_field=False,
                         inpaint_type='patchmatch', depth_est='default',
                         point_capacity_factor=1.3)
    pipe = KenBurnsPipeline(cfg)
    img = (rng.rand(40, 48, 3) * 255).astype(np.uint8)
    state = pipe.generate_state(img)
    obj_from, obj_to = pipe.autozoom(state)
    frames = pipe.process_kenburns(state, obj_from, obj_to, inpaint=True)
    assert frames.shape == (2, 40, 48, 3)
    assert np.isfinite(frames.astype(np.float32)).all()


def test_stream_video(rng, tmp_path):
    """Chunked overlapped transfer writes the same palindrome mp4 as
    write_video and returns the forward frames."""
    import cv2
    import jax.numpy as jnp
    from cartoonsegmentation_tpu.pipeline import stream_video

    frames = (rng.rand(7, 32, 48, 3) * 255).astype(np.uint8)
    p1 = str(tmp_path / 'a.mp4')
    p2 = str(tmp_path / 'b.mp4')
    got = stream_video(jnp.asarray(frames), p1, playback=True, chunk=3,
                       yuv420=False)
    np.testing.assert_array_equal(got, frames)
    from cartoonsegmentation_tpu.pipeline import write_video
    write_video(frames, p2, playback=True)
    c1 = cv2.VideoCapture(p1)
    c2 = cv2.VideoCapture(p2)
    n1 = int(c1.get(cv2.CAP_PROP_FRAME_COUNT))
    n2 = int(c2.get(cv2.CAP_PROP_FRAME_COUNT))
    c1.release(); c2.release()
    assert n1 == n2 == 7 + 5


def test_stream_encoder_error_raises_not_hangs(rng, tmp_path,
                                               monkeypatch):
    """An exception in the threaded encoder (e.g. disk full mid
    vw.write, or decode failure) must surface as a raise — the
    BOUNDED chunk queue means a dead consumer would otherwise
    deadlock the producer's q.put forever (r5 review finding: the
    worker keeps draining after an error so join()+re-raise run)."""
    from cartoonsegmentation_tpu.config import KenBurnsConfig
    from cartoonsegmentation_tpu.pipeline import KenBurnsPipeline
    from cartoonsegmentation_tpu.utils import image as img_mod

    import threading

    def run_with_watchdog(fn, timeout=300):
        # a reappearing deadlock must FAIL the test, not hang the
        # suite: run in a daemon thread and bound the join
        res = {}

        def target():
            try:
                fn()
                res['ok'] = True
            except Exception as e:  # noqa: BLE001
                res['err'] = e
        th = threading.Thread(target=target, daemon=True)
        th.start()
        th.join(timeout=timeout)
        assert not th.is_alive(), \
            'render hung — encoder deadlock regression'
        return res

    def boom(arr):
        raise RuntimeError('decode exploded')

    monkeypatch.setattr(img_mod, 'i420_to_bgr_host', boom)
    cfg = KenBurnsConfig(max_size=64, num_frame=12, depth_field=False,
                         point_capacity_factor=1.5, detector='none',
                         discfill_max_steps=8, playback=False)
    pipe = KenBurnsPipeline(cfg)
    img = (rng.rand(48, 64, 3) * 255).astype(np.uint8)
    state = pipe.generate_state(img)
    obj_from, obj_to = pipe.autozoom(state)
    steps = np.linspace(0.0, 1.0, cfg.num_frame)
    # chunk=2 → 6 chunks > queue maxsize 4: without the mid-loop
    # drain, this hangs instead of raising
    res = run_with_watchdog(lambda: pipe.render_frames_stream(
        state, obj_from, obj_to, steps, str(tmp_path / 'x.mp4'),
        chunk=2))
    assert 'decode exploded' in str(res.get('err'))

    # second deadlock mode (r5 review): the error fires in the
    # PALINDROME tail, after the sentinel was consumed — the drain
    # must not block on the then-empty queue
    monkeypatch.undo()
    import cv2
    RealWriter = cv2.VideoWriter

    class FailingTailWriter:
        def __init__(self, *a, **k):
            self._vw = RealWriter(*a, **k)
            self.n = 0

        def write(self, f):
            self.n += 1
            if self.n > 12:         # all 12 forward frames ok
                raise RuntimeError('tail write exploded')
            return self._vw.write(f)

        def release(self):
            return self._vw.release()

    cfg2 = cfg.replace(playback=True)
    pipe2 = KenBurnsPipeline(cfg2)
    state2 = pipe2.generate_state(img)
    o_f, o_t = pipe2.autozoom(state2)
    # render_frames_stream does `import cv2` at call time, so
    # patching the module attribute reaches it
    monkeypatch.setattr(cv2, 'VideoWriter', FailingTailWriter)
    res = run_with_watchdog(lambda: pipe2.render_frames_stream(
        state2, o_f, o_t, steps, str(tmp_path / 'y.mp4'), chunk=2))
    assert 'tail write exploded' in str(res.get('err'))


def test_bgr_to_i420_matches_cv2(rng):
    """Device-side I420 packing matches cv2.COLOR_BGR2YUV_I420 to
    within 1 LSB (OpenCV's SIMD path rounds a hair differently on
    ~0.5% of bytes; invisible pre-encode)."""
    import cv2
    import jax.numpy as jnp
    from cartoonsegmentation_tpu.utils.image import bgr_to_i420

    frames = (rng.rand(3, 64, 96, 3) * 255).astype(np.uint8)
    mine = np.asarray(bgr_to_i420(jnp.asarray(frames)))
    ref = np.stack([cv2.cvtColor(f, cv2.COLOR_BGR2YUV_I420)
                    for f in frames])
    assert mine.shape == ref.shape == (3, 96, 96)
    d = np.abs(mine.astype(int) - ref.astype(int))
    assert d.max() <= 1
    assert (d > 0).mean() < 0.02


def test_stream_video_yuv420_roundtrip(rng, tmp_path):
    """stream_video's halved-transfer I420 path: smooth frames
    round-trip through device I420 → host BGR within quantization
    error, and the mp4 has the palindrome frame count."""
    import cv2
    import jax.numpy as jnp
    from cartoonsegmentation_tpu.pipeline import stream_video

    # smooth gradient frames (chroma subsampling is lossless-ish on
    # smooth content; random noise would alias)
    t = np.linspace(0, 1, 5, dtype=np.float32)[:, None, None, None]
    yy = np.linspace(0, 1, 32, dtype=np.float32)[None, :, None, None]
    xx = np.linspace(0, 1, 48, dtype=np.float32)[None, None, :, None]
    frames = ((0.2 + 0.6 * (0.5 * t + 0.3 * yy + 0.2 * xx))
              * 255).astype(np.uint8).repeat(3, axis=3)
    p = str(tmp_path / 'yuv.mp4')
    got = stream_video(jnp.asarray(frames), p, playback=True, chunk=2)
    assert got.shape == frames.shape
    d = np.abs(got.astype(int) - frames.astype(int))
    assert d.max() <= 4, d.max()
    cap = cv2.VideoCapture(p)
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 5 + 3
    cap.release()


def test_stream_video_odd_dims_fallback(rng, tmp_path):
    """Odd frame heights can't be I420-packed — stream_video must fall
    back to raw BGR transfer and stay byte-exact."""
    import jax.numpy as jnp
    from cartoonsegmentation_tpu.pipeline import stream_video

    frames = (rng.rand(3, 30, 47, 3) * 255).astype(np.uint8)
    got = stream_video(jnp.asarray(frames),
                       str(tmp_path / 'odd.mp4'), playback=False)
    np.testing.assert_array_equal(got, frames)


def test_render_frames_stream_matches_batch(rng, tmp_path):
    """The chunked streaming renderer (render + D2H + encode
    overlapped) must produce byte-identical frames to the one-scan
    render_frames — same compiled per-frame program, chunk padding
    dropped, focal planes from the global first frame — and write a
    playable mp4."""
    import cv2
    cfg = KenBurnsConfig(max_size=64, num_frame=5, depth_field=True,
                         point_capacity_factor=1.5,
                         discfill_max_steps=16, playback=True)
    pipe = KenBurnsPipeline(cfg)
    img = (rng.rand(48, 64, 3) * 255).astype(np.uint8)
    state = pipe.generate_state(img)
    obj_from, obj_to = pipe.autozoom(state)
    state = pipe.compact_state(state)
    steps = np.linspace(0.0, 1.0, 5)
    want = pipe.render_frames(state, obj_from, obj_to, steps,
                              depth_field=True)
    path = str(tmp_path / 'stream.mp4')
    got = pipe.render_frames_stream(state, obj_from, obj_to, steps,
                                    path, depth_field=True, chunk=2,
                                    yuv420=False)
    np.testing.assert_array_equal(got, want)
    # default I420 link format: lossy 4:2:0 chroma (mp4 stores 4:2:0
    # anyway), luma near-exact
    got420 = pipe.render_frames_stream(state, obj_from, obj_to, steps,
                                       path, depth_field=True, chunk=2)
    assert got420.shape == want.shape
    cap = cv2.VideoCapture(path)
    # playback palindrome: 5 forward + 3 reversed interior
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 8
    cap.release()


def test_run_installs_detector_by_default(rng, tmp_path):
    """run() always segments like the reference's
    generate_kenburns_config (kenburns_effect.py:915): the configured
    detector is auto-installed and its stage lands in the timer and
    stage previews."""
    from cartoonsegmentation_tpu.config import KenBurnsConfig
    cfg = KenBurnsConfig(max_size=64, det_size=64, num_frame=2,
                         depth_field=False, depth_est='default',
                         refine_method='none', max_instances=4,
                         point_capacity_factor=1.5, playback=False)
    pipe = KenBurnsPipeline(cfg)
    img = (rng.rand(48, 64, 3) * 255).astype(np.uint8)
    frames = pipe.run(img)
    assert frames.shape == (2, 48, 64, 3)
    assert pipe._detector is not None
    assert pipe.timer.seconds.get('detector', 0) > 0
    assert 'instances' in pipe.stages


def test_masked_median_u8_oracle(rng):
    """Histogram median == numpy lower-median over rounded values,
    per instance; invalid or empty slots give -inf."""
    import jax.numpy as jnp
    from cartoonsegmentation_tpu.pipeline.depth import masked_median_u8

    H, W = 13, 17
    vals = (rng.rand(H, W) * 255).astype(np.float32)
    N = 5
    masks = rng.rand(N, H, W) > 0.6
    masks[3] = False                     # valid but empty mask
    valid = np.array([1, 1, 0, 1, 1], bool)
    got = np.asarray(masked_median_u8(
        jnp.asarray(vals), jnp.asarray(masks), jnp.asarray(valid),
        chunk=64))
    q = np.clip(np.round(vals), 0, 255)
    for i in range(N):
        if not valid[i] or not masks[i].any():
            assert got[i] == -np.inf, i
        else:
            s = np.sort(q[masks[i]])
            assert got[i] == s[(len(s) - 1) // 2], i


def test_capacity_100_group_shot(rng):
    """Reference-parity instance capacity: 40 instances (past the old
    16 cap) flow through adjust → focal-plane median → render without
    being dropped (reference infer caps at 100,
    animeinsseg/__init__.py:417)."""
    H, W = 40, 48
    n = 40
    masks = np.zeros((n, H, W), bool)
    boxes = np.zeros((n, 4), np.float32)
    for i in range(n):
        y, x = (i // 8) * 5, (i % 8) * 6
        masks[i, y:y + 4, x:x + 5] = True
        boxes[i] = [x, y, 5, 4]
    ins = Instances.from_numpy(masks, boxes, capacity=100)
    assert int(ins.count()) == 40

    cfg = KenBurnsConfig(max_size=48, num_frame=2, depth_field=True,
                         dof_num_samples=4, point_capacity_factor=1.2,
                         discfill_max_steps=8, depth_est='default',
                         detector='none')
    assert cfg.max_instances == 100      # shipped default
    pipe = KenBurnsPipeline(cfg)
    img = (rng.rand(H, W, 3) * 255).astype(np.uint8)
    state = pipe.generate_state(img, instances=ins)
    assert int(state.instances.count()) == 40   # nothing dropped
    obj_from, obj_to = pipe.autozoom(state)
    frames = pipe.process_kenburns(state, obj_from, obj_to,
                                   inpaint=False)
    assert frames.shape == (2, H, W, 3)
    assert np.isfinite(frames.astype(np.float32)).all()
