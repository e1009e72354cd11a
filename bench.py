"""Benchmark: the full flagship 3D-Ken-Burns workload (reference
configs/3dkenburns.yaml defaults: detector + ISNet mask refine +
LeReS depth + autozoom + 2 inpaint passes + 75 frames @ max_size
1024 with depth-of-field, on one real TPU chip).

Prints the headline JSON line
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
IMMEDIATELY after the render measurement (so a later timeout cannot
forfeit the number), then runs secondary phases behind a wall-clock
budget (env BENCH_BUDGET_S, default 2200 s) and re-prints the same
headline enriched with their results as the final line. The clip
phase prints a second headline, `kenburns_clip_wall_s` — the
user-facing image→mp4 latency with per-stage attribution and the
in-run tunnel-bandwidth probe that makes it interpretable. Every phase
logs a timestamp to stderr so a timeout is diagnosable (the r3 run
died in an un-attributed 25-minute compile).

The reference publishes no numbers (BASELINE.md), so vs_baseline is
the real-time factor against the 25 fps output video rate — the
reference pipeline renders well below 1.0x on its shipped defaults.

Timing discipline: every phase is compile-separated (one warm-up run
first), every re-timed execution perturbs its inputs with OS-entropy
randomness (the runtime memoizes identical-input executions ACROSS
processes — CLAUDE.md), and compiles go through a persistent
on-disk cache (.jax_cache/) so a subsequent bench process on this
machine skips them entirely.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

T0 = time.time()
# 2200 default: the FIRST device interaction of a fresh process pays
# the tunnel/device cold start (observed 5-17 min, absorbed by the
# opening bandwidth probe); every phase prints its JSON as soon as it
# completes, so an external kill still preserves the numbers so far
BUDGET = float(os.environ.get('BENCH_BUDGET_S', '2200'))


def log(msg: str) -> None:
    print(f'[bench +{time.time() - T0:7.1f}s] {msg}', file=sys.stderr,
          flush=True)


def remaining() -> float:
    return BUDGET - (time.time() - T0)


def tunnel_probe(entropy, mb: int = 48):
    """In-run raw link bandwidth (VERDICT r4 item 1): time a fixed
    ~`mb` MB H2D push and D2H pull of fresh OS-entropy bytes →
    (H2D MB/s, D2H MB/s). Fresh data per call — raw transfers aren't
    execution-memoized, but regimes drift, so callers probe at the
    point in the run whose numbers they want to interpret.

    device_put through this tunnel is LAZY: block_until_ready returns
    before the bytes actually cross, so the H2D timing forces
    materialization with a device-side reduction (jitted; warmed up
    first so its compile/dispatch isn't in the timing), and a 1 MB
    warm-up round trip precedes both directions."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def touch(x):
        return x.sum()

    # warm-up: compile `touch` AT THE PROBE SHAPE (zeros — content
    # doesn't matter, this round trip is untimed) + one small pull
    w = np.zeros((mb, 1024, 1024), dtype=np.uint8)
    dw = jax.device_put(w)
    jax.block_until_ready(touch(dw))
    np.asarray(jax.device_get(dw[:1]))
    del dw
    a = entropy.integers(0, 255, (mb, 1024, 1024), dtype=np.uint8)
    t0 = time.time()
    d = jax.device_put(a)
    jax.block_until_ready(touch(d))                     # forces the push
    h2d = mb / (time.time() - t0)
    t0 = time.time()
    np.asarray(jax.device_get(d))
    d2h = mb / (time.time() - t0)
    del d
    return round(h2d, 1), round(d2h, 1)


def matmul_peak(entropy):
    """Measured bf16 matmul roofline on THIS chip in THIS run
    (VERDICT r4 item 2) — replaces the hard-coded 25e12 sanity
    constant. A chain of large (4096²·bf16) matmuls inside lax.scan,
    timed with the same two-scan-lengths differencing discipline as
    det_bench (cancels the H2D of the fresh seed input and the
    dispatch overhead); analytic FLOPs (exact for matmuls). Returns
    TFLOP/s or None if the measurement is unusable.

    Measured r5: 190.5 TFLOP/s — essentially the v5e paper bf16 peak
    (197), i.e. the chip computes at FULL speed and only the tunnel
    link is slow. This replaced the old hard-coded 25e12 'best
    sustained through this tunnel' guess, which undersold the chip
    by ~8x."""
    import jax
    import jax.numpy as jnp
    D = 4096
    K = 4                                   # matmuls per scan step
    wrng = np.random.RandomState(0)
    Ws = [jnp.asarray(wrng.randn(D, D).astype(np.float32) * 0.02,
                      dtype=jnp.bfloat16) for _ in range(K)]
    scale = jnp.bfloat16(1.0 / np.sqrt(D))

    def make(length):
        @jax.jit
        def f(seed):                        # seed (256, D) f32, ~4 MB
            y = jnp.tile(seed, (D // seed.shape[0], 1)) \
                .astype(jnp.bfloat16)

            def step(y, _):
                for W in Ws:                # chained — can't hoist
                    y = (y @ W) * scale
                return y, ()
            y, _ = jax.lax.scan(step, y, None, length=length)
            return y.astype(jnp.float32).mean()
        return f

    # the differenced work must dwarf tunnel dispatch noise (~0.1 s):
    # 64 extra steps × 4 matmuls × 2·4096³ ≈ 35 TFLOP → ≥0.2 s even
    # at full v5e bf16 peak (the first run's 6-step diff was ~17 ms
    # and vanished into the noise)
    l1, l2 = 8, 72
    f1, f2 = make(l1), make(l2)
    seed0 = entropy.standard_normal((256, D)).astype(np.float32)
    # analytic FLOPs — exact for a pure matmul chain (2·D³ each), and
    # avoids a second lower().compile() of the big program just to ask
    # cost_analysis what we already know
    flops = l2 * K * 2.0 * D ** 3
    for f in (f1, f2):
        jax.block_until_ready(f(jnp.asarray(seed0)))

    def run_once(f):
        x = entropy.standard_normal((256, D)).astype(np.float32)
        t0 = time.time()
        jax.block_until_ready(f(jnp.asarray(x)))
        return time.time() - t0

    diffs = []
    for _ in range(3):
        ta = run_once(f1)
        tb = run_once(f2)
        diffs.append(tb - ta)
    dt = float(np.median(diffs))
    if dt <= 0.05:
        return None
    diff_flops = flops * (l2 - l1) / l2
    return diff_flops / dt / 1e12


def main() -> None:
    import cv2
    import jax

    from cartoonsegmentation_tpu.utils.env import enable_compilation_cache
    if enable_compilation_cache():
        log('persistent compilation cache: .jax_cache/')

    # The runtime memoizes executions by VALUE, and the cache persists
    # across processes; model weights are deterministically seeded, so
    # any fixed perturbation constant would make a re-run of bench.py
    # replay the previous run's timings instead of measuring. Every
    # perturbed input below therefore mixes in OS-entropy randomness.
    entropy = np.random.default_rng()

    from cartoonsegmentation_tpu.config import build_kenburns_cfg
    from cartoonsegmentation_tpu.pipeline import KenBurnsPipeline

    img = cv2.imread('/root/reference/examples/kenburns_lion.png')
    if img is None:  # fallback synthetic image
        rng = np.random.RandomState(0)
        img = (rng.rand(768, 1024, 3) * 255).astype(np.uint8)

    # the shipped default config (reference configs/3dkenburns.yaml:
    # detector animeinsseg + refinenet_isnet, depth leres, depth_field
    # True, 75 frames, max_size 1024)
    cfg = build_kenburns_cfg('configs/3dkenburns.yaml').replace(
        max_size=1024, num_frame=75, auto_zoom=True)
    assert cfg.depth_field, 'bench must run the shipped default'
    assert cfg.detector == 'animeinsseg', \
        'bench must run the instance-guided default'
    pipe = KenBurnsPipeline(cfg)
    # no consumer of stage previews here — skip their full-frame D2H
    # (colorized depth x3, inpainted x2, instance overlay per run)
    pipe.stage_previews = False
    log(f'device: {jax.devices()[0]}; detector={cfg.detector} '
        f'refine={cfg.refine_method} depth={cfg.depth_est} '
        f'max_instances={cfg.max_instances}')

    # raw link bandwidth FIRST: every host-touching stage number below
    # is only interpretable relative to this run's tunnel regime (the
    # regime fluctuates 2-3x between runs — README perf notes)
    h2d0, d2h0 = tunnel_probe(np.random.default_rng())
    log(f'tunnel probe: H2D {h2d0} MB/s, D2H {d2h0} MB/s')

    # --- phase 1: generate_state (detector fwd + ISNet refine + depth
    # + instance adjust + point cloud) — compile pass, then a steady
    # pass on a perturbed image for honest per-stage seconds.
    pipe.ensure_detector()
    log('generate_state: compile+run (detector on, RANDOM weights '
        '— representative cost, not representative masks)')
    state = pipe.generate_state(img)
    log(f'generate_state compile pass done: '
        f'{ {k: round(v, 2) for k, v in pipe.timer.seconds.items()} }')
    n_det = int(jax.device_get(state.instances.count()))

    snap = dict(pipe.timer.seconds)
    img_b = cv2.convertScaleAbs(
        img, alpha=float(entropy.uniform(0.995, 0.9995)))
    state_b = pipe.generate_state(img_b)
    gen_steady = {k: round(pipe.timer.seconds[k] - snap.get(k, 0.0), 3)
                  for k in pipe.timer.seconds}
    log(f'generate_state steady pass: {gen_steady} '
        f'(instances detected: {n_det})')
    # per-stage H2D cost at the probed link rate (VERDICT r4 item 1):
    # the detector stage pushes a uint8 det_size² canvas + the refine
    # stage's image; depth pushes its own resized input. These bounds
    # say how much of each steady stage is link, not compute.
    H0, W0 = img.shape[:2]
    s = min(1024 / max(H0, W0), 1.0)
    Hs, Ws = int(H0 * s), int(W0 * s)
    det_mb = (cfg.det_size ** 2 * 3 + Hs * Ws * 3) / 1e6
    depth_mb = Hs * Ws * 3 * 4 / 1e6     # f32 at working res (LeReS)
    gen_h2d_est = {
        'detector_h2d_est_s': round(det_mb / h2d0, 3) if h2d0 else None,
        'depth_h2d_est_s': round(depth_mb / h2d0, 3) if h2d0 else None,
    }
    log(f'H2D estimates at probe rate: {gen_h2d_est} '
        f'(det {det_mb:.1f} MB, depth {depth_mb:.1f} MB)')

    # --- phase 2: autozoom (already timed within generate flow)
    log('autozoom')
    obj_from, obj_to = pipe.autozoom(state)
    obj_from_b, obj_to_b = pipe.autozoom(state_b)

    # --- phase 3: inpaint passes — compile (first call) vs steady
    # (re-run on the perturbed-image state so nothing memoizes)
    def run_inpaint(st, o_f, o_t):
        t0 = time.time()
        for t in (0.0, 1.0):
            su, sv, ds, _, _ = pipe._camera_params(t, o_f, o_t, st)
            st = pipe.inpaint_pass(st, su, sv, ds)
        jax.block_until_ready(st.cloud.points)
        return st, time.time() - t0

    log('inpaint passes: compile')
    state1, inpaint_compile_s = run_inpaint(state, obj_from, obj_to)
    log(f'inpaint compile pass: {inpaint_compile_s:.1f}s; steady')
    _, inpaint_steady_s = run_inpaint(state_b, obj_from_b, obj_to_b)
    log(f'inpaint steady pass: {inpaint_steady_s:.2f}s')
    state = pipe.compact_state(state1)

    steps = np.linspace(0.0, 1.0, cfg.num_frame)

    def bench_render(depth_field):
        # warmup/compile
        frames = pipe.render_frames(state, obj_from, obj_to, steps,
                                    depth_field=depth_field,
                                    return_device=True)
        jax.block_until_ready(frames)
        best = np.inf
        for i in range(2):
            o2 = dict(obj_from)
            o2['center_u'] = obj_from['center_u'] \
                + 0.01 * (i + 1) + float(entropy.uniform(0, 0.01))
            t0 = time.time()
            frames = pipe.render_frames(state, o2, obj_to, steps,
                                        depth_field=depth_field,
                                        return_device=True)
            jax.block_until_ready(frames)
            best = min(best, time.time() - t0)
        return frames, best

    # --- phase 4: the headline render (DoF on, shipped defaults)
    log('render (depth_field=True): compile + 2 timed runs')
    frames, dt = bench_render(True)
    fps = cfg.num_frame / dt
    log(f'render: {dt:.3f}s for {cfg.num_frame} frames = {fps:.2f} fps')

    extra = {
        'frame_shape': [int(s) for s in frames.shape],
        'depth_field': True,
        'detector_in_flagship': True,
        'max_instances': cfg.max_instances,
        'instances_detected_random_weights': n_det,
        'gen_state_steady_s': gen_steady,
        'gen_state_h2d_est_s': gen_h2d_est,
        'inpaint_passes_compile_s': round(inpaint_compile_s, 3),
        'inpaint_passes_steady_s': round(inpaint_steady_s, 3),
        'render_s_total': round(dt, 3),
        'tunnel_H2D_MBps': h2d0,
        'tunnel_D2H_MBps': d2h0,
        'device': str(jax.devices()[0]),
    }

    def headline():
        return {
            'metric': 'kenburns_render_fps_1024_default',
            'value': round(fps, 3),
            'unit': 'frames/sec',
            'vs_baseline': round(fps / 25.0, 3),
            'extra': extra,
        }

    # the number is safe from here on: print it NOW (the driver keeps
    # the tail; the enriched final line replaces this one if reached)
    print(json.dumps(headline()), flush=True)

    skipped = []

    def phase(name, min_budget_s, fn):
        if remaining() < min_budget_s:
            log(f'SKIP {name}: {remaining():.0f}s left < {min_budget_s}s')
            skipped.append(name)
            return
        log(f'phase: {name} ({remaining():.0f}s budget left)')
        try:
            fn()
        except Exception as e:
            log(f'phase {name} FAILED: {e!r}')
            skipped.append(f'{name} (error)')

    # --- secondary phases, each behind the wall-clock budget --------
    def p_render_nodof():
        _, dt_nodof = bench_render(False)
        extra['render_fps_no_dof'] = round(cfg.num_frame / dt_nodof, 3)
    phase('render_no_dof', 240, p_render_nodof)

    def p_transfer():
        t0 = time.time()
        np.asarray(jax.device_get(frames))
        extra['host_transfer_s'] = round(time.time() - t0, 3)
    phase('host_transfer', 60, p_transfer)

    def p_stream():
        # I420 streaming path (device-side chroma subsample → 1.5 B/px
        # over the link, decoded+encoded host-side while transferring).
        # Best of 2: tunnel bandwidth occasionally stalls mid-phase.
        from cartoonsegmentation_tpu.pipeline import stream_video
        best = np.inf
        for k in range(2):
            # flip the LSB so the re-run cannot be a memoized replay
            fk = frames if k == 0 else frames ^ np.uint8(1)
            t0 = time.time()
            stream_video(fk, '/tmp/bench_stream.mp4', playback=False)
            best = min(best, time.time() - t0)
        extra['stream_i420_transfer_encode_s'] = round(best, 3)
    phase('stream_i420', 90, p_stream)

    def p_clip():
        # the WHOLE clip, image → mp4 (detector + refine + depth +
        # autozoom + inpaint + chunked render overlapped with I420
        # transfer+encode): the reference's headline workload
        # (run_kenburns.py:19-41) and this bench's CO-HEADLINE
        # (VERDICT r4 item 1). Steady state: second run, perturbed
        # image so nothing memoizes. A fresh in-run tunnel probe right
        # before the timed run makes the host-touching stage seconds
        # interpretable against THIS phase's link regime.
        log('clip: compile any rest (streaming render fns)')
        pipe.run(img, '/tmp/bench_clip.mp4')
        h2d1, d2h1 = tunnel_probe(entropy)
        log(f'pre-clip tunnel probe: H2D {h2d1} MB/s, D2H {d2h1} MB/s')
        img3 = cv2.convertScaleAbs(
            img, alpha=float(entropy.uniform(0.99, 0.9945)))
        log('clip: steady timed run')
        snap_t = dict(pipe.timer.seconds)
        t0 = time.time()
        pipe.run(img3, '/tmp/bench_clip.mp4')
        clip_wall = time.time() - t0
        stage_s = {
            k: round(v - snap_t.get(k, 0.0), 2)
            for k, v in pipe.timer.seconds.items()
            if v - snap_t.get(k, 0.0) > 0.05}
        extra['clip_wall_s'] = round(clip_wall, 3)
        extra['clip_stage_s'] = stage_s
        extra['tunnel_D2H_MBps_preclip'] = d2h1
        log(f'clip stage breakdown: {stage_s}')
        # the link-bound floor for this regime: the I420 frame bytes
        # that must cross the tunnel, at the just-probed D2H rate
        T, H, W = frames.shape[:3]
        i420_mb = T * H * W * 1.5 / 1e6
        bound = i420_mb / d2h1 if d2h1 else None
        extra['clip_i420_MB'] = round(i420_mb, 1)
        extra['clip_transfer_bound_s'] = \
            round(bound, 2) if bound else None
        # co-headline: the user-facing image→mp4 latency, attributed
        # (vs_baseline: clip seconds per second of produced 25fps
        # video — the reference's own workload definition,
        # run_kenburns.py:19-41, has no published wall number)
        print(json.dumps({
            'metric': 'kenburns_clip_wall_s',
            'value': round(clip_wall, 3),
            'unit': 'seconds (image->mp4, 75f@1024)',
            'vs_baseline': round(clip_wall / (cfg.num_frame / 25.0), 3),
            'extra': {'stage_s': stage_s,
                      'tunnel_D2H_MBps': d2h1,
                      'i420_MB': round(i420_mb, 1),
                      'transfer_bound_s':
                          round(bound, 2) if bound else None},
        }), flush=True)
    phase('clip_wall', 300, p_clip)

    peak_holder = [None]

    def p_roofline():
        peak = matmul_peak(entropy)
        peak_holder[0] = peak
        extra['matmul_peak_tflops_measured'] = \
            round(peak, 2) if peak else None
        log(f'measured bf16 matmul peak: {peak and round(peak, 2)} '
            f'TFLOP/s')
    phase('matmul_roofline', 120, p_roofline)

    def p_det_bench():
        # sanity ceiling for the differenced compute estimate: 2x the
        # JUST-MEASURED matmul peak on this chip (VERDICT r4 item 2 —
        # no more hard-coded constant); conservative fallback if the
        # roofline phase didn't run
        sanity = (2.0 * peak_holder[0] * 1e12) if peak_holder[0] \
            else 25e12
        f, co, tf = det_bench(img, entropy, 'bfloat16', batch=1,
                              sanity_flops=sanity)
        extra['detector_fwd_fps_640_bf16'] = round(f, 2)
        if remaining() > 180:
            f16, co16, tf16 = det_bench(img, entropy, 'bfloat16',
                                        batch=16, sanity_flops=sanity)
            extra['detector_fwd_fps_640_bf16_b16'] = round(f16, 2)
            extra['detector_b16_tflops'] = \
                round(tf16, 2) if tf16 else None
            if tf16 and peak_holder[0]:
                extra['detector_pct_of_measured_peak'] = \
                    round(100.0 * tf16 / peak_holder[0], 1)
    phase('det_bench', 240, p_det_bench)

    def p_marigold():
        # the native diffusion depth path ON THE REAL TPU (VERDICT r4
        # item 4): one LCM 4-step, ensemble-5 Marigold inference at
        # reduced res (the reference wrapper's sampler config,
        # utils/apply_marigold.py:8-49). First call compiles the
        # SD2-UNet graph (minutes through the tunnel, then cached in
        # .jax_cache); the steady call perturbs the image so nothing
        # memoizes.
        from cartoonsegmentation_tpu.models.marigold import \
            MarigoldDepth
        est = MarigoldDepth(processing_res=384, denoise_steps=4,
                            ensemble_size=5, scheduler='lcm')
        rgb = img[..., ::-1].copy()
        t0 = time.time()
        est(rgb)
        extra['marigold_compile_s'] = round(time.time() - t0, 1)
        log(f"marigold compile+run: {extra['marigold_compile_s']}s")
        rgb2 = cv2.convertScaleAbs(
            rgb, alpha=float(entropy.uniform(0.99, 0.999)))
        t0 = time.time()
        est(rgb2, seed=int(entropy.integers(1, 1 << 30)))
        extra['marigold_steady_s'] = round(time.time() - t0, 2)
        extra['marigold_cfg'] = 'res384 lcm4 ens5'
        log(f"marigold steady: {extra['marigold_steady_s']}s")
    phase('marigold_tpu', 240, p_marigold)

    def p_ldm_native():
        # the in-process SD-inpainting path on the real TPU (VERDICT
        # r4 item 4): 4 DDIM steps at 256 (config-reduced; the point
        # is a captured on-TPU execution, not quality)
        from cartoonsegmentation_tpu.models.ldm_inpaint import \
            LDMInpainter
        inp = LDMInpainter(steps=4)
        small = cv2.resize(img, (512, 384))
        mask = np.zeros(small.shape[:2], np.uint8)
        mask[120:260, 160:360] = 255
        t0 = time.time()
        inp(small, mask, res=256)
        extra['ldm_native_compile_s'] = round(time.time() - t0, 1)
        log(f"ldm_native compile+run: {extra['ldm_native_compile_s']}s")
        small2 = cv2.convertScaleAbs(
            small, alpha=float(entropy.uniform(0.99, 0.999)))
        t0 = time.time()
        inp(small2, mask, res=256,
            seed=int(entropy.integers(1, 1 << 30)))
        extra['ldm_native_steady_s'] = round(time.time() - t0, 2)
        extra['ldm_native_cfg'] = 'res256 ddim4'
        log(f"ldm_native steady: {extra['ldm_native_steady_s']}s")
    phase('ldm_native_tpu', 180, p_ldm_native)

    def p_tp():
        # TP forward measurement needs >1 real chip; on this 1-chip
        # tunnel it records why it can't run (VERDICT r4 item 5's
        # bench hook). With n>=2 real devices: BEiT-L block under
        # Megatron rules on a (1, n) model mesh.
        n = len(jax.devices())
        if n < 2:
            extra['tp_forward'] = 'skipped: 1 real device ' \
                '(TP measured on the 8-device CPU mesh in tests)'
            return
        from cartoonsegmentation_tpu.parallel.tp import tp_bench_block
        extra['tp_forward'] = tp_bench_block(n)
    phase('tp_forward', 60, p_tp)

    log(f'done in {time.time() - T0:.0f}s; skipped: {skipped}')
    extra['skipped_phases'] = skipped
    print(json.dumps(headline()), flush=True)


def det_bench(img, entropy, dtype, batch=1, sanity_flops=25e12):
    """Detector forward throughput at 640 (secondary metric).

    Transfer-inclusive throughput + a compute-only estimate.

    Timing hazards on this runtime, and how each is handled:
    - identical-input executions are memoized → every timed call
      transfers a FRESHLY perturbed host array (device-resident
      perturbation has been observed to still memoize);
    - that H2D transfer pollutes the timing (batch·1.2 MB of
      uint8 canvas through the tunnel — normalization happens on
      device, pipeline/segment.py normalize_canvas) → the
      compute-only figure is the DIFFERENCE of two scan lengths
      with identical transfers;
    - XLA could hoist a repeated forward out of the scan → each
      step's input is chained to the previous step's output.
    The inclusive figure is a lower bound on real throughput and
    is what gets REPORTED; the differenced compute-only estimate
    is returned separately and discarded when timing noise makes
    it unphysical (`sanity_flops` — 2x the matmul peak MEASURED on
    this chip in this run by matmul_peak(); the chip is
    virtualized/time-sliced well below v5e paper peak).
    """
    import jax
    import jax.numpy as jnp
    from cartoonsegmentation_tpu.pipeline import AnimeInsSeg
    from cartoonsegmentation_tpu.pipeline.segment import normalize_canvas

    seg = AnimeInsSeg(det_size=640, dtype=dtype)
    x, _, _ = seg._preprocess(img)        # uint8 canvas (1.2 MB)
    x = np.repeat(x, batch, axis=0)
    variables = seg._ensure_variables()
    l1, l2 = (4, 12) if batch == 1 else (2, 6)

    def make_scan(length):
        @jax.jit
        def det_scan(variables, x0):
            def step(carry, _):
                xc, inj = carry
                out = seg.model.apply(variables, xc + inj)
                return (xc, out[0][0].mean() * 1e-12), \
                    out[1][0].mean()
            _, outs = jax.lax.scan(
                step, (normalize_canvas(x0), jnp.float32(0)), None,
                length=length)
            return outs
        return det_scan

    scan1, scan2 = make_scan(l1), make_scan(l2)
    flops = None
    try:
        ca = scan2.lower(variables, jnp.asarray(x)) \
            .compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = ca.get('flops')
    except Exception:
        pass
    for s in (scan1, scan2):                       # compile both
        jax.block_until_ready(s(variables, jnp.asarray(x)))

    def run_once(scan):
        # fresh OS-entropy LSB noise per call keeps the canvas
        # uint8 (1.2 MB H2D like the real infer() path) while
        # still defeating the value-keyed execution memoization
        xi = x ^ entropy.integers(0, 2, x.shape).astype(x.dtype)
        t0 = time.time()
        jax.block_until_ready(scan(variables, jnp.asarray(xi)))
        return time.time() - t0

    # back-to-back (l1, l2) pairs share a tunnel-latency regime,
    # so the per-pair difference isolates the extra (l2-l1)
    # forwards; the median over pairs rejects regime shifts
    diffs, t2s = [], []
    for k in range(4):
        ta = run_once(scan1)
        tb = run_once(scan2)
        t2s.append(tb)
        diffs.append(tb - ta)
    fps_incl = l2 * batch / min(t2s)
    flops_per_img = flops / l2 / batch if flops else None
    fps_diff = None
    dt = float(np.median(diffs))
    if dt > 0.01:
        cand = (l2 - l1) * batch / dt
        if (flops_per_img is not None
                and cand * flops_per_img < sanity_flops):
            fps_diff = cand
    best = max(fps_incl, fps_diff or 0.0)
    tflops = best * flops_per_img / 1e12 if flops_per_img else None
    return fps_incl, fps_diff, tflops


if __name__ == '__main__':
    main()
