"""Benchmark: the Ken Burns hot loop (the reference's headline
workload — configs/3dkenburns.yaml defaults: 75 frames @ max_size
1024 per clip, depth_field ON, run on one real TPU chip).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference publishes no numbers (BASELINE.md), so vs_baseline is
the real-time factor against the 25 fps output video rate — the
reference pipeline renders well below 1.0x on its shipped defaults.

Timing discipline: every phase is reported compile-separated (one
warm-up run first), and the headline render fps is the shipped
default workload (depth_field=True, discfill fast mode, bf16 splat
payload). A no-DoF fps is reported alongside for comparison with
round-1 numbers.
"""
from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import cv2
    import jax

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
    # depth_field True, 75 frames, max_size 1024); depth net choice
    # does not affect the render loop being measured
    cfg = build_kenburns_cfg('configs/3dkenburns.yaml').replace(
        max_size=1024, num_frame=75, depth_est='default',
        auto_zoom=True)
    assert cfg.depth_field, 'bench must run the shipped default'
    pipe = KenBurnsPipeline(cfg)

    state = pipe.generate_state(img)
    obj_from, obj_to = pipe.autozoom(state)

    # inpaint passes: compile (first call) vs steady state (re-run on
    # a fresh state built from a perturbed image so the runtime cannot
    # memoize identical inputs)
    def run_inpaint(st):
        t0 = time.time()
        for t in (0.0, 1.0):
            su, sv, ds, _, _ = pipe._camera_params(t, obj_from, obj_to,
                                                   st)
            st = pipe.inpaint_pass(st, su, sv, ds)
        jax.block_until_ready(st.cloud.points)
        return st, time.time() - t0

    state1, inpaint_compile_s = run_inpaint(state)
    img2 = cv2.convertScaleAbs(
        img, alpha=float(entropy.uniform(0.995, 0.9995)))
    state2 = pipe.generate_state(img2)
    state2, inpaint_steady_s = run_inpaint(state2)
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

    frames_nodof, dt_nodof = bench_render(False)
    frames, dt = bench_render(True)
    fps = cfg.num_frame / dt

    t0 = time.time()
    host = np.asarray(jax.device_get(frames))
    transfer_s = time.time() - t0

    # I420 streaming path (device-side chroma subsample → 1.5 B/px
    # over the link, decoded+encoded host-side while transferring).
    # Best of 2: tunnel bandwidth occasionally stalls for tens of
    # seconds mid-phase; a single sample can read 10x high.
    from cartoonsegmentation_tpu.pipeline import stream_video
    transfer_i420_s = np.inf
    for k in range(2):
        # frames are uint8; flip the LSB so the re-run cannot be a
        # memoized replay (bench artifact only, not user output)
        fk = frames if k == 0 else frames ^ np.uint8(1)
        t0 = time.time()
        stream_video(fk, '/tmp/bench_stream.mp4', playback=False)
        transfer_i420_s = min(transfer_i420_s, time.time() - t0)

    # the WHOLE clip, image -> mp4 (seg off, depth + autozoom +
    # inpaint + chunked render overlapped with I420 transfer+encode):
    # the reference's headline workload is this full path
    # (run_kenburns.py:19-41). Steady state: second run, perturbed
    # image so nothing memoizes.
    pipe.run(img, '/tmp/bench_clip.mp4')          # compile any rest
    img3 = cv2.convertScaleAbs(
        img, alpha=float(entropy.uniform(0.99, 0.9945)))
    t0 = time.time()
    pipe.run(img3, '/tmp/bench_clip.mp4')
    clip_wall_s = time.time() - t0

    # render+transfer+encode overlap alone (state already built).
    # obj_from is entropy-perturbed: state/cams/steps are otherwise
    # value-identical to the pipe.run() above and the cross-process
    # memoization would replay the chunk executions in ~0 time.
    o_pert = dict(obj_from)
    o_pert['center_u'] = obj_from['center_u'] \
        + float(entropy.uniform(0.005, 0.02))
    t0 = time.time()
    pipe.render_frames_stream(state, o_pert, obj_to, steps,
                              '/tmp/bench_stream2.mp4')
    stream_overlap_s = time.time() - t0

    # secondary: detector forward throughput at 640 in f32 AND bf16
    # (scan-chained so tunnel dispatch latency doesn't pollute it;
    # bf16-vs-f32 head agreement is asserted in tests/test_detector.py)
    import jax.numpy as jnp
    from cartoonsegmentation_tpu.pipeline import AnimeInsSeg

    def det_bench(dtype, batch=1):
        """Transfer-inclusive throughput + a compute-only estimate.

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
        it unphysical (> 25 TFLOP/s — 2x the best sustained matmul
        rate ever measured through this tunnel; the chip is
        virtualized/time-sliced well below v5e paper peak).
        """
        seg = AnimeInsSeg(det_size=640, dtype=dtype)
        from cartoonsegmentation_tpu.pipeline.segment import \
            normalize_canvas
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
                    and cand * flops_per_img < 25e12):
                fps_diff = cand
        best = max(fps_incl, fps_diff or 0.0)
        tflops = best * flops_per_img / 1e12 if flops_per_img else None
        return fps_incl, fps_diff, tflops

    det_fps_f32, det_co_f32, _ = det_bench(None)
    try:
        det_fps_bf16, det_co_bf16, _ = det_bench('bfloat16')
    except Exception:
        det_fps_bf16 = det_co_bf16 = None
    # throughput-bound: DP batch on one chip (pipeline/segment.py
    # infer_batch is the multi-chip path; the forward itself batches)
    det_fps_b16, det_co_b16, det_tflops_b16 = det_bench(
        'bfloat16', batch=16)

    result = {
        'metric': 'kenburns_render_fps_1024_default',
        'value': round(fps, 3),
        'unit': 'frames/sec',
        'vs_baseline': round(fps / 25.0, 3),
        'extra': {
            'frame_shape': list(host.shape),
            'depth_field': True,
            'render_fps_no_dof': round(cfg.num_frame / dt_nodof, 3),
            'inpaint_passes_compile_s': round(inpaint_compile_s, 3),
            'inpaint_passes_steady_s': round(inpaint_steady_s, 3),
            'render_s_total': round(dt, 3),
            'host_transfer_s': round(transfer_s, 3),
            'stream_i420_transfer_encode_s': round(transfer_i420_s, 3),
            'device': str(jax.devices()[0]),
            'detector_fwd_fps_640_f32': round(det_fps_f32, 2),
            'detector_fwd_fps_640_bf16':
                round(det_fps_bf16, 2) if det_fps_bf16 else None,
            'detector_fwd_fps_640_bf16_b16': round(det_fps_b16, 2),
            'detector_computeonly_fps': {
                k: round(v, 2) if v else None
                for k, v in (('f32', det_co_f32),
                             ('bf16', det_co_bf16),
                             ('bf16_b16', det_co_b16))},
            'detector_b16_tflops':
                round(det_tflops_b16, 2) if det_tflops_b16 else None,
            'clip_wall_s': round(clip_wall_s, 3),
            'stream_overlap_s': round(stream_overlap_s, 3),
        },
    }
    print(json.dumps(result))


if __name__ == '__main__':
    main()
