"""Benchmark: the Ken Burns hot loop (the reference's headline
workload — configs/3dkenburns.yaml defaults: 75 frames @ max_size
1024 per clip, run on one real TPU chip).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference publishes no numbers (BASELINE.md), so vs_baseline is
the real-time factor against the 25 fps output video rate — the
reference pipeline renders well below 1.0x on its shipped defaults.
"""
from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import cv2
    import jax

    from cartoonsegmentation_tpu.config import KenBurnsConfig
    from cartoonsegmentation_tpu.pipeline import KenBurnsPipeline

    img = cv2.imread('/root/reference/examples/kenburns_lion.png')
    if img is None:  # fallback synthetic image
        rng = np.random.RandomState(0)
        img = (rng.rand(768, 1024, 3) * 255).astype(np.uint8)

    cfg = KenBurnsConfig(max_size=1024, num_frame=75, depth_field=False,
                         depth_est='default', auto_zoom=True)
    pipe = KenBurnsPipeline(cfg)

    state = pipe.generate_state(img)
    obj_from, obj_to = pipe.autozoom(state)

    # inpaint passes (counted separately; the per-frame loop is the
    # steady-state cost that scales with clip length)
    t0 = time.time()
    for t in (0.0, 1.0):
        su, sv, ds, _, _ = pipe._camera_params(t, obj_from, obj_to, state)
        state = pipe.inpaint_pass(state, su, sv, ds)
    jax.block_until_ready(state.cloud.points)
    inpaint_s = time.time() - t0
    state = pipe.compact_state(state)

    steps = np.linspace(0.0, 1.0, cfg.num_frame)
    # warmup (compile)
    frames = pipe.render_frames(state, obj_from, obj_to, steps,
                                return_device=True)
    jax.block_until_ready(frames)
    t0 = time.time()
    frames = pipe.render_frames(state, obj_from, obj_to, steps,
                                return_device=True)
    jax.block_until_ready(frames)
    dt = time.time() - t0
    fps = cfg.num_frame / dt

    t0 = time.time()
    host = np.asarray(jax.device_get(frames))
    transfer_s = time.time() - t0

    # secondary: detector forward+postprocess throughput at 640
    # (scan-chained so tunnel dispatch latency doesn't pollute it)
    import jax.numpy as jnp
    from cartoonsegmentation_tpu.pipeline import AnimeInsSeg
    seg = AnimeInsSeg(det_size=640)
    x, _, _ = seg._preprocess(img)
    variables = seg._ensure_variables()

    @jax.jit
    def det_scan(variables, x0):
        def step(x, _):
            out = seg.model.apply(variables, x)
            # chain: derive next input from this forward's output
            delta = out[3].mean() * 0.0
            return x + delta, out[0][0].mean()
        _, outs = jax.lax.scan(step, x0, None, length=8)
        return outs

    outs = det_scan(variables, jnp.asarray(x))
    jax.block_until_ready(outs)
    t0 = time.time()
    outs = det_scan(variables, jnp.asarray(x) * 1.0001)
    jax.block_until_ready(outs)
    det_fps = 8 / (time.time() - t0)

    result = {
        'metric': 'kenburns_render_fps_1024',
        'value': round(fps, 3),
        'unit': 'frames/sec',
        'vs_baseline': round(fps / 25.0, 3),
        'extra': {
            'frame_shape': list(host.shape),
            'inpaint_passes_s': round(inpaint_s, 3),
            'render_s_total': round(dt, 3),
            'host_transfer_s': round(transfer_s, 3),
            'device': str(jax.devices()[0]),
            'detector_fwd_fps_640': round(det_fps, 2),
        },
    }
    print(json.dumps(result))


if __name__ == '__main__':
    main()
