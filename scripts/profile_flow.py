#!/usr/bin/env python3
"""Stage-level timing of the 1080p Flow bench pipeline on the real chip.

Times each device program separately (warm, median of 3) with a
one-element fetch as the sync point, matching bench.py methodology.
Run: python scripts/profile_flow.py [n_frames]
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def med3(fn):
    ts = []
    for _ in range(3):
        time.sleep(1.0)
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from bench import synth_clip_device
    from comfyui_video_stabilizer_tpu.models import geometry as G
    from comfyui_video_stabilizer_tpu.models.flow import (
        SAMPLE_STEP, _fused_fits_sampled, _grid_points)
    from comfyui_video_stabilizer_tpu.ops import flow_dis as FD
    from comfyui_video_stabilizer_tpu.ops import resize as R
    from comfyui_video_stabilizer_tpu.ops import ransac as RS
    from comfyui_video_stabilizer_tpu.ops import warp as W

    frames = synth_clip_device(n, 1080, 1920)
    frames.block_until_ready()
    h, w = 1080, 1920
    ws = G.working_estimation_size(w, h)
    print(f"working size {ws}", file=sys.stderr)

    # stage 1: gray + downscale
    grays = R.gray_for_estimation(frames, ws)
    grays.block_until_ready()
    t_gray = med3(lambda: jax.device_get(
        R.gray_for_estimation(frames, ws)[0, 0, 0]))

    # stage 2: DIS fit-grid solve
    samples = FD.dis_flow_fit(grays, SAMPLE_STEP, model="similarity")
    samples.block_until_ready()
    t_dis = med3(lambda: jax.device_get(
        FD.dis_flow_fit(grays, SAMPLE_STEP, model="similarity")[0, 0, 0]))

    # stage 3: fused RANSAC fits (payload fetch = what the pipeline does)
    pts = _grid_points(grays.shape[1], grays.shape[2], SAMPLE_STEP)
    _ = jax.device_get(_fused_fits_sampled(samples, pts, 0, False, RS.DEFAULT_HYPOTHESES))
    t_fits = med3(lambda: jax.device_get(
        _fused_fits_sampled(samples, pts, 0, False, RS.DEFAULT_HYPOTHESES)))

    # stage 4: warp + masks (identity-ish recenter matrices)
    mats = np.tile(np.eye(3, dtype=np.float32), (n, 1, 1))
    mats[:, 0, 2] = np.linspace(-20, 20, n)
    mats[:, 1, 2] = np.linspace(-12, 12, n)
    border = np.asarray([0.5, 0.5, 0.5], np.float32)

    def warp_run():
        cover = W.coverage_mask(mats, (w, h), (w, h))
        masks = W.zero_small(1.0 - cover)
        ratios = masks.reshape(n, -1).mean(axis=1)
        out = W.warp_clip(frames, mats, (w, h), "bilinear", border)
        jax.device_get((out[0, 0, 0, 0], out[-1, -1, -1, -1],
                        masks[0, 0, 0], masks[-1, -1, -1], ratios))

    warp_run()
    t_warp = med3(warp_run)

    # RTT floor: fetch one element of an already-materialized array
    t_rtt = med3(lambda: jax.device_get(frames[0, 0, 0, 0]))

    # end-to-end for reference
    from comfyui_video_stabilizer_tpu.models.flow import stabilize_flow
    from comfyui_video_stabilizer_tpu.utils.video_io import FrameAdapter, VideoContext
    ctx = VideoContext(frames=frames,
                       adapter=FrameAdapter(np.dtype(np.float32), False, "0_1", "numpy", False),
                       width=w, height=h, channels=3, fps=30.0,
                       template_kind="sequence", template_meta={})

    def full():
        res = stabilize_flow(ctx, "crop_and_pad", "similarity", False, 0.8, 0.6, 0.6,
                             (127, 127, 127), 30.0)
        jax.device_get((res.frames[0, 0, 0, 0], res.masks[0, 0, 0],
                        res.frames[-1, -1, -1, -1], res.masks[-1, -1, -1]))
    full()
    t_full = med3(full)

    for k, v in [("gray", t_gray), ("dis_fit", t_dis), ("fused_fits+fetch", t_fits),
                 ("warp+masks+sync", t_warp), ("rtt_floor", t_rtt), ("full", t_full)]:
        print(f"{k:>18}: {v * 1000:8.1f} ms")
    print(f"{'full f/s':>18}: {n / t_full:8.1f}")


if __name__ == "__main__":
    main()
