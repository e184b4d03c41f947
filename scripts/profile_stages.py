#!/usr/bin/env python3
"""Per-stage device timing of the 1080p flow bench path.

Each variant is timed end-to-end (warm, blocked) so tunnel-latency
noise shows up only as a constant; differences between variants
attribute time to stages.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def timeit(label, fn, reps=3):
    fn()  # warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    print(f"{label:34s} med {np.median(ts)*1e3:8.1f} ms  min {min(ts)*1e3:8.1f} ms")
    return float(np.median(ts))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from bench import synth_clip_device
    from comfyui_video_stabilizer_tpu.models import geometry as G
    from comfyui_video_stabilizer_tpu.models.flow import (
        _fused_fits_sampled,
        _grid_points,
        flow_estimator,
        stabilize_flow,
    )
    from comfyui_video_stabilizer_tpu.ops import flow_dis as FD
    from comfyui_video_stabilizer_tpu.ops import resize as R
    from comfyui_video_stabilizer_tpu.ops import warp as W
    from comfyui_video_stabilizer_tpu.ops import ransac as RS
    from comfyui_video_stabilizer_tpu.utils.video_io import FrameAdapter, VideoContext

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    print(f"building {n}-frame 1080p clip...", file=sys.stderr)
    frames = synth_clip_device(n, 1080, 1920)
    frames.block_until_ready()

    ctx = VideoContext(
        frames=frames,
        adapter=FrameAdapter(np.dtype(np.float32), False, "0_1", "numpy", False),
        width=1920, height=1080, channels=3, fps=30.0,
        template_kind="sequence", template_meta={},
    )

    ws = G.working_estimation_size(1920, 1080)
    print("working size:", ws)

    def sync(a):
        # scalar-element fetch: the only reliable sync through the dev
        # tunnel (block_until_ready returns early; ravel would copy)
        _ = float(np.asarray(a[tuple([0] * a.ndim)]))

    def gray_only():
        g = R.gray_for_estimation(frames, ws)
        sync(g)
        return g

    grays = gray_only()

    def flow_only():
        f, c = FD.dis_flow(grays)
        sync(f)

    flow, conf = FD.dis_flow(grays)
    flow.block_until_ready()
    h, w = grays.shape[1:3]
    pts = _grid_points(int(h), int(w), 8)

    def fits_only():
        b = flow.shape[0]
        samples = flow[:, ::8, ::8, :].reshape(b, -1, 2)
        return jax.device_get(
            _fused_fits_sampled(samples, pts, 0, False, RS.DEFAULT_HYPOTHESES))

    def estimator_only():
        flow_estimator(np.asarray(grays) if False else grays, "similarity")

    # realistic warp matrices (small similarity corrections)
    rng = np.random.default_rng(0)
    mats = np.tile(np.eye(3, dtype=np.float64), (n, 1, 1))
    th_ = rng.uniform(-0.004, 0.004, n)
    mats[:, 0, 0] = np.cos(th_); mats[:, 0, 1] = -np.sin(th_)
    mats[:, 1, 0] = np.sin(th_); mats[:, 1, 1] = np.cos(th_)
    mats[:, 0, 2] = rng.uniform(-8, 8, n)
    mats[:, 1, 2] = rng.uniform(-8, 8, n)

    def warp_only():
        out, mask = W.warp_clip_with_mask(frames, mats, (1920, 1080), "bilinear", (0.5, 0.5, 0.5))
        sync(out)
        sync(mask)

    def full():
        res = stabilize_flow(ctx, "crop_and_pad", "similarity", False, 0.8, 0.6, 0.6,
                             (127, 127, 127), 30.0)
        sync(res.frames)
        sync(res.masks)

    t_gray = timeit("gray+downscale", lambda: gray_only())
    t_flow = timeit("dis_flow (95 pairs)", flow_only)
    t_fits = timeit("fused_fits + device_get", fits_only)
    t_est = timeit("flow_estimator (all estimation)", estimator_only)
    t_warp = timeit("warp_clip_with_mask 1080p", warp_only)
    t_full = timeit("FULL stabilize_flow", full, reps=5)
    print(f"\nsum of stages: {(t_gray+t_flow+t_fits+t_warp)*1e3:.1f} ms; full {t_full*1e3:.1f} ms")
    print(f"unattributed (host math, syncs, misc): {(t_full-t_gray-t_flow-t_fits-t_warp)*1e3:.1f} ms")
    print(f"f/s full: {n/t_full:.1f}")


if __name__ == "__main__":
    main()
