#!/usr/bin/env python3
"""Sustained server throughput: overlapped stabilize calls.

`bench.py` measures single-clip LATENCY — one stabilize call, full
output sync, which serializes the host link round-trip against device
compute.  A serving deployment overlaps clips: while clip A's output
sync is in flight, clip B's programs are already queued.  This demo
runs K clips through a small thread pool (JAX's blocking fetches
release the GIL, so two Python threads suffice to keep the device fed)
and reports SUSTAINED frames/sec.

Usage: python scripts/throughput_pipeline.py [n_frames] [n_clips] [workers]
"""
from __future__ import annotations

import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    clips = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    workers = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from bench import synth_clip_device
    from comfyui_video_stabilizer_tpu.models.flow import stabilize_flow
    from comfyui_video_stabilizer_tpu.utils.video_io import FrameAdapter, VideoContext

    base = synth_clip_device(n, 1080, 1920)
    base.block_until_ready()
    # one shared input clip: two in-flight 1080p stabilizations already
    # hold ~2x (padded source + planar + NHWC outputs + masks) in HBM,
    # so the demo defaults to 48-frame clips (bench.py measures 96)
    clip_arrays = [base]
    jax.block_until_ready(clip_arrays)

    def ctx_for(i):
        return VideoContext(
            frames=clip_arrays[i % len(clip_arrays)],
            adapter=FrameAdapter(np.dtype(np.float32), False, "0_1", "numpy", False),
            width=1920, height=1080, channels=3, fps=30.0,
            template_kind="sequence", template_meta={},
        )

    def run(i):
        res = stabilize_flow(ctx_for(i), "crop_and_pad", "similarity", False,
                             0.8, 0.6, 0.6, (127, 127, 127), 30.0)
        jax.device_get((res.frames[0, 0, 0, 0], res.masks[-1, -1, -1]))
        return None  # drop outputs promptly: K live clips would exhaust HBM

    print("warmup...", file=sys.stderr)
    run(0)

    # latency reference (serial)
    t0 = time.perf_counter()
    for i in range(2):
        run(i)
    serial = (time.perf_counter() - t0) / 2

    time.sleep(2.0)
    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=workers) as pool:
        list(pool.map(run, range(clips)))
    wall = time.perf_counter() - t0
    print(f"serial latency: {serial*1e3:.0f} ms/clip -> {n/serial:.1f} f/s",
          file=sys.stderr)
    print(f"pipelined: {clips} clips x {n} frames in {wall:.2f}s "
          f"({workers} workers)", file=sys.stderr)
    import json
    print(json.dumps({
        "metric": "1080p_flow_sustained_frames_per_sec",
        "value": round(clips * n / wall, 2),
        "unit": "frames/sec",
        "serial_fps": round(n / serial, 2),
        "clips": clips, "workers": workers,
    }))


if __name__ == "__main__":
    main()
