#!/usr/bin/env python3
"""Benchmark: 1080p Flow-path stabilization throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/sec", "vs_baseline": N}

vs_baseline is measured against the driver target of 500 frames/sec at
1080p on a single v5e (BASELINE.md).  Secondary diagnostics go to
stderr.  Run with the default environment (TPU); compile time is
excluded by a warmup pass.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

TARGET_FPS = 500.0


def synth_clip(n=64, h=1080, w=1920, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.random((h + 128, w + 128, 3), dtype=np.float32)
    # cheap separable blur for trackable low-frequency structure
    k = np.ones(9, np.float32) / 9.0
    for axis in (0, 1):
        base = np.apply_along_axis(lambda m: np.convolve(m, k, mode="same"), axis, base)
    mats = [np.eye(3)]
    for i in range(1, n):
        th = 0.004 * np.sin(i / 3.0) + rng.uniform(-0.002, 0.002)
        t = rng.uniform(-4, 4, 2) + [6 * np.sin(i / 2.5), 4 * np.cos(i / 3.5)]
        d = np.array([[np.cos(th), -np.sin(th), t[0]], [np.sin(th), np.cos(th), t[1]], [0, 0, 1.0]])
        mats.append(d @ mats[-1])
    crop = np.eye(3)
    crop[0, 2] = crop[1, 2] = -64

    from comfyui_video_stabilizer_tpu.ops import warp as W

    view = np.stack([crop @ np.linalg.inv(m) for m in mats])
    frames = W.warp_clip(np.repeat(base[None], n, 0), view, (w, h), "bilinear", (0.5, 0.5, 0.5))
    return frames


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    from comfyui_video_stabilizer_tpu.models.flow import stabilize_flow
    from comfyui_video_stabilizer_tpu.utils.video_io import normalize_video_input

    print(f"building synthetic 1080p clip ({n} frames)...", file=sys.stderr)
    frames = synth_clip(n=n)
    ctx = normalize_video_input(frames)

    def run():
        return stabilize_flow(
            ctx, "crop_and_pad", "similarity", False, 0.8, 0.6, 0.6, (127, 127, 127), 30.0
        )

    print("warmup (compile)...", file=sys.stderr)
    t0 = time.perf_counter()
    run()
    warm = time.perf_counter() - t0
    print(f"warmup {warm:.1f}s; timed run...", file=sys.stderr)

    t0 = time.perf_counter()
    result = run()
    elapsed = time.perf_counter() - t0
    fps = n / elapsed
    print(
        f"flow-path 1080p: {elapsed:.2f}s for {n} frames -> {fps:.1f} f/s "
        f"(applied mode {result.meta['transform_mode_applied']})",
        file=sys.stderr,
    )

    print(
        json.dumps(
            {
                "metric": "1080p_flow_stabilize_frames_per_sec",
                "value": round(fps, 2),
                "unit": "frames/sec",
                "vs_baseline": round(fps / TARGET_FPS, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
