#!/usr/bin/env python3
"""Per-config benchmark: every BASELINE config + all three framings.

`bench.py` prints the single driver-facing headline (1080p Flow
crop_and_pad).  This script measures the full perf story on the real
chip and emits ONE JSON line PER CONFIG:

  {"metric": "<name>_frames_per_sec", "value": N, "unit": "frames/sec", ...}

Configs (BASELINE.json `configs` + the framing/mode arms VERDICT r3
asked to publish):
  classic_480p               config 1: Classic 480p/64f similarity crop_and_pad
  classic_1080p              Classic at 1080p/64f
  shake_apply_720p           config 2: Shake meta -> Motion Apply 720p/96f bilinear
  flow_720p_perspective_lock config 3: Flow 720p/128f perspective + camera_lock
  apply_blur_ultra_1080p     config 4: Motion Apply blur 0.5 Ultra (33 samples) bicubic
  flow_1080p_expand          config 5's framing at 1080p/96f (speculative bucket fast path)
  flow_1080p_perspective     headline clip, perspective transform mode
  flow_1080p_crop            headline clip, crop framing (keep_fov solver host path)

Timing protocol matches bench.py: clip generated on device, warm run,
median of 5 trials with a 1.5 s settle between them (dev-tunnel
backpressure), full output sync via a fused corner-element fetch.

Usage: python scripts/bench_full.py [--config NAME] [--trials K]
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def _sync(*arrays):
    import jax

    probes = []
    for a in arrays:
        if a is None:
            continue
        flat = a
        idx0 = (0,) * getattr(a, "ndim", 0)
        idx1 = tuple(-1 for _ in range(getattr(a, "ndim", 0)))
        probes.append(flat[idx0])
        probes.append(flat[idx1])
    jax.device_get(tuple(probes))


def _median_fps(run, n_frames, trials):
    run()  # warm (compile)
    ts = []
    for _ in range(trials):
        time.sleep(1.5)
        t0 = time.perf_counter()
        run()
        ts.append(time.perf_counter() - t0)
    med = float(np.median(ts))
    return n_frames / med, [round(t * 1000) for t in ts]


def main() -> int:
    only = None
    trials = 5
    argv = sys.argv[1:]
    while argv:
        a = argv.pop(0)
        if a == "--config":
            only = argv.pop(0)
        elif a == "--trials":
            trials = int(argv.pop(0))
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp  # noqa: F401

    from bench import synth_clip_device
    from comfyui_video_stabilizer_tpu.models import shake as S
    from comfyui_video_stabilizer_tpu.models.classic import stabilize_classic
    from comfyui_video_stabilizer_tpu.models.flow import stabilize_flow
    from comfyui_video_stabilizer_tpu.models.motion_apply import apply_motion
    from comfyui_video_stabilizer_tpu.utils.video_io import FrameAdapter, VideoContext

    def ctx_for(frames, w, h, fps=30.0):
        return VideoContext(
            frames=frames,
            adapter=FrameAdapter(np.dtype(np.float32), False, "0_1", "numpy", False),
            width=w, height=h, channels=3, fps=fps,
            template_kind="sequence", template_meta={},
        )

    clips: dict = {}

    def clip(n, h, w):
        key = (n, h, w)
        if key not in clips:
            print(f"building {w}x{h}/{n}f clip on device...", file=sys.stderr)
            c = synth_clip_device(n, h, w)
            c.block_until_ready()
            clips[key] = c
        return clips[key]

    def stab(engine, framing, mode, lock, n, h, w):
        def run():
            res = engine(ctx_for(clip(n, h, w), w, h), framing, mode, lock,
                         0.8, 0.6, 0.6, (127, 127, 127), 30.0)
            _sync(res.frames, res.masks)
        return run

    def apply_cfg(n, h, w, style, interp, blur, samples):
        meta = {"motion_meta": S.generate_shake_motion_meta(
            recipe=S.STYLES[style], frame_count=n, width=w, height=h,
            fps=24.0, amount=1.0, speed=1.0, seed=7)}

        def run():
            res = apply_motion(ctx_for(clip(n, h, w), w, h), meta,
                               (127, 127, 127), interpolation=interp,
                               motion_blur=blur, motion_blur_samples=samples)
            _sync(res.frames, res.masks)
        return run

    configs = {
        "classic_480p": (64, lambda: stab(stabilize_classic, "crop_and_pad",
                                          "similarity", False, 64, 480, 854)),
        "classic_1080p": (64, lambda: stab(stabilize_classic, "crop_and_pad",
                                           "similarity", False, 64, 1080, 1920)),
        "shake_apply_720p": (96, lambda: apply_cfg(96, 720, 1280, "handheld",
                                                   "bilinear", 0.0, 9)),
        "flow_720p_perspective_lock": (128, lambda: stab(
            stabilize_flow, "crop_and_pad", "perspective", True, 128, 720, 1280)),
        "apply_blur_ultra_1080p": (32, lambda: apply_cfg(
            32, 1080, 1920, "action", "bicubic", 0.5, 33)),
        "flow_1080p_expand": (96, lambda: stab(
            stabilize_flow, "expand", "similarity", False, 96, 1080, 1920)),
        "flow_1080p_perspective": (96, lambda: stab(
            stabilize_flow, "crop_and_pad", "perspective", False, 96, 1080, 1920)),
        "flow_1080p_crop": (96, lambda: stab(
            stabilize_flow, "crop", "similarity", False, 96, 1080, 1920)),
    }

    failures = 0
    for name, (n_frames, make) in configs.items():
        if only is not None and name != only:
            continue
        try:
            fps, all_ms = _median_fps(make(), n_frames, trials)
            print(f"{name}: trials {all_ms} ms", file=sys.stderr)
            print(json.dumps({
                "metric": f"{name}_frames_per_sec",
                "value": round(fps, 2),
                "unit": "frames/sec",
                "frames": n_frames,
            }), flush=True)
        except Exception as exc:  # keep measuring the remaining configs
            failures += 1
            print(f"{name}: FAIL {type(exc).__name__}: {exc}", file=sys.stderr)
        # free the clip cache between configs: two 1080p/96f clips plus
        # warp live-sets approach the HBM budget
        clips.clear()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
