#!/usr/bin/env python3
"""Crop-framing throughput on the real chip (VERDICT r4 item 3).

Times stabilize_flow / stabilize_classic with framing="crop" end-to-end
(median of 3 warm runs, full output sync) at 1080p, fast path on vs off.
Run:
    python scripts/profile_crop.py [n_frames]
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def med3(fn, k=3):
    ts = []
    for _ in range(k):
        time.sleep(1.0)
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench import synth_clip_device
    from comfyui_video_stabilizer_tpu.models.classic import stabilize_classic
    from comfyui_video_stabilizer_tpu.models.flow import stabilize_flow
    from comfyui_video_stabilizer_tpu.utils.video_io import FrameAdapter, VideoContext

    h, w = 1080, 1920
    frames = synth_clip_device(n, h, w)
    frames.block_until_ready()
    ctx = VideoContext(
        frames=frames,
        adapter=FrameAdapter(np.dtype(np.float32), False, "0_1", "numpy", False),
        width=w, height=h, channels=3, fps=30.0,
        template_kind="sequence", template_meta={},
    )
    kw = dict(framing_mode="crop", transform_mode="similarity",
              camera_lock=False, strength=0.8, smooth=0.6, keep_fov=0.8,
              padding_rgb=(127, 127, 127), frame_rate=30.0)

    def sync(res):
        jax.block_until_ready(res.frames)
        jax.block_until_ready(res.masks)

    for name, fn in (("flow", stabilize_flow), ("classic", stabilize_classic)):
        for fast in ("1", "0"):
            os.environ["CVST_FASTPATH"] = fast
            res = fn(ctx, **kw)  # compile
            sync(res)
            t = med3(lambda: sync(fn(ctx, **kw)))
            st = res.meta["framing"]["keep_fov_status"]
            print(f"1080p crop {name:7s} fastpath={fast}: {t*1e3:7.1f} ms "
                  f"-> {n/t:6.1f} f/s  (status {st}, "
                  f"scale {res.meta['framing']['stabilization_scale']:.4f}, "
                  f"pad_max {res.meta['padding_fraction_max']:.5f})",
                  flush=True)


if __name__ == "__main__":
    main()
