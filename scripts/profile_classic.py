#!/usr/bin/env python3
"""Classic-path throughput on the real chip: 480p and 1080p clips.

Times stabilize_classic end-to-end (median of 3 warm runs, full output
sync) plus the lk_track stage alone.  Run:
    python scripts/profile_classic.py [n_frames]
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def med3(fn, k=3):
    ts = []
    for _ in range(k):
        time.sleep(1.5)
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
    from comfyui_video_stabilizer_tpu.models import geometry as G
    from comfyui_video_stabilizer_tpu.models.classic import stabilize_classic
    from comfyui_video_stabilizer_tpu.ops import lk as LK
    from comfyui_video_stabilizer_tpu.ops import resize as R
    from comfyui_video_stabilizer_tpu.utils.video_io import FrameAdapter, VideoContext

    for (h, w) in ((480, 854), (1080, 1920)):
        frames = synth_clip_device(n, h, w)
        frames.block_until_ready()
        ctx = VideoContext(
            frames=frames,
            adapter=FrameAdapter(np.dtype(np.float32), False, "0_1", "numpy", False),
            width=w, height=h, channels=3, fps=30.0,
            template_kind="sequence", template_meta={},
        )

        ws = G.working_estimation_size(w, h)
        grays = R.gray_for_estimation(frames, ws)
        grays.block_until_ready()
        pts, counts = LK.gftt_batch(np.asarray(grays[:-1]))
        pyr = LK.gaussian_pyramid(grays)
        prev = [lvl[:-1] for lvl in pyr]
        curr = [lvl[1:] for lvl in pyr]

        def lk_run():
            g, v = LK.lk_track(prev, curr, pts, counts)
            jax.device_get((g[0, 0, 0], v[-1, -1]))

        lk_run()
        t_lk = med3(lk_run)

        def full():
            res = stabilize_classic(ctx, "crop_and_pad", "similarity", False,
                                    0.8, 0.6, 0.6, (127, 127, 127), 30.0)
            jax.device_get((res.frames[0, 0, 0, 0], res.masks[0, 0, 0],
                            res.frames[-1, -1, -1, -1], res.masks[-1, -1, -1]))

        full()
        t_full = med3(full)
        print(f"{h}p: lk_track {t_lk*1000:7.1f} ms | full {t_full*1000:7.1f} ms "
              f"| {n/t_full:6.1f} f/s", flush=True)


if __name__ == "__main__":
    main()
