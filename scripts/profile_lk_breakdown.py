#!/usr/bin/env python3
"""Break lk_track's per-level cost into prep (window extraction +
template sampling + normal equations) vs the Pallas GN loop."""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def timeit(fn, reps=3):
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1000


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import functools
    import jax.numpy as jnp

    from bench import synth_clip_device
    from comfyui_video_stabilizer_tpu.models import geometry as G
    from comfyui_video_stabilizer_tpu.ops import lk as LK
    from comfyui_video_stabilizer_tpu.ops import resize as R

    for (h, w) in ((480, 854),):
        frames = synth_clip_device(n, h, w)
        frames.block_until_ready()
        ws = G.working_estimation_size(w, h)
        grays = R.gray_for_estimation(frames, ws)
        grays.block_until_ready()
        t_gftt = timeit(lambda: jax.block_until_ready(LK.gftt_batch(grays[:-1])))
        pts, counts = LK.gftt_batch(grays[:-1])
        t_pyr = timeit(lambda: jax.block_until_ready(
            [jnp.asarray(x) for x in LK.gaussian_pyramid(grays)]))
        pyr = [jnp.asarray(x) for x in LK.gaussian_pyramid(grays)]
        prev = [lvl[:-1] for lvl in pyr]
        curr = [lvl[1:] for lvl in pyr]

        t_lk = timeit(lambda: jax.block_until_ready(
            LK.lk_track(prev, curr, pts, counts)))
        print(f"{h}p: gftt {t_gftt:.1f} ms | pyramid {t_pyr:.1f} ms | "
              f"lk_track {t_lk:.1f} ms", flush=True)

        # per-level: prep vs full level solve
        F = pts.shape[1]
        valid = jnp.asarray(np.arange(F)[None] < np.asarray(counts)[:, None])
        prep_j = jax.jit(functools.partial(LK._lk_prep, win=LK.WIN),
                         static_argnames=("bf16_extract",))
        g = jnp.asarray(pts / (2.0 ** 3))
        for lvl in range(3, -1, -1):
            ptsl = jnp.asarray(pts / (2.0 ** lvl))
            is0 = lvl == 0
            t_prep = timeit(lambda: jax.block_until_ready(
                prep_j(prev[lvl], curr[lvl], ptsl, g, bf16_extract=is0)))
            t_lvl = timeit(lambda: jax.block_until_ready(
                LK._lk_level_all_pallas(prev[lvl], curr[lvl], ptsl, g, valid,
                                        LK.WIN, LK.MAX_ITERS, LK.EPS, is0)))
            print(f"  level {lvl} ({prev[lvl].shape}): prep {t_prep:6.1f} ms | "
                  f"full {t_lvl:6.1f} ms", flush=True)
            g2, st = LK._lk_level_all_pallas(prev[lvl], curr[lvl], ptsl, g, valid,
                                             LK.WIN, LK.MAX_ITERS, LK.EPS, is0)
            g = g2 * (2.0 if lvl > 0 else 1.0)
            valid = valid & st


if __name__ == "__main__":
    main()
