#!/usr/bin/env python3
"""Attribute device time inside the fused DIS flow solve.

Times dis_flow at refine_rounds 0..3, plus the standalone stage kernels
at the real level shapes (96-frame 1080p clip -> 960x540 working grays).
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from comfyui_video_stabilizer_tpu.ops import flow_dis as FD


def timeit(label, fn, reps=3):
    print("compiling:", label, flush=True)
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    print(f"{label:46s} med {np.median(ts)*1e3:8.1f} ms", flush=True)
    return float(np.median(ts))


def sync(a):
    _ = float(np.asarray(a[tuple([0] * a.ndim)]))


def main():
    h, w = 540, 960
    n = 96
    key = jax.random.PRNGKey(0)
    grays = jax.random.uniform(key, (n, h, w), jnp.float32) * 255.0
    sync(grays)

    coarsest = FD.num_levels(h, w)
    finest = min(FD.FINEST_SCALE, coarsest)
    print("levels: coarsest", coarsest, "finest", finest, flush=True)

    for rounds in (0, 1, 2, 3):
        def run(r=rounds):
            f, c = FD._dis_flow_fused(grays, coarsest, finest, FD.RADIUS, FD.PATCH, r,
                                      "similarity")
            sync(f)
        timeit(f"dis_flow fused rounds={rounds}", run)

    # stage kernels at the two hot level shapes
    lvl2 = (n - 1, h >> 2, w >> 2)   # 135x240
    lvl1 = (n - 1, h >> 1, w >> 1)   # 270x480
    for (b, lh, lw), tag in ((lvl2, "lvl2"), (lvl1, "lvl1")):
        I = jax.random.uniform(jax.random.PRNGKey(1), (b, lh, lw), jnp.float32) * 255.0
        J = jax.random.uniform(jax.random.PRNGKey(2), (b, lh, lw), jnp.float32) * 255.0
        sync(I); sync(J)
        M = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (b, 3, 3))

        def warp_only():
            o = FD._warp_similarity_device(J, M, pad_t=32, radius=4)
            sync(o)
        timeit(f"warp_similarity {tag} ({lh}x{lw})", warp_only)

        def resid_full():
            f, c = FD._residual_flow(I, J, FD.RADIUS, FD.PATCH, False)
            sync(f)
        timeit(f"residual_flow cv r={FD.RADIUS} {tag}", resid_full)

        def resid_r2():
            f, c = FD._residual_flow(I, J, 2, FD.PATCH, False)
            sync(f)
        timeit(f"residual_flow cv r=2 {tag}", resid_r2)

        def resid_lk():
            f, c = FD._residual_flow(I, J, FD.RADIUS, FD.PATCH, True)
            sync(f)
        timeit(f"residual_flow lk-only {tag}", resid_lk)

        def fit_only():
            flow0 = jnp.zeros((b, lh, lw, 2), jnp.float32)
            conf0 = jnp.ones((b, lh, lw), jnp.float32)
            m = FD._fit_similarity_dense(flow0, conf0, 4)
            sync(m)
        timeit(f"fit_similarity {tag}", fit_only)


if __name__ == "__main__":
    main()
