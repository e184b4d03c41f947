#!/usr/bin/env python3
"""Dissect the 1080p warp cost: kernel vs layout vs mask vs plan variant."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from comfyui_video_stabilizer_tpu.ops import warp as W
    from comfyui_video_stabilizer_tpu.ops import warp_pallas as WP

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    key = jax.random.PRNGKey(0)
    frames = jax.random.uniform(key, (n, 1080, 1920, 3), jnp.float32)

    def sync(a):
        _ = float(np.asarray(a[tuple([0] * a.ndim)]))

    sync(frames)

    rng = np.random.default_rng(0)
    mats = np.tile(np.eye(3, dtype=np.float64), (n, 1, 1))
    th_ = rng.uniform(-0.004, 0.004, n)
    mats[:, 0, 0] = np.cos(th_); mats[:, 0, 1] = -np.sin(th_)
    mats[:, 1, 0] = np.sin(th_); mats[:, 1, 1] = np.cos(th_)
    mats[:, 0, 2] = rng.uniform(-8, 8, n)
    mats[:, 1, 2] = rng.uniform(-8, 8, n)
    coeffs = W.prepare_inverse_coeffs(mats)

    plan = WP._plan(coeffs, 1080, 1920, 1080, 1920, cubic=False)
    print("plan: k", plan["k"], "tile", (plan["th"], plan["tw"]),
          "win", (plan["wh"], plan["ww"]), "pad", (plan["pad_y"], plan["pad_x"]))

    def timeit(label, fn, reps=3):
        fn()
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        print(f"{label:38s} med {np.median(ts)*1e3:8.1f} ms ({n/np.median(ts):7.1f} f/s)")
        return float(np.median(ts))

    border = np.asarray([0.5, 0.5, 0.5], np.float32)

    def pallas_full():
        out = WP.warp_clip_pallas(frames, mats, coeffs, (1920, 1080), "bilinear", border)
        sync(out)

    # layout-only program: transpose+pad exactly as the wrapper does
    @jax.jit
    def layout_only(fr):
        return jnp.pad(
            jnp.transpose(fr, (0, 3, 1, 2)),
            ((0, 0), (0, 0), (plan["pad_y"], plan["pad_y"]), (plan["pad_x"], plan["pad_x"])),
        )

    def layout():
        out = layout_only(frames)
        sync(out)

    def mask_only():
        m = W.coverage_mask(mats, (1920, 1080), (1920, 1080))
        sync(m)

    def with_mask():
        out, m = W.warp_clip_with_mask(frames, mats, (1920, 1080), "bilinear", border)
        sync(out)
        sync(m)

    # out-transpose only
    planar = jnp.transpose(frames, (0, 3, 1, 2))
    sync(planar)

    @jax.jit
    def untranspose(x):
        return jnp.transpose(x, (0, 2, 3, 1))

    def out_t():
        out = untranspose(planar)
        sync(out)

    timeit("pallas warp (incl layout)", pallas_full)
    timeit("layout in-transpose+pad only", layout)
    timeit("out-transpose only", out_t)
    timeit("coverage mask only", mask_only)
    timeit("warp_clip_with_mask (dispatcher)", with_mask)


if __name__ == "__main__":
    main()
