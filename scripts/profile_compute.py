#!/usr/bin/env python3
"""True device-compute cost per pipeline stage, tunnel-latency-free.

Each stage is dispatched R times (distinct inputs so nothing caches),
then ONE final element fetch; per-op cost = (T_R - T_1) / (R - 1).
The single-dispatch wall time T_1 absorbs the tunnel round trip, so
the difference isolates queued device execution.
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from bench import synth_clip_device
    from comfyui_video_stabilizer_tpu.models import geometry as G
    from comfyui_video_stabilizer_tpu.ops import flow_dis as FD
    from comfyui_video_stabilizer_tpu.ops import resize as R_
    from comfyui_video_stabilizer_tpu.ops import warp as W
    from comfyui_video_stabilizer_tpu.ops import warp_pallas as WP

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    R = 6
    frames = synth_clip_device(n, 1080, 1920)
    frames.block_until_ready()

    rng = np.random.default_rng(0)
    mats = np.tile(np.eye(3, dtype=np.float64), (n, 1, 1))
    th_ = rng.uniform(-0.004, 0.004, n)
    mats[:, 0, 0] = np.cos(th_); mats[:, 0, 1] = -np.sin(th_)
    mats[:, 1, 0] = np.sin(th_); mats[:, 1, 1] = np.cos(th_)
    mats[:, 0, 2] = rng.uniform(-8, 8, n)
    mats[:, 1, 2] = rng.uniform(-8, 8, n)
    coeffs = W.prepare_inverse_coeffs(mats)
    border = np.asarray([0.5, 0.5, 0.5], np.float32)

    def sync(a):
        _ = float(np.asarray(a[tuple([0] * a.ndim)]))

    def measure(label, fn):
        # fn(i) -> device array; warm once, then T_1 and T_R.  Only a
        # 2-deep window of output refs is kept alive (the big padded
        # planar buffers are ~4 GB each; the queue frees them in order).
        sync(fn(0))
        t0 = time.perf_counter()
        sync(fn(1))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        prev = None
        for i in range(R):
            out = fn(i + 2)
            prev = out
        sync(prev)
        tr = time.perf_counter() - t0
        per = (tr - t1) / (R - 1)
        print(f"{label:36s} {per*1e3:8.1f} ms/op   (T1 {t1*1e3:6.1f}, T{R} {tr*1e3:7.1f})",
              flush=True)
        return per

    plan = WP._plan(coeffs, 1080, 1920, 1080, 1920, cubic=False)

    @jax.jit
    def layout_only(fr, s):
        return jnp.pad(
            jnp.transpose(fr + s, (0, 3, 1, 2)),
            ((0, 0), (0, 0), (plan["pad_y"], plan["pad_y"]), (plan["pad_x"], plan["pad_x"])),
        )

    @jax.jit
    def transpose_only(fr, s):
        return jnp.transpose(fr + s, (0, 3, 1, 2))

    planar = jnp.transpose(frames, (0, 3, 1, 2))
    planar.block_until_ready()

    @jax.jit
    def untranspose(x, s):
        return jnp.transpose(x + s, (0, 2, 3, 1))

    measure("in transpose+pad", lambda i: layout_only(frames, np.float32(i * 1e-8)))
    measure("in transpose only", lambda i: transpose_only(frames, np.float32(i * 1e-8)))
    measure("out transpose", lambda i: untranspose(planar, np.float32(i * 1e-8)))
    measure("full pallas warp (incl layout)",
            lambda i: WP.warp_clip_pallas(frames + np.float32(i * 1e-8), mats, coeffs,
                                          (1920, 1080), "bilinear", border))
    measure("coverage mask stats",
            lambda i: W.padding_mask_stats(mats + i * 1e-12, (1920, 1080), (1920, 1080))[0])
    measure("gray_for_estimation",
            lambda i: R_.gray_for_estimation(frames + np.float32(i * 1e-8), (960, 540)))

    from comfyui_video_stabilizer_tpu.models import flow as FL

    dec = FL._gray_decimation(1920, 1080, (960, 540))
    grays_d = R_.gray_for_estimation(frames, (960, 540), decimation=dec)
    grays_d.block_until_ready()
    step = FL.SAMPLE_STEP // dec if dec > 1 else FL.SAMPLE_STEP
    fs = 0 if dec > 1 else FD.FINEST_SCALE

    def dis_fit(i):
        s = FD.dis_flow_fit(grays_d + np.float32(i * 1e-6), step,
                            finest_scale=fs, model="similarity")
        return s

    measure(f"DIS fit solve (dec={dec})", dis_fit)
    samples = dis_fit(0)
    samples.block_until_ready()
    # samples are decimated-grid flow scaled back to working px; the fit
    # grid is always the WORKING-res 8-px lattice (models/flow.py)
    pts = FL._grid_points(540, 960, FL.SAMPLE_STEP)
    import comfyui_video_stabilizer_tpu.ops.ransac as RS
    measure("fused RANSAC fits",
            lambda i: FL._fused_fits_sampled(samples + np.float32(i * 1e-6), pts, 0,
                                             False, RS.DEFAULT_HYPOTHESES)[0])


if __name__ == "__main__":
    main()
