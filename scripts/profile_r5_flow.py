#!/usr/bin/env python3
"""Round-5 focused timing: per-program device cost of the flagship
fast path with RTT subtraction.

Each stage is timed warm with a 1-element device_get sync; the tunnel
round-trip cost is measured separately on a no-op program and printed
so stage costs can be read net of it.
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def med(fn, reps=5):
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), float(min(ts))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from bench import synth_clip_device
    from comfyui_video_stabilizer_tpu.models import fastpath as FP
    from comfyui_video_stabilizer_tpu.models import flow as FL
    from comfyui_video_stabilizer_tpu.models import geometry as G
    from comfyui_video_stabilizer_tpu.ops import flow_dis as FD
    from comfyui_video_stabilizer_tpu.ops import ransac as RS
    from comfyui_video_stabilizer_tpu.ops import warp as W
    from comfyui_video_stabilizer_tpu.ops import warp_pallas as WP

    h, w = 1080, 1920
    frames = synth_clip_device(n, h, w)
    frames.block_until_ready()

    # tunnel RTT: scalar fetch of an already-materialized value
    one = jnp.float32(1.0) + 0.0
    one.block_until_ready()
    rtt_m, rtt_min = med(lambda: jax.device_get(one), reps=9)
    print(f"tunnel RTT (scalar fetch)          med {rtt_m*1e3:7.1f} ms  min {rtt_min*1e3:7.1f} ms")

    ws = G.working_estimation_size(w, h)
    plan = FP._speculative_plan(h, w, h, w, affine=True)

    def sync(x):
        jax.device_get(x[(0,) * x.ndim])

    # stage 1: fused ingest
    factors = FP._gray_pool_factors(w, h, ws, 1)
    print("pool factors:", factors)
    def s_ingest():
        padded, grays = FP._ingest(frames, plan["pad_y"], plan["pad_x"],
                                   factors[0], factors[1])
        sync(grays)
        return padded, grays
    m, mn = med(s_ingest)
    print(f"ingest (pad+gray)                  med {m*1e3:7.1f} ms  min {mn*1e3:7.1f} ms")
    padded, grays = s_ingest()

    # stage 2: DIS flow samples
    def s_dis():
        s = FD.dis_flow_fit(grays, FL.SAMPLE_STEP, finest_scale=FD.FINEST_SCALE,
                            model="similarity")
        sync(s)
        return s
    m, mn = med(s_dis)
    print(f"dis_flow_fit                       med {m*1e3:7.1f} ms  min {mn*1e3:7.1f} ms")
    samples = s_dis()

    # stage 3: fused fits
    gh, gw = int(grays.shape[1]), int(grays.shape[2])
    pts = FL._grid_points(gh, gw, FL.SAMPLE_STEP)
    def s_fits():
        f = FL._fused_fits_sampled(samples, pts, 0, False, RS.DEFAULT_HYPOTHESES)
        sync(f[0])
        return f
    m, mn = med(s_fits)
    print(f"fused_fits                         med {m*1e3:7.1f} ms  min {mn*1e3:7.1f} ms")
    fits = s_fits()

    # stage 4: trajectory program
    plan_key = (plan["k"], plan["th"], plan["tw"], plan["n_th"], plan["n_tw"],
                plan["sub"], plan["margin"], plan["extra"])
    window = G.smoothing_window(0.6, 30.0)
    total_pts = ((540 + FL.SAMPLE_STEP - 1) // FL.SAMPLE_STEP) * ((960 + FL.SAMPLE_STEP - 1) // FL.SAMPLE_STEP)
    def s_traj():
        out = FP._traj_program(
            jnp.float32(0.8), jnp.float32(1.0), *fits, kind="flow", mode="similarity",
            want_persp=False, camera_lock=False, window=window,
            width=w, height=h, scale_xy=(0.5, 0.5), total_pts=total_pts,
            plan=plan_key, framing="crop_and_pad", bucket=None)
        sync(out["coeffs"])
        return out
    m, mn = med(s_traj)
    print(f"traj program                       med {m*1e3:7.1f} ms  min {mn*1e3:7.1f} ms")
    out = s_traj()

    # stage 5: padding stats
    def s_stats():
        masks, ratios = W._padding_stats_xla(out["coeffs"], h, w, h, w)
        sync(ratios)
        return masks, ratios
    m, mn = med(s_stats)
    print(f"padding stats                      med {m*1e3:7.1f} ms  min {mn*1e3:7.1f} ms")

    # stage 6: pallas warp (pre-padded source)
    border = jnp.asarray(np.array([0.5, 0.5, 0.5], np.float32))
    warp_kw = dict(out_h=h, out_w=w, th=plan["th"], tw=plan["tw"],
                   wh=plan["wh"], ww=plan["ww"], k=plan["k"],
                   n_th=plan["n_th"], n_tw=plan["n_tw"], in_h=h, in_w=w,
                   pad_y=plan["pad_y"], pad_x=plan["pad_x"], channels=3,
                   interp="bilinear", affine=True, pre_padded=True,
                   planar=False)
    def s_warp():
        sout = WP._warp_pallas_call(padded, out["coeffs"].reshape(-1), border, **warp_kw)
        sync(sout)
        return sout
    m, mn = med(s_warp)
    print(f"pallas warp k={plan['k']}                   med {m*1e3:7.1f} ms  min {mn*1e3:7.1f} ms")

    # full fast path for reference
    def s_full():
        r = FP.run_flow_fast(frames, "crop_and_pad", "similarity", False,
                             0.8, 0.6, 30.0, (w, h), ws, 1, (127, 127, 127))
        jax.device_get((r["stabilized"][0, 0, 0, 0], r["padding_masks"][0, 0, 0],
                        r["stabilized"][-1, -1, -1, -1], r["padding_masks"][-1, -1, -1]))
    m, mn = med(s_full)
    print(f"FULL fast path                     med {m*1e3:7.1f} ms  min {mn*1e3:7.1f} ms")
    print(f"f/s at med: {n/m:.1f}, at min: {n/mn:.1f}")


if __name__ == "__main__":
    main()
