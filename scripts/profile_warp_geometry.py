#!/usr/bin/env python3
"""Device sweep of Pallas-warp window geometries (round 5).

The (k, th, tw) plan fixes the window DMA amplification:
  amp = (wh / th) * (ww / tw)
with wh ~ th + k + 8 and ww >= tw + k + 127 (lane-aligned origins).
The shipped rule grows ww in powers of two from 256, wasting lane
bandwidth; this sweep measures multiple-of-128 windows and wider
tiles on the real bench coefficients, asserting bit-equality with the
shipped plan's output.
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


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
    from bench import synth_clip_device
    from comfyui_video_stabilizer_tpu.models import fastpath as FP
    from comfyui_video_stabilizer_tpu.models import flow as FL
    from comfyui_video_stabilizer_tpu.models import geometry as G
    from comfyui_video_stabilizer_tpu.ops import flow_dis as FD
    from comfyui_video_stabilizer_tpu.ops import ransac as RS
    from comfyui_video_stabilizer_tpu.ops import warp_pallas as WP

    h, w = 1080, 1920
    frames = synth_clip_device(n, h, w)
    frames.block_until_ready()

    # real bench coefficients: run estimation + trajectory once
    ws = G.working_estimation_size(w, h)
    res = FP.run_flow_fast(frames, "crop_and_pad", "similarity", False,
                           0.8, 0.6, 30.0, (w, h), ws, 1, (127, 127, 127))
    coeffs = np.zeros((n, 8), np.float64)
    from comfyui_video_stabilizer_tpu.ops import warp as W
    coeffs = W.prepare_inverse_coeffs(np.asarray(res["final_matrices"], np.float64))
    print("max |coeff c|:", np.abs(coeffs[:, 2]).max(), "|f|:", np.abs(coeffs[:, 5]).max())
    span64 = WP._max_tile_span(coeffs, 64, 256, -(-h // 64), -(-w // 256), True)
    print("tile span @64x256:", span64)
    for th, tw in ((64, 512), (128, 256), (128, 512)):
        s = WP._max_tile_span(coeffs, th, tw, -(-h // th), -(-w // tw), True)
        print(f"tile span @{th}x{tw}:", s)

    border = jnp.asarray([0.5, 0.5, 0.5], jnp.float32)
    cf = jnp.asarray(coeffs, jnp.float32).reshape(-1)
    src = jnp.asarray(frames, jnp.float32)

    def sync(x):
        jax.device_get(x[0, 0, 0, 0])

    results = {}

    def run_variant(label, k, th, tw, ww_rule):
        n_th = -(-h // th)
        n_tw = -(-w // tw)
        wh = -(-(th + k + 8) // 8) * 8
        if ww_rule == "pow2":
            ww = 256
            while ww < tw + k + 128:
                ww *= 2
        else:  # multiple-of-128 minimum
            ww = -(-(tw + k + 128) // 128) * 128
        pad_y = max(8, -(-(wh - h) // 2))
        pad_x = max(128, -(-(ww - w) // 2))
        amp = wh / th * ww / tw
        kw = dict(out_h=h, out_w=w, th=th, tw=tw, wh=wh, ww=ww, k=k,
                  n_th=n_th, n_tw=n_tw, in_h=h, in_w=w,
                  pad_y=pad_y, pad_x=pad_x, channels=3,
                  interp="bilinear", affine=True)
        try:
            out = WP._warp_pallas_call(src, cf, border, **kw)
            out.block_until_ready()
        except Exception as exc:
            print(f"{label:28s} FAILED: {str(exc)[:120]}")
            return
        m, mn = med(lambda: sync(WP._warp_pallas_call(src, cf, border, **kw)))
        results[label] = np.asarray(out[:2])
        print(f"{label:28s} amp {amp:4.2f}  med {m*1e3:7.1f} ms  min {mn*1e3:7.1f} ms")
        if "base" in results and label != "base":
            same = np.array_equal(results[label], results["base"])
            print(f"{'':28s} bit-equal vs base: {same}")

    run_variant("base k6 64x256 pow2", 6, 64, 256, "pow2")
    run_variant("k6 64x256 ww448", 6, 64, 256, "m128")
    run_variant("k6 64x512 ww768", 6, 64, 512, "m128")
    run_variant("k8 64x512 ww768", 8, 64, 512, "m128")
    run_variant("k6 128x512 ww768", 6, 128, 512, "m128")


if __name__ == "__main__":
    main()
