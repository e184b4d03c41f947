#!/usr/bin/env python3
"""Ablation microbench of the Pallas warp kernel internals.

Builds hacked kernel variants (no rolls / no FMA loop / DMA only) to
attribute the ~150 ms/96f kernel time. Results are WRONG numerically;
this is timing-only.
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from comfyui_video_stabilizer_tpu.ops import warp as W
from comfyui_video_stabilizer_tpu.ops import warp_pallas as WP


def make_kernel_variant(*, th, tw, wh, ww, k, n_th, n_tw, in_h, in_w, pad_y, pad_x,
                        channels, variant):
    taps = 2
    tap_start = 0

    def kernel(origins_ref, coeffs_ref, border_ref, img_ref, out_ref, win, rolled, sem):
        n = pl.program_id(0)
        ty = pl.program_id(1)
        tx = pl.program_id(2)
        tile_id = (n * n_th + ty) * n_tw + tx
        total_tiles = pl.num_programs(0) * n_th * n_tw
        ry = origins_ref[4 * tile_id + 2]
        rx = origins_ref[4 * tile_id + 3]
        oy = pl.multiple_of(origins_ref[4 * tile_id], 8) + ry
        ox = pl.multiple_of(origins_ref[4 * tile_id + 1], 128) + rx

        def dma_for(tid):
            slot = jax.lax.rem(tid, 2)
            fn = tid // (n_th * n_tw)
            oy_t = pl.multiple_of(origins_ref[4 * tid], 8)
            ox_t = pl.multiple_of(origins_ref[4 * tid + 1], 128)
            return pltpu.make_async_copy(
                img_ref.at[fn, :, pl.ds(oy_t, wh), pl.ds(ox_t, ww)],
                win.at[slot],
                sem.at[slot],
            )

        @pl.when(tile_id == 0)
        def _():
            dma_for(tile_id).start()

        @pl.when(tile_id + 1 < total_tiles)
        def _():
            dma_for(tile_id + 1).start()

        cp = dma_for(tile_id)

        ylo = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0).astype(jnp.float32)
        xlo = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1).astype(jnp.float32)
        ygf = ylo + (ty * th).astype(jnp.float32)
        xgf = xlo + (tx * tw).astype(jnp.float32)

        a = coeffs_ref[n * 8 + 0]; b = coeffs_ref[n * 8 + 1]; c = coeffs_ref[n * 8 + 2]
        d = coeffs_ref[n * 8 + 3]; e = coeffs_ref[n * 8 + 4]; f = coeffs_ref[n * 8 + 5]
        g = coeffs_ref[n * 8 + 6]; h = coeffs_ref[n * 8 + 7]

        denom = 1.0 + g * xgf + h * ygf
        safe = denom != 0.0
        inv_d = jnp.where(safe, 1.0 / jnp.where(safe, denom, 1.0), 0.0)
        qx = (a - 1.0) * xgf + b * ygf + c - (g * xgf) * xgf - (h * xgf) * ygf
        qy = d * xgf + (e - 1.0) * ygf + f - (g * ygf) * xgf - (h * ygf) * ygf
        lim = 1.0e6
        dxf = jnp.clip(jnp.where(safe, qx * inv_d, -lim), -lim, lim)
        dyf = jnp.clip(jnp.where(safe, qy * inv_d, -lim), -lim, lim)

        fdx = jnp.floor(dxf); fdy = jnp.floor(dyf)
        fx = dxf - fdx; fy = dyf - fdy
        ix = (xgf + fdx).astype(jnp.int32)
        iy = (ygf + fdy).astype(jnp.int32)
        ex = (tx * tw) + fdx.astype(jnp.int32) + tap_start + pad_x - ox
        ey = (ty * th) + fdy.astype(jnp.int32) + tap_start + pad_y - oy

        wx_tap = [1.0 - fx, fx]
        wy_tap = [1.0 - fy, fy]

        def axis_weights(e0, base, size, w_tap, kk):
            out = None
            for t in range(taps):
                tap_coord = base + tap_start + t
                val = (tap_coord >= 0) & (tap_coord <= size - 1)
                m = jnp.where((e0 + t == kk) & val, w_tap[t], 0.0)
                out = m if out is None else out + m
            return out

        cp.wait()
        cur = jax.lax.rem(tile_id, 2)

        if variant in ("full", "noloop"):
            for ch in range(channels):
                rolled[ch] = pltpu.roll(pltpu.roll(win[cur, ch], -rx, 1), -ry, 0)
        else:  # noroll / dmaonly: copy without rolls
            for ch in range(channels):
                rolled[ch] = win[cur, ch]

        if variant in ("full", "noroll"):
            accs = [jnp.zeros((th, tw), jnp.float32) for _ in range(channels)]
            wsum = jnp.zeros((th, tw), jnp.float32)
            wxs = [axis_weights(ex, ix, in_w, wx_tap, kx) for kx in range(k)]
            for ky in range(k):
                wy = axis_weights(ey, iy, in_h, wy_tap, ky)
                for kx in range(k):
                    wgt = wy * wxs[kx]
                    wsum = wsum + wgt
                    for ch in range(channels):
                        accs[ch] = accs[ch] + wgt * rolled[ch, ky : ky + th, kx : kx + tw]
            for ch in range(channels):
                out_ref[0, ch] = accs[ch] + border_ref[ch] * (1.0 - wsum)
        else:
            for ch in range(channels):
                out_ref[0, ch] = rolled[ch, 0:th, 0:tw] + border_ref[ch]

    return kernel


@functools.partial(jax.jit, static_argnames=("out_h", "out_w", "plan_key", "variant"))
def call_variant(frames_nhwc, origins, coeffs32, border, *, out_h, out_w, plan_key, variant):
    th, tw, wh, ww, k, n_th, n_tw, in_h, in_w, pad_y, pad_x, channels = plan_key
    planar_padded = jnp.pad(
        jnp.transpose(frames_nhwc, (0, 3, 1, 2)),
        ((0, 0), (0, 0), (pad_y, pad_y), (pad_x, pad_x)),
    )
    n = planar_padded.shape[0]
    kernel = make_kernel_variant(
        th=th, tw=tw, wh=wh, ww=ww, k=k, n_th=n_th, n_tw=n_tw,
        in_h=in_h, in_w=in_w, pad_y=pad_y, pad_x=pad_x,
        channels=channels, variant=variant,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n, n_th, n_tw),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.SMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.SMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=pl.BlockSpec(
            (1, channels, th, tw),
            lambda i, j, kk, *_: (i, 0, j, kk),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, channels, wh, ww), jnp.float32),
            pltpu.VMEM((channels, wh, ww), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, channels, n_th * th, n_tw * tw), jnp.float32),
    )(origins, coeffs32, border, planar_padded)
    return jnp.transpose(out[:, :, :out_h, :out_w], (0, 2, 3, 1))


def main():
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
    print("plan: k", plan["k"], "tile", (plan["th"], plan["tw"]), "win",
          (plan["wh"], plan["ww"]))
    plan_key = (plan["th"], plan["tw"], plan["wh"], plan["ww"], plan["k"],
                plan["n_th"], plan["n_tw"], 1080, 1920, plan["pad_y"], plan["pad_x"], 3)

    origins = jnp.asarray(plan["origins"], jnp.int32)
    coeffs32 = jnp.asarray(coeffs, jnp.float32).reshape(-1)
    border = jnp.asarray([0.5, 0.5, 0.5], jnp.float32)

    for variant in ("full", "noroll", "noloop", "dmaonly"):
        def run():
            out = call_variant(frames, origins, coeffs32, border,
                               out_h=1080, out_w=1920, plan_key=plan_key, variant=variant)
            sync(out)
        run()
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            run()
            ts.append(time.perf_counter() - t0)
        med = float(np.median(ts))
        print(f"{variant:10s} med {med*1e3:8.1f} ms ({n/med:7.1f} f/s)")


if __name__ == "__main__":
    main()
