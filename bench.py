#!/usr/bin/env python3
"""Benchmark: 1080p Flow-path stabilization throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/sec", "vs_baseline": N}

vs_baseline is measured against the driver target of 500 frames/sec at
1080p on a single v5e (BASELINE.md).  The clip is generated and kept
ON DEVICE: this development environment reaches the chip through a
~20 MB/s tunnel, so host<->device transfer is excluded (as it would
not exist on a production host with a PCIe/DMA link); what is timed is
the full pipeline — grayscale + working-size downscale, the fused
coarse-to-fine dense-flow solve, RANSAC model fits, host trajectory
solve + smoothing + framing, and the Pallas warp + padding masks —
exactly what a user-facing stabilize call executes.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


TARGET_FPS = 500.0


def synth_clip_device(n, h, w, seed=0):
    """Synthetic shaken clip generated on device (no tunnel upload)."""
    import jax
    import jax.numpy as jnp

    from comfyui_video_stabilizer_tpu.ops import warp as W

    key = jax.random.PRNGKey(seed)
    hp, wp = h + 128, w + 128
    # multi-octave value noise: strong trackable texture at all scales
    base = jnp.zeros((hp, wp), jnp.float32)
    for octave, amp in ((4, 0.35), (16, 0.3), (64, 0.2), (256, 0.15)):
        key, sub = jax.random.split(key)
        coarse = jax.random.uniform(sub, (hp // octave + 2, wp // octave + 2), jnp.float32)
        up = jax.image.resize(coarse, (hp, wp), "bilinear")
        base = base + amp * up
    base = (base - base.min()) / (base.max() - base.min())
    base = base[..., None]
    base = jnp.concatenate([base, base * 0.7 + 0.1, 1.0 - base], axis=-1)

    rng = np.random.default_rng(seed)
    mats = [np.eye(3)]
    for i in range(1, n):
        th = 0.003 * np.sin(i / 3.0) + rng.uniform(-0.0015, 0.0015)
        t = rng.uniform(-3, 3, 2) + [5 * np.sin(i / 2.5), 3.5 * np.cos(i / 3.5)]
        d = np.array([[np.cos(th), -np.sin(th), t[0]], [np.sin(th), np.cos(th), t[1]], [0, 0, 1.0]])
        mats.append(d @ mats[-1])
    crop = np.eye(3)
    crop[0, 2] = crop[1, 2] = -64
    view = np.stack([crop @ np.linalg.inv(m) for m in mats])
    clip_bytes = n * h * w * 3 * 4
    if clip_bytes > W.CHUNK_BUDGET_BYTES // 2:
        # oversized clip (e.g. 4K/300f ~ 30 GB): synthesize in chunks
        # into a HOST buffer — the pipelines' streaming paths expect
        # exactly that, and a device broadcast would materialize the
        # whole clip in HBM
        out = np.empty((n, h, w, 3), np.float32)
        step = max(1, (W.CHUNK_BUDGET_BYTES // 16) // max(h * w * 3 * 4, 1))
        for s in range(0, n, step):
            e = min(n, s + step)
            sub = W.warp_clip(
                jnp.broadcast_to(base[None], (e - s,) + base.shape), view[s:e],
                (w, h), "bilinear", (0.5, 0.5, 0.5),
            )
            out[s:e] = np.asarray(sub)
        return out
    frames = W.warp_clip(
        jnp.broadcast_to(base[None], (n,) + base.shape), view, (w, h), "bilinear", (0.5, 0.5, 0.5)
    )
    return jnp.asarray(frames)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    import jax

    # persistent compile cache: the tunnel compiler costs minutes per kernel
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from comfyui_video_stabilizer_tpu.models.flow import stabilize_flow
    from comfyui_video_stabilizer_tpu.utils.video_io import FrameAdapter, VideoContext

    print(f"building synthetic 1080p clip on device ({n} frames)...", file=sys.stderr)
    frames = synth_clip_device(n, 1080, 1920)
    frames.block_until_ready()

    ctx = VideoContext(
        frames=frames,
        adapter=FrameAdapter(np.dtype(np.float32), False, "0_1", "numpy", False),
        width=1920,
        height=1080,
        channels=3,
        fps=30.0,
        template_kind="sequence",
        template_meta={},
    )

    import jax as _jax

    def run():
        res = stabilize_flow(
            ctx, "crop_and_pad", "similarity", False, 0.8, 0.6, 0.6, (127, 127, 127), 30.0
        )
        # full sync: frames AND masks must be materialized before the
        # clock stops.  Element fetches are used because through the
        # development tunnel block_until_ready returns early; one fused
        # device_get costs a single round trip.
        _jax.device_get((res.frames[0, 0, 0, 0], res.masks[0, 0, 0],
                         res.frames[-1, -1, -1, -1], res.masks[-1, -1, -1]))
        return res

    print("warmup (compile)...", file=sys.stderr)
    t0 = time.perf_counter()
    run()
    print(f"warmup {time.perf_counter() - t0:.1f}s; timed runs...", file=sys.stderr)

    mode_applied = run().meta["transform_mode_applied"]
    samples = []
    for trial in range(7):
        # settle the relay between trials: back-to-back runs queue
        # behind the previous run's D2H traffic in the development
        # tunnel and measure its backpressure (208 vs a stable 430 f/s
        # with the pause), not the pipeline.
        time.sleep(2.0)
        t0 = time.perf_counter()
        # the result is dropped INSIDE the trial: holding the previous
        # trial's device buffers across a run doubles the live output
        # set and reproducibly throttles later trials to ~half speed
        run()
        elapsed = time.perf_counter() - t0
        fps = n / elapsed
        samples.append(fps)
        print(
            f"trial {trial}: {elapsed:.2f}s for {n} frames -> {fps:.1f} f/s "
            f"(mode {mode_applied})",
            file=sys.stderr,
        )

    # dev-tunnel jitter mitigation: if the spread is pathological
    # (occasional multi-hundred-ms relay stalls), sample more and take
    # the median of everything — a neutral rule independent of the
    # result's value.
    if (max(samples) - min(samples)) / max(np.median(samples), 1e-9) > 0.25:
        print("high trial spread; sampling 4 extra trials...", file=sys.stderr)
        for trial in range(4):
            time.sleep(2.0)
            t0 = time.perf_counter()
            run()
            elapsed = time.perf_counter() - t0
            samples.append(n / elapsed)
            print(f"extra trial {trial}: {elapsed:.2f}s -> {samples[-1]:.1f} f/s",
                  file=sys.stderr)

    median = float(np.median(samples))
    print(
        json.dumps(
            {
                "metric": "1080p_flow_stabilize_frames_per_sec",
                "value": round(median, 2),
                "unit": "frames/sec",
                "vs_baseline": round(median / TARGET_FPS, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
