#!/usr/bin/env python3
"""TPU device smoke: kernel correctness + the 5 BASELINE configs.

Runs on the real chip (default environment).  CPU-side correctness is
covered by pytest; this script validates the device paths the CPU
suite cannot: the compiled Pallas warp, the fused flow solve, all five
BASELINE.json benchmark configurations (at reduced frame counts where
the full size would take minutes through the dev tunnel's compile
path), and prints stage timings.

Usage: python3 scripts/device_smoke.py [--full]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main() -> int:
    full = "--full" in sys.argv
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    import importlib.util

    spec = importlib.util.spec_from_file_location("bench", "bench.py")
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    from comfyui_video_stabilizer_tpu.models.classic import stabilize_classic
    from comfyui_video_stabilizer_tpu.models.flow import stabilize_flow
    from comfyui_video_stabilizer_tpu.models.motion_apply import apply_motion
    from comfyui_video_stabilizer_tpu.models import shake as S
    from comfyui_video_stabilizer_tpu.ops import warp as W
    from comfyui_video_stabilizer_tpu.ops import warp_pallas as WP
    from comfyui_video_stabilizer_tpu.utils.video_io import FrameAdapter, VideoContext

    failures = 0
    dev = jax.devices()[0]
    log(f"device: {dev} platform={dev.platform}")

    def ctx_for(frames, w, h, fps=24.0):
        return VideoContext(
            frames=frames,
            adapter=FrameAdapter(np.dtype(np.float32), False, "0_1", "numpy", False),
            width=w, height=h, channels=3, fps=fps,
            template_kind="sequence", template_meta={},
        )

    # --- kernel correctness: compiled pallas vs interpret ---
    rng = np.random.default_rng(0)
    frames = rng.random((2, 96, 160, 3)).astype(np.float32)
    theta = 0.012
    mats = np.stack([
        np.array([[np.cos(theta), -np.sin(theta), 4.2],
                  [np.sin(theta), np.cos(theta), -2.1],
                  [1e-6, -5e-7, 1.0]])] * 2)
    coeffs = W.prepare_inverse_coeffs(mats)
    for interp in ("bilinear", "bicubic"):
        dev_out = np.asarray(WP.warp_clip_pallas(frames, mats, coeffs, (160, 96), interp, (0.2, 0.4, 0.6)))
        ref_out = np.asarray(WP.warp_clip_pallas(frames, mats, coeffs, (160, 96), interp, (0.2, 0.4, 0.6), interpret=True))
        err = float(np.abs(dev_out - ref_out).max())
        ok = err < 1e-5
        log(f"pallas {interp} device==interpret: max err {err:.2e} {'OK' if ok else 'FAIL'}")
        failures += 0 if ok else 1

    # --- BASELINE configs (reduced frame counts unless --full) ---
    def timed(label, fn):
        nonlocal failures
        t0 = time.perf_counter()
        try:
            result = fn()
            dt = time.perf_counter() - t0
            log(f"{label}: OK ({dt:.2f}s)")
            return result
        except Exception as exc:
            log(f"{label}: FAIL {type(exc).__name__}: {exc}")
            failures += 1
            return None

    # config 1: Classic 480p similarity crop_and_pad
    n1 = 64 if full else 8
    clip480 = np.asarray(bench.synth_clip_device(n1, 480, 854))
    timed(f"config1 classic 480p/{n1}f", lambda: stabilize_classic(
        ctx_for(jnp.asarray(clip480), 854, 480), "crop_and_pad", "similarity",
        False, 0.7, 0.5, 0.6, (127, 127, 127), 30.0))

    # config 2: shake -> motion apply 720p bilinear deterministic
    n2 = 32 if full else 8
    clip720 = bench.synth_clip_device(n2, 720, 1280)
    meta2 = {"motion_meta": S.generate_shake_motion_meta(
        recipe=S.STYLES["handheld"], frame_count=n2, width=1280, height=720,
        fps=24.0, amount=1.0, speed=1.0, seed=7)}
    r2a = timed(f"config2 shake->apply 720p/{n2}f", lambda: apply_motion(
        ctx_for(clip720, 1280, 720), meta2, (127, 127, 127)))
    r2b = apply_motion(ctx_for(clip720, 1280, 720), meta2, (127, 127, 127))
    det = bool(np.array_equal(np.asarray(r2a.frames), np.asarray(r2b.frames)))
    log(f"config2 determinism: {'OK' if det else 'FAIL'}")
    failures += 0 if det else 1

    # config 3: flow 720p perspective + camera_lock
    n3 = 128 if full else 12
    clip720b = bench.synth_clip_device(n3, 720, 1280)
    timed(f"config3 flow 720p/{n3}f perspective+lock", lambda: stabilize_flow(
        ctx_for(clip720b, 1280, 720), "crop_and_pad", "perspective",
        True, 0.8, 0.6, 0.6, (127, 127, 127), 24.0))

    # config 4: motion apply blur Ultra 1080p bicubic
    n4 = 16 if full else 4
    clip1080 = bench.synth_clip_device(n4, 1080, 1920)
    meta4 = {"motion_meta": S.generate_shake_motion_meta(
        recipe=S.STYLES["action"], frame_count=n4, width=1920, height=1080,
        fps=24.0, amount=1.0, speed=1.0, seed=3)}
    timed(f"config4 apply blur-Ultra 1080p/{n4}f bicubic", lambda: apply_motion(
        ctx_for(clip1080, 1920, 1080), meta4, (127, 127, 127),
        interpolation="bicubic", motion_blur=0.5, motion_blur_samples=33))

    # config 5: 4K flow + expand + padding mask (streaming class).
    # With --full, the HOST-side streaming path is exercised by
    # temporarily lowering the HBM chunk budget on a 24-frame clip:
    # moving a real 300-frame/30 GB clip through the ~20 MB/s dev
    # tunnel costs ~an hour of pure I/O that a production PCIe host
    # does in seconds, and the code path is identical.
    n5 = 24 if full else 6
    saved_budget = W.CHUNK_BUDGET_BYTES
    try:
        if full:
            W.CHUNK_BUDGET_BYTES = 256 << 20  # force time-chunk streaming
        clip4k = bench.synth_clip_device(n5, 2160, 3840)
        if full:
            assert isinstance(clip4k, np.ndarray), "streaming synth expected"
        r5 = timed(f"config5 flow 4K/{n5}f expand (streamed={full})",
                   lambda: stabilize_flow(
                       ctx_for(clip4k, 3840, 2160), "expand", "similarity",
                       False, 0.8, 0.6, 0.6, (127, 127, 127), 24.0))
    finally:
        W.CHUNK_BUDGET_BYTES = saved_budget
    if r5 is not None:
        masks = np.asarray(r5.masks)
        log(f"config5 mask shape {masks.shape}, padding max {masks.max():.3f}")

    log(f"device_smoke: {'ALL OK' if failures == 0 else f'{failures} FAILURE(S)'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
