"""Classic pipeline end-to-end: synthetic known-motion recovery + replay."""

import numpy as np

from comfyui_video_stabilizer_tpu.models import classic as C
from comfyui_video_stabilizer_tpu.models import geometry as G
from comfyui_video_stabilizer_tpu.models import motion_apply as MA
from comfyui_video_stabilizer_tpu.ops import lk as LK
from comfyui_video_stabilizer_tpu.ops import warp as W
from comfyui_video_stabilizer_tpu.utils.video_io import normalize_video_input

GRAY = (127, 127, 127)


def _textured_base(h, w, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.random((h, w), np.float32)
    # blur to create trackable blobs + add corners grid
    import cv2

    base = cv2.GaussianBlur(base, (9, 9), 2.0)
    for y in range(10, h - 10, 24):
        for x in range(10, w - 10, 24):
            base[y - 2 : y + 2, x - 2 : x + 2] = (x * 13 + y * 7) % 3 / 2.0
    img = np.stack([base, base * 0.8 + 0.1, 1.0 - base], axis=-1)
    return np.clip(img, 0, 1).astype(np.float32)


def _shaken_clip(n=8, h=144, w=192, seed=0):
    """Warp a static textured scene by known per-frame similarity motion."""
    base = _textured_base(h + 80, w + 80, seed)
    rng = np.random.default_rng(seed + 1)
    mats = [np.eye(3)]
    truth = []
    for i in range(1, n):
        theta = rng.uniform(-0.01, 0.01)
        t = rng.uniform(-3, 3, 2)
        d = np.array(
            [
                [np.cos(theta), -np.sin(theta), t[0]],
                [np.sin(theta), np.cos(theta), t[1]],
                [0, 0, 1.0],
            ]
        )
        truth.append(d)
        mats.append(d @ mats[-1])
    crop = np.eye(3)
    crop[0, 2], crop[1, 2] = -40, -40  # sample interior so borders stay textured
    view_mats = np.stack([crop @ np.linalg.inv(m) for m in mats])
    frames = np.asarray(W.warp_clip(np.repeat(base[None], n, 0), view_mats, (w, h), "bilinear", (0.5, 0.5, 0.5)))
    return frames, truth


def test_gftt_finds_corners():
    frames, _ = _shaken_clip(n=2)
    from comfyui_video_stabilizer_tpu.ops import resize as R

    grays = R.make_gray(frames)
    pts, counts = map(np.asarray, LK.gftt_batch(np.asarray(grays)[:1]))
    assert counts[0] >= 100
    # min-distance respected
    p = pts[0, : counts[0]]
    d2 = ((p[:, None] - p[None]) ** 2).sum(-1) + np.eye(counts[0]) * 1e9
    assert d2.min() >= 7.0**2 - 1e-3


def test_gftt_device_greedy_matches_host_oracle():
    """The on-device greedy scan must reproduce the sequential host
    greedy (C++ native / python) acceptance exactly — same corners,
    same order, same counts."""
    frames, _ = _shaken_clip(n=4, seed=9)
    from comfyui_video_stabilizer_tpu.ops import resize as R

    grays = np.asarray(R.make_gray(frames))
    pts_d, counts_d = map(np.asarray, LK.gftt_batch(grays))
    pts_h, counts_h = LK.gftt_batch_host(grays)
    assert np.array_equal(counts_d, counts_h)
    assert np.array_equal(pts_d, pts_h)


def test_lk_tracks_known_translation():
    frames, truth = _shaken_clip(n=3, seed=2)
    from comfyui_video_stabilizer_tpu.ops import resize as R

    grays = R.make_gray(frames)
    pts, counts = map(np.asarray, LK.gftt_batch(grays[:-1]))
    pyr = LK.gaussian_pyramid(grays)
    tracked, status = LK.lk_track([l[:-1] for l in pyr], [l[1:] for l in pyr], pts, counts)
    tracked = np.asarray(tracked); status = np.asarray(status)
    assert status.sum(axis=1).min() >= 50
    # median shift should match the known motion's effect prev->curr.
    # scene static, camera view moves by d => pixels move by inv-view delta;
    # frame k+1 = warp(base, crop @ inv(M_{k+1})): pixel motion matrix is
    # (crop @ inv(M_{k+1})) @ inv(crop @ inv(M_k)) ~= similarity with small params.
    for b in range(2):
        v = status[b]
        shift = np.median(tracked[b][v] - pts[b][v], axis=0)
        assert np.all(np.abs(shift) < 6.0)  # small, bounded by truth magnitudes


def test_classic_estimator_recovers_similarity():
    frames, truth = _shaken_clip(n=6, seed=4)
    from comfyui_video_stabilizer_tpu.ops import resize as R

    grays = R.make_gray(frames)
    fits = C.classic_estimator(grays, "similarity")
    assert not fits.degenerate.any()
    assert fits.accepted["similarity"].all()
    # reprojection check: fitted matrix must predict tracked motion closely
    assert (fits.confidences["similarity"] > 0.5).all()


def test_classic_stabilize_end_to_end_and_replay():
    frames, _ = _shaken_clip(n=8, seed=6)
    ctx = normalize_video_input(frames)
    res = C.stabilize_classic(
        ctx, "crop_and_pad", "similarity", False, 0.7, 0.5, 0.6, GRAY, 16.0
    )
    meta = res.meta
    assert meta["frames"] == 8
    assert meta["transform_mode_applied"] == "similarity"
    assert "motion_meta" in meta
    assert len(meta["stabilization_warp"]["per_frame"]) == 8
    # stabilization should reduce frame-to-frame pixel motion vs input
    orig_diff = np.abs(np.diff(frames, axis=0)).mean()
    stab_interior = res.frames[:, 20:-20, 20:-20]
    stab_diff = np.abs(np.diff(stab_interior, axis=0)).mean()
    assert stab_diff < orig_diff

    # replay contract: Motion Apply on original frames + meta reproduces
    # the stabilizer's own output bit-exactly (same warp kernel, same mats)
    replay = MA.apply_motion(normalize_video_input(frames), meta, GRAY)
    np.testing.assert_array_equal(replay.frames, res.frames)
    np.testing.assert_array_equal(replay.masks, res.masks)


def test_classic_camera_lock_zero_target():
    frames, _ = _shaken_clip(n=5, seed=8)
    ctx = normalize_video_input(frames)
    res = C.stabilize_classic(ctx, "expand", "translation", True, 1.0, 0.2, 0.6, GRAY, 16.0)
    tp = np.asarray(res.meta["estimated_motion"]["target_path"])
    assert np.all(tp == 0)
    assert res.meta["framing"]["expanded_size"][0] >= frames.shape[2]


def test_classic_crop_mode_no_padding():
    frames, _ = _shaken_clip(n=6, seed=10)
    ctx = normalize_video_input(frames)
    res = C.stabilize_classic(ctx, "crop", "similarity", False, 1.0, 0.8, 0.6, GRAY, 16.0)
    fm = res.meta["framing"]
    assert fm["mode"] == "crop"
    assert fm["keep_fov_status"] in ("met", "clamped", "failed", "disabled")
    assert res.frames.shape == frames.shape
    # crop contract: zero padding anywhere
    assert res.meta["padding_fraction_max"] <= 1e-6


def test_single_frame_and_empty():
    frames, _ = _shaken_clip(n=1)
    ctx = normalize_video_input(frames[:1])
    res = C.stabilize_classic(ctx, "crop", "similarity", False, 0.7, 0.5, 0.6, GRAY, 16.0)
    assert res.meta["note"].startswith("Single-frame")
    assert np.asarray(res.masks).max() == 0.0


def test_extract_windows_matches_direct_slicing():
    """Hierarchical one-hot window extraction is an exact selection:
    bit-identical to direct numpy slicing for interior, edge, and
    out-of-range corners, in both f32 and the bf16-select mode (on
    bf16-exact integer-valued images)."""
    rng = np.random.default_rng(3)
    B, H, W, F = 5, 61, 83, 17
    stack = np.floor(rng.random((B, H, W)).astype(np.float32) * 256.0)
    corners = np.stack(
        [rng.integers(-30, W + 30, (B, F)), rng.integers(-30, H + 30, (B, F))],
        axis=-1,
    ).astype(np.int32)
    # force exact-edge cases
    corners[0, 0] = (0, 0)
    corners[0, 1] = (W - 1, H - 1)
    corners[0, 2] = (-1, 5)
    for wext, bf16 in ((49, False), (49, True), (36, False), (13, False)):
        got = np.asarray(
            LK._extract_windows_batched(
                np.asarray(stack), np.asarray(corners), wext, chunk=2, bf16=bf16
            )
        )
        pad = wext
        padded = np.pad(stack, ((0, 0), (pad, pad), (pad, pad)))
        Hp, Wp = H + 2 * pad, W + 2 * pad
        for b in range(B):
            for f in range(F):
                cy = int(np.clip(corners[b, f, 1] + pad, 0, Hp - wext))
                cx = int(np.clip(corners[b, f, 0] + pad, 0, Wp - wext))
                ref = padded[b, cy : cy + wext, cx : cx + wext]
                np.testing.assert_array_equal(
                    got[b, f], ref, err_msg=f"wext={wext} bf16={bf16} b={b} f={f}"
                )


def test_extract_windows_dma_matches_onehot():
    """The Pallas DMA extraction (device path) is bit-identical to the
    one-hot selection path for interior, edge, and out-of-range corners
    — including the F-to-feature-block padding round trip."""
    import jax.numpy as jnp

    from comfyui_video_stabilizer_tpu.ops import extract_pallas as EP

    rng = np.random.default_rng(11)
    B, H, W = 4, 57, 91
    stack = rng.random((B, H, W)).astype(np.float32)
    for wext, F in ((49, 17), (36, 129), (13, 8)):
        corners = np.stack(
            [rng.integers(-30, W + 30, (B, F)), rng.integers(-30, H + 30, (B, F))],
            axis=-1,
        ).astype(np.int32)
        corners[0, 0] = (0, 0)
        corners[0, 1] = (W - 1, H - 1)
        pad = wext
        padded = np.pad(stack, ((0, 0), (pad, pad), (pad, pad)))
        Hp, Wp = H + 2 * pad, W + 2 * pad
        cy = np.clip(corners[..., 1] + pad, 0, Hp - wext)
        cx = np.clip(corners[..., 0] + pad, 0, Wp - wext)
        got = np.asarray(
            EP.extract_windows_dma(
                jnp.asarray(padded), jnp.asarray(cy), jnp.asarray(cx), wext,
                interpret=True,
            )
        )
        for b in range(B):
            for f in range(F):
                ref = padded[b, cy[b, f] : cy[b, f] + wext, cx[b, f] : cx[b, f] + wext]
                np.testing.assert_array_equal(
                    got[b, f], ref, err_msg=f"wext={wext} F={F} b={b} f={f}"
                )
