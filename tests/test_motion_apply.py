"""Motion Apply engine tests: framings, blur, replay, inverse round-trip."""

import numpy as np
import pytest

from comfyui_video_stabilizer_tpu.meta import motion_meta as MM
from comfyui_video_stabilizer_tpu.models import motion_apply as MA
from comfyui_video_stabilizer_tpu.models import inverse as INV
from comfyui_video_stabilizer_tpu.models import shake as S
from comfyui_video_stabilizer_tpu.utils.video_io import normalize_video_input

GRAY = (127, 127, 127)


def _frames(n=6, h=96, w=128, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.stack(
        [
            (xx / w).astype(np.float32),
            (yy / h).astype(np.float32),
            ((xx + yy) % 17 / 17.0).astype(np.float32),
        ],
        axis=-1,
    )
    frames = np.stack([base * (0.5 + 0.5 * np.cos(i / 3)) for i in range(n)])
    frames += rng.random((n, h, w, 3), dtype=np.float32) * 0.05
    return np.clip(frames, 0, 1).astype(np.float32)


def _ctx(frames):
    return normalize_video_input(frames)


def _shake_meta(n, w, h, fps=16.0, style="handheld", seed=0, amount=1.0):
    return {
        "motion_meta": S.generate_shake_motion_meta(
            recipe=S.STYLES[style],
            frame_count=n,
            width=w,
            height=h,
            fps=fps,
            amount=amount,
            speed=1.0,
            seed=seed,
            style=style,
        )
    }


def test_identity_apply_is_exact():
    frames = _frames()
    n, h, w = frames.shape[:3]
    meta = {
        "motion_meta": MM.build_motion_meta_v2(
            source="estimated_classic",
            frame_count=n,
            fps=16.0,
            input_size=(w, h),
            output_size=(w, h),
            matrices=[np.eye(3)] * n,
        )
    }
    res = MA.apply_motion(_ctx(frames), meta, GRAY)
    np.testing.assert_array_equal(res.frames, frames)
    assert res.masks.max() == 0.0
    assert res.meta["motion_apply"]["framing_mode"] == "crop_and_pad"


def test_crop_and_pad_matches_per_frame_oracle():
    import cv2

    frames = _frames()
    n, h, w = frames.shape[:3]
    meta = _shake_meta(n, w, h, seed=4)
    res = MA.apply_motion(_ctx(frames), meta, (64, 32, 200), interpolation="bilinear")
    border = [64 / 255.0, 32 / 255.0, 200 / 255.0]
    for i in range(n):
        m = np.asarray(meta["motion_meta"]["per_frame"][i]["matrix"])
        ref = cv2.warpPerspective(
            frames[i], m, (w, h), flags=cv2.INTER_LINEAR,
            borderMode=cv2.BORDER_CONSTANT, borderValue=border,
        )
        err = np.abs(res.frames[i] - ref)
        assert np.percentile(err, 99) <= 1e-3


def test_crop_mode_zero_masks_and_no_padding():
    frames = _frames(n=8)
    n, h, w = frames.shape[:3]
    meta = _shake_meta(n, w, h, seed=2, amount=1.2)
    res = MA.apply_motion(_ctx(frames), meta, (255, 0, 0), framing_mode="crop")
    assert res.meta["motion_apply"]["framing_mode"] == "crop"
    assert res.masks.max() == 0.0
    # red padding must never leak into a cropped output
    red_hits = ((np.abs(res.frames[..., 0] - 1.0) < 1e-3) &
                (res.frames[..., 1] < 1e-3) & (res.frames[..., 2] < 1e-3)).mean()
    assert red_hits < 1e-4


def test_crop_fallback_when_no_overlap():
    frames = _frames(n=3)
    n, h, w = frames.shape[:3]
    mats = [np.eye(3),
            np.array([[1.0, 0, w * 3.0], [0, 1, 0], [0, 0, 1]]),
            np.array([[1.0, 0, -w * 3.0], [0, 1, 0], [0, 0, 1]])]
    meta = {
        "motion_meta": MM.build_motion_meta_v2(
            source="estimated_classic", frame_count=n, fps=16.0,
            input_size=(w, h), output_size=(w, h), matrices=mats,
        )
    }
    res = MA.apply_motion(_ctx(frames), meta, GRAY, framing_mode="crop")
    assert res.meta.get("framing_fallback") == "crop_and_pad"
    assert res.meta["motion_apply"]["framing_mode"] == "crop_and_pad"


def test_expand_mode_grows_canvas_and_keeps_content():
    frames = _frames(n=4)
    n, h, w = frames.shape[:3]
    mats = [np.eye(3), np.array([[1.0, 0, 20.0], [0, 1, -12.0], [0, 0, 1]])] * 2
    meta = {
        "motion_meta": MM.build_motion_meta_v2(
            source="estimated_classic", frame_count=n, fps=16.0,
            input_size=(w, h), output_size=(w, h), matrices=mats,
        )
    }
    res = MA.apply_motion(_ctx(frames), meta, GRAY, framing_mode="expand")
    ow, oh = res.meta["motion_apply"]["output_size"]
    assert ow == w + 20 and oh == h + 12
    # every frame's content fully covered -> mask fraction < 1 everywhere union
    assert res.frames.shape == (n, oh, ow, 3)
    assert res.masks.shape == (n, oh, ow)
    assert res.masks[0].mean() > 0  # identity frame in larger canvas has padding


def test_blur_zero_identical_to_plain():
    frames = _frames()
    n, h, w = frames.shape[:3]
    meta = _shake_meta(n, w, h, seed=6)
    plain = MA.apply_motion(_ctx(frames), meta, GRAY)
    blur0 = MA.apply_motion(_ctx(frames), meta, GRAY, motion_blur=0.0, motion_blur_samples=17)
    np.testing.assert_array_equal(plain.frames, blur0.frames)
    np.testing.assert_array_equal(plain.masks, blur0.masks)


def test_blur_deterministic_and_soft_mask():
    frames = _frames()
    n, h, w = frames.shape[:3]
    meta = _shake_meta(n, w, h, seed=6, amount=1.5)
    a = MA.apply_motion(_ctx(frames), meta, GRAY, motion_blur=0.5, motion_blur_samples=9)
    b = MA.apply_motion(_ctx(frames), meta, GRAY, motion_blur=0.5, motion_blur_samples=9)
    np.testing.assert_array_equal(a.frames, b.frames)
    # soft mask values strictly between 0 and 1 must exist at moving borders
    interior = a.masks[(a.masks > 0) & (a.masks < 1)]
    assert interior.size > 0


def test_blur_matches_reference_matrix_lerp():
    mats = np.stack([np.eye(3), np.diag([1.1, 1.1, 1.0]), np.eye(3)])
    samples = MA.blurred_sample_matrices(mats, 0.5, 5)
    assert samples.shape == (3, 5, 3, 3)
    # frame 0 lerps toward frame 1
    np.testing.assert_allclose(samples[0, -1], mats[0] + (mats[1] - mats[0]) * 0.5)
    # last frame extrapolates backwards
    np.testing.assert_allclose(samples[2, -1], mats[2] + (mats[2] - mats[1]) * 0.5)
    np.testing.assert_allclose(samples[:, 0], mats)


def test_progress_tick_counts():
    frames = _frames(n=5)
    n, h, w = frames.shape[:3]
    meta = _shake_meta(n, w, h)
    ticks = []
    MA.apply_motion(_ctx(frames), meta, GRAY, progress_callback=lambda: ticks.append(1))
    assert len(ticks) == n  # plain: one per frame
    ticks.clear()
    MA.apply_motion(
        _ctx(frames), meta, GRAY, motion_blur=0.4, motion_blur_samples=5,
        progress_callback=lambda: ticks.append(1),
    )
    assert len(ticks) == n * 5
    ticks.clear()
    MA.apply_motion(
        _ctx(frames), meta, GRAY, framing_mode="crop",
        progress_callback=lambda: ticks.append(1),
    )
    assert len(ticks) == n + n  # common-mask pass + warp pass


def test_size_mismatch_raises():
    frames = _frames(n=4)
    n, h, w = frames.shape[:3]
    meta = _shake_meta(n, w + 2, h)
    with pytest.raises(ValueError, match="input_size"):
        MA.apply_motion(_ctx(frames), meta, GRAY)
    meta = _shake_meta(n + 1, w, h)
    with pytest.raises(ValueError, match="Frame count mismatch"):
        MA.apply_motion(_ctx(frames), meta, GRAY)


def test_legacy_block_selected_by_size_match():
    frames = _frames(n=3, h=60, w=80)
    n, h, w = frames.shape[:3]
    # stabilization produced 80x60 output from a 100x70 source
    mats = [np.array([[1.0, 0, -10.0], [0, 1, -5.0], [0, 0, 1]])] * n
    warp_block = MM.build_stabilization_warp_meta(
        source_size=(100, 70), output_size=(w, h), framing_mode="crop_and_pad",
        applied_matrices=mats,
    )
    motion_block = MM.applied_motion_meta_from_stabilization_warp(warp_block, 16.0, "estimated_flow")
    meta = {"motion_meta": motion_block, "stabilization_warp": warp_block}
    # frames are 80x60 = warp OUTPUT size -> the inverted legacy block must win
    motion = MA.resolve_motion_for_context(meta, _ctx(frames))
    assert motion.source == "legacy_stabilization"
    assert motion.input_size == (w, h)
    assert motion.output_size == (100, 70)


def test_inverse_roundtrip_accuracy():
    """Shake -> apply (expand) -> legacy inverse restores originals.

    Reference thresholds: p99 <= 0.3, mean <= 0.035 on 0..1 pixels
    (/root/reference/scripts/check_inverse_stabilization.py:161-165).
    """
    import cv2

    frames = _frames(n=6, h=120, w=160, seed=3)
    blurred = np.stack([cv2.GaussianBlur(f, (5, 5), 1.5) for f in frames])
    n, h, w = blurred.shape[:3]
    meta = _shake_meta(n, w, h, seed=12)
    applied = MA.apply_motion(_ctx(blurred), meta, GRAY, framing_mode="expand")
    ow, oh = applied.meta["motion_apply"]["output_size"]

    # build the legacy warp block describing what was applied
    mats = MA.expand_matrices(
        np.asarray([e["matrix"] for e in meta["motion_meta"]["per_frame"]], float), (w, h)
    )[0]
    warp_block = MM.build_stabilization_warp_meta(
        source_size=(w, h), output_size=(ow, oh), framing_mode="expand", applied_matrices=mats
    )
    restored = INV.apply_inverse_stabilization(
        _ctx(applied.frames), {"stabilization_warp": warp_block}, GRAY
    )
    err = np.abs(restored.frames - blurred)
    valid = restored.masks < 0.5
    err_valid = err[valid]
    assert np.percentile(err_valid, 99) <= 0.3
    assert err_valid.mean() <= 0.035
    assert "inverse_stabilization" in restored.meta


def test_legacy_inverse_engine_matches_inverse_node_path():
    """The exported legacy engine (models/inverse.py, parity with
    /root/reference/nodes/stabilizer_utils.py:929-1007) and the Inverse
    node's Motion-Apply route must agree pixel-exactly
    (/root/reference/docs/requirements/003:51)."""
    frames = _frames(n=5, h=96, w=128, seed=7)
    n, h, w = frames.shape[:3]
    meta = _shake_meta(n, w, h, seed=4)
    applied = MA.apply_motion(_ctx(frames), meta, GRAY, framing_mode="expand")
    ow, oh = applied.meta["motion_apply"]["output_size"]
    mats = MA.expand_matrices(
        np.asarray([e["matrix"] for e in meta["motion_meta"]["per_frame"]], float), (w, h)
    )[0]
    warp_block = MM.build_stabilization_warp_meta(
        source_size=(w, h), output_size=(ow, oh), framing_mode="expand", applied_matrices=mats
    )
    legacy_meta = {"stabilization_warp": warp_block}

    direct = INV.apply_inverse_stabilization(_ctx(applied.frames), legacy_meta, GRAY)

    from comfyui_video_stabilizer_tpu.meta.motion_meta import resolve_motion_meta

    motion = resolve_motion_meta(legacy_meta)
    assert motion.source == "legacy_stabilization"
    via_apply = MA.apply_motion(
        _ctx(applied.frames), legacy_meta, GRAY,
        framing_mode="crop_and_pad", interpolation="bilinear",
    )
    np.testing.assert_allclose(
        np.asarray(direct.frames), np.asarray(via_apply.frames), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(direct.masks), np.asarray(via_apply.masks), atol=2e-5
    )
