"""Pipeline-policy semantics: sticky fallback, early-outs, meta schema."""

import numpy as np
import pytest

from comfyui_video_stabilizer_tpu.models import stabilize as ST
from comfyui_video_stabilizer_tpu.models.classic import stabilize_classic
from comfyui_video_stabilizer_tpu.utils.video_io import normalize_video_input

GRAY = (127, 127, 127)


def _fits(b, degenerate=None, **modes):
    """Helper to build PairFits from {mode: (accept_list, conf)} pairs."""
    matrices = {}
    confidences = {}
    accepted = {}
    for mode, (accept, conf) in modes.items():
        matrices[mode] = np.stack([np.eye(3, dtype=np.float32) * (1 + 0.01 * i) for i in range(b)])
        for i in range(b):
            matrices[mode][i, 2, 2] = 1.0
        confidences[mode] = np.asarray(conf, float)
        accepted[mode] = np.asarray(accept, bool)
    return ST.PairFits(
        degenerate=np.asarray(degenerate if degenerate is not None else [False] * b),
        matrices=matrices,
        confidences=confidences,
        accepted=accepted,
    )


def test_sticky_degradation_perspective_to_similarity():
    # pair 1 fails perspective -> active mode degrades for pairs 2..
    fits = _fits(
        4,
        perspective=([True, False, True, True], [0.5, 0.0, 0.6, 0.7]),
        similarity=([True, True, True, True], [0.4, 0.3, 0.45, 0.5]),
        translation=([True] * 4, [1.0] * 4),
    )
    mats, modes, confs, _ = ST.sticky_select("perspective", fits)
    assert modes == ["perspective", "similarity", "similarity", "similarity"]
    assert confs[1] == pytest.approx(0.3)


def test_degenerate_pair_degrades_to_translation():
    fits = _fits(
        3,
        degenerate=[False, True, False],
        similarity=([True, True, True], [0.5, 0.5, 0.5]),
        translation=([True] * 3, [0.9] * 3),
    )
    mats, modes, confs, _ = ST.sticky_select("similarity", fits)
    assert modes == ["similarity", "translation", "translation"]
    assert confs[1] == 0.0
    np.testing.assert_array_equal(mats[1], np.eye(3))


def test_translation_requested_never_upgrades():
    fits = _fits(
        2,
        similarity=([True, True], [0.9, 0.9]),
        translation=([True, True], [0.8, 0.8]),
    )
    _, modes, _, _ = ST.sticky_select("translation", fits)
    assert modes == ["translation", "translation"]


def test_empty_input_meta():
    frames = np.zeros((1, 8, 10, 3), np.float32)
    ctx = normalize_video_input(frames)
    ctx.frames = ctx.frames[:0]
    res = ST.stabilize_clip(
        ctx, estimator=None, source_name="estimated_classic",
        framing_mode="crop", transform_mode="similarity", camera_lock=False,
        strength=0.7, smooth=0.5, keep_fov=0.6, padding_rgb=GRAY, frame_rate=16.0,
    )
    meta = res.meta
    assert meta["frames"] == 0
    assert meta["transform_mode_applied"] == "identity"
    assert meta["stabilization_warp"]["per_frame"] == []
    assert meta["estimated_motion"]["path"] == []
    assert len(res.frames) == 0


def test_keep_fov_one_bypasses():
    rng = np.random.default_rng(0)
    frames = rng.random((4, 48, 64, 3)).astype(np.float32)
    ctx = normalize_video_input(frames)
    res = stabilize_classic(ctx, "crop", "similarity", False, 0.7, 0.5, 1.0, GRAY, 16.0)
    assert res.meta["note"].startswith("keep_fov~=1.0")
    assert res.meta["framing"]["stabilization_scale"] == 0.0
    np.testing.assert_array_equal(np.asarray(res.frames), frames)
    assert np.asarray(res.masks).max() == 0.0
    # identity warp meta: replay must be exact
    ident = np.asarray(res.meta["stabilization_warp"]["per_frame"][0]["applied_matrix"])
    np.testing.assert_array_equal(ident, np.eye(3))


def test_meta_schema_fields_per_framing():
    rng = np.random.default_rng(1)
    frames = rng.random((5, 48, 64, 3)).astype(np.float32)
    for framing, keys in [
        ("crop", {"keep_fov_status", "keep_fov_effective", "crop_origin", "crop_size",
                  "actual_content_ratio", "stabilization_scale"}),
        ("crop_and_pad", {"safe_region_origin", "safe_region_size",
                          "actual_content_ratio", "center_offset"}),
        ("expand", {"expanded_size"}),
    ]:
        res = stabilize_classic(
            normalize_video_input(frames), framing, "translation", False,
            0.7, 0.5, 0.6, GRAY, 16.0,
        )
        fm = res.meta["framing"]
        assert keys <= set(fm), (framing, fm.keys())
        assert fm["mode"] == framing
        assert "padding_detected" in fm
        assert "min_content_ratio" in fm
        for key in ("transform_mode_requested", "transform_mode_applied", "camera_lock",
                    "strength", "strength_effective", "smooth", "fps_requested",
                    "fps_effective", "keep_fov_applied", "padding_color_rgb",
                    "stabilization_warp", "estimated_motion", "padding_fraction_mean",
                    "padding_fraction_max", "motion_meta"):
            assert key in res.meta, key
        em = res.meta["estimated_motion"]
        assert len(em["per_transition"]) == 4
        assert len(em["path"]) == 5
        assert len(em["target_path"]) == 5
        assert len(em["target_path_effective"]) == 5


def test_classic_perspective_end_to_end():
    rng = np.random.default_rng(7)
    import cv2

    base = cv2.GaussianBlur(rng.random((180, 220, 3)).astype(np.float32), (7, 7), 1.5)
    for y in range(8, 172, 20):
        for x in range(8, 212, 20):
            base[y - 1 : y + 1, x - 1 : x + 1] = (x + y) % 2
    frames = np.stack([base[6 + i : 102 + i, 8 + i : 136 + i] for i in range(5)])
    res = stabilize_classic(
        normalize_video_input(frames), "crop_and_pad", "perspective", False,
        0.8, 0.5, 0.6, GRAY, 16.0,
    )
    em = res.meta["estimated_motion"]["per_transition"]
    assert len(em) == 4
    # sticky policy: the applied mode can only degrade over the clip
    modes = [t["mode"] for t in em]
    order = {"perspective": 0, "similarity": 1, "translation": 2}
    ranks = [order[m] for m in modes]
    assert ranks == sorted(ranks), modes
    assert res.meta["transform_mode_requested"] == "perspective"
    mats = np.asarray([t["matrix"] for t in em])
    assert np.isfinite(mats).all()


def test_node_blur_progress_ticks():
    from comfyui_video_stabilizer_tpu import nodes as N
    from comfyui_video_stabilizer_tpu.models import shake as S
    import comfyui_video_stabilizer_tpu.nodes.motion_apply_node as MAN

    rng = np.random.default_rng(3)
    frames = rng.random((4, 40, 48, 3)).astype(np.float32)
    meta = {"motion_meta": S.generate_shake_motion_meta(
        recipe=S.STYLES["handheld"], frame_count=4, width=48, height=40,
        fps=16.0, amount=1.0, speed=1.0, seed=2)}

    ticks = []

    class SpyBar:
        def __init__(self, total):
            self.total = total

        def update_absolute(self, value, total=None):
            ticks.append(value)

    orig = MAN.ProgressBar
    MAN.ProgressBar = SpyBar
    try:
        # Draft blur: 4 frames x 5 samples = 20 engine ticks + final
        N.VideoStabilizerMotionApply.execute(
            frames, meta, "crop_and_pad", "bilinear", "#7F7F7F", 0.4, "Draft"
        )
    finally:
        MAN.ProgressBar = orig
    assert max(ticks) == 20
    assert ticks == sorted(ticks)
