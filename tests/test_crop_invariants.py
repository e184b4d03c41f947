"""Crop framing invariants (reference check_crop_aspect_ratio parity):
zero padding, exact aspect ratio, shear-free uniform scale, no-overlap
fallback with stabilization disabled + note."""

import numpy as np

from comfyui_video_stabilizer_tpu.models import framing as F
from comfyui_video_stabilizer_tpu.models import geometry as G
from comfyui_video_stabilizer_tpu.models.classic import stabilize_classic
from comfyui_video_stabilizer_tpu.utils.video_io import normalize_video_input

GRAY = (127, 127, 127)


def _clip(n=6, h=96, w=128, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.random((h + 60, w + 60, 3)).astype(np.float32)
    return np.stack([
        base[20 + int(3 * np.sin(i)) : 20 + int(3 * np.sin(i)) + h,
             20 + (i % 4) : 20 + (i % 4) + w]
        for i in range(n)
    ])


def test_crop_zero_padding_and_aspect():
    frames = _clip()
    n, h, w = frames.shape[:3]
    res = stabilize_classic(
        normalize_video_input(frames), "crop", "similarity", False,
        1.0, 0.8, 0.6, (255, 0, 0), 16.0,
    )
    assert res.meta["padding_fraction_max"] <= 1e-6  # crop guarantees no padding
    fm = res.meta["framing"]
    crop_w, crop_h = fm["crop_size"]
    if crop_w > 0 and crop_h > 0 and fm["keep_fov_status"] != "disabled":
        assert abs(crop_w / crop_h - w / h) < 1e-3  # aspect preserved

    # shear-free uniform scale: the crop premultiplier of every frame is
    # a pure scale+translation, so M_final @ inv(M_apply) must be diagonal
    finals = np.asarray([e["applied_matrix"] for e in res.meta["stabilization_warp"]["per_frame"]])
    # crop matrix = finals[i] @ inv(apply_i); apply unknown here, but the
    # SAME crop premultiplies all frames: finals[i] @ inv(finals[j]) has the
    # same similarity class as apply_i @ inv(apply_j) — verify finals stay
    # shear-free for a similarity request instead:
    params = G.matrices_to_params(finals, "similarity")
    back = G.params_to_matrices(params, "similarity")
    np.testing.assert_allclose(back, finals, atol=1e-3)  # no residual shear


def test_keep_fov_statuses_and_scale_bounds():
    frames = _clip(seed=3)
    deltas = np.array([[2.0, -1.0, 0.01, 0.002]] * (len(frames)))
    for target in (0.2, 0.9):
        (final, apply_m, masks, eff, status, note, scale, origin, size) = (
            F.compute_crop_with_keep_fov_parametric(
                "similarity", deltas, 128, 96, target, 2.0)
        )
        assert status in ("met", "clamped", "failed", "disabled")
        assert 0.0 <= scale <= 1.0
        if status == "met":
            assert eff >= target - 1e-3


def test_no_overlap_fallback_disables_stabilization():
    # deltas so large no crop region overlaps at full stabilization
    deltas = np.array([[400.0, 0.0], [-400.0, 0.0], [0.0, 300.0]])
    (final, apply_m, masks, eff, status, note, scale, origin, size) = (
        F.compute_crop_with_keep_fov_parametric("translation", deltas, 128, 96, 0.0, 2.0)
    )
    assert status == "disabled"
    assert scale == 0.0
    assert note is not None and "disabled" in note
    # zero stabilization => identity transforms
    np.testing.assert_allclose(np.asarray(apply_m), np.stack([np.eye(3)] * 3), atol=1e-6)


def test_crop_inverse_marks_unrecoverable_pixels():
    """Reference check_inverse_stabilization:167-172: restoring a crop
    must mark the discarded regions in the padding mask."""
    from comfyui_video_stabilizer_tpu.meta import motion_meta as MM
    from comfyui_video_stabilizer_tpu.models.inverse import apply_inverse_stabilization

    rng = np.random.default_rng(1)
    n, h, w = 3, 64, 96
    stabilized = rng.random((n, h, w, 3)).astype(np.float32)
    # crop transform: zoomed 1.5x from the center of a larger source
    s = 1.5
    mats = [np.array([[s, 0, -20.0], [0, s, -12.0], [0, 0, 1]])] * n
    warp_block = MM.build_stabilization_warp_meta(
        source_size=(w, h), output_size=(w, h), framing_mode="crop",
        applied_matrices=mats,
    )
    res = apply_inverse_stabilization(
        normalize_video_input(stabilized), {"stabilization_warp": warp_block}, GRAY
    )
    masks = np.asarray(res.masks)
    assert masks.max() == 1.0          # unrecoverable border exists
    assert 0.05 < masks.mean() < 0.95  # but not everything
    assert res.meta["inverse_stabilization"]["framing_mode"] == "crop"
