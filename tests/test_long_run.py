"""Long-run robustness: 500-frame clips must not diverge.

Reference criterion (docs/requirements/001:124 via SURVEY §6): no
monotonic zoom creep or missing-area divergence on long clips.
"""

import numpy as np

from comfyui_video_stabilizer_tpu.models.flow import stabilize_flow
from comfyui_video_stabilizer_tpu.models import geometry as G
from comfyui_video_stabilizer_tpu.utils.video_io import normalize_video_input

GRAY = (127, 127, 127)


def _long_clip(n=500, h=96, w=128, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.random((h, w), np.float32)
    # light smoothing via separable box for trackable content
    k = np.ones(3) / 3.0
    base = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 0, base)
    base = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 1, base)
    frames = np.empty((n, h, w, 3), np.float32)
    # bounded oscillating shake: rolls with wrap keep full texture
    for i in range(n):
        dx = int(round(4 * np.sin(i / 7.0) + rng.uniform(-1, 1)))
        dy = int(round(3 * np.cos(i / 9.0) + rng.uniform(-1, 1)))
        shifted = np.roll(np.roll(base, dy, axis=0), dx, axis=1)
        frames[i] = shifted[..., None]
    return frames


def test_500_frames_no_divergence():
    frames = _long_clip()
    n = frames.shape[0]
    res = stabilize_flow(
        normalize_video_input(frames), "crop_and_pad", "similarity", False,
        0.8, 0.6, 0.6, GRAY, 16.0,
    )
    meta = res.meta
    assert meta["frames"] == n

    mats = np.asarray([e["applied_matrix"] for e in meta["stabilization_warp"]["per_frame"]])
    params = G.matrices_to_params(mats, "similarity")
    # no monotonic zoom creep: log-scale stays near zero across the clip
    assert np.abs(params[:, 3]).max() < 0.05, params[:, 3].max()
    # no runaway translation: corrections stay within the shake amplitude class
    assert np.abs(params[:, :2]).max() < 24.0
    # padding fraction stays bounded (no growing missing area)
    assert meta["padding_fraction_max"] < 0.35
    ratios = np.asarray(res.masks).reshape(n, -1).mean(axis=1)
    first, last = ratios[: n // 5].mean(), ratios[-n // 5 :].mean()
    assert last < first + 0.05, (first, last)  # not growing over time


def test_500_frame_shake_meta_roundtrip():
    """Generator + validator stay exact over long sequences."""
    from comfyui_video_stabilizer_tpu.meta.motion_meta import resolve_motion_meta
    from comfyui_video_stabilizer_tpu.models import shake as S

    block = S.generate_shake_motion_meta(
        recipe=S.STYLES["walking"], frame_count=500, width=320, height=240,
        fps=24.0, amount=1.0, speed=1.0, seed=11,
    )
    motion = resolve_motion_meta({"motion_meta": block})
    mats = motion.matrices()
    dets = np.linalg.det(mats)
    assert np.isfinite(mats).all()
    assert (np.abs(dets) > 0.5).all() and (np.abs(dets) < 2.0).all()
