"""Arbitrary (odd, non-tile-aligned) frame sizes and minimal clips."""

import numpy as np
import pytest

from comfyui_video_stabilizer_tpu.models.classic import stabilize_classic
from comfyui_video_stabilizer_tpu.models.flow import stabilize_flow
from comfyui_video_stabilizer_tpu.models import motion_apply as MA
from comfyui_video_stabilizer_tpu.models import shake as S
from comfyui_video_stabilizer_tpu.utils.video_io import normalize_video_input

GRAY = (127, 127, 127)


def _clip(n, h, w, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.random((h + 16, w + 16, 3)).astype(np.float32)
    return np.stack([base[4 + (i % 3) : 4 + (i % 3) + h, 5 + (i % 2) : 5 + (i % 2) + w]
                     for i in range(n)])


@pytest.mark.parametrize("h,w", [(101, 147), (64, 333), (217, 96)])
def test_flow_odd_sizes(h, w):
    frames = _clip(4, h, w)
    res = stabilize_flow(
        normalize_video_input(frames), "crop_and_pad", "similarity", False,
        0.7, 0.5, 0.6, GRAY, 16.0,
    )
    assert np.asarray(res.frames).shape == frames.shape
    assert np.isfinite(np.asarray(res.frames)).all()


def test_classic_odd_sizes():
    frames = _clip(4, 143, 201, seed=2)
    res = stabilize_classic(
        normalize_video_input(frames), "expand", "translation", False,
        0.7, 0.5, 0.6, GRAY, 16.0,
    )
    ow, oh = res.meta["framing"]["expanded_size"]
    assert np.asarray(res.frames).shape[1:3] == (oh, ow)


def test_two_frame_clip_all_pipelines():
    frames = _clip(2, 80, 96, seed=3)
    ctx = normalize_video_input(frames)
    for engine, framing in ((stabilize_flow, "crop"), (stabilize_classic, "crop_and_pad")):
        res = engine(ctx, framing, "similarity", False, 0.7, 0.5, 0.6, GRAY, 16.0)
        assert res.meta["frames"] == 2
        assert len(res.meta["estimated_motion"]["per_transition"]) == 1

    meta = {"motion_meta": S.generate_shake_motion_meta(
        recipe=S.STYLES["handheld"], frame_count=2, width=96, height=80,
        fps=16.0, amount=1.0, speed=1.0, seed=4)}
    out = MA.apply_motion(ctx, meta, GRAY, motion_blur=0.5, motion_blur_samples=5)
    assert np.asarray(out.frames).shape == frames.shape


def test_apply_odd_output_size_legacy():
    """Legacy restore to an odd-sized source canvas."""
    from comfyui_video_stabilizer_tpu.meta import motion_meta as MM

    frames = _clip(3, 90, 110, seed=5)
    mats = [np.array([[1.0, 0, -7.0], [0, 1, 5.0], [0, 0, 1]])] * 3
    warp_block = MM.build_stabilization_warp_meta(
        source_size=(123, 97), output_size=(110, 90), framing_mode="crop_and_pad",
        applied_matrices=mats,
    )
    out = MA.apply_motion(normalize_video_input(frames), {"stabilization_warp": warp_block}, GRAY)
    assert np.asarray(out.frames).shape[1:3] == (97, 123)
