"""Fidelity harness: batched TPU warp vs the OpenCV oracle.

BASELINE gate: warped pixel outputs within 1e-3 of the OpenCV
reference (measured as p99/mean; cv2 computes coordinates in float64,
we compute displacements in float32, so isolated pixels may sit one
1/32-px bin away — see ops/warp.py docstring).
"""

import cv2
import numpy as np
import pytest

from comfyui_video_stabilizer_tpu.ops import warp as W


def _test_clip(n=4, h=120, w=160, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.random((h, w, 3)).astype(np.float32)
    # smooth it a little so interpolation differences are content-driven
    base = cv2.GaussianBlur(base, (5, 5), 1.2)
    frames = np.stack([np.roll(base, i, axis=1) for i in range(n)])
    return np.ascontiguousarray(frames, np.float32)


def _test_matrices(n, w, h, seed=1, persp=True):
    rng = np.random.default_rng(seed)
    mats = []
    for _ in range(n):
        theta = rng.uniform(-0.03, 0.03)
        s = np.exp(rng.uniform(-0.02, 0.02))
        tx, ty = rng.uniform(-12, 12, 2)
        m = np.array(
            [
                [s * np.cos(theta), -s * np.sin(theta), tx],
                [s * np.sin(theta), s * np.cos(theta), ty],
                [0.0, 0.0, 1.0],
            ]
        )
        if persp:
            m[2, 0] = rng.uniform(-1e-5, 1e-5)
            m[2, 1] = rng.uniform(-1e-5, 1e-5)
        mats.append(m)
    return np.stack(mats)


CV2_FLAGS = {
    "bilinear": cv2.INTER_LINEAR,
    "bicubic": cv2.INTER_CUBIC,
    "nearest": cv2.INTER_NEAREST,
}


def _cv2_warp(frames, mats, out_size, interp, border):
    outs = []
    for f, m in zip(frames, mats):
        outs.append(
            cv2.warpPerspective(
                f,
                m.astype(np.float64),
                out_size,
                flags=CV2_FLAGS[interp],
                borderMode=cv2.BORDER_CONSTANT,
                borderValue=list(map(float, border)),
            )
        )
    return np.stack(outs)


@pytest.mark.parametrize("interp", ["bilinear", "bicubic", "nearest"])
def test_warp_matches_opencv(interp):
    frames = _test_clip()
    n, h, w = frames.shape[:3]
    mats = _test_matrices(n, w, h)
    border = (0.3, 0.5, 0.7)
    ours = W.warp_clip(frames, mats, (w, h), interp, border)
    ref = _cv2_warp(frames, mats, (w, h), interp, border)
    err = np.abs(ours - ref)
    assert np.percentile(err, 99) <= 1e-3, f"p99 {np.percentile(err, 99)}"
    assert err.mean() <= 2e-4, f"mean {err.mean()}"


def test_warp_expanded_canvas():
    frames = _test_clip()
    n, h, w = frames.shape[:3]
    mats = _test_matrices(n, w, h, seed=3)
    # translate well into a larger canvas (the expand framing path)
    shift = np.eye(3)
    shift[0, 2], shift[1, 2] = 37.0, 21.0
    mats = np.einsum("ij,njk->nik", shift, mats)
    out_size = (w + 80, h + 48)
    ours = W.warp_clip(frames, mats, out_size, "bilinear", (0, 0, 0))
    ref = _cv2_warp(frames, mats, out_size, "bilinear", (0, 0, 0))
    err = np.abs(ours - ref)
    assert np.percentile(err, 99) <= 1e-3
    assert err.mean() <= 2e-4


def test_coverage_matches_opencv_nearest_ones():
    frames = _test_clip()
    n, h, w = frames.shape[:3]
    mats = _test_matrices(n, w, h, seed=5)
    ones = np.ones((h, w), np.float32)
    cover = W.coverage_mask(mats, (w, h), (w, h))
    for i in range(n):
        ref = cv2.warpPerspective(
            ones, mats[i], (w, h), flags=cv2.INTER_NEAREST,
            borderMode=cv2.BORDER_CONSTANT, borderValue=0.0,
        )
        ref_bin = (ref > 0.5).astype(np.float32)
        mismatch = (cover[i] != ref_bin).mean()
        assert mismatch < 2e-4, f"frame {i}: coverage mismatch fraction {mismatch}"


def test_identity_warp_is_exact():
    frames = _test_clip()
    n, h, w = frames.shape[:3]
    mats = np.stack([np.eye(3)] * n)
    out = W.warp_clip(frames, mats, (w, h), "bilinear", (0, 0, 0))
    np.testing.assert_array_equal(out, frames)


def test_blur_zero_equals_plain():
    frames = _test_clip()
    n, h, w = frames.shape[:3]
    mats = _test_matrices(n, w, h, seed=7)
    plain = W.warp_clip(frames, mats, (w, h), "bilinear", (0.1, 0.1, 0.1))
    samples = np.repeat(mats[:, None], 5, axis=1)  # all samples identical
    blurred, mask = W.warp_clip_blur(frames, samples, (w, h), "bilinear", (0.1, 0.1, 0.1))
    np.testing.assert_allclose(blurred, plain, atol=1e-6)
    cover = W.coverage_mask(mats, (w, h), (w, h))
    np.testing.assert_allclose(mask, 1.0 - cover, atol=1e-6)


def test_streaming_chunked_path_matches_unchunked(monkeypatch):
    """4K/300-frame class clips stream in time chunks; results identical."""
    from comfyui_video_stabilizer_tpu.ops import warp as W2

    frames = _test_clip(n=6)
    n, h, w = frames.shape[:3]
    mats = _test_matrices(n, w, h, seed=9)
    full = np.asarray(W2.warp_clip(frames, mats, (w, h), "bilinear", (0.1, 0.2, 0.3)))
    fullm = W2.warp_clip_with_mask(frames, mats, (w, h), "bilinear", (0.1, 0.2, 0.3))

    monkeypatch.setattr(W2, "CHUNK_BUDGET_BYTES", frames[0].nbytes * 8)  # ~2 frames/chunk
    chunked = W2.warp_clip(frames, mats, (w, h), "bilinear", (0.1, 0.2, 0.3))
    assert isinstance(chunked, np.ndarray)  # streaming returns host memory
    np.testing.assert_array_equal(chunked, full)
    cw, cm = W2.warp_clip_with_mask(frames, mats, (w, h), "bilinear", (0.1, 0.2, 0.3))
    np.testing.assert_array_equal(np.asarray(cm), np.asarray(fullm[1]))

    # blur streaming
    samples = np.repeat(mats[:, None], 3, axis=1)
    bf, bm = W2.warp_clip_blur(frames, samples, (w, h), "bilinear", (0.1, 0.2, 0.3))
    np.testing.assert_allclose(np.asarray(bf), full, atol=1e-6)


def test_streaming_full_pipeline_matches_unstreamed(monkeypatch):
    """stabilize_flow on a host-resident clip with a tiny chunk budget
    (the 4K/300f class) matches the in-HBM run end-to-end."""
    from comfyui_video_stabilizer_tpu.models.flow import stabilize_flow
    from comfyui_video_stabilizer_tpu.ops import warp as W2
    from comfyui_video_stabilizer_tpu.utils.video_io import normalize_video_input

    rng = np.random.default_rng(4)
    base = rng.random((140, 180), np.float32)
    n, h, w = 10, 96, 128
    frames = np.empty((n, h, w, 3), np.float32)
    for i in range(n):
        dy, dx = int(4 * np.sin(i / 1.5)), int(5 * np.cos(i / 2.0))
        crop = base[20 + dy : 20 + dy + h, 24 + dx : 24 + dx + w]
        frames[i] = np.stack([crop, 1.0 - crop, crop * 0.5 + 0.25], axis=-1)

    ref = stabilize_flow(normalize_video_input(frames), "crop_and_pad", "similarity",
                         False, 0.8, 0.6, 0.6, (127, 127, 127), 16.0)

    monkeypatch.setattr(W2, "CHUNK_BUDGET_BYTES", frames[0].nbytes * 12)
    streamed = stabilize_flow(normalize_video_input(frames), "crop_and_pad", "similarity",
                              False, 0.8, 0.6, 0.6, (127, 127, 127), 16.0)
    assert isinstance(streamed.frames, np.ndarray)
    np.testing.assert_allclose(np.asarray(streamed.frames), np.asarray(ref.frames), atol=1e-6)
    np.testing.assert_allclose(np.asarray(streamed.masks), np.asarray(ref.masks), atol=1e-6)
