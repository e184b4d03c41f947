"""I/O adaptation heuristics — the 9-layout matrix of the reference's
refactor harness (/root/reference/scripts/compare_refactor_behavior.py:289-363)."""

import numpy as np
import pytest
import torch

from comfyui_video_stabilizer_tpu.utils.color import parse_padding_color
from comfyui_video_stabilizer_tpu.utils.video_io import (
    convert_masks_for_output,
    normalize_video_input,
    reconstruct_video,
    resolve_fps,
)


def _base(n=3, h=10, w=12):
    rng = np.random.default_rng(0)
    return rng.random((n, h, w, 3)).astype(np.float32)


def test_layouts_all_normalize_identically():
    base = _base()
    n, h, w, _ = base.shape
    variants = {
        "batch_f32": base,
        "list_of_frames": [base[i] for i in range(n)],
        "torch_batch": torch.from_numpy(base.copy()),
        "torch_frames": [torch.from_numpy(base[i].copy()) for i in range(n)],
        "dict_frames": {"frames": base, "fps": 24.0},
        "dict_images": {"images": base},
        "dict_video": {"video": base},
        "float64": base.astype(np.float64),
        "non_contiguous": np.asfortranarray(base),
        "uint8": (base * 255).astype(np.uint8),
        "range_255": base * 255.0,
        "chw_frames": [np.moveaxis(base[i], -1, 0) for i in range(n)],
    }
    for name, value in variants.items():
        ctx = normalize_video_input(value)
        assert ctx.frames.shape == (n, h, w, 3), name
        assert ctx.frames.dtype == np.float32, name
        ref = base if name not in ("uint8",) else (base * 255).astype(np.uint8) / 255.0
        np.testing.assert_allclose(ctx.frames, ref, atol=1.5e-2 if name == "uint8" else 1e-6,
                                   err_msg=name)
    assert normalize_video_input({"frames": base, "fps": 24.0}).fps == 24.0


def test_grayscale_and_rgba():
    gray = np.random.default_rng(1).random((2, 8, 9)).astype(np.float32)
    ctx = normalize_video_input([gray[0], gray[1]])
    assert ctx.frames.shape == (2, 8, 9, 3)
    np.testing.assert_array_equal(ctx.frames[..., 0], ctx.frames[..., 2])

    rgba = np.random.default_rng(2).random((2, 8, 9, 4)).astype(np.float32)
    ctx = normalize_video_input(rgba)
    assert ctx.frames.shape == (2, 8, 9, 3)
    np.testing.assert_array_equal(ctx.frames, rgba[..., :3])


def test_input_never_mutated():
    scaled = (_base() * 255.0).astype(np.float32)
    copy = scaled.copy()
    normalize_video_input(scaled)
    np.testing.assert_array_equal(scaled, copy)


def test_empty_and_errors():
    with pytest.raises(ValueError, match="empty"):
        normalize_video_input([])
    with pytest.raises(ValueError, match="'frames'"):
        normalize_video_input({"fps": 10})
    with pytest.raises(ValueError, match="Mixed tensor layouts"):
        normalize_video_input([np.zeros((4, 6, 3), np.float32),
                               torch.zeros((4, 6, 3))])


def test_reconstruct_shapes_and_dict_template():
    base = _base()
    ctx = normalize_video_input({"frames": base, "fps": 20.0, "meta": "x"})
    out = reconstruct_video(ctx.frames, ctx)
    assert isinstance(out, dict)
    assert out["fps"] == 20.0 and out["meta"] == "x"
    assert tuple(out["frames"].shape) == base.shape

    ctx2 = normalize_video_input(base)
    tensor = reconstruct_video(ctx2.frames, ctx2)
    assert torch.is_tensor(tensor) and tuple(tensor.shape) == base.shape

    masks = convert_masks_for_output(np.zeros((3, 10, 12, 1), np.float32))
    assert tuple(masks.shape) == (3, 10, 12)
    empty = convert_masks_for_output(np.zeros((0, 10, 12), np.float32))
    assert tuple(empty.shape) == (1, 1, 1)


def test_resolve_fps_priority():
    base = _base()
    ctx = normalize_video_input({"frames": base, "fps": 25.0})
    assert resolve_fps(ctx, 10.0) == 25.0
    ctx = normalize_video_input(base)
    assert resolve_fps(ctx, 10.0) == 10.0
    assert resolve_fps(ctx, float("nan")) == 16.0
    assert resolve_fps(ctx, -5) == 16.0


@pytest.mark.parametrize(
    "value,expected",
    [
        ("#7F7F7F", (127, 127, 127)),
        ("#fff", (255, 255, 255)),
        ("10,20,30", (10, 20, 30)),
        ("10/20/30", (10, 20, 30)),
        ("64", (127, 127, 127)),   # 2-char hex string is invalid -> default
        (0xFF00FF, (255, 0, 255)),
        ("zzz", (127, 127, 127)),  # parse failures fall back, never raise
        ("#12345", (127, 127, 127)),
        ("1,2", (127, 127, 127)),
        ("300,-5,900", (255, 0, 255)),  # channel clamp
    ],
)
def test_padding_color(value, expected):
    assert parse_padding_color(value) == expected


class _CountingDeviceArray:
    """Minimal device-array stand-in: counts host materializations."""

    def __init__(self, data):
        self._data = np.asarray(data, np.float32)
        self.ndim = self._data.ndim
        self.shape = self._data.shape
        self.fetches = 0

    def __array__(self, dtype=None, copy=None):
        self.fetches += 1
        return self._data if dtype is None else self._data.astype(dtype)

    def __iter__(self):  # the per-frame path we must NOT take
        raise AssertionError("per-frame iteration on a device array")


def test_reconstruct_video_bulk_device_download():
    """VERDICT #6: device arrays leave the chip in ONE bulk transfer at
    the node boundary, never via per-frame list() iteration."""
    from comfyui_video_stabilizer_tpu.utils.video_io import (
        convert_masks_for_output,
        normalize_video_input,
        reconstruct_video,
    )

    frames = _CountingDeviceArray(np.zeros((4, 8, 8, 3)))
    ctx = normalize_video_input(np.zeros((4, 8, 8, 3), np.float32))
    out = reconstruct_video(frames, ctx)
    assert frames.fetches == 1
    assert tuple(out.shape) == (4, 8, 8, 3)

    masks = _CountingDeviceArray(np.zeros((4, 8, 8)))
    m = convert_masks_for_output(masks)
    assert masks.fetches == 1
    assert tuple(m.shape) == (4, 8, 8)
