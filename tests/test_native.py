"""Native C++ helpers vs the pure-python/numpy references."""

import numpy as np
import pytest

from comfyui_video_stabilizer_tpu.ops import morphology as M

try:
    from comfyui_video_stabilizer_tpu.native import rectangle as NR

    NR._load()
    HAVE_NATIVE = True
except Exception:
    HAVE_NATIVE = False

needs_native = pytest.mark.skipif(not HAVE_NATIVE, reason="no C++ toolchain")


def _py_reference_rect(mask):
    """Direct numpy reference (same algorithm as ops/morphology fallback)."""
    height, width = mask.shape
    heights = np.zeros(width + 1, dtype=np.int64)
    best_area, best = 0, (0, 0, width, height)
    row_pos = mask > 0
    for y in range(height):
        heights[:width] = (heights[:width] + 1) * row_pos[y]
        stack = []
        for x in range(width + 1):
            curr = heights[x]
            while stack and heights[stack[-1]] > curr:
                top = stack.pop()
                h = int(heights[top])
                left = stack[-1] + 1 if stack else 0
                area = h * (x - left)
                if area > best_area:
                    best_area, best = area, (left, y - h + 1, x - left, h)
            stack.append(x)
    return best


@needs_native
@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_native_rectangle_optimal(seed):
    rng = np.random.default_rng(seed)
    mask = rng.random((48, 64)) > 0.25
    nx, ny, nw, nh = NR.largest_axis_aligned_rectangle(mask)
    px, py, pw, ph = _py_reference_rect(mask)
    assert nw * nh == pw * ph  # both find a maximum-area rectangle
    assert mask[ny : ny + nh, nx : nx + nw].all()


@needs_native
def test_native_rectangle_used_by_morphology():
    rng = np.random.default_rng(7)
    mask = rng.random((40, 56)) > 0.2
    x0, y0, w, h = M.largest_axis_aligned_rectangle(mask)
    px, py, pw, ph = _py_reference_rect(mask)
    assert w * h == pw * ph
    assert mask[y0 : y0 + h, x0 : x0 + w].all()


@needs_native
def test_native_greedy_min_distance():
    rng = np.random.default_rng(3)
    n = 500
    ys = rng.integers(0, 100, n)
    xs = rng.integers(0, 120, n)
    out = NR.greedy_min_distance(ys, xs, 100, 120, 7.0, 100)
    assert out.shape[0] > 10
    d2 = ((out[:, None] - out[None]) ** 2).sum(-1) + np.eye(out.shape[0]) * 1e9
    assert d2.min() >= 7.0**2 - 1e-9
