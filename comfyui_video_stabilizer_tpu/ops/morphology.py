"""Binary mask morphology + rectangle searches.

Replaces cv2.dilate / cv2.erode / cv2.integral call sites
(/root/reference/nodes/stabilizer_utils.py:465, 604-656, 782-784) with
batched reduce_window ops and cumsum integral images.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("radius",))
def _maxpool(stack: jnp.ndarray, radius: int) -> jnp.ndarray:
    k = 2 * radius + 1
    return jax.lax.reduce_window(
        stack, -jnp.inf, jax.lax.max,
        (1, k, k), (1, 1, 1), "SAME",
    )


@functools.partial(jax.jit, static_argnames=("radius",))
def _minpool(stack: jnp.ndarray, radius: int) -> jnp.ndarray:
    k = 2 * radius + 1
    return jax.lax.reduce_window(
        stack, jnp.inf, jax.lax.min,
        (1, k, k), (1, 1, 1), "SAME",
    )


def dilate(stack, radius: int = 1) -> jnp.ndarray:
    """Batched square dilation; edge behavior matches cv2 (replicate-safe
    for binary masks: cv2 uses +inf/-inf padding semantics for max/min)."""
    return _maxpool(jnp.asarray(stack, jnp.float32), radius)


def erode(stack, radius: int = 1) -> jnp.ndarray:
    # cv2.erode pads with +inf for min-filter, i.e. borders erode inward
    # only based on in-image values; reduce_window 'SAME' with +inf init
    # matches that.
    return _minpool(jnp.asarray(stack, jnp.float32), radius)


@jax.jit
def _bboxes_kernel(stack: jnp.ndarray):
    rows_any = jnp.any(stack > 0.5, axis=2)  # (N, H)
    cols_any = jnp.any(stack > 0.5, axis=1)  # (N, W)
    h = stack.shape[1]
    w = stack.shape[2]
    y_idx = jnp.arange(h)[None, :]
    x_idx = jnp.arange(w)[None, :]
    big = jnp.iinfo(jnp.int32).max
    y_min = jnp.min(jnp.where(rows_any, y_idx, big), axis=1)
    y_max = jnp.max(jnp.where(rows_any, y_idx, -1), axis=1)
    x_min = jnp.min(jnp.where(cols_any, x_idx, big), axis=1)
    x_max = jnp.max(jnp.where(cols_any, x_idx, -1), axis=1)
    return x_min, y_min, x_max, y_max


def content_bboxes(stack: np.ndarray):
    """Per-frame bounding boxes of mask>0.5; empty frames yield x_max=-1."""
    x_min, y_min, x_max, y_max = _bboxes_kernel(jnp.asarray(stack, jnp.float32))
    return (np.asarray(x_min), np.asarray(y_min), np.asarray(x_max), np.asarray(y_max))


def integral_image(mask: np.ndarray) -> np.ndarray:
    """(H+1, W+1) summed-area table (cv2.integral layout)."""
    h, w = mask.shape
    out = np.zeros((h + 1, w + 1), np.float64)
    np.cumsum(np.cumsum(mask.astype(np.float64), axis=0), axis=1, out=out[1:, 1:])
    return out


def largest_axis_aligned_rectangle(binary_mask: np.ndarray) -> Tuple[int, int, int, int]:
    """Largest all-ones axis-aligned rectangle, histogram-stack algorithm.

    O(H*W); rare degenerate-fallback path, so it runs on host (the
    native/ C++ port accelerates it when built).  Returns (x0, y0, w, h).
    """
    try:
        from ..native import rectangle as _native

        return _native.largest_axis_aligned_rectangle(binary_mask)
    except Exception:
        pass
    height, width = binary_mask.shape
    heights = np.zeros(width + 1, dtype=np.int64)
    best_area = 0
    best_rect = (0, 0, width, height)
    row_pos = binary_mask > 0
    for y in range(height):
        heights[:width] = (heights[:width] + 1) * row_pos[y]
        stack: list[int] = []
        for x in range(width + 1):
            curr = heights[x]
            while stack and heights[stack[-1]] > curr:
                top = stack.pop()
                h = int(heights[top])
                left = stack[-1] + 1 if stack else 0
                area = h * (x - left)
                if area > best_area:
                    best_area = area
                    best_rect = (left, y - h + 1, x - left, h)
            stack.append(x)
    return best_rect


def largest_aspect_ratio_rectangle(
    binary_mask: np.ndarray,
    target_width: int,
    target_height: int,
) -> Tuple[float, float, float, float] | None:
    """Largest all-valid crop preserving the target aspect ratio.

    Integral image + binary search over crop height; centered placement
    preferred.  Mirrors /root/reference/nodes/stabilizer_utils.py:448-504.
    """
    if target_width <= 0 or target_height <= 0:
        return None
    height, width = binary_mask.shape
    aspect = float(target_width) / float(target_height)
    integral = integral_image(binary_mask > 0)

    def find_fit(crop_h: int):
        crop_w = int(np.ceil(aspect * crop_h))
        if crop_h <= 0 or crop_h > height or crop_w > width:
            return None
        sums = (
            integral[crop_h:, crop_w:]
            - integral[:-crop_h, crop_w:]
            - integral[crop_h:, :-crop_w]
            + integral[:-crop_h, :-crop_w]
        )
        matches = sums == crop_w * crop_h
        if not matches.any():
            return None
        y0 = int(np.clip(round((height - crop_h) * 0.5), 0, matches.shape[0] - 1))
        x0 = int(np.clip(round((width - crop_w) * 0.5), 0, matches.shape[1] - 1))
        if not matches[y0, x0]:
            y0, x0 = np.unravel_index(int(np.argmax(matches)), matches.shape)
        return int(x0), int(y0)

    low, high = 1, min(height, int(np.floor(width / aspect)))
    best = None
    while low <= high:
        crop_h = (low + high) // 2
        loc = find_fit(crop_h)
        if loc is None:
            high = crop_h - 1
        else:
            best = (loc[0], loc[1], crop_h)
            low = crop_h + 1
    if best is None:
        return None
    x0, y0, crop_h = best
    return float(x0), float(y0), aspect * crop_h, float(crop_h)
