"""Tensor <-> batched-numpy bridge for video payloads.

TPU-first redesign of the reference's L1 adaptation layer
(/root/reference/nodes/stabilizer_utils.py:52-233, 1055-1077): instead
of a Python list of per-frame HWC arrays, normalization produces ONE
contiguous float32 (N, H, W, 3) RGB 0..1 batch, because every
downstream op (grayscale, flow, warp, masks) is a whole-clip batched
TPU kernel.  Input heuristics are behavior-compatible:

* accepts torch tensors, numpy arrays, python sequences of frames, or
  dicts carrying ``frames`` / ``images`` / ``video`` (+ optional fps);
* CHW frames are detected when the leading dim is 1/3/4 and smaller
  than the trailing dim; a leading singleton batch dim is squeezed;
* grayscale is expanded to 3 channels, >3 channels are truncated;
* uint8 and float data with per-frame max > 1.5 are scaled by 1/255
  (the float scaling decision is made per frame, as in the reference);
* reconstruction always emits a contiguous float32 BHWC torch tensor
  (numpy when torch is unavailable); dict inputs get their template
  back with ``frames`` replaced.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Iterable, List, Literal, Tuple

import numpy as np

try:
    import torch
except ImportError:  # pragma: no cover - torch is optional at runtime
    torch = None


@dataclass
class FrameAdapter:
    """Context captured from the first frame, used for reconstruction."""

    dtype: np.dtype
    channel_first: bool
    value_range: Literal["0_1", "0_255"]
    origin: Literal["numpy", "torch"]
    squeeze_last_dim: bool


@dataclass
class VideoContext:
    """Normalized clip: frames is a float32 (N, H, W, 3) RGB 0..1 batch."""

    frames: np.ndarray
    adapter: FrameAdapter
    width: int
    height: int
    channels: int
    fps: float | None
    template_kind: Literal["dict", "sequence"]
    template_meta: Dict[str, Any]

    @property
    def frame_count(self) -> int:
        return int(self.frames.shape[0])


def resolve_fps(context: VideoContext, frame_rate: float, default: float = 16.0) -> float:
    for candidate in (context.fps, frame_rate, default):
        if isinstance(candidate, (int, float)) and np.isfinite(candidate) and candidate > 0.0:
            return float(candidate)
    return float(default)


def _as_numpy(value: Any) -> Tuple[np.ndarray, Literal["numpy", "torch"]]:
    if torch is not None and isinstance(value, torch.Tensor):
        return value.detach().cpu().numpy(), "torch"
    return np.asarray(value), "numpy"


def _frame_layout(arr: np.ndarray) -> Tuple[np.ndarray, bool, bool]:
    """Apply the per-frame layout heuristics; returns (hwc, chw_flag, squeeze)."""
    channel_first = False
    squeeze_last_dim = False
    if arr.ndim == 3 and arr.shape[0] in (1, 3, 4) and arr.shape[0] < arr.shape[-1]:
        channel_first = True
        arr = np.moveaxis(arr, 0, -1)
    elif arr.ndim == 4 and arr.shape[0] == 1:
        arr = arr[0]
    if arr.ndim == 2:
        arr = arr[..., np.newaxis]
        squeeze_last_dim = True
    elif arr.ndim == 3 and arr.shape[2] == 1:
        squeeze_last_dim = True
    return arr, channel_first, squeeze_last_dim


def _ensure_rgb_batch(frames: np.ndarray) -> np.ndarray:
    """(N, H, W, C) -> (N, H, W, 3): expand grayscale, truncate extras."""
    channels = frames.shape[-1]
    if channels == 1:
        return np.repeat(frames, 3, axis=-1)
    if channels > 3:
        return frames[..., :3]
    if channels == 2:
        pad = np.zeros(frames.shape[:-1] + (1,), dtype=frames.dtype)
        return np.concatenate([frames, pad], axis=-1)
    return frames


def _scale_to_unit(batch: np.ndarray, src_dtype: np.dtype) -> Tuple[np.ndarray, Literal["0_1", "0_255"]]:
    """Range heuristic, applied per frame for float data (reference parity)."""
    if src_dtype == np.uint8:
        return batch.astype(np.float32) / 255.0, "0_255"
    converted = np.ascontiguousarray(batch, dtype=np.float32)
    if converted.size:
        frame_max = converted.reshape(converted.shape[0], -1).max(axis=1)
        needs_scale = frame_max > 1.5
        if needs_scale.any():
            if converted is batch or np.shares_memory(converted, batch):
                converted = converted.copy()  # never mutate caller-owned data
            converted[needs_scale] /= 255.0
            return converted, "0_255" if needs_scale[0] else "0_1"
    return converted, "0_1"


def normalize_video_input(value: Any) -> VideoContext:
    """Normalize any accepted video payload into a VideoContext."""
    if isinstance(value, dict):
        candidates = ("frames", "images", "video")
        frames_seq = None
        for key in candidates:
            if key in value:
                frames_seq = value[key]
                break
        if frames_seq is None:
            raise ValueError("Video input dictionary must contain 'frames'.")
        template_kind: Literal["dict", "sequence"] = "dict"
        template_meta = {k: v for k, v in value.items() if k not in candidates}
        fps = template_meta.get("fps")
    else:
        frames_seq = value
        template_kind = "sequence"
        template_meta = {}
        fps = None

    arr, origin = _as_numpy(frames_seq) if not isinstance(frames_seq, (list, tuple)) else (None, "numpy")

    if arr is not None and arr.ndim == 4:
        # Whole-batch fast path: one conversion, no per-frame python loop.
        first = arr[0]
        channel_first = first.shape[0] in (1, 3, 4) and first.shape[0] < first.shape[-1] and first.ndim == 3
        if channel_first:
            arr = np.moveaxis(arr, 1, -1)
        squeeze_last_dim = arr.shape[-1] == 1
        src_dtype = arr.dtype
        batch, value_range = _scale_to_unit(arr, src_dtype)
        batch = _ensure_rgb_batch(batch)
        adapter = FrameAdapter(
            dtype=src_dtype,
            channel_first=channel_first,
            value_range=value_range,
            origin=origin,
            squeeze_last_dim=squeeze_last_dim,
        )
    else:
        if arr is not None and arr.ndim < 3:
            raise ValueError("Video input must have at least 3 dimensions (frames, height, width).")
        frame_list: List[np.ndarray] = []
        adapter = None
        iterable: Iterable[Any] = frames_seq if arr is None else list(arr)
        for frame in iterable:
            frame_np, frame_origin = _as_numpy(frame)
            hwc, channel_first, squeeze_last_dim = _frame_layout(frame_np)
            src_dtype = hwc.dtype
            scaled, value_range = _scale_to_unit(hwc[np.newaxis], src_dtype)
            rgb = _ensure_rgb_batch(scaled)[0]
            frame_adapter = FrameAdapter(
                dtype=src_dtype,
                channel_first=channel_first,
                value_range=value_range,
                origin=frame_origin,
                squeeze_last_dim=squeeze_last_dim,
            )
            if adapter is None:
                adapter = frame_adapter
            elif (
                frame_adapter.channel_first != adapter.channel_first
                or frame_adapter.origin != adapter.origin
            ):
                raise ValueError("Mixed tensor layouts within the same video sequence are not supported.")
            frame_list.append(rgb)
        if not frame_list:
            raise ValueError("The input video sequence is empty.")
        batch = np.stack(frame_list, axis=0)

    if batch.shape[0] == 0:
        raise ValueError("The input video sequence is empty.")

    batch = np.ascontiguousarray(batch, dtype=np.float32)
    height, width, channels = batch.shape[1:]
    return VideoContext(
        frames=batch,
        adapter=adapter,
        width=int(width),
        height=int(height),
        channels=int(channels),
        fps=fps,
        template_kind=template_kind,
        template_meta=template_meta,
    )


def reconstruct_video(frames: Any, context: VideoContext) -> Any:
    """Pack frames into a contiguous float32 BHWC tensor payload."""
    if not isinstance(frames, np.ndarray) and getattr(frames, "ndim", None) == 4:
        # Device (jax) array: ONE bulk device->host transfer for the whole
        # clip, never a per-frame fetch loop (reference stacks whole-clip
        # buffers the same way, stabilizer_utils.py:200-221).
        frames = np.asarray(frames)
    if isinstance(frames, np.ndarray) and frames.ndim == 4:
        stacked = (
            frames
            if frames.shape[0]
            else np.zeros((1, context.height, context.width, 3), dtype=np.float32)
        )
    else:
        frame_list = list(frames)
        if not frame_list:
            stacked = np.zeros((1, context.height, context.width, 3), dtype=np.float32)
        else:
            stacked = np.stack(frame_list, axis=0)
    stacked = np.ascontiguousarray(stacked, dtype=np.float32)
    if not stacked.flags.writeable:
        stacked = stacked.copy()  # torch.from_numpy requires a writable buffer
    tensor = torch.from_numpy(stacked) if torch is not None else stacked

    if context.template_kind == "dict":
        payload = dict(context.template_meta)
        payload["frames"] = tensor
        return payload
    return tensor


def convert_masks_for_output(masks: Any) -> Any:
    """Internal masks -> (N, H, W) float32 tensor payload."""
    if not isinstance(masks, np.ndarray) and getattr(masks, "ndim", None) in (3, 4):
        masks = np.asarray(masks)  # one bulk device->host transfer
    if isinstance(masks, np.ndarray) and masks.ndim in (3, 4):
        if not masks.shape[0]:
            stacked = np.zeros((1, 1, 1), dtype=np.float32)
        else:
            stacked = masks[..., 0] if masks.ndim == 4 else masks
    else:
        masks_2d: List[np.ndarray] = []
        for mask in masks:
            mask_2d = mask[..., 0] if mask.ndim == 3 else mask
            masks_2d.append(mask_2d.astype(np.float32))
        stacked = np.stack(masks_2d, axis=0) if masks_2d else np.zeros((1, 1, 1), dtype=np.float32)

    stacked = np.ascontiguousarray(stacked, dtype=np.float32)
    if not stacked.flags.writeable:
        stacked = stacked.copy()
    if torch is not None:
        return torch.from_numpy(stacked)
    return stacked
