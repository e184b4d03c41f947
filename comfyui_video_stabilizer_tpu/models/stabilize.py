"""Shared stabilization pipeline engine (Classic & Flow are twins).

One engine implements the 9-stage skeleton of the reference's
``_stabilize_frames`` (classic /root/reference/nodes/
video_stabilizer_classic.py:163-567, flow video_stabilizer_flow.py:
213-640), parameterized by a batched *estimator*:

  1. fps resolution + empty/single-frame early-outs
  2. grayscale at <=960 px working size (batched TPU kernels)
  3. estimator: per-pair fits for the full fallback chain, computed
     for ALL pairs in parallel (batched LK / DIS / RANSAC kernels)
  4. sticky-mode selection: the reference's loop-carried
     ``active_mode`` degradation is reproduced as a host-side scan
     over per-pair acceptance flags — observable behavior preserved
     without serializing the kernels
  5. path integration (cumsum) in the requested parameter space
  6. target path: camera_lock or fps-aware smoothing
  7. framing: crop (keep_fov solver + no-padding refine) /
     crop_and_pad (recenter) / expand (union canvas)
  8. ONE batched warp + closed-form padding masks
  9. meta assembly + motion_meta v2 attach
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Tuple

import numpy as np

from ..meta.motion_meta import (
    applied_motion_meta_from_stabilization_warp,
    build_stabilization_warp_meta,
)
from ..ops import resize as R
from ..ops import warp as W
from ..utils.profiling import StageTimer
from ..utils.video_io import VideoContext
from . import framing as F
from . import geometry as G

logger = logging.getLogger(__name__)

ProgressCallback = Callable[[int, int], None]  # (done, total)
InterruptCheck = Callable[[], None]

MODE_PRIORITY: Dict[str, List[str]] = {
    "perspective": ["perspective", "similarity", "translation"],
    "similarity": ["similarity", "translation"],
    "translation": ["translation"],
}

# Estimation dispatch granularity: pairs per chunk.  The reference
# polls interruption every pair and batches progress updates stride-10
# through its estimation loop (/root/reference/nodes/
# video_stabilizer_classic.py:221-223,279-284); the batched engines
# dispatch estimation in 32-pair chunks with a host progress tick +
# interrupt poll between chunks.  Dispatch is async, so chunking adds
# NO device syncs — a raised interrupt simply stops enqueueing.
ESTIMATION_CHUNK_PAIRS = 32


class EstimationInterrupted(BaseException):
    """Shield for interrupts raised inside chunked-estimation progress
    ticks.  Estimators wrap their primary dispatch in ``except
    Exception`` blocks (backend degradation: DIS -> TV-L1 -> phase;
    fast path -> host path) — a cooperative-cancellation exception must
    not be mistaken for a backend failure, so the engine's tick closure
    re-raises it as this BaseException (immune to ``except Exception``)
    and unwraps it at the engine boundary."""

    @property
    def original(self) -> BaseException:
        return self.args[0]


def estimation_chunk_spans(n_frames: int, chunk: int = ESTIMATION_CHUNK_PAIRS):
    """Frame-slice plan [(start, end, drop_leading_pairs)] covering all
    n_frames-1 adjacent pairs in `chunk`-pair chunks.

    Every chunk spans exactly chunk+1 frames (ONE compiled shape); the
    final chunk is anchored at the clip's end and overlaps its
    predecessor, with the duplicated leading pairs dropped — so each
    pair's estimate is computed from the same inputs as the unchunked
    dispatch and the results are bit-identical to it.
    """
    b = n_frames - 1
    if b <= chunk:
        return [(0, n_frames, 0)]
    spans = []
    s = 0
    while s + chunk < b:
        spans.append((s, s + chunk + 1, 0))
        s += chunk
    start = b - chunk
    spans.append((start, n_frames, s - start))
    return spans


@dataclass
class PairFits:
    """Batched per-pair estimation results for the full fallback chain.

    All arrays have length B = N - 1.  ``degenerate`` marks pairs with
    too few usable points: they yield an identity transform, mode
    'translation', confidence 0 (and degrade the sticky mode).
    """

    degenerate: np.ndarray
    matrices: Dict[str, np.ndarray]
    confidences: Dict[str, np.ndarray]
    accepted: Dict[str, np.ndarray]
    residuals: Dict[str, np.ndarray] | None = None
    extra_meta: Dict[str, Any] = field(default_factory=dict)


@dataclass
class StabilizationResult:
    frames: np.ndarray | List[np.ndarray]
    masks: np.ndarray | List[np.ndarray]
    meta: Dict[str, Any]


Estimator = Callable[[np.ndarray, str], PairFits]
# (gray_frames (N, h, w) float, requested_mode) -> PairFits


def sticky_select(requested_mode: str, fits: PairFits) -> Tuple[np.ndarray, List[str], List[float], List[float] | None]:
    """Reproduce the reference's loop-carried mode degradation.

    active_mode starts at the requested mode; each pair tries the
    fallback chain from the *current* active mode and the first
    accepted model wins; a pair whose winning mode differs from
    active_mode re-points active_mode for all later pairs.
    """
    b = fits.degenerate.shape[0]
    out_mats = np.tile(np.eye(3, dtype=np.float32), (b, 1, 1))
    out_modes: List[str] = []
    out_confs: List[float] = []
    out_res: List[float] | None = [] if fits.residuals is not None else None

    active = requested_mode
    for i in range(b):
        if fits.degenerate[i]:
            used, conf, res = "translation", 0.0, 0.0
            mat = np.eye(3, dtype=np.float32)
        else:
            used = None
            for mode in MODE_PRIORITY[active]:
                if mode in fits.accepted and fits.accepted[mode][i]:
                    used = mode
                    mat = fits.matrices[mode][i]
                    conf = float(fits.confidences[mode][i])
                    res = float(fits.residuals[mode][i]) if fits.residuals is not None else 0.0
                    break
            if used is None:
                used, conf, res = "translation", 0.0, 0.0
                mat = np.eye(3, dtype=np.float32)
        if used != active:
            active = used
        out_mats[i] = mat
        out_modes.append(used)
        out_confs.append(conf)
        if out_res is not None:
            out_res.append(res)
    return out_mats, out_modes, out_confs, out_res


def _resolve_fps_pair(frame_rate: float, context_fps) -> Tuple[float, float | None]:
    fps_candidate = frame_rate
    if not isinstance(fps_candidate, (int, float)) or not np.isfinite(fps_candidate) or fps_candidate <= 0.0:
        fps_candidate = (
            context_fps
            if isinstance(context_fps, (int, float)) and np.isfinite(context_fps) and context_fps > 0.0
            else 16.0
        )
    fps_effective = float(max(1.0, fps_candidate))
    fps_requested = float(frame_rate) if isinstance(frame_rate, (int, float)) and frame_rate > 0.0 else None
    return fps_effective, fps_requested


def stabilize_clip(
    context: VideoContext,
    *,
    estimator: Estimator,
    source_name: str,
    framing_mode: G.FramingMode,
    transform_mode: G.TransformMode,
    camera_lock: bool,
    strength: float,
    smooth: float,
    keep_fov: float,
    padding_rgb: Tuple[int, int, int],
    frame_rate: float,
    extra_meta: Dict[str, Any] | None = None,
    progress: ProgressCallback | None = None,
    interrupt_check: InterruptCheck | None = None,
) -> StabilizationResult:
    frames = context.frames
    total_frames = context.frame_count
    width, height = context.width, context.height
    fps_effective, fps_requested = _resolve_fps_pair(frame_rate, context.fps)
    extra_meta = dict(extra_meta or {})

    def _attach_motion_meta(meta: Dict[str, Any]) -> Dict[str, Any]:
        try:
            meta["motion_meta"] = applied_motion_meta_from_stabilization_warp(
                meta["stabilization_warp"], fps=fps_effective, source=source_name
            )
        except (KeyError, TypeError, ValueError, np.linalg.LinAlgError):
            logger.debug("Failed to derive motion_meta from stabilization_warp.", exc_info=True)
        return meta

    def _tick(done: int, total: int) -> None:
        if progress is not None:
            progress(done, total)
        if interrupt_check is not None:
            interrupt_check()

    estimation_steps = max(0, total_frames - 1)
    progress_total = estimation_steps + total_frames

    if total_frames == 0:
        meta = {
            "frames": 0,
            "note": "Empty frame sequence; nothing to stabilise.",
            "transform_mode_requested": transform_mode,
            "transform_mode_applied": "identity",
            "camera_lock": camera_lock,
            "strength": strength,
            "strength_effective": 0.0,
            "smooth": smooth,
            "fps_requested": fps_requested,
            "fps_effective": fps_effective,
            "framing": {
                "mode": framing_mode,
                "input_size": [width, height],
                "padding_color_rgb": [int(c) for c in padding_rgb],
            },
            "keep_fov_applied": False,
            "padding_color_rgb": [int(c) for c in padding_rgb],
            **extra_meta,
            "stabilization_warp": build_stabilization_warp_meta(
                source_size=(width, height),
                output_size=(width, height),
                framing_mode=framing_mode,
                applied_matrices=[],
            ),
            "estimated_motion": {"per_transition": [], "path": [], "target_path": [], "target_path_effective": []},
            "padding_fraction_mean": 0.0,
            "padding_fraction_max": 0.0,
        }
        return StabilizationResult([], [], _attach_motion_meta(meta))

    if total_frames == 1:
        zero_mask = np.zeros((1, height, width), dtype=np.float32)
        meta = {
            "frames": 1,
            "note": "Single-frame input; bypassed stabilization.",
            "transform_mode": transform_mode,
            "framing_mode": framing_mode,
            **extra_meta,
            "stabilization_warp": build_stabilization_warp_meta(
                source_size=(width, height),
                output_size=(width, height),
                framing_mode=framing_mode,
                applied_matrices=[np.eye(3, dtype=np.float32)],
            ),
            "fps_requested": fps_requested,
            "fps_effective": fps_effective,
        }
        _tick(progress_total, progress_total)
        return StabilizationResult(frames.copy(), zero_mask, _attach_motion_meta(meta))

    # ---- estimation at working resolution (batched) ----
    timer = StageTimer()
    working_size = G.working_estimation_size(width, height)
    dec_fn = getattr(estimator, "gray_decimation", None)
    decimation = dec_fn(width, height, working_size) if dec_fn is not None else 1
    base_mode = transform_mode

    # Zero-sync device fast path (models/fastpath.py): gray ingest,
    # estimation, sticky select, trajectory, framing solve (recenter /
    # expand union canvas), warp all dispatched without a serial host
    # round-trip; returns every host value the meta assembly below
    # needs.  None -> exact host path (which then computes its own
    # grays).
    def _tick_pairs(done_pairs: int) -> None:
        # chunked-estimation progress: called between chunk DISPATCHES
        # (no syncs); an interrupt raised here stops enqueueing further
        # chunks, matching the reference's per-pair polling granularity
        try:
            _tick(min(int(done_pairs), estimation_steps), progress_total)
        except BaseException as exc:
            raise EstimationInterrupted(exc) from exc

    # chunked dispatch only when an observer exists: with no progress
    # bar and no interrupt poll, the single whole-clip dispatch is the
    # same values with one less host loop
    tick_pairs_cb = (
        _tick_pairs if (progress is not None or interrupt_check is not None) else None
    )

    fast = None
    fast_fn = getattr(estimator, "fast_path", None)
    if fast_fn is not None and framing_mode in ("crop", "crop_and_pad", "expand"):
        with timer.stage("estimation"):
            try:
                fast = fast_fn(
                    frames, framing_mode, transform_mode, camera_lock, strength,
                    smooth, fps_effective, (width, height), working_size,
                    decimation, padding_rgb, tick_pairs=tick_pairs_cb,
                    keep_fov=keep_fov,
                )
            except EstimationInterrupted as ei:
                raise ei.original
    if fast is not None:
        matrices = fast["matrices"]
        modes_used = fast["modes_used"]
        confidences = fast["confidences"]
        residuals = fast["residuals"]
        extra_meta.update(fast["extra_meta"])
        active_mode = modes_used[-1] if modes_used else transform_mode
        _tick(estimation_steps, progress_total)
        strength = fast["strength"]
        smooth = fast["smooth"]
        path = fast["path"]
        target_path = fast["target_path"]
        diffs = fast["diffs"]
        delta_params_full = diffs
    else:
        with timer.stage("grayscale_downscale"):
            grays = R.gray_for_estimation(frames, working_size, decimation=decimation)
        with timer.stage("estimation"):
            try:
                fits = (
                    estimator(grays, transform_mode, decimation=decimation,
                              tick_pairs=tick_pairs_cb)
                    if decimation > 1
                    else estimator(grays, transform_mode, tick_pairs=tick_pairs_cb)
                )
            except EstimationInterrupted as ei:
                raise ei.original
        matrices, modes_used, confidences, residuals = sticky_select(transform_mode, fits)
        if working_size is not None:
            matrices = G.rescale_transforms_to_full(matrices, (width, height), working_size)
        extra_meta.update(fits.extra_meta)
        active_mode = modes_used[-1] if modes_used else transform_mode
        _tick(estimation_steps, progress_total)

        delta_params = G.matrices_to_params(matrices, base_mode)
        path = G.integrate_path(delta_params)

        strength = float(np.clip(strength, 0.0, 1.0))
        smooth = float(np.clip(smooth, 0.0, 1.0))

        if camera_lock:
            smooth = max(smooth, 0.85)
            target_path = np.zeros_like(path)
        else:
            smoothed = G.smooth_path(path, smooth, fps_effective)
            target_path = path + strength * (smoothed - path)

        diffs = target_path - path
        delta_params_full = diffs.copy()

    keep_fov_clamped = float(np.clip(keep_fov, 0.0, 1.0))
    keep_fov_applied = framing_mode == "crop" and keep_fov_clamped > 1e-6
    stabilization_scale = 1.0
    keep_fov_status = "disabled"
    keep_fov_note: str | None = None
    keep_fov_effective_value = 1.0
    crop_origin: List[float] = [0.0, 0.0]
    crop_size: List[float] = [float(width), float(height)]
    output_size = (width, height)

    if framing_mode == "crop":
        if keep_fov_clamped >= 0.9999:
            zero_masks = np.zeros((total_frames, height, width), dtype=np.float32)
            meta = {
                "frames": total_frames,
                "note": "keep_fov~=1.0 in crop mode; returning original frames.",
                "transform_mode_requested": transform_mode,
                "transform_mode_applied": "identity",
                "camera_lock": camera_lock,
                "strength": strength,
                "strength_effective": 0.0,
                "smooth": smooth,
                "fps_requested": fps_requested,
                "fps_effective": fps_effective,
                "framing": {
                    "mode": framing_mode,
                    "input_size": [width, height],
                    "keep_fov_requested": keep_fov_clamped,
                    "keep_fov_effective": 1.0,
                    "min_content_ratio": 1.0,
                    "padding_color_rgb": [int(c) for c in padding_rgb],
                    "stabilization_scale": 0.0,
                },
                "keep_fov_applied": False,
                **extra_meta,
                "stabilization_warp": build_stabilization_warp_meta(
                    source_size=(width, height),
                    output_size=(width, height),
                    framing_mode=framing_mode,
                    applied_matrices=[np.eye(3, dtype=np.float32)] * total_frames,
                ),
                "estimated_motion": {
                    "per_transition": [],
                    "path": path.tolist(),
                    "target_path": target_path.tolist(),
                    "target_path_effective": path.tolist(),
                },
                "padding_fraction_mean": 0.0,
                "padding_fraction_max": 0.0,
            }
            _tick(progress_total, progress_total)
            return StabilizationResult(frames.copy(), zero_masks, _attach_motion_meta(meta))

        if fast is not None:
            # keep_fov solver + no-padding refine already ran on device
            # (models/fastpath.py::_traj_program crop branch +
            # _crop_finalize); statuses were reconstructed host-side
            apply_matrices = fast["apply_matrices"]
            final_matrices = fast["final_matrices"]
            keep_fov_status = fast["keep_fov_status"]
            keep_fov_note = fast["keep_fov_note"]
            keep_fov_effective_value = fast["keep_fov_effective"]
            stabilization_scale = fast["stabilization_scale"]
            crop_origin = list(fast["crop_origin"])
            crop_size = list(fast["crop_size"])
        else:
            safety_margin_px = max(0.5, 0.02 * max(width, height))
            (
                final_matrices,
                apply_matrices,
                _content_masks,
                keep_fov_effective_value,
                keep_fov_status,
                keep_fov_note,
                stabilization_scale,
                crop_origin,
                crop_size,
            ) = F.compute_crop_with_keep_fov_parametric(
                base_mode,
                delta_params_full,
                width,
                height,
                keep_fov_clamped,
                safety_margin_px,
                interrupt_check=interrupt_check,
                return_masks=False,
            )
            (
                final_matrices,
                _content_masks,
                crop_origin,
                crop_size,
                keep_fov_effective_value,
            ) = F.refine_no_padding_crop(
                final_matrices,
                width,
                height,
                safety_shrink_px=1,
                interrupt_check=interrupt_check,
            )
    elif fast is not None:
        apply_matrices = fast["apply_matrices"]
        final_matrices = fast["final_matrices"]
    else:
        apply_matrices = G.params_to_matrices(delta_params_full, base_mode)
        final_matrices = apply_matrices

    if fast is not None:
        mins, maxs = fast["mins"], fast["maxs"]
    else:
        mins, maxs = G.compute_bounding_boxes(apply_matrices, width, height)

    framing_meta: Dict[str, Any] = {
        "mode": framing_mode,
        "input_size": [width, height],
        "padding_color_rgb": [int(c) for c in padding_rgb],
        "min_content_ratio": G.min_content_ratio(mins, maxs, width, height),
    }

    if framing_mode == "crop":
        framing_meta.update(
            {
                "keep_fov_status": keep_fov_status,
                "keep_fov_effective": keep_fov_effective_value,
                "crop_origin": list(crop_origin),
                "crop_size": list(crop_size),
                "actual_content_ratio": keep_fov_effective_value,
                "stabilization_scale": float(stabilization_scale),
            }
        )
        if keep_fov_applied:
            framing_meta["keep_fov_requested"] = keep_fov_clamped
        if keep_fov_note:
            framing_meta["keep_fov_note"] = keep_fov_note
    elif framing_mode == "crop_and_pad":
        x0, y0, x1, y1 = G.intersection_box(mins, maxs)
        intersection_w = max(1.0, x1 - x0)
        intersection_h = max(1.0, y1 - y0)
        if fast is not None:
            offset_x, offset_y = fast["center_offset"]
        else:
            offset_x = width * 0.5 - (x0 + x1) * 0.5
            offset_y = height * 0.5 - (y0 + y1) * 0.5
            translate = G.translation_matrix(offset_x, offset_y).astype(np.float64)
            final_matrices = np.einsum("ij,njk->nik", translate, np.asarray(apply_matrices, np.float64)).astype(np.float32)
        framing_meta.update(
            {
                "safe_region_origin": [x0, y0],
                "safe_region_size": [intersection_w, intersection_h],
                "actual_content_ratio": min(intersection_w / width, intersection_h / height),
                "center_offset": [offset_x, offset_y],
            }
        )
    else:  # expand
        if fast is not None and "output_size" in fast:
            # union canvas + translate already composed on device
            output_size = fast["output_size"]
        else:
            translate, output_size = G.prepare_expand_transform(mins, maxs)
            final_matrices = np.einsum(
                "ij,njk->nik", translate.astype(np.float64), np.asarray(apply_matrices, np.float64)
            ).astype(np.float32)
        framing_meta["expanded_size"] = list(output_size)

    effective_diffs = (
        G.matrices_to_params(apply_matrices, base_mode)
        if framing_mode == "crop"
        else delta_params_full
    )
    stabilization_scale = float(np.clip(stabilization_scale, 0.0, 1.0))
    strength_effective = strength * stabilization_scale
    effective_target_path = path + effective_diffs

    # ---- warp pass: one batched kernel + closed-form masks ----
    border = np.asarray(padding_rgb, np.float32) / 255.0
    out_w_i, out_h_i = int(output_size[0]), int(output_size[1])
    with timer.stage("warp"):
        if fast is not None:
            # already dispatched (and its stats fetched) by the fast path
            stabilized = fast["stabilized"]
            padding_masks = fast["padding_masks"]
            ratios_dev = fast["padded_ratios"]
        elif not W.will_stream(total_frames, height, width, out_h_i, out_w_i):
            # masks + per-frame stats are queued BEFORE the frame warp
            # (device streams run in dispatch order), so the stats
            # round-trip below overlaps the warp instead of following it
            padding_masks, ratios_dev = W.padding_mask_stats(
                final_matrices, (width, height), output_size
            )
            stabilized = W.warp_clip(
                frames, final_matrices, output_size, "bilinear", border
            )
        else:
            stabilized, padding_masks = W.warp_clip_with_mask(
                frames, final_matrices, output_size, "bilinear", border
            )
            ratios_dev = padding_masks.reshape(total_frames, -1).mean(axis=1)
    # only the tiny per-frame stats leave the device; masks are already
    # zero-smalled, so any nonzero mean implies detectable padding
    padded_ratios = np.asarray(ratios_dev)
    padding_detected = bool((padded_ratios > 0).any())
    framing_meta["padding_detected"] = padding_detected
    _tick(progress_total, progress_total)

    per_transition = []
    for idx, (mode, confidence) in enumerate(zip(modes_used, confidences)):
        entry = {
            "index": idx,
            "mode": mode,
            "confidence": confidence,
            "matrix": matrices[idx].astype(np.float32).tolist(),
        }
        if residuals is not None:
            entry["residual"] = residuals[idx]
        per_transition.append(entry)

    meta = {
        "frames": total_frames,
        "transform_mode_requested": transform_mode,
        "transform_mode_applied": active_mode,
        "camera_lock": camera_lock,
        "strength": strength,
        "strength_effective": strength_effective,
        "smooth": smooth,
        "fps_requested": fps_requested,
        "fps_effective": fps_effective,
        "framing": framing_meta,
        "keep_fov_applied": keep_fov_applied,
        "padding_color_rgb": [int(c) for c in padding_rgb],
        **extra_meta,
        "stabilization_warp": build_stabilization_warp_meta(
            source_size=(width, height),
            output_size=output_size,
            framing_mode=framing_mode,
            applied_matrices=final_matrices,
        ),
        "estimated_motion": {
            "per_transition": per_transition,
            "path": path.tolist(),
            "target_path": target_path.tolist(),
            "target_path_effective": effective_target_path.tolist(),
        },
        "padding_fraction_mean": float(padded_ratios.mean()),
        "padding_fraction_max": float(padded_ratios.max()),
    }
    return StabilizationResult(stabilized, padding_masks, timer.attach(_attach_motion_meta(meta)))
