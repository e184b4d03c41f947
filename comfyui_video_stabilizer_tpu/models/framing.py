"""Framing solvers: keep_fov crop search and no-padding refinement.

Behavior parity with /root/reference/nodes/stabilizer_utils.py:507-837,
restructured TPU-first: the reference warps one binary mask per frame
per evaluation; here every mask pass is ONE batched closed-form
coverage computation over the whole clip, and the 3x3 close + bbox
measurements are batched reduce_window/reduction kernels.  Only the
18-iteration scalar binary search over the stabilization scale stays
on host (it's O(iterations x N) corner projections).
"""

from __future__ import annotations

from typing import Callable, Dict, List, Sequence, Tuple

import numpy as np

from ..ops import morphology as M
from ..ops import warp as W
from . import geometry as G

InterruptCheck = Callable[[], None] | None


def scale_deltas_parametric(
    base_mode: G.TransformMode,
    deltas: np.ndarray,
    scale: float,
) -> np.ndarray:
    """Per-frame parameter deltas scaled by ``scale`` -> (N, 3, 3)."""
    scale = float(np.clip(scale, 0.0, 1.0))
    return G.params_to_matrices(np.asarray(deltas, np.float64) * scale, base_mode)


def _closed_content_masks(matrices: np.ndarray, width: int, height: int) -> np.ndarray:
    """Binary content masks of the final matrices with 3x3 close cleanup."""
    cover = W.coverage_mask(matrices, (width, height), (width, height))
    closed = M.erode(M.dilate(cover, 1), 1)
    return closed


def _masked_min_ratio(masks: np.ndarray, width: int, height: int) -> float:
    x_min, y_min, x_max, y_max = M.content_bboxes(masks)
    ratios = np.where(
        x_max >= 0,
        np.minimum(
            np.maximum(1.0, x_max - x_min + 1.0) / width,
            np.maximum(1.0, y_max - y_min + 1.0) / height,
        ),
        0.0,
    )
    # empty frames force ratio 0 (matches per-frame coords.size == 0 branch)
    ratios = np.where(x_max >= 0, ratios, 0.0)
    return float(ratios.min()) if ratios.size else 1.0


def compute_crop_with_keep_fov_parametric(
    base_mode: G.TransformMode,
    delta_params: np.ndarray,
    width: int,
    height: int,
    keep_fov_target: float,
    safety_margin_px: float,
    max_iterations: int = 18,
    interrupt_check: InterruptCheck = None,
    return_masks: bool = True,
) -> Tuple[
    np.ndarray,  # final matrices (crop pre-multiplied)
    np.ndarray,  # pre-crop apply matrices
    np.ndarray | None,  # content masks (N, H, W) or None
    float,  # effective keep_fov ratio
    str,  # status: met | clamped | failed | disabled
    str | None,  # note
    float,  # stabilization scale
    List[float],  # crop origin
    List[float],  # crop size
]:
    """Binary-search the stabilization scale satisfying ``keep_fov``.

    Scale s in [0, 1] multiplies the correction deltas; for each
    candidate the intersection of warped bounds (minus a safety margin
    capped at 25% of the safe region) yields an aspect-preserving
    centered crop whose ratio is compared to the target.
    """
    keep_fov_clamped = float(np.clip(keep_fov_target, 0.0, 1.0))
    target_ratio = keep_fov_clamped
    eps = 1e-4

    def evaluate_bbox_only(scale: float) -> Tuple[float, Dict[str, object]]:
        if interrupt_check is not None:
            interrupt_check()
        mats = scale_deltas_parametric(base_mode, delta_params, scale)
        mins, maxs = G.compute_bounding_boxes(mats, width, height)
        x0, y0, x1, y1 = G.intersection_box(mins, maxs)
        safe_w = max(0.0, x1 - x0)
        safe_h = max(0.0, y1 - y0)
        margin = min(safety_margin_px, safe_w * 0.25, safe_h * 0.25)
        safe_x0 = x0 + margin
        safe_y0 = y0 + margin
        safe_w = max(0.0, safe_w - 2.0 * margin)
        safe_h = max(0.0, safe_h - 2.0 * margin)

        if safe_w <= 0.0 or safe_h <= 0.0:
            return 0.0, {
                "scale": scale,
                "pre_crop": mats,
                "final": mats,
                "crop_origin": [0.0, 0.0],
                "crop_size": [float(width), float(height)],
                "has_overlap": False,
            }

        crop_ratio = min(1.0, safe_w / width, safe_h / height)
        crop_w = width * crop_ratio
        crop_h = height * crop_ratio
        crop_x0 = safe_x0 + (safe_w - crop_w) * 0.5
        crop_y0 = safe_y0 + (safe_h - crop_h) * 0.5
        crop_scale = width / crop_w  # one uniform scale keeps the aspect
        crop_matrix = np.array(
            [
                [crop_scale, 0.0, -crop_scale * crop_x0],
                [0.0, crop_scale, -crop_scale * crop_y0],
                [0.0, 0.0, 1.0],
            ],
            dtype=np.float64,
        )
        final_mats = np.einsum("ij,njk->nik", crop_matrix, mats.astype(np.float64)).astype(np.float32)
        return crop_ratio, {
            "scale": scale,
            "pre_crop": mats,
            "final": final_mats,
            "crop_origin": [crop_x0, crop_y0],
            "crop_size": [crop_w, crop_h],
            "has_overlap": True,
        }

    def finalize_with_masks(candidate: Dict[str, object]) -> Dict[str, object]:
        if interrupt_check is not None:
            interrupt_check()
        masks = _closed_content_masks(np.asarray(candidate["final"]), width, height)
        min_ratio = _masked_min_ratio(masks, width, height)
        out = dict(candidate)
        out.update(
            {
                "content_masks": masks if return_masks else None,
                "ratio_final": float(min_ratio),
                "crop_origin": list(candidate.get("crop_origin", [0.0, 0.0])),
                "crop_size": list(candidate.get("crop_size", [float(width), float(height)])),
            }
        )
        return out

    ratio_full, raw_full = evaluate_bbox_only(1.0)
    if keep_fov_clamped <= eps:
        if bool(raw_full["has_overlap"]):
            raw = raw_full
            stabilization_scale = 1.0
            note = None
        else:
            _, raw = evaluate_bbox_only(0.0)
            stabilization_scale = 0.0
            note = "No common crop region at full stabilization; stabilization was disabled."
        cand = finalize_with_masks(raw)
        return (
            np.asarray(cand["final"]),
            np.asarray(raw["pre_crop"]),
            cand["content_masks"],
            cand["ratio_final"],
            "disabled",
            note,
            stabilization_scale,
            cand["crop_origin"],
            cand["crop_size"],
        )

    if ratio_full >= target_ratio - eps:
        cand = finalize_with_masks(raw_full)
        return (
            np.asarray(cand["final"]),
            np.asarray(raw_full["pre_crop"]),
            cand["content_masks"],
            cand["ratio_final"],
            "met",
            None,
            1.0,
            cand["crop_origin"],
            cand["crop_size"],
        )

    low, high = 0.0, 1.0
    best_candidate: Dict[str, object] | None = None
    for _ in range(max_iterations):
        mid = 0.5 * (low + high)
        ratio_mid, raw_mid = evaluate_bbox_only(mid)
        if ratio_mid >= target_ratio - eps:
            best_candidate = raw_mid
            low = mid
        else:
            high = mid

    if best_candidate is None:
        _, raw_zero = evaluate_bbox_only(0.0)
        cand = finalize_with_masks(raw_zero)
        note = (
            None
            if keep_fov_clamped <= eps
            else f"keep_fov target {keep_fov_clamped:.3f} could not be satisfied even with zero stabilisation."
        )
        return (
            np.asarray(cand["final"]),
            np.asarray(raw_zero["pre_crop"]),
            cand["content_masks"],
            cand["ratio_final"],
            "failed" if keep_fov_clamped > eps else "disabled",
            note,
            0.0,
            cand["crop_origin"],
            cand["crop_size"],
        )

    cand = finalize_with_masks(best_candidate)
    status = "met" if cand["ratio_final"] >= target_ratio - eps else "clamped"
    note = None
    scale_best = float(best_candidate["scale"])
    if status == "clamped" and keep_fov_clamped > eps:
        note = (
            f"keep_fov target {keep_fov_clamped:.3f} reduced to {cand['ratio_final']:.3f} "
            f"at stabilisation scale {scale_best:.3f}."
        )
    return (
        np.asarray(cand["final"]),
        np.asarray(best_candidate["pre_crop"]),
        cand["content_masks"],
        cand["ratio_final"],
        status,
        note,
        scale_best,
        cand["crop_origin"],
        cand["crop_size"],
    )


def refine_no_padding_crop(
    final_matrices: np.ndarray,
    width: int,
    height: int,
    safety_shrink_px: int = 1,
    interrupt_check: InterruptCheck = None,
) -> Tuple[np.ndarray, np.ndarray, List[float], List[float], float]:
    """Guarantee padding-free crop output.

    AND of all per-frame coverage masks (one batched min-reduce),
    eroded by ``safety_shrink_px``; largest aspect-preserving all-valid
    rectangle pre-multiplies a uniform crop onto every frame matrix.
    """
    final_matrices = np.asarray(final_matrices, np.float64)
    if interrupt_check is not None:
        interrupt_check()
    cover = W.coverage_mask(final_matrices, (width, height), (width, height))
    common = cover.min(axis=0) if cover.shape[0] else np.ones((height, width), np.float32)
    if safety_shrink_px > 0:
        common = M.erode(common[None], safety_shrink_px)[0]
    common = np.asarray(common)  # host copy for the rectangle search

    def bail() -> Tuple[np.ndarray, np.ndarray, List[float], List[float], float]:
        return (
            final_matrices.astype(np.float32),
            cover,
            [0.0, 0.0],
            [float(width), float(height)],
            0.0,
        )

    if common.max() == 0:
        return bail()

    aspect_crop = M.largest_aspect_ratio_rectangle(common > 0.5, width, height)
    if aspect_crop is None:
        return bail()

    x0, y0, crop_w, crop_h = aspect_crop
    crop_scale = width / crop_w
    crop_matrix = np.array(
        [
            [crop_scale, 0.0, -crop_scale * x0],
            [0.0, crop_scale, -crop_scale * y0],
            [0.0, 0.0, 1.0],
        ],
        dtype=np.float64,
    )
    refined = np.einsum("ij,njk->nik", crop_matrix, final_matrices).astype(np.float32)
    if interrupt_check is not None:
        interrupt_check()
    refined_cover = W.coverage_mask(refined, (width, height), (width, height))
    return refined, refined_cover, [x0, y0], [crop_w, crop_h], 1.0
