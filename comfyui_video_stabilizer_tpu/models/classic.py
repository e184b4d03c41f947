"""Classic (sparse feature tracking) estimator.

Pairs GFTT corners with pyramidal LK tracks and robust-fits the
requested transform with the perspective->similarity->translation
fallback chain (/root/reference/nodes/video_stabilizer_classic.py:
69-160).  All pairs are estimated in parallel; the sticky active-mode
degradation is applied afterwards by the shared engine's host scan.

Acceptance contract (same thresholds as the reference):
  <12 detected features or <8 surviving tracks -> degenerate pair
  perspective: >=4 points, RANSAC inlier ratio >= 0.15
  similarity:  >=3 points, RANSAC inlier ratio >= 0.1
  translation: always accepted; confidence = survivors / detected
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np

from ..ops import lk as LK
from ..ops import ransac as RS
from ..utils.video_io import VideoContext
from . import geometry as G
from .stabilize import PairFits, StabilizationResult, stabilize_clip

MIN_FEATURES = 12
MIN_TRACKS = 8
PERSP_MIN_RATIO = 0.15
SIM_MIN_RATIO = 0.1


def classic_estimator(grays: np.ndarray, requested_mode: str, *, seed: int = 0) -> PairFits:
    n = grays.shape[0]
    b = n - 1
    pts, det_counts = LK.gftt_batch(grays[:-1])
    pyr = LK.gaussian_pyramid(grays)
    prev_pyr = [lvl[:-1] for lvl in pyr]
    curr_pyr = [lvl[1:] for lvl in pyr]
    tracked, status = LK.lk_track(prev_pyr, curr_pyr, pts, det_counts)

    status_np = np.asarray(status)
    surv_counts = status_np.sum(axis=1)
    degenerate = (det_counts < MIN_FEATURES) | (surv_counts < MIN_TRACKS)

    matrices: Dict[str, np.ndarray] = {}
    confidences: Dict[str, np.ndarray] = {}
    accepted: Dict[str, np.ndarray] = {}

    if requested_mode == "perspective":
        H, n_in, n_valid = RS.fit_model_batch(pts, tracked, status, "perspective", seed=seed)
        conf = np.where(n_valid > 0, n_in / np.maximum(n_valid, 1), 0.0)
        finite = np.isfinite(H).all(axis=(1, 2))
        matrices["perspective"] = H
        confidences["perspective"] = conf
        accepted["perspective"] = finite & (surv_counts >= 4) & (conf >= PERSP_MIN_RATIO)

    if requested_mode in ("perspective", "similarity"):
        S, n_in, n_valid = RS.fit_model_batch(pts, tracked, status, "similarity", seed=seed + 1)
        conf = np.where(n_valid > 0, n_in / np.maximum(n_valid, 1), 0.0)
        finite = np.isfinite(S).all(axis=(1, 2))
        matrices["similarity"] = S
        confidences["similarity"] = conf
        accepted["similarity"] = finite & (surv_counts >= 3) & (conf >= SIM_MIN_RATIO)

    T = RS.median_translation_batch(pts, tracked, status)
    matrices["translation"] = T
    confidences["translation"] = np.where(
        det_counts > 0, surv_counts / np.maximum(det_counts, 1), 0.0
    )
    accepted["translation"] = np.ones(b, bool)

    return PairFits(
        degenerate=degenerate,
        matrices=matrices,
        confidences=confidences,
        accepted=accepted,
        residuals=None,
    )


def stabilize_classic(
    context: VideoContext,
    framing_mode: G.FramingMode,
    transform_mode: G.TransformMode,
    camera_lock: bool,
    strength: float,
    smooth: float,
    keep_fov: float,
    padding_rgb: Tuple[int, int, int],
    frame_rate: float,
    progress=None,
    interrupt_check=None,
) -> StabilizationResult:
    return stabilize_clip(
        context,
        estimator=classic_estimator,
        source_name="estimated_classic",
        framing_mode=framing_mode,
        transform_mode=transform_mode,
        camera_lock=camera_lock,
        strength=strength,
        smooth=smooth,
        keep_fov=keep_fov,
        padding_rgb=padding_rgb,
        frame_rate=frame_rate,
        progress=progress,
        interrupt_check=interrupt_check,
    )
