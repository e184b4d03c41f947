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

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
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


@functools.partial(jax.jit, static_argnames=("want_persp", "n_hyp"))
def _fused_classic_fits(pts, tracked, status, seed, want_persp, n_hyp):
    """Every robust fit + the survivor stats as ONE device program so
    the estimator pays a single host round-trip (same structure as the
    flow path's _fused_fits_sampled)."""
    b = pts.shape[0]
    surv = status.sum(axis=1)

    def keys(salt):
        return jax.vmap(lambda i: jax.random.fold_in(jax.random.PRNGKey(seed + salt), i))(
            jnp.arange(b)
        )

    out = [surv]
    if want_persp:
        H, nH, vH = RS._ransac_batched(
            keys(0), pts, tracked, status, "perspective", n_hyp, RS.PERSP_THRESH
        )
        out += [H, nH, vH]
    S, nS, vS = RS._ransac_batched(
        keys(1), pts, tracked, status, "similarity", n_hyp, RS.SIM_THRESH
    )
    out += [S, nS, vS]
    med = RS._masked_median_shift(pts, tracked, status)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (b, 3, 3))
    T = eye.at[:, 0, 2].set(med[:, 0]).at[:, 1, 2].set(med[:, 1])
    out.append(T)
    return tuple(out)


@functools.partial(jax.jit, static_argnames=("want_persp", "n_hyp"))
def _classic_estimate_fused(grays, seed, want_persp, n_hyp):
    """GFTT + pyramid + LK + every robust fit as ONE device program.

    Dispatch fusion: through the dev tunnel every program LAUNCH costs
    ~30 ms wall regardless of its device time (measured: the blocked
    greedy cut the gftt scan's device work 6x and the end-to-end gftt
    wall time did not move), so the per-stage chain — gftt, 4 pyramid
    levels' LK jits, fits — was launch-bound at ~10 dispatches.  The
    inner functions are themselves jitted; tracing them here inlines
    everything into a single launch.  Used when no progress/interrupt
    observer needs chunk-granular dispatch."""
    pts, det_counts = LK.gftt_batch(grays[:-1])
    pyr = LK.gaussian_pyramid(grays)
    tracked, status = LK.lk_track(
        [lvl[:-1] for lvl in pyr], [lvl[1:] for lvl in pyr], pts, det_counts
    )
    fits = _fused_classic_fits(pts, tracked, status, seed, want_persp, n_hyp)
    return (pts, det_counts, tracked, status) + fits


def _lk_tracks_chunked(grays, tick_pairs):
    """GFTT + pyramid + LK over all adjacent pairs, dispatched in
    32-pair chunks with a progress tick + interrupt poll between chunk
    dispatches (models/stabilize.py::estimation_chunk_spans).  GFTT is
    per-frame and LK per-pair, so the concatenated results are
    bit-identical to the single dispatch; no syncs are added."""
    from .stabilize import estimation_chunk_spans

    def one(g):
        pts, det_counts = LK.gftt_batch(g[:-1])
        pyr = LK.gaussian_pyramid(g)
        tracked, status = LK.lk_track(
            [lvl[:-1] for lvl in pyr], [lvl[1:] for lvl in pyr], pts, det_counts
        )
        return pts, det_counts, tracked, status

    spans = estimation_chunk_spans(int(grays.shape[0]))
    if len(spans) == 1 or tick_pairs is None:
        return one(grays)
    parts = []
    for s, e, drop in spans:
        chunk = one(grays[s:e])
        parts.append(tuple(x[drop:] for x in chunk) if drop else chunk)
        tick_pairs(e - 1)
    return tuple(jnp.concatenate(xs, axis=0) for xs in zip(*parts))


def _tracks_and_fits(grays, tick_pairs, seed, want_persp):
    """(pts, det_counts, tracked, status), fits-tuple — fused into one
    launch when no chunk-granular observer is attached."""
    from .stabilize import estimation_chunk_spans

    spans = estimation_chunk_spans(int(grays.shape[0]))
    if tick_pairs is None or len(spans) == 1:
        out = _classic_estimate_fused(
            jnp.asarray(grays), seed, want_persp, RS.DEFAULT_HYPOTHESES
        )
        return out[:4], out[4:]
    pts, det_counts, tracked, status = _lk_tracks_chunked(grays, tick_pairs)
    fits = _fused_classic_fits(
        jnp.asarray(pts), tracked, status, seed, want_persp,
        RS.DEFAULT_HYPOTHESES,
    )
    return (pts, det_counts, tracked, status), fits


def classic_estimator(grays: np.ndarray, requested_mode: str, *, seed: int = 0,
                      tick_pairs=None) -> PairFits:
    n = grays.shape[0]
    b = n - 1
    want_persp = requested_mode == "perspective"
    (pts, det_counts, tracked, status), fits = _tracks_and_fits(
        grays, tick_pairs, seed, want_persp
    )
    # det_counts rides along in the estimator's single host fetch (the
    # corners themselves never leave the device)
    fused = jax.device_get((det_counts,) + fits)
    it = iter(fused)
    det_counts = np.asarray(next(it))
    surv_counts = np.asarray(next(it))
    degenerate = (det_counts < MIN_FEATURES) | (surv_counts < MIN_TRACKS)

    matrices: Dict[str, np.ndarray] = {}
    confidences: Dict[str, np.ndarray] = {}
    accepted: Dict[str, np.ndarray] = {}

    if want_persp:
        H, n_in, n_valid = (np.asarray(next(it)) for _ in range(3))
        conf = np.where(n_valid > 0, n_in / np.maximum(n_valid, 1), 0.0)
        finite = np.isfinite(H).all(axis=(1, 2))
        matrices["perspective"] = H
        confidences["perspective"] = conf
        accepted["perspective"] = finite & (surv_counts >= 4) & (conf >= PERSP_MIN_RATIO)

    S, n_in, n_valid = (np.asarray(next(it)) for _ in range(3))
    conf = np.where(n_valid > 0, n_in / np.maximum(n_valid, 1), 0.0)
    finite = np.isfinite(S).all(axis=(1, 2))
    matrices["similarity"] = S
    confidences["similarity"] = conf
    accepted["similarity"] = finite & (surv_counts >= 3) & (conf >= SIM_MIN_RATIO)

    T = np.asarray(next(it))
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


def _classic_fast_path(frames, framing, transform_mode, camera_lock,
                       strength, smooth, fps, size, working_size,
                       decimation, padding_rgb, tick_pairs=None, keep_fov=1.0):
    """Engine hook: zero-sync device pipeline for crop/crop_and_pad/
    expand (see models/fastpath.py).  Returns None to fall back to the
    host path."""
    import logging
    import os

    from . import fastpath

    try:
        return fastpath.run_classic_fast(
            frames, framing, transform_mode, camera_lock, strength, smooth,
            fps, size, working_size, decimation, padding_rgb,
            tick_pairs=tick_pairs, keep_fov=keep_fov,
        )
    except Exception:
        if os.environ.get("CVST_FASTPATH_STRICT"):
            raise
        logging.getLogger(__name__).debug(
            "fast path failed; using host engine", exc_info=True
        )
        return None


classic_estimator.fast_path = _classic_fast_path


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
