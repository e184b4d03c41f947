"""Flow (dense optical flow) estimator + stabilizer.

Parity with /root/reference/nodes/video_stabilizer_flow.py:76-210:
dense flow on the working-size grays, sampled on an 8-px grid, robust
model fit with the same fallback chain and thresholds as Classic plus
a mean-absolute-residual diagnostic per transition.

Backend chain mirrors the reference's full three-tier runtime
degradation (DIS -> TV-L1 -> phase correlation,
/root/reference/nodes/video_stabilizer_flow.py:90-107): the TPU DIS
reformulation (ops/flow_dis.py) is the primary backend, a first-party
primal-dual TV-L1 solver (ops/tvl1.py) is the middle tier, and FFT
phase correlation is the translation-only last resort.  Each hop is
caught and recorded in ``flow_fallback_reason`` exactly like the
reference records backend degradation.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import flow_dis as FD
from ..ops import phase_corr as PC
from ..ops import ransac as RS
from ..utils.video_io import VideoContext
from . import geometry as G
from .stabilize import PairFits, StabilizationResult, stabilize_clip

SAMPLE_STEP = 8
MIN_VALID = 12
PERSP_MIN_RATIO = 0.15
SIM_MIN_RATIO = 0.1


@functools.lru_cache(maxsize=16)
def _grid_points(h: int, w: int, step: int) -> jax.Array:
    ys = np.arange(0, h, step, dtype=np.int32)
    xs = np.arange(0, w, step, dtype=np.int32)
    gy, gx = np.meshgrid(ys, xs, indexing="ij")
    pts = np.stack([gx.ravel(), gy.ravel()], axis=1).astype(np.float32)
    return jax.device_put(pts)  # cached device constant: no per-clip upload


@functools.partial(jax.jit, static_argnames=("want_persp", "n_hyp"))
def _fused_fits_sampled(samples, pts, seed, want_persp, n_hyp):
    """Every robust fit + diagnostics as ONE device program.

    Returns a flat tuple so the caller fetches everything in a single
    host round-trip (the development tunnel charges ~30 ms per sync;
    even on production hosts, one fetch beats seven).
    """
    b = samples.shape[0]
    prev_pts = jnp.broadcast_to(pts[None], samples.shape)
    curr_pts = prev_pts + samples
    valid = jnp.isfinite(curr_pts).all(axis=2)
    valid_counts = valid.sum(axis=1)

    def keys(salt):
        return jax.vmap(lambda i: jax.random.fold_in(jax.random.PRNGKey(seed + salt), i))(
            jnp.arange(b)
        )

    out = [valid_counts]
    if want_persp:
        H, nH, vH = RS._ransac_batched(
            keys(0), prev_pts, curr_pts, valid, "perspective", n_hyp, RS.PERSP_THRESH
        )
        out += [H, nH, vH, RS._residuals_kernel(H, prev_pts, curr_pts, valid)]
    S, nS, vS = RS._ransac_batched(
        keys(1), prev_pts, curr_pts, valid, "similarity", n_hyp, RS.SIM_THRESH
    )
    out += [S, nS, vS, RS._residuals_kernel(S, prev_pts, curr_pts, valid)]
    med = RS._masked_median_shift(prev_pts, curr_pts, valid)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (b, 3, 3))
    T = eye.at[:, 0, 2].set(med[:, 0]).at[:, 1, 2].set(med[:, 1])
    out += [T, RS._residuals_kernel(T, prev_pts, curr_pts, valid)]
    return tuple(out)


def _gray_decimation(width: int, height: int, working_size) -> int:
    """Decimation factor the fit path can absorb into gray production.

    The fit-grid solve never reads pyramid levels finer than
    working-res / 2**FINEST_SCALE (ops/flow_dis.py), so when the
    working resize is an exact box factor the engine can hand the
    estimator quarter-working-res grays directly — one fused
    gray+pool pass instead of a working-res gray plus two unread
    pyramid levels (~0.5 GB of HBM traffic on a 96-frame 1080p clip).
    """
    from ..ops.resize import can_decimate

    dec = 1 << FD.FINEST_SCALE
    if SAMPLE_STEP % dec:
        return 1
    tw, th = working_size if working_size is not None else (int(width), int(height))
    if FD.num_levels(th, tw) < FD.FINEST_SCALE:
        return 1
    return dec if can_decimate(width, height, working_size, dec) else 1


def _dis_samples_chunked(grays, step_local, finest_scale, model, tick_pairs):
    """DIS flow over all adjacent pairs, dispatched in 32-pair chunks
    with a progress tick + interrupt poll between chunk dispatches
    (models/stabilize.py::estimation_chunk_spans — bit-identical to the
    single dispatch; DIS is per-pair).  No syncs are added: the chunks
    are device arrays concatenated lazily."""
    from .stabilize import estimation_chunk_spans

    spans = estimation_chunk_spans(int(grays.shape[0]))
    if len(spans) == 1 or tick_pairs is None:
        return FD.dis_flow_fit(grays, step_local, finest_scale=finest_scale,
                               model=model)
    parts = []
    for s, e, drop in spans:
        part = FD.dis_flow_fit(grays[s:e], step_local,
                               finest_scale=finest_scale, model=model)
        parts.append(part[drop:] if drop else part)
        tick_pairs(e - 1)
    return jnp.concatenate(parts, axis=0)


def flow_estimator(
    grays: np.ndarray, requested_mode: str, *, seed: int = 0, decimation: int = 1,
    tick_pairs=None,
) -> PairFits:
    n, h, w = grays.shape
    b = n - 1
    h_work, w_work = h * decimation, w * decimation
    extra: Dict[str, object] = {"flow_backend": "DIS", "flow_fallback_reason": None}

    want_persp = requested_mode == "perspective"
    try:
        # perspective mode drives the coarse-to-fine pre-warp with an
        # IRLS homography fit so projective motion is tracked by the
        # level warps, not just the +-radius residual window.  The fit
        # path samples the finest DIS level directly (no polish /
        # full-res upsample — see ops/flow_dis._dis_flow_fit_fused).
        # Pre-decimated grays (see _gray_decimation) enter the solve at
        # what would be its finest level; finest_scale=0 keeps every
        # physical level identical to the undecimated solve.
        samples = _dis_samples_chunked(
            grays,
            SAMPLE_STEP // decimation,
            0 if decimation > 1 else FD.FINEST_SCALE,
            "homography" if want_persp else "similarity",
            tick_pairs,
        )
        if decimation > 1:
            samples = samples * float(decimation)  # back to working px units
        pts = _grid_points(h_work, w_work, SAMPLE_STEP)
        fused = jax.device_get(
            _fused_fits_sampled(samples, pts, seed, want_persp, RS.DEFAULT_HYPOTHESES)
        )
    except Exception as exc:  # degraded backend, mirrors reference chain
        # middle tier: TV-L1 (reference: cv2.optflow.DualTVL1, only when
        # importable — here a first-party JAX solver, ops/tvl1.py)
        try:
            from ..ops import tvl1 as TV

            step_local = SAMPLE_STEP // decimation
            flow_full, _conf = TV.tvl1_flow(grays)
            samples = flow_full[:, ::step_local, ::step_local, :].reshape(b, -1, 2)
            if decimation > 1:
                samples = samples * float(decimation)
            pts = _grid_points(h_work, w_work, SAMPLE_STEP)
            fused = jax.device_get(
                _fused_fits_sampled(samples, pts, seed, want_persp, RS.DEFAULT_HYPOTHESES)
            )
            extra = {
                "flow_backend": "TVL1",
                "flow_fallback_reason": f"DIS unavailable ({exc}); using TV-L1.",
            }
            exc = None
        except Exception as exc2:
            exc = f"{exc}; TV-L1 failed ({exc2})"
        if exc is not None:  # last tier: translation-only phase correlate
            extra = {
                "flow_backend": "phase_correlate",
                "flow_fallback_reason": f"DIS unavailable ({exc}); using phase correlation.",
            }
            shifts, resp = PC.phase_correlate_batch(np.asarray(grays[:-1]), np.asarray(grays[1:]))
            mats = np.tile(np.eye(3, dtype=np.float32), (b, 1, 1))
            shifts = shifts * float(decimation)
            mats[:, 0, 2] = shifts[:, 0]
            mats[:, 1, 2] = shifts[:, 1]
            return PairFits(
                degenerate=np.zeros(b, bool),
                matrices={"translation": mats},
                confidences={"translation": resp},
                accepted={"translation": np.ones(b, bool)},
                residuals={"translation": np.zeros(b)},
                extra_meta=extra,
            )
        # TV-L1 succeeded: fall through to the shared fit unpacking

    it = iter(fused)
    valid_counts = np.asarray(next(it))
    degenerate = valid_counts < MIN_VALID
    total_pts = (
        ((h_work + SAMPLE_STEP - 1) // SAMPLE_STEP)
        * ((w_work + SAMPLE_STEP - 1) // SAMPLE_STEP)
    )

    matrices: Dict[str, np.ndarray] = {}
    confidences: Dict[str, np.ndarray] = {}
    accepted: Dict[str, np.ndarray] = {}
    residuals: Dict[str, np.ndarray] = {}

    if want_persp:
        H, n_in, n_valid, rH = (np.asarray(next(it)) for _ in range(4))
        conf = np.where(n_valid > 0, n_in / np.maximum(n_valid, 1), 0.0)
        finite = np.isfinite(H).all(axis=(1, 2))
        matrices["perspective"] = H
        confidences["perspective"] = conf
        accepted["perspective"] = finite & (valid_counts >= 4) & (conf >= PERSP_MIN_RATIO)
        residuals["perspective"] = rH

    S, n_in, n_valid, rS = (np.asarray(next(it)) for _ in range(4))
    conf = np.where(n_valid > 0, n_in / np.maximum(n_valid, 1), 0.0)
    finite = np.isfinite(S).all(axis=(1, 2))
    matrices["similarity"] = S
    confidences["similarity"] = conf
    accepted["similarity"] = finite & (valid_counts >= 3) & (conf >= SIM_MIN_RATIO)
    residuals["similarity"] = rS

    T, rT = (np.asarray(next(it)) for _ in range(2))
    matrices["translation"] = T
    confidences["translation"] = valid_counts / max(total_pts, 1)
    accepted["translation"] = np.ones(b, bool)
    residuals["translation"] = rT

    return PairFits(
        degenerate=degenerate,
        matrices=matrices,
        confidences=confidences,
        accepted=accepted,
        residuals=residuals,
        extra_meta=extra,
    )


# engine hook: stabilize_clip consults this to produce pre-decimated grays
flow_estimator.gray_decimation = _gray_decimation


def _flow_fast_path(frames, framing, transform_mode, camera_lock,
                    strength, smooth, fps, size, working_size,
                    decimation, padding_rgb, tick_pairs=None, keep_fov=1.0):
    """Engine hook: zero-sync device pipeline for crop/crop_and_pad/
    expand (see models/fastpath.py).  Returns None to fall back to the
    host path."""
    import logging
    import os

    from . import fastpath

    try:
        return fastpath.run_flow_fast(
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
        return None  # host path re-runs with its full fallback chain


flow_estimator.fast_path = _flow_fast_path


def stabilize_flow(
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
        estimator=flow_estimator,
        source_name="estimated_flow",
        framing_mode=framing_mode,
        transform_mode=transform_mode,
        camera_lock=camera_lock,
        strength=strength,
        smooth=smooth,
        keep_fov=keep_fov,
        padding_rgb=padding_rgb,
        frame_rate=frame_rate,
        extra_meta={"flow_backend": "DIS", "flow_fallback_reason": None},
        progress=progress,
        interrupt_check=interrupt_check,
    )
