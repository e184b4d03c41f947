"""Zero-sync device front-end for the stabilizers (crop_and_pad + expand).

The standard engine (models/stabilize.py) fetches the robust fits to
host, solves the trajectory in float64 numpy, and only then dispatches
the warp — one full host<->device round-trip sits serially between
estimation and warp.  On a production PCIe host that costs ~1 ms; on
the dev tunnel it costs 35-60 ms, and either way it is latency a
stabilize call does not need: the trajectory math is O(N*D) scalars
that the device solves in microseconds.

This module runs stages 4-7 of the reference pipeline
(/root/reference/nodes/video_stabilizer_flow.py:324-460 — sticky-mode
selection, path integration, fps smoothing, crop_and_pad recentering /
expand union-canvas solve)
as ONE device program appended to the estimation dispatch queue, then
dispatches the padding stats and the warp against device-resident
inverse coefficients.  The only host fetch is the diagnostics bundle
(matrices, paths, confidences — a few KB), issued AFTER the warp is
queued so the transfer overlaps warp execution.  Critical-path host
syncs per stabilize call: one (the caller's output wait).

Because the warp must be *planned* (tile/K selection) before the
correction magnitudes are known on host, the Pallas kernel launches
with a fixed speculative plan and the device program emits a guard —
the same tile-span bound the host planner computes
(ops/warp_pallas.py::_max_tile_span), evaluated on the actual
coefficients.  If the fetched guard says the plan cannot hold (wild
corrections; rare for stabilization), the call returns None and the
engine transparently re-runs the exact host path.

Expand framing adds a second speculation: its union canvas size is
data-dependent (/root/reference/nodes/stabilizer_utils.py:386-406), so
the warp dispatches into a STATIC bucket canvas — the input size grown
by EXPAND_MARGIN_PX per side, rounded up to the warp kernel's tile
grid — and the device program computes the true canvas size + origin
alongside a bucket-fit guard.  After the (warp-overlapped) diagnostics
fetch, the bucket outputs are sliced to the exact canvas on device;
warped pixel values are independent of canvas size, so the slice is
exact.  A bucket miss (corrections beyond the margin) re-warps once on
the host planner at the exact size, trajectory kept.

Numerics: the trajectory runs in float32 (vs the host path's float64)
and the warp coefficients come from an on-device Newton-refined 3x3
inverse computed at Precision.HIGHEST (vs host float64 inverse rounded
to float32).  Measured against the host engine at 1080p/96f: applied
matrices within ~2e-3 px (recenter-offset near-ties), pixel p99 well
under 1e-3, identical mode/acceptance decisions (gated in
tests/test_fastpath.py; see docs/parity.md).  The CPU default keeps
the host path, preserving the bit-exact replay contract the
reference's checks enforce.
"""

from __future__ import annotations

import functools
import os
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

PERSP_MIN_RATIO = 0.15
SIM_MIN_RATIO = 0.1
MIN_VALID = 12           # flow: min valid grid samples (models/flow.py)
CL_MIN_FEATURES = 12     # classic: min detected corners (models/classic.py)
CL_MIN_TRACKS = 8        # classic: min surviving LK tracks

_MODE_IDX = {"perspective": 0, "similarity": 1, "translation": 2}
_MODE_NAMES = ("perspective", "similarity", "translation")

# expand bucket slack per side: covers the correction magnitudes real
# smoothing produces (tens of px); larger canvases guard-miss to the
# exact host re-warp.  64 (not more) keeps a 96-frame 1080p clip's
# bucket inside the warp stage's HBM chunk budget (ops/warp.py:
# will_stream rejects the fast path otherwise).
EXPAND_MARGIN_PX = 64


def enabled() -> bool:
    """Fast path on accelerators by default; CVST_FASTPATH=0/1 overrides
    (tests force-enable it on the CPU backend)."""
    flag = os.environ.get("CVST_FASTPATH")
    if flag is not None:
        return flag not in ("0", "false", "")
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def _mesh_defer(frames, n: int) -> bool:
    """True when the fast path must defer to the host engine.

    Under a mesh the fast path now runs SHARDED: estimation and the
    trajectory program are GSPMD-partitioned jits (the estimation
    kernels fall back to their XLA mirrors there, ops/cv_pallas.py /
    ops/lk.py gates) and the speculative warp runs shard_map-ped over
    the frame axis (ops/warp_pallas.py::warp_pallas_sharded).  Only
    when the frame axis cannot shard evenly over the mesh's ``data``
    axis (spatial fallback, parallel/production.py) — or with a
    multi-device input outside any set_mesh context — does the host
    path take over."""
    from ..utils.meshinfo import active_abstract_mesh, data_shards

    if active_abstract_mesh() is not None:
        return data_shards(n) is None
    try:
        return len(frames.sharding.device_set) > 1
    except Exception:
        return False


# ---------------------------------------------------------------------------
# Device math helpers (float32 ports of models/geometry.py)
# ---------------------------------------------------------------------------

def _params_from_mats(m: jnp.ndarray, mode: str) -> jnp.ndarray:
    if mode == "translation":
        return jnp.stack([m[:, 0, 2], m[:, 1, 2]], axis=-1)
    if mode == "similarity":
        a, c = m[:, 0, 0], m[:, 1, 0]
        scale = jnp.sqrt(jnp.maximum(a * a + c * c, 1e-10))
        theta = jnp.arctan2(c, a)
        return jnp.stack([m[:, 0, 2], m[:, 1, 2], theta, jnp.log(scale)], axis=-1)
    return jnp.stack(
        [m[:, 0, 0] - 1.0, m[:, 0, 1], m[:, 0, 2],
         m[:, 1, 0], m[:, 1, 1] - 1.0, m[:, 1, 2],
         m[:, 2, 0], m[:, 2, 1]],
        axis=-1,
    )


def _mats_from_params(p: jnp.ndarray, mode: str) -> jnp.ndarray:
    n = p.shape[0]
    one = jnp.ones(n, jnp.float32)
    zero = jnp.zeros(n, jnp.float32)
    if mode == "translation":
        rows = [one, zero, p[:, 0], zero, one, p[:, 1], zero, zero, one]
    elif mode == "similarity":
        s = jnp.exp(p[:, 3])
        ct = s * jnp.cos(p[:, 2])
        st = s * jnp.sin(p[:, 2])
        rows = [ct, -st, p[:, 0], st, ct, p[:, 1], zero, zero, one]
    else:
        rows = [p[:, 0] + 1.0, p[:, 1], p[:, 2],
                p[:, 3], p[:, 4] + 1.0, p[:, 5],
                p[:, 6], p[:, 7], one]
    return jnp.stack(rows, axis=-1).reshape(n, 3, 3)


def _inverse_coeffs_device(m: jnp.ndarray) -> jnp.ndarray:
    """(N, 3, 3) -> (N, 8) normalized inverse-map coefficients, float32.

    Adjugate/determinant start + one Newton step (X <- X(2I - MX))
    lands within ~1 ulp of the host float64 inverse rounded to float32
    (ops/warp.py::prepare_inverse_coeffs)."""
    a, b, c = m[:, 0, 0], m[:, 0, 1], m[:, 0, 2]
    d, e, f = m[:, 1, 0], m[:, 1, 1], m[:, 1, 2]
    g, h, i = m[:, 2, 0], m[:, 2, 1], m[:, 2, 2]
    adj = jnp.stack(
        [e * i - f * h, c * h - b * i, b * f - c * e,
         f * g - d * i, a * i - c * g, c * d - a * f,
         d * h - e * g, b * g - a * h, a * e - b * d],
        axis=-1,
    ).reshape(-1, 3, 3)
    det = a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)
    ok = jnp.abs(det) > 1e-20
    inv = adj / jnp.where(ok, det, 1.0)[:, None, None]
    eye2 = 2.0 * jnp.eye(3, dtype=jnp.float32)[None]
    # 3x3 Newton step at FULL f32 precision: the MXU's default bf16
    # passes would inject ~1e-2 coefficient error (measured) and the
    # whole point of the step is the last few ulps
    hi = jax.lax.Precision.HIGHEST
    mm = lambda x, y: jnp.einsum("nij,njk->nik", x, y, precision=hi)
    inv = mm(inv, eye2 - mm(m, inv))
    inv = jnp.where(ok[:, None, None], inv, jnp.eye(3, dtype=jnp.float32)[None])
    w0 = inv[:, 2, 2]
    w_ok = (w0 != 0.0) & jnp.isfinite(w0)
    inv = inv / jnp.where(w_ok, w0, 1.0)[:, None, None]
    return jnp.stack(
        [inv[:, 0, 0], inv[:, 0, 1], inv[:, 0, 2],
         inv[:, 1, 0], inv[:, 1, 1], inv[:, 1, 2],
         inv[:, 2, 0], inv[:, 2, 1]],
        axis=-1,
    )


def _span_guard(coeffs: jnp.ndarray, plan: Tuple[int, ...]) -> jnp.ndarray:
    """Device twin of ops/warp_pallas.py::_max_tile_span + _plan's fit
    test: True iff the speculative (k, tile) plan holds for these
    coefficients.  plan = (k, th, tw, n_th, n_tw, sub, margin, extra)."""
    k, th, tw, n_th, n_tw, sub, margin, extra = plan
    ys = (jnp.arange(n_th * sub + 1, dtype=jnp.float32) * (th / sub))[None, :, None]
    xs = (jnp.arange(n_tw * sub + 1, dtype=jnp.float32) * (tw / sub))[None, None, :]
    a, b, c, d, e, f, g, h = [coeffs[:, i][:, None, None] for i in range(8)]
    denom = 1.0 + g * xs + h * ys
    safe = denom != 0.0
    inv_d = jnp.where(safe, 1.0 / jnp.where(safe, denom, 1.0), 0.0)
    qx = (a - 1.0) * xs + b * ys + c - (g * xs) * xs - (h * xs) * ys
    qy = d * xs + (e - 1.0) * ys + f - (g * ys) * xs - (h * ys) * ys
    dx = jnp.where(safe, qx * inv_d, jnp.inf)
    dy = jnp.where(safe, qy * inv_d, jnp.inf)
    bx = jnp.floor(dx + xs) - jnp.floor(xs)
    by = jnp.floor(dy + ys) - jnp.floor(ys)

    def tile_span(field, axis):
        # overlapping (sub+1)-sample windows, stride sub, both axes
        def windows(x, ax):
            n_t = (x.shape[ax] - 1) // sub
            main = jnp.moveaxis(x, ax, -1)
            body = main[..., : n_t * sub].reshape(main.shape[:-1] + (n_t, sub))
            edge = main[..., sub::sub][..., :n_t]
            mx = jnp.maximum(body.max(-1), edge)
            mn = jnp.minimum(body.min(-1), edge)
            return jnp.moveaxis(mn, -1, ax), jnp.moveaxis(mx, -1, ax)

        mn, mx = windows(field, 1)
        mn = windows(mn, 2)[0]
        mx = windows(mx, 2)[1]
        return (mx - mn).max()

    span = jnp.maximum(tile_span(bx, 2), tile_span(by, 1))
    finite = jnp.isfinite(coeffs).all()
    return finite & (span + margin + extra <= k)


_LUMA = np.array([0.299, 0.587, 0.114], np.float32)


@functools.partial(jax.jit, static_argnames=("pad_y", "pad_x", "fy", "fx"))
def _ingest(frames, pad_y, pad_x, fy, fx):
    """ONE pass over the NHWC clip produces BOTH warp and estimation
    inputs: the planar-padded source the Pallas window DMAs read and
    the working-res quantized luma (integer-factor pool).  Sharing the
    clip read saves ~7 ms on a 96-frame 1080p clip vs the two separate
    programs (same luma/floor/pool expressions as
    ops/resize._gray_pool_kernel)."""
    padded = jnp.pad(
        jnp.transpose(frames, (0, 3, 1, 2)),
        ((0, 0), (0, 0), (pad_y, pad_y), (pad_x, pad_x)),
    )
    gray = jnp.einsum("nhwc,c->nhw", frames, jnp.asarray(_LUMA))
    gray = jnp.floor(jnp.clip(gray * 255.0, 0.0, 255.0))
    n, h, w = gray.shape
    if fy != 1 or fx != 1:
        gray = gray.reshape(n, h // fy, fy, w // fx, fx).mean(axis=(2, 4))
    return padded, gray


def _gray_pool_factors(width, height, working_size, decimation):
    """Integer pool factors for the fused ingest, or None when the
    working resize is not an exact box factor (dense-matmul resize
    path — the ingest then computes grays the standard way).  Mirrors
    ops/resize.can_decimate + the integer-factor pool condition of
    gray_for_estimation so the ingest gray is value-identical."""
    from ..ops.resize import can_decimate

    if not can_decimate(width, height, working_size, max(int(decimation), 1)):
        return None
    if working_size is None:
        gw, gh = int(width), int(height)
    else:
        gw, gh = int(working_size[0]), int(working_size[1])
        if int(width) % gw or int(height) % gh:
            return None
    gw //= decimation
    gh //= decimation
    if gw <= 0 or gh <= 0 or width % gw or height % gh:
        return None
    return height // gh, width // gw


# ---------------------------------------------------------------------------
# The trajectory program (one jit): sticky select -> path -> framing -> coeffs
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit,
    static_argnames=("kind", "mode", "want_persp", "camera_lock", "window",
                     "width", "height", "scale_xy", "total_pts", "plan",
                     "framing", "bucket"),
)
def _traj_program(
    strength, keep_fov, *fits,
    kind, mode, want_persp, camera_lock, window, width, height, scale_xy,
    total_pts, plan, framing="crop_and_pad", bucket=None,
):
    it = iter(fits)
    eye = jnp.eye(3, dtype=jnp.float32)

    # --- estimator-specific fits unpack + acceptance flags -----------
    if kind == "flow":
        gate_counts = next(it)  # valid grid samples per pair
        b = gate_counts.shape[0]
        deg = gate_counts < MIN_VALID
        n_per_fit = 4  # (M, n_inliers, n_valid, residual)
    else:  # classic (sparse tracks); no residual diagnostics
        det_counts = next(it)
        gate_counts = next(it)  # surviving tracks per pair
        b = gate_counts.shape[0]
        deg = (det_counts < CL_MIN_FEATURES) | (gate_counts < CL_MIN_TRACKS)
        n_per_fit = 3

    def fit_block(thresh_pts, min_ratio):
        M, n_in, n_valid = next(it), next(it), next(it)
        r = next(it) if n_per_fit == 4 else jnp.zeros(b, jnp.float32)
        conf = jnp.where(n_valid > 0, n_in / jnp.maximum(n_valid, 1), 0.0)
        ok = (jnp.isfinite(M).all(axis=(1, 2))
              & (gate_counts >= thresh_pts) & (conf >= min_ratio))
        return M.astype(jnp.float32), conf.astype(jnp.float32), r.astype(jnp.float32), ok

    if want_persp:
        Mp, cp, rp, op_ = fit_block(4, PERSP_MIN_RATIO)
    else:
        Mp = jnp.broadcast_to(eye, (b, 3, 3))
        cp = rp = jnp.zeros(b, jnp.float32)
        op_ = jnp.zeros(b, bool)
    Ms, cs, rs, os_ = fit_block(3, SIM_MIN_RATIO)
    Mt = next(it).astype(jnp.float32)
    if kind == "flow":
        rt = next(it).astype(jnp.float32)
        ct = gate_counts.astype(jnp.float32) / max(total_pts, 1)
    else:
        rt = jnp.zeros(b, jnp.float32)
        ct = jnp.where(
            det_counts > 0,
            gate_counts.astype(jnp.float32) / jnp.maximum(det_counts, 1),
            0.0,
        )

    acc3 = jnp.stack([op_, os_, jnp.ones(b, bool)], axis=1)  # (B, 3)

    # sticky active-mode degradation (reference classic:264-272): one
    # tiny scan; the first accepted mode at or below `active` wins
    req = jnp.int32(_MODE_IDX[mode])

    def step(active, x):
        acc_i, deg_i = x
        can = acc_i & (jnp.arange(3) >= active)
        chosen = jnp.where(deg_i, 2, jnp.argmax(can))
        return chosen, chosen

    _, chosen = jax.lax.scan(step, req, (acc3, deg))

    def sel(v0, v1, v2):
        return jnp.where(
            (chosen == 0)[..., *([None] * (v0.ndim - 1))], v0,
            jnp.where((chosen == 1)[..., *([None] * (v1.ndim - 1))], v1, v2),
        )

    Msel = sel(Mp, Ms, Mt)
    Msel = jnp.where(deg[:, None, None], eye, Msel)
    conf = jnp.where(deg, 0.0, sel(cp, cs, ct))
    resid = jnp.where(deg, 0.0, sel(rp, rs, rt))

    # rescale working-res transforms to full res: S^-1 M S
    sx, sy = scale_xy
    if (sx, sy) != (1.0, 1.0):
        s_vec = jnp.asarray([sx, sy, 1.0], jnp.float32)
        Mf = (Msel * s_vec[None, None, :]) / s_vec[None, :, None]
    else:
        Mf = Msel

    # path integration + fps-aware smoothing (float32 on device)
    P = _params_from_mats(Mf, mode)
    d_dim = P.shape[1]
    path = jnp.concatenate(
        [jnp.zeros((1, d_dim), jnp.float32), jnp.cumsum(P, axis=0)], axis=0
    )
    n = b + 1
    if camera_lock:
        target = jnp.zeros_like(path)
    elif window >= 3 and n > 2:
        pad = window // 2
        padded = jnp.concatenate(
            [jnp.repeat(path[:1], pad, 0), path, jnp.repeat(path[-1:], pad, 0)],
            axis=0,
        )
        cs_ = jnp.cumsum(padded, axis=0)
        zero = jnp.zeros((1, d_dim), jnp.float32)
        sums = cs_[window - 1:] - jnp.concatenate([zero, cs_[: n - 1 + 2 * pad - window + 1]], 0)
        smoothed = sums * (1.0 / window)
        target = path + strength * (smoothed - path)
    else:
        target = path
    diffs = target - path

    apply_m = _mats_from_params(diffs, mode)

    # framing solve (reference classic:431-464).  All tiny matrix
    # products at FULL f32 precision: the MXU's default bf16 passes
    # cost ~0.1 px on 1920-scale corner coordinates (measured)
    hi = jax.lax.Precision.HIGHEST
    corners = jnp.asarray(
        [[0.0, 0.0, 1.0], [float(width), 0.0, 1.0],
         [0.0, float(height), 1.0], [float(width), float(height), 1.0]],
        jnp.float32,
    )

    if framing == "crop":
        # keep_fov solver, device twin of models/framing.py::
        # compute_crop_with_keep_fov_parametric (reference
        # stabilizer_utils.py:507-613): an 18-iteration binary search
        # over the stabilization scale.  Midpoints are dyadic (exact in
        # f32), so the search visits the same scales as the host's f64
        # loop; only the ratio comparisons carry f32 rounding.  The
        # mask finalize + no-padding refine run in _crop_finalize on
        # the selected candidate.
        eps = 1e-4
        wf, hf = jnp.float32(width), jnp.float32(height)
        margin_px = jnp.float32(max(0.5, 0.02 * max(width, height)))

        def eval_candidate(scale):
            mats = _mats_from_params(diffs * scale, mode)
            wc = jnp.einsum("nij,kj->nki", mats, corners, precision=hi)
            cxy = wc[..., :2] / wc[..., 2:3]
            mn = cxy.min(axis=1)
            mx = cxy.max(axis=1)
            x0 = mn[:, 0].max(); y0 = mn[:, 1].max()
            x1 = mx[:, 0].min(); y1 = mx[:, 1].min()
            safe_w = jnp.maximum(0.0, x1 - x0)
            safe_h = jnp.maximum(0.0, y1 - y0)
            margin = jnp.minimum(margin_px,
                                 jnp.minimum(safe_w * 0.25, safe_h * 0.25))
            sx0 = x0 + margin
            sy0 = y0 + margin
            sw = jnp.maximum(0.0, safe_w - 2.0 * margin)
            sh = jnp.maximum(0.0, safe_h - 2.0 * margin)
            overlap = (sw > 0.0) & (sh > 0.0)
            ratio = jnp.where(
                overlap, jnp.minimum(1.0, jnp.minimum(sw / wf, sh / hf)), 0.0
            )
            return ratio, overlap, (mats, mn, mx, sx0, sy0, sw, sh)

        kf_target = keep_fov

        def search_step(_, carry):
            low, high, found, best = carry
            mid = 0.5 * (low + high)
            ratio, _, _ = eval_candidate(mid)
            ok = ratio >= kf_target - eps
            return (jnp.where(ok, mid, low), jnp.where(ok, high, mid),
                    found | ok, jnp.where(ok, mid, best))

        low0 = jnp.float32(0.0)
        ratio_full, overlap_full, _ = eval_candidate(jnp.float32(1.0))
        _, _, found, best = jax.lax.fori_loop(
            0, 18, search_step,
            (low0, jnp.float32(1.0), jnp.asarray(False), low0),
        )
        # host selection order: disabled (keep_fov<=eps) -> met at full
        # scale -> best search candidate -> failed (scale 0)
        s_star = jnp.where(
            kf_target <= eps,
            jnp.where(overlap_full, 1.0, 0.0),
            jnp.where(ratio_full >= kf_target - eps, 1.0,
                      jnp.where(found, best, 0.0)),
        )
        _, overlap_c, (mats_c, mn_c, mx_c, sx0, sy0, sw, sh) = (
            eval_candidate(s_star)
        )
        crop_ratio = jnp.minimum(1.0, jnp.minimum(sw / wf, sh / hf))
        crop_w = wf * crop_ratio
        crop_h = hf * crop_ratio
        cx0 = sx0 + (sw - crop_w) * 0.5
        cy0 = sy0 + (sh - crop_h) * 0.5
        cscale = jnp.where(overlap_c, wf / jnp.maximum(crop_w, 1e-6), 1.0)
        cmat = jnp.where(
            overlap_c,
            jnp.stack([cscale, 0.0, -cscale * cx0,
                       0.0, cscale, -cscale * cy0,
                       0.0, 0.0, 1.0]).reshape(3, 3),
            eye,
        )
        final = jnp.einsum("ij,njk->nik", cmat, mats_c, precision=hi)
        finite = jnp.isfinite(final).all()
        return dict(
            chosen=chosen, conf=conf, resid=resid, matrices=Mf,
            path=path, target=target, diffs=diffs,
            apply=mats_c, final=final, coeffs=_inverse_coeffs_device(final),
            mins=mn_c, maxs=mx_c, offsets=jnp.zeros(2, jnp.float32),
            degenerate=deg, guard=finite, fit=finite,
            out_wh=jnp.asarray([width, height], jnp.int32),
            crop_ratio_full=ratio_full, crop_overlap_full=overlap_full,
            crop_found=found, crop_best_scale=best, crop_s_star=s_star,
        )

    warped = jnp.einsum("nij,kj->nki", apply_m, corners, precision=hi)
    xy = warped[..., :2] / warped[..., 2:3]
    mins = xy.min(axis=1)
    maxs = xy.max(axis=1)
    if framing == "expand":
        # union canvas: global translation puts the min corner at (0,0)
        # (device twin of models/geometry.py::prepare_expand_transform)
        ex0 = mins[:, 0].min(); ey0 = mins[:, 1].min()
        ex1 = maxs[:, 0].max(); ey1 = maxs[:, 1].max()
        out_w = jnp.maximum(jnp.ceil(ex1 - ex0), 1.0).astype(jnp.int32)
        out_h = jnp.maximum(jnp.ceil(ey1 - ey0), 1.0).astype(jnp.int32)
        trans = eye.at[0, 2].set(-ex0).at[1, 2].set(-ey0)
        offsets = jnp.stack([-ex0, -ey0])
        out_wh = jnp.stack([out_w, out_h])
        bucket_h, bucket_w = bucket
        fit = (out_w <= bucket_w) & (out_h <= bucket_h)
    else:  # crop_and_pad recenter
        x0 = mins[:, 0].max(); y0 = mins[:, 1].max()
        x1 = maxs[:, 0].min(); y1 = maxs[:, 1].min()
        off_x = 0.5 * width - 0.5 * (x0 + x1)
        off_y = 0.5 * height - 0.5 * (y0 + y1)
        trans = eye.at[0, 2].set(off_x).at[1, 2].set(off_y)
        offsets = jnp.stack([off_x, off_y])
        out_wh = jnp.asarray([width, height], jnp.int32)
        fit = jnp.asarray(True)
    final = jnp.einsum("ij,njk->nik", trans, apply_m, precision=hi)

    coeffs = _inverse_coeffs_device(final)
    finite = jnp.isfinite(final).all()
    guard = _span_guard(coeffs, plan) & finite

    return dict(
        chosen=chosen, conf=conf, resid=resid, matrices=Mf,
        path=path, target=target, diffs=diffs,
        apply=apply_m, final=final, coeffs=coeffs,
        mins=mins, maxs=maxs, offsets=offsets,
        degenerate=deg, guard=guard, fit=fit & finite, out_wh=out_wh,
    )


def _round_half_even_half(v: jnp.ndarray) -> jnp.ndarray:
    """round(v / 2) with banker's rounding for non-negative int32 v —
    the device twin of Python's round((height - crop_h) * 0.5) in
    ops/morphology.py::largest_aspect_ratio_rectangle (the .5 ties are
    exact, so only the half-to-even rule matters)."""
    half = v // 2
    return jnp.where(v % 2 == 0, half,
                     jnp.where(half % 2 == 0, half, half + 1))


@functools.partial(jax.jit, static_argnames=("width", "height", "iters"))
def _crop_finalize(final_pre, crop_w_table, *, width, height, iters):
    """Mask finalize + no-padding refine for crop framing, on device.

    Device twin of models/framing.py::finalize_with_masks +
    refine_no_padding_crop (reference stabilizer_utils.py:448-504,
    614-656): ONE nearest-coverage stack feeds both the per-frame
    3x3-close bbox ratio (met/clamped decision) and the all-frames AND
    mask whose integral image drives the aspect-rectangle binary
    search.  The search is a fixed-``iters`` fori_loop over the crop
    height; ``crop_w_table`` is the host-precomputed exact
    ceil(aspect * h) table, so the width arithmetic is pure int32 and
    bit-identical to the host search.  Dynamic-shift rolls replace the
    host's integral slicing (no scalarized gathers on TPU).
    """
    from ..ops import morphology as M
    from ..ops import warp as W

    wf, hf = jnp.float32(width), jnp.float32(height)
    coeffs_pre = _inverse_coeffs_device(final_pre)
    xn, yn = W._nearest_coords(coeffs_pre, height, width)
    cover = ((xn >= 0) & (xn < width) & (yn >= 0) & (yn < height)).astype(
        jnp.float32
    )

    # --- keep_fov ratio_final: per-frame 3x3 close -> bbox min ratio
    closed = M._minpool(M._maxpool(cover, 1), 1)
    rows_any = jnp.any(closed > 0.5, axis=2)  # (N, H)
    cols_any = jnp.any(closed > 0.5, axis=1)  # (N, W)
    y_idx = jnp.arange(height)[None, :]
    x_idx = jnp.arange(width)[None, :]
    big = jnp.iinfo(jnp.int32).max
    y_min = jnp.min(jnp.where(rows_any, y_idx, big), axis=1)
    y_max = jnp.max(jnp.where(rows_any, y_idx, -1), axis=1)
    x_min = jnp.min(jnp.where(cols_any, x_idx, big), axis=1)
    x_max = jnp.max(jnp.where(cols_any, x_idx, -1), axis=1)
    ratios = jnp.where(
        x_max >= 0,
        jnp.minimum(
            jnp.maximum(1.0, (x_max - x_min + 1).astype(jnp.float32)) / wf,
            jnp.maximum(1.0, (y_max - y_min + 1).astype(jnp.float32)) / hf,
        ),
        0.0,
    )
    ratio_final = ratios.min()

    # --- no-padding refine: AND mask, erode 1, integral, rect search
    common = M._minpool(cover.min(axis=0)[None], 1)[0]  # (H, W)
    cnt = (common > 0.5).astype(jnp.int32)
    integral = jnp.pad(
        jnp.cumsum(jnp.cumsum(cnt, axis=0), axis=1), ((1, 0), (1, 0))
    )  # (H+1, W+1) summed-area table, exact int32
    yy = jnp.arange(height + 1, dtype=jnp.int32)[:, None]
    xx = jnp.arange(width + 1, dtype=jnp.int32)[None, :]

    def search_step(_, carry):
        low, high, found, bx, by, bh = carry
        cont = low <= high
        ch = (low + high) // 2
        cw = crop_w_table[jnp.clip(ch, 0, height)]
        size_ok = (ch >= 1) & (ch <= height) & (cw <= width) & (cw >= 1)
        i_dd = jnp.roll(jnp.roll(integral, -ch, axis=0), -cw, axis=1)
        i_d0 = jnp.roll(integral, -ch, axis=0)
        i_0d = jnp.roll(integral, -cw, axis=1)
        sums = i_dd - i_d0 - i_0d + integral
        in_range = (yy <= height - ch) & (xx <= width - cw)
        matches = in_range & (sums == ch * cw) & size_ok
        any_fit = matches.any()
        # centered placement preferred; else first match in row-major
        # order (device argmax == host np.argmax over the valid region)
        y0c = _round_half_even_half(height - ch)
        x0c = _round_half_even_half(width - cw)
        centered = matches[y0c, x0c]
        flat = jnp.argmax(matches.reshape(-1).astype(jnp.int8))
        x0 = jnp.where(centered, x0c, flat % (width + 1))
        y0 = jnp.where(centered, y0c, flat // (width + 1))
        ok = cont & any_fit
        low2 = jnp.where(cont & any_fit, ch + 1, low)
        high2 = jnp.where(cont & ~any_fit, ch - 1, high)
        return (low2, high2, found | ok,
                jnp.where(ok, x0.astype(jnp.int32), bx),
                jnp.where(ok, y0.astype(jnp.int32), by),
                jnp.where(ok, ch, bh))

    hi0 = jnp.int32(
        min(height, int(np.floor(width / (np.float64(width) / np.float64(height)))))
    )
    zero = jnp.int32(0)
    _, _, refine_ok, bx, by, bh = jax.lax.fori_loop(
        0, iters, search_step,
        (jnp.int32(1), hi0, jnp.asarray(False), zero, zero, zero),
    )

    # crop matrix: scale = width / (aspect * crop_h) == height / crop_h
    cscale = jnp.where(refine_ok, hf / jnp.maximum(bh.astype(jnp.float32), 1.0), 1.0)
    x0f = bx.astype(jnp.float32)
    y0f = by.astype(jnp.float32)
    cmat = jnp.stack([cscale, 0.0, -cscale * x0f,
                      0.0, cscale, -cscale * y0f,
                      0.0, 0.0, 1.0]).reshape(3, 3)
    refined = jnp.einsum("ij,njk->nik", cmat, final_pre,
                         precision=jax.lax.Precision.HIGHEST)
    final_out = jnp.where(refine_ok, refined, final_pre)
    return dict(
        final=final_out,
        coeffs=_inverse_coeffs_device(final_out),
        ratio_final=ratio_final,
        refine_ok=refine_ok,
        rect=jnp.stack([bx, by, bh]),
    )


@functools.partial(
    jax.jit,
    static_argnames=("pad_y", "pad_x", "fy", "fx", "step_local", "finest",
                     "model", "dec", "n_hyp", "mode", "want_persp",
                     "camera_lock", "window", "width", "height", "scale_xy",
                     "total_pts", "plan"),
)
def _flow_fused_program(frames, pts_grid, strength, keep_fov, seed, *,
                        pad_y, pad_x, fy, fx, step_local, finest, model, dec,
                        n_hyp, mode, want_persp, camera_lock, window, width,
                        height, scale_xy, total_pts, plan):
    """The WHOLE Flow crop_and_pad fast path as ONE device launch:
    ingest, DIS fit-grid flow, RANSAC fits, trajectory + framing,
    padding stats, speculative Pallas warp.

    Dispatch fusion: through the dev tunnel each program launch/sync
    interaction costs ~30 ms wall regardless of device time; the
    multi-launch fast path (~6 programs) paid that per stage, which
    both inflated single-call latency (measured 250 ms wall on ~100 ms
    of device work at 1080p/80f) and let congestion episodes scatter
    the sustained-bench windows.  The inner functions are all jitted;
    tracing them here inlines the pipeline into one program.  The
    Pallas warp stays a separate launch: inlining it too ballooned the
    XLA optimization pass past a 30-minute compile (everything else
    compiles in minutes and persists in the compile cache).  Returns
    the padded planar source alongside the outputs so the caller can
    dispatch the warp immediately.  Used when no chunk-granular
    progress observer is attached and no mesh is active (the sharded
    path keeps per-stage GSPMD programs).
    """
    from ..ops import flow_dis as FD
    from ..ops import warp as W
    from ..ops import warp_pallas as WP
    from . import flow as FL

    padded, grays = _ingest(frames, pad_y, pad_x, fy, fx)
    samples = FD.dis_flow_fit(grays, step_local, finest_scale=finest,
                              model=model)
    if dec > 1:
        samples = samples * float(dec)
    fits = FL._fused_fits_sampled(samples, pts_grid, seed, want_persp, n_hyp)
    out = _traj_program(
        strength, keep_fov, *fits,
        kind="flow", mode=mode, want_persp=want_persp,
        camera_lock=camera_lock, window=window, width=width, height=height,
        scale_xy=scale_xy, total_pts=total_pts, plan=plan,
        framing="crop_and_pad", bucket=None,
    )
    masks, ratios = W._padding_stats_xla(out["coeffs"], height, width,
                                         height, width)
    return out, masks, ratios, padded


# ---------------------------------------------------------------------------
# Host orchestration
# ---------------------------------------------------------------------------

def _speculative_plan(out_h: int, out_w: int, in_h: int, in_w: int,
                      affine: bool):
    """Fixed bilinear Pallas plan for the speculative dispatch.

    k=6 over 64x256 tiles tolerates a ~3 px per-tile displacement span
    (margin rules of ops/warp_pallas.py::_plan) — which real smoothing
    corrections DO reach: the bench clip's correction field spans
    exactly 3 px per tile, so lower-K variants (k=4 runs ~58 vs 90 ms
    at 1080p/96f) reject it; sweeping smaller tiles bought <10% before
    spans stopped fitting.  The device guard re-checks the actual
    coefficients against this exact plan; on a guard miss the engine
    re-warps once through the host planner (warp-only — the fetched
    trajectory is kept)."""
    from ..ops import warp_pallas as WP

    k, th, tw = 6, 64, 256
    n_th, n_tw, wh, ww, pad_y, pad_x = WP._geometry(k, th, tw, out_h, out_w, in_h, in_w)
    margin = 1 if affine else 3
    sub = 1 if affine else 4
    return dict(k=k, th=th, tw=tw, wh=wh, ww=ww, pad_y=pad_y, pad_x=pad_x,
                n_th=n_th, n_tw=n_tw, margin=margin, sub=sub, extra=2)


def _out_dims(framing: str, height: int, width: int) -> Tuple[int, int]:
    """Static warp canvas (h, w): exact for crop_and_pad, the
    speculative bucket for expand (the warp kernel's grid handles
    ragged tile edges, so no tile rounding is needed)."""
    if framing != "expand":
        return height, width
    return height + 2 * EXPAND_MARGIN_PX, width + 2 * EXPAND_MARGIN_PX


def _crop_gate(framing: str, keep_fov: float, frames, n: int) -> bool:
    """True when crop framing must defer to the host engine: the
    keep_fov~=1 bypass returns original frames without a warp, and a
    mesh run routes crop through the sharded production engine (the
    finalize program's coverage stack has no sharded input)."""
    if framing != "crop":
        return False
    if float(np.clip(keep_fov, 0.0, 1.0)) >= 0.9999:
        return True
    from ..utils.meshinfo import active_abstract_mesh

    if active_abstract_mesh() is not None:
        return True
    try:
        return len(frames.sharding.device_set) > 1
    except Exception:
        return False


def _crop_w_table(width: int, height: int) -> np.ndarray:
    """Exact ceil(aspect * crop_h) table for the device rectangle
    search, computed in the same float64 expression as the host
    (ops/morphology.py:130)."""
    aspect = np.float64(width) / np.float64(height)
    return np.ceil(aspect * np.arange(height + 1, dtype=np.float64)).astype(
        np.int32
    )


def run_flow_fast(
    frames,
    framing: str,
    transform_mode: str,
    camera_lock: bool,
    strength: float,
    smooth: float,
    fps: float,
    size: Tuple[int, int],
    working_size,
    decimation: int,
    padding_rgb: Tuple[int, int, int],
    seed: int = 0,
    tick_pairs=None,
    keep_fov: float = 1.0,
) -> Dict | None:
    """Dispatch the full Flow crop/crop_and_pad/expand pipeline with
    zero serial host syncs; returns the host-value dict
    models/stabilize.py's meta assembly consumes, or None to fall back
    to the standard engine."""
    from ..ops import flow_dis as FD
    from ..ops import ransac as RS
    from ..ops import warp as W
    from . import flow as FL
    from . import geometry as G

    if not enabled() or framing not in ("crop", "crop_and_pad", "expand"):
        return None
    width, height = int(size[0]), int(size[1])
    if getattr(frames, "ndim", 0) != 4 or frames.shape[-1] != 3:
        return None
    n = int(frames.shape[0])
    out_h_b, out_w_b = _out_dims(framing, height, width)
    if W.will_stream(n, height, width, out_h_b, out_w_b) or n < 2:
        return None
    if _crop_gate(framing, keep_fov, frames, n):
        return None
    if framing != "crop" and _mesh_defer(frames, n):
        return None
    # same single upload the host path pays at warp time (no-op for
    # device-resident clips)
    frames = W._device_frames(frames)

    want_persp = transform_mode == "perspective"
    pre_padded = None
    if framing == "crop":
        # crop's refined matrices carry an aspect-crop zoom whose
        # per-tile displacement span breaks the shift-window Pallas
        # plan, so the warp dispatches through the XLA sampler — no
        # speculative plan, no pre-padded planar source.
        plan = None
        factors = None
    else:
        plan = _speculative_plan(out_h_b, out_w_b, height, width,
                                 affine=not want_persp)
        factors = _gray_pool_factors(width, height, working_size, decimation)
    # fully-fused single-launch path (see _flow_fused_program): no
    # progress observer, recenter framing, pool-factor ingest, no mesh.
    # CVST_FUSED=0 opts out (e.g. to avoid the one-time mega-program
    # compile on a cold cache).
    keep_fov_c = float(np.clip(keep_fov, 0.0, 1.0))
    if (tick_pairs is None and framing == "crop_and_pad"
            and factors is not None and W._use_pallas("bilinear")
            and os.environ.get("CVST_FUSED", "1") not in ("0", "false")):
        from ..utils.meshinfo import active_abstract_mesh

        if active_abstract_mesh() is None:
            gh = height // factors[0]
            gw = width // factors[1]
            h_work = gh * decimation
            w_work = gw * decimation
            strength_c = float(np.clip(strength, 0.0, 1.0))
            smooth_c = float(np.clip(smooth, 0.0, 1.0))
            if camera_lock:
                smooth_c = max(smooth_c, 0.85)
            window = G.smoothing_window(smooth_c, fps) if smooth_c > 0.0 else 0
            scale_xy = ((working_size[0] / float(width),
                         working_size[1] / float(height))
                        if working_size is not None else (1.0, 1.0))
            total_pts = (
                ((h_work + FL.SAMPLE_STEP - 1) // FL.SAMPLE_STEP)
                * ((w_work + FL.SAMPLE_STEP - 1) // FL.SAMPLE_STEP)
            )
            plan_key = (plan["k"], plan["th"], plan["tw"], plan["n_th"],
                        plan["n_tw"], plan["sub"], plan["margin"],
                        plan["extra"])
            warp_kw = dict(
                out_h=out_h_b, out_w=out_w_b, th=plan["th"], tw=plan["tw"],
                wh=plan["wh"], ww=plan["ww"], k=plan["k"],
                n_th=plan["n_th"], n_tw=plan["n_tw"], in_h=height,
                in_w=width, pad_y=plan["pad_y"], pad_x=plan["pad_x"],
                channels=3, interp="bilinear", affine=not want_persp,
                pre_padded=True, planar=False,
            )
            border = np.asarray(padding_rgb, np.float32) / 255.0
            try:
                out, masks, ratios, padded = _flow_fused_program(
                    frames, FL._grid_points(h_work, w_work, FL.SAMPLE_STEP),
                    jnp.float32(strength_c), jnp.float32(keep_fov_c), seed,
                    pad_y=plan["pad_y"], pad_x=plan["pad_x"],
                    fy=factors[0], fx=factors[1],
                    step_local=FL.SAMPLE_STEP // decimation,
                    finest=0 if decimation > 1 else FD.FINEST_SCALE,
                    model="homography" if want_persp else "similarity",
                    dec=decimation, n_hyp=RS.DEFAULT_HYPOTHESES,
                    mode=transform_mode, want_persp=want_persp,
                    camera_lock=camera_lock, window=window, width=width,
                    height=height, scale_xy=scale_xy, total_pts=total_pts,
                    plan=plan_key,
                )
                from ..ops import warp_pallas as WP

                stabilized = WP._warp_pallas_call(
                    padded, out["coeffs"].reshape(-1), jnp.asarray(border),
                    **warp_kw,
                )
            except Exception:
                return None  # host path runs the full fallback chain
            return _dispatch_and_collect(
                frames, out, plan, want_persp, width, height, padding_rgb,
                extra_meta={"flow_backend": "DIS",
                            "flow_fallback_reason": None},
                strength_c=strength_c, smooth_c=smooth_c, has_resid=True,
                framing=framing, out_dims=(out_h_b, out_w_b),
                keep_fov_c=keep_fov_c,
                precomputed=(masks, ratios, stabilized),
            )

    if factors is not None and W._use_pallas("bilinear"):
        pre_padded, grays = _ingest(frames, plan["pad_y"], plan["pad_x"],
                                    factors[0], factors[1])
    else:
        from ..ops import resize as R

        grays = R.gray_for_estimation(frames, working_size,
                                      decimation=decimation)

    gh, gw = int(grays.shape[1]), int(grays.shape[2])
    h_work, w_work = gh * decimation, gw * decimation
    try:
        # chunked dispatch: progress tick + interrupt poll between
        # 32-pair chunks, no syncs (an interrupt raised by tick_pairs
        # is a BaseException and passes through this except)
        samples = FL._dis_samples_chunked(
            grays,
            FL.SAMPLE_STEP // decimation,
            0 if decimation > 1 else FD.FINEST_SCALE,
            "homography" if want_persp else "similarity",
            tick_pairs,
        )
    except Exception:
        return None  # host path runs the DIS -> TV-L1 -> phase chain
    if decimation > 1:
        samples = samples * float(decimation)
    pts = FL._grid_points(h_work, w_work, FL.SAMPLE_STEP)
    fits = FL._fused_fits_sampled(samples, pts, seed, want_persp,
                                  RS.DEFAULT_HYPOTHESES)

    if working_size is not None:
        scale_xy = (working_size[0] / float(width), working_size[1] / float(height))
    else:
        scale_xy = (1.0, 1.0)
    strength_c = float(np.clip(strength, 0.0, 1.0))
    smooth_c = float(np.clip(smooth, 0.0, 1.0))
    if camera_lock:
        smooth_c = max(smooth_c, 0.85)
    window = G.smoothing_window(smooth_c, fps) if smooth_c > 0.0 else 0
    total_pts = (
        ((h_work + FL.SAMPLE_STEP - 1) // FL.SAMPLE_STEP)
        * ((w_work + FL.SAMPLE_STEP - 1) // FL.SAMPLE_STEP)
    )
    plan_key = None if plan is None else (
        plan["k"], plan["th"], plan["tw"], plan["n_th"], plan["n_tw"],
        plan["sub"], plan["margin"], plan["extra"])

    out = _traj_program(
        jnp.float32(strength_c), jnp.float32(keep_fov_c), *fits,
        kind="flow", mode=transform_mode, want_persp=want_persp,
        camera_lock=camera_lock, window=window, width=width, height=height,
        scale_xy=scale_xy, total_pts=total_pts, plan=plan_key,
        framing=framing, bucket=(out_h_b, out_w_b),
    )

    return _dispatch_and_collect(
        frames, out, plan, want_persp, width, height, padding_rgb,
        extra_meta={"flow_backend": "DIS", "flow_fallback_reason": None},
        strength_c=strength_c, smooth_c=smooth_c, has_resid=True,
        pre_padded=pre_padded, framing=framing, out_dims=(out_h_b, out_w_b),
        keep_fov_c=keep_fov_c,
    )


def run_classic_fast(
    frames,
    framing: str,
    transform_mode: str,
    camera_lock: bool,
    strength: float,
    smooth: float,
    fps: float,
    size: Tuple[int, int],
    working_size,
    decimation: int,
    padding_rgb: Tuple[int, int, int],
    seed: int = 0,
    tick_pairs=None,
    keep_fov: float = 1.0,
) -> Dict | None:
    """Classic-estimator twin of run_flow_fast: GFTT + pyramidal LK +
    fused RANSAC fits queue straight into the shared trajectory
    program — the corner/track tensors never visit the host."""
    from ..ops import lk as LK
    from ..ops import ransac as RS
    from ..ops import warp as W
    from . import classic as CL
    from . import geometry as G

    if not enabled() or framing not in ("crop", "crop_and_pad", "expand"):
        return None
    width, height = int(size[0]), int(size[1])
    if getattr(frames, "ndim", 0) != 4 or frames.shape[-1] != 3:
        return None
    n = int(frames.shape[0])
    out_h_b, out_w_b = _out_dims(framing, height, width)
    if W.will_stream(n, height, width, out_h_b, out_w_b) or n < 2:
        return None
    if _crop_gate(framing, keep_fov, frames, n):
        return None
    if framing != "crop" and _mesh_defer(frames, n):
        return None
    frames = W._device_frames(frames)

    want_persp = transform_mode == "perspective"
    pre_padded = None
    if framing == "crop":
        plan = None  # XLA warp — see run_flow_fast
        factors = None
    else:
        plan = _speculative_plan(out_h_b, out_w_b, height, width,
                                 affine=not want_persp)
        factors = _gray_pool_factors(width, height, working_size, decimation)
    if factors is not None and W._use_pallas("bilinear"):
        pre_padded, grays = _ingest(frames, plan["pad_y"], plan["pad_x"],
                                    factors[0], factors[1])
    else:
        from ..ops import resize as R

        grays = R.gray_for_estimation(frames, working_size,
                                      decimation=decimation)
    try:
        # one fused launch (gftt + pyramid + LK + fits); chunked
        # dispatch with progress/interrupt polls when observed
        # (see models/classic.py::_tracks_and_fits)
        (pts, det_counts, tracked, status), fits = CL._tracks_and_fits(
            grays, tick_pairs, seed, want_persp
        )
    except Exception:
        return None

    if working_size is not None:
        scale_xy = (working_size[0] / float(width), working_size[1] / float(height))
    else:
        scale_xy = (1.0, 1.0)
    strength_c = float(np.clip(strength, 0.0, 1.0))
    smooth_c = float(np.clip(smooth, 0.0, 1.0))
    if camera_lock:
        smooth_c = max(smooth_c, 0.85)
    window = G.smoothing_window(smooth_c, fps) if smooth_c > 0.0 else 0
    plan_key = None if plan is None else (
        plan["k"], plan["th"], plan["tw"], plan["n_th"], plan["n_tw"],
        plan["sub"], plan["margin"], plan["extra"])
    keep_fov_c = float(np.clip(keep_fov, 0.0, 1.0))

    out = _traj_program(
        jnp.float32(strength_c), jnp.float32(keep_fov_c), det_counts, *fits,
        kind="classic", mode=transform_mode, want_persp=want_persp,
        camera_lock=camera_lock, window=window, width=width, height=height,
        scale_xy=scale_xy, total_pts=1, plan=plan_key,
        framing=framing, bucket=(out_h_b, out_w_b),
    )
    return _dispatch_and_collect(
        frames, out, plan, want_persp, width, height, padding_rgb,
        extra_meta={}, strength_c=strength_c, smooth_c=smooth_c,
        has_resid=False, pre_padded=pre_padded, framing=framing,
        out_dims=(out_h_b, out_w_b), keep_fov_c=keep_fov_c,
    )


@functools.partial(jax.jit, static_argnames=("h", "w"))
def _slice_canvas(x, h, w):
    """Bucket canvas -> exact canvas.  A copy (XLA cannot alias a
    smaller output into the input buffer), so the expand dispatch path
    drops every other large reference first — see the release note in
    _dispatch_and_collect."""
    return x[:, :h, :w]


@functools.partial(jax.jit, static_argnames=("h", "w"))
def _slice_transpose_planar(x, h, w):
    """Planar tile-grid warp output -> exact-canvas NHWC, one fused op.

    The expand fast path takes the Pallas warp's raw planar output
    (``planar=True``) so the bucket-size NHWC copy is never
    materialized: the canvas slice rides the one transpose the output
    needed anyway (saves a ~2.9 GB buffer + its write/read pass at
    1080p/96f)."""
    return jnp.transpose(x[:, :, :h, :w], (0, 2, 3, 1))


def _dispatch_and_collect(
    frames, out, plan, want_persp, width, height, padding_rgb, *,
    extra_meta, strength_c, smooth_c, has_resid, pre_padded=None,
    framing="crop_and_pad", out_dims=None, keep_fov_c=1.0, precomputed=None,
):
    """Queue stats + the speculative warp, then do the single
    (warp-overlapped) diagnostics fetch and build the host-value dict
    the engine's meta assembly consumes.  ``precomputed`` carries
    (masks, ratios, stabilized) already emitted by a fused program
    (_flow_fused_program) — the fetch/guard/meta logic is shared."""
    from ..ops import warp as W

    out_h_b, out_w_b = out_dims if out_dims is not None else (height, width)
    crop_fin = None
    if framing == "crop":
        # mask finalize + no-padding refine appended to the dispatch
        # queue; the refined coefficients feed the stats + warp below
        hi0 = min(height, int(np.floor(
            width / (np.float64(width) / np.float64(height)))))
        crop_fin = _crop_finalize(
            out["final"], jnp.asarray(_crop_w_table(width, height)),
            width=width, height=height, iters=max(1, hi0).bit_length() + 1,
        )
        out = {**out, "final": crop_fin["final"], "coeffs": crop_fin["coeffs"]}
    # crop_and_pad: stats queued before the warp so their fetch
    # overlaps warp compute.  expand: stats queued AFTER the warp —
    # at 1080p/96f the bucket mask (~1 GB) on top of the warp's peak
    # live set (source + padded planar + planar & NHWC bucket outputs,
    # ~11 GB) exhausts HBM if it is alive during the warp.  crop: stats
    # AND warp dispatch from the fetched host matrices below — the
    # refined matrices carry the aspect-crop zoom, so the warp needs the
    # host planner's full K/tile ladder (the speculative plan cannot
    # hold, and the XLA gather fallback measured 5.8 f/s at 1080p/64f vs
    # the planned Pallas warp's ~550).  Crop therefore pays ONE serial
    # diagnostics round trip before its warp; everything upstream
    # (estimation, solver, refine) still runs zero-sync.
    if precomputed is not None:
        masks, ratios, stabilized = precomputed
    elif framing not in ("expand", "crop"):
        masks, ratios = W._padding_stats_xla(
            out["coeffs"], out_h_b, out_w_b, height, width
        )
    elif framing == "crop":
        ratios = np.zeros(int(frames.shape[0]), np.float32)  # placeholder
    border = np.asarray(padding_rgb, np.float32) / 255.0
    use_pallas = W._use_pallas("bilinear") and framing != "crop"
    if precomputed is not None:
        pass  # stats + warp already emitted by the fused program
    elif framing == "crop":
        stabilized = None  # dispatched from host matrices after the fetch
    elif use_pallas:
        from ..ops import warp_pallas as WP
        from ..utils.meshinfo import data_shards

        src = pre_padded if pre_padded is not None else (
            frames.astype(jnp.float32) if frames.dtype != jnp.float32 else frames
        )
        warp_kw = dict(
            out_h=out_h_b, out_w=out_w_b, th=plan["th"], tw=plan["tw"],
            wh=plan["wh"], ww=plan["ww"], k=plan["k"],
            n_th=plan["n_th"], n_tw=plan["n_tw"], in_h=height, in_w=width,
            pad_y=plan["pad_y"], pad_x=plan["pad_x"], channels=3,
            interp="bilinear", affine=not want_persp,
            pre_padded=pre_padded is not None,
            planar=framing == "expand",
        )
        shards = data_shards(int(frames.shape[0]))
        if shards is not None:
            # mesh run: per-shard speculative warps, no collectives —
            # the plan/guard are global, the frames embarrassingly so
            stabilized = WP.warp_pallas_sharded(
                src, out["coeffs"].reshape(-1), jnp.asarray(border),
                shards=shards, **warp_kw,
            )
        else:
            stabilized = WP._warp_pallas_call(
                src, out["coeffs"].reshape(-1), jnp.asarray(border), **warp_kw
            )
    else:
        stabilized = W._warp_xla(frames, out["coeffs"], jnp.asarray(border),
                                 out_h_b, out_w_b, "bilinear")

    if framing == "expand":
        masks, ratios = W._padding_stats_bucket(
            out["coeffs"], out["out_wh"], out_h_b, out_w_b, height, width
        )
        # release the padded planar source before the canvas slice
        # runs: it is ~2.9 GB at 1080p/96f and the slice (a copy —
        # donation cannot alias a smaller output) needs the headroom
        src = pre_padded = None  # noqa: F841

    # ONE host fetch, overlapping the queued warp
    crop_diag_dev = () if crop_fin is None else (
        out["crop_ratio_full"], out["crop_overlap_full"], out["crop_found"],
        out["crop_best_scale"], out["crop_s_star"], crop_fin["ratio_final"],
        crop_fin["refine_ok"], crop_fin["rect"],
    )
    diag = jax.device_get(
        (out["guard"], out["fit"], out["out_wh"], out["chosen"], out["conf"],
         out["resid"], out["matrices"], out["path"], out["target"],
         out["diffs"], out["apply"], out["final"], out["mins"], out["maxs"],
         out["offsets"], out["degenerate"], ratios) + crop_diag_dev
    )
    (guard, fit, out_wh, chosen, conf, resid, matrices, path, target, diffs,
     apply_m, final, mins, maxs, offsets, degenerate, ratios_np) = diag[:17]
    crop_diag = diag[17:]

    if not np.isfinite(final).all():
        return None  # engine re-runs the full host path

    output_size = None
    plan_ok = bool(guard) or not use_pallas
    if framing == "crop":
        # stats + warp from the fetched matrices through the host
        # planner: the aspect-crop zoom fits a high-K Pallas variant for
        # typical keep_fov targets and falls to the XLA sampler beyond
        # the ladder — exactly the host engine's warp behavior.
        final64 = np.asarray(final, np.float64)
        masks, ratios_dev = W.padding_mask_stats(
            final64, (width, height), (width, height)
        )
        stabilized = W.warp_clip(
            frames, final64, (width, height), "bilinear", border
        )
        ratios_np = np.asarray(ratios_dev)
    elif framing == "expand":
        out_w_e, out_h_e = int(out_wh[0]), int(out_wh[1])
        if out_w_e <= 0 or out_h_e <= 0:
            return None
        output_size = (out_w_e, out_h_e)
        if bool(fit) and plan_ok:
            # speculative bucket held: slice to the true canvas (warped
            # pixel values are independent of canvas size)
            if use_pallas:  # planar warp output: fused slice+transpose
                stabilized = _slice_transpose_planar(stabilized, h=out_h_e, w=out_w_e)
            else:
                stabilized = _slice_canvas(stabilized, h=out_h_e, w=out_w_e)
            masks = _slice_canvas(masks, h=out_h_e, w=out_w_e)
        else:
            # canvas beyond the bucket (or plan miss): exact host
            # re-warp, trajectory kept
            final64 = np.asarray(final, np.float64)
            masks, ratios_dev = W.padding_mask_stats(
                final64, (width, height), output_size
            )
            stabilized = W.warp_clip(
                frames, final64, output_size, "bilinear", border
            )
            ratios_np = np.asarray(ratios_dev)
    elif use_pallas and not plan_ok:
        # Wild corrections for the speculative plan: the fetched
        # trajectory stands — only the WARP re-runs through the host
        # planner (which picks a fitting K variant or the XLA path),
        # with masks/ratios recomputed from the same host matrices so
        # all three outputs share one coefficient set.
        final64 = np.asarray(final, np.float64)
        masks, ratios_dev = W.padding_mask_stats(
            final64, (width, height), (width, height)
        )
        stabilized = W.warp_clip(
            frames, final64, (width, height), "bilinear", border
        )
        ratios_np = np.asarray(ratios_dev)

    modes_used = [_MODE_NAMES[int(i)] for i in chosen]
    result = dict(
        matrices=np.asarray(matrices, np.float32),
        modes_used=modes_used,
        confidences=[float(v) for v in conf],
        residuals=[float(v) for v in resid] if has_resid else None,
        path=np.asarray(path, np.float64),
        target_path=np.asarray(target, np.float64),
        diffs=np.asarray(diffs, np.float64),
        apply_matrices=np.asarray(apply_m, np.float32),
        final_matrices=np.asarray(final, np.float32),
        mins=np.asarray(mins, np.float64),
        maxs=np.asarray(maxs, np.float64),
        center_offset=[float(offsets[0]), float(offsets[1])],
        stabilized=stabilized,
        padding_masks=masks,
        padded_ratios=np.asarray(ratios_np),
        extra_meta=extra_meta,
        strength=strength_c,
        smooth=smooth_c,
    )
    if output_size is not None:
        result["output_size"] = output_size
    if crop_fin is not None:
        # statuses/notes reconstructed from fetched codes, byte-matching
        # models/framing.py::compute_crop_with_keep_fov_parametric +
        # refine_no_padding_crop (reference stabilizer_utils.py:560-613)
        (ratio_full, overlap_full, found, best_scale, s_star,
         ratio_final, refine_ok, rect) = crop_diag
        eps = 1e-4
        kf = keep_fov_c
        if kf <= eps:
            status = "disabled"
            note = (
                None if bool(overlap_full) else
                "No common crop region at full stabilization; "
                "stabilization was disabled."
            )
            scale = float(s_star)
        elif float(ratio_full) >= kf - eps:
            status, note, scale = "met", None, 1.0
        elif not bool(found):
            status = "failed"
            note = (f"keep_fov target {kf:.3f} could not be satisfied "
                    f"even with zero stabilisation.")
            scale = 0.0
        else:
            scale = float(best_scale)
            if float(ratio_final) >= kf - eps:
                status, note = "met", None
            else:
                status = "clamped"
                note = (f"keep_fov target {kf:.3f} reduced to "
                        f"{float(ratio_final):.3f} at stabilisation scale "
                        f"{scale:.3f}.")
        if bool(refine_ok):
            aspect = np.float64(width) / np.float64(height)
            crop_origin = [float(rect[0]), float(rect[1])]
            crop_size = [float(aspect * np.float64(int(rect[2]))),
                         float(rect[2])]
            kfe = 1.0
        else:
            crop_origin = [0.0, 0.0]
            crop_size = [float(width), float(height)]
            kfe = 0.0
        result.update(
            keep_fov_status=status,
            keep_fov_note=note,
            keep_fov_effective=kfe,
            stabilization_scale=scale,
            crop_origin=crop_origin,
            crop_size=crop_size,
        )
    return result
