"""Batched homography warp — the framework's hottest kernel.

Replaces every ``cv2.warpPerspective`` call site of the reference
(/root/reference/nodes/video_stabilizer_classic.py:492-513,
motion_apply.py:94-190, stabilizer_utils.py:615-992) with ONE whole-clip
batched TPU op, with the coverage mask and shutter-sample accumulation
fused instead of issued as extra per-frame warps.

Numerics are OpenCV-compatible by construction:

* cv2 (>= 4.x float path) computes per-pixel source coordinates in
  double and interpolates with exact float weights (no fixed-point for
  float images; verified empirically against cv2 5.0).  We match that
  *without* float64 on device: coordinates are generated as a
  **displacement field**.  For output pixel (x, y) and normalized
  inverse matrix coefficients (host float64):

      D(x, y)  = 1 + g*x + h*y
      Qx(x, y) = (a - 1)*x + b*y + c - g*x**2 - h*x*y       # = (sx-x)*D
      dx       = Qx / D;   x0 = x + floor(dx);   fx = dx - floor(dx)

  ``x + floor(dx)`` is exact integer math, and the fraction carries
  only the float32 error of the *small* displacement (~1e-6 px for
  stabilization-magnitude warps), never the magnitude of the absolute
  coordinate — this is what keeps a float32 TPU kernel within 1e-3 of
  cv2's float64 coordinates even at 4K.
* bilinear/bicubic weights are exact; bicubic uses OpenCV's A = -0.75
  kernel.  NEAREST uses round-half-to-even like cv2's saturate_cast.
* BORDER_CONSTANT semantics: each tap outside the source image reads
  the border color (per channel).
* the coverage mask is the closed form of "warp an all-ones image with
  INTER_NEAREST": round-half-even of the *unquantized* source coords,
  in-bounds test.  No second warp is ever issued.

The implementations here are pure-XLA (gather based) and platform
agnostic; on TPU the dispatcher in this module swaps in the Pallas
shift-window kernel from ``warp_pallas.py`` for supported configs,
which avoids TPU's scalarized gathers entirely.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Interp = str  # 'bilinear' | 'bicubic' | 'nearest'


# ---------------------------------------------------------------------------
# Host-side matrix preparation
# ---------------------------------------------------------------------------

def prepare_inverse_coeffs(matrices: np.ndarray) -> np.ndarray:
    """(N, 3, 3) forward src->dst matrices -> (N, 8) displacement coeffs.

    Returns per-frame [a, b, c, d, e, f, g, h] of the *inverse* map with
    w0 folded in (normalized so that the constant denominator term is
    1).  Computed in float64 on host; the device only ever sees small
    displacement coefficients.
    """
    matrices = np.asarray(matrices, dtype=np.float64)
    if matrices.ndim == 2:
        matrices = matrices[None]
    n = matrices.shape[0]
    coeffs = np.zeros((n, 8), dtype=np.float64)
    for i in range(n):
        try:
            minv = np.linalg.inv(matrices[i])
        except np.linalg.LinAlgError:
            minv = np.eye(3)
        w0 = minv[2, 2]
        if w0 != 0.0 and np.isfinite(w0):
            minv = minv / w0
        coeffs[i] = [
            minv[0, 0], minv[0, 1], minv[0, 2],
            minv[1, 0], minv[1, 1], minv[1, 2],
            minv[2, 0], minv[2, 1],
        ]
    return coeffs


# ---------------------------------------------------------------------------
# Coordinate generation (shared by all interpolation modes)
# ---------------------------------------------------------------------------

def _displacements(coeffs: jnp.ndarray, out_h: int, out_w: int):
    """Per-pixel float source displacements (dx, dy) and denominator D.

    coeffs: (N, 8) float32.  Returns dx, dy of shape (N, H, W) float32
    relative to the output pixel's own coordinates.
    """
    xx = jax.lax.broadcasted_iota(jnp.float32, (out_h, out_w), 1)
    yy = jax.lax.broadcasted_iota(jnp.float32, (out_h, out_w), 0)
    a = coeffs[:, 0][:, None, None]
    b = coeffs[:, 1][:, None, None]
    c = coeffs[:, 2][:, None, None]
    d = coeffs[:, 3][:, None, None]
    e = coeffs[:, 4][:, None, None]
    f = coeffs[:, 5][:, None, None]
    g = coeffs[:, 6][:, None, None]
    h = coeffs[:, 7][:, None, None]
    xx = xx[None]
    yy = yy[None]
    denom = 1.0 + g * xx + h * yy
    # (sx - x) * D and (sy - y) * D expand to these quadratics; each term is
    # small or has a tiny coefficient, so float32 keeps ~1e-4 px accuracy.
    qx = (a - 1.0) * xx + b * yy + c - (g * xx) * xx - (h * xx) * yy
    qy = d * xx + (e - 1.0) * yy + f - (g * yy) * xx - (h * yy) * yy
    safe = denom != 0.0
    inv_d = jnp.where(safe, 1.0 / jnp.where(safe, denom, 1.0), 0.0)
    dx = qx * inv_d
    dy = qy * inv_d
    return dx, dy, safe


_DISP_LIM = 1.0e6  # px; beyond this everything is out of frame anyway


def _split_coords(coeffs: jnp.ndarray, out_h: int, out_w: int):
    """Exact integer/fraction split of the source coords.

    Returns int32 (x0, y0) = floor(source) and float32 fractions
    (fx, fy) in [0, 1).  floor(x + dx) == x + floor(dx) exactly because
    x is an integer, so no large-magnitude float is ever formed.
    """
    dx, dy, safe = _displacements(coeffs, out_h, out_w)
    xi = jax.lax.broadcasted_iota(jnp.int32, (out_h, out_w), 1)[None]
    yi = jax.lax.broadcasted_iota(jnp.int32, (out_h, out_w), 0)[None]
    dx = jnp.where(safe, jnp.clip(dx, -_DISP_LIM, _DISP_LIM), -_DISP_LIM)
    dy = jnp.where(safe, jnp.clip(dy, -_DISP_LIM, _DISP_LIM), -_DISP_LIM)
    dxf = jnp.floor(dx)
    dyf = jnp.floor(dy)
    x0 = xi + dxf.astype(jnp.int32)
    y0 = yi + dyf.astype(jnp.int32)
    fx = dx - dxf
    fy = dy - dyf
    return x0, y0, fx, fy


def _nearest_coords(coeffs: jnp.ndarray, out_h: int, out_w: int):
    """Round-half-to-even integer source coords (cv2 INTER_NEAREST path)."""
    x0, y0, fx, fy = _split_coords(coeffs, out_h, out_w)

    def rnd(base, frac):
        up = jnp.where(
            frac > 0.5,
            1,
            jnp.where(frac < 0.5, 0, (base & 1)),  # tie -> even neighbor
        )
        return base + up

    return rnd(x0, fx), rnd(y0, fy)


# ---------------------------------------------------------------------------
# Gather-based sampling (exact; fast on CPU, fallback on TPU)
# ---------------------------------------------------------------------------

def _gather_taps(frames: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray) -> jnp.ndarray:
    """frames (N,H,W,C), ys/xs (N,OH,OW) int32 (may be out of range).

    Returns (N,OH,OW,C) samples with indices clipped; validity handled
    by the caller.
    """
    n, h, w, c = frames.shape
    ysc = jnp.clip(ys, 0, h - 1)
    xsc = jnp.clip(xs, 0, w - 1)
    flat = frames.reshape(n, h * w, c)
    lin = (ysc * w + xsc).reshape(n, -1)
    out = jnp.take_along_axis(flat, lin[..., None], axis=1)
    return out.reshape(n, ys.shape[1], ys.shape[2], c)


def _tap_weight_bilinear(fx, fy):
    w00 = (1.0 - fy) * (1.0 - fx)
    w01 = (1.0 - fy) * fx
    w10 = fy * (1.0 - fx)
    w11 = fy * fx
    return ((0, 0, w00), (0, 1, w01), (1, 0, w10), (1, 1, w11))


def _cubic_weights(t: jnp.ndarray):
    """OpenCV's bicubic kernel (A = -0.75) at offsets -1, 0, 1, 2."""
    A = -0.75
    w0 = ((A * (t + 1) - 5 * A) * (t + 1) + 8 * A) * (t + 1) - 4 * A
    w1 = ((A + 2) * t - (A + 3)) * t * t + 1
    w2 = ((A + 2) * (1 - t) - (A + 3)) * (1 - t) * (1 - t) + 1
    w3 = 1.0 - w0 - w1 - w2
    return (w0, w1, w2, w3)


def _sample(frames, coeffs, out_h, out_w, border, interp):
    n, h, w, c = frames.shape
    border_vec = jnp.asarray(border, jnp.float32).reshape(1, 1, 1, c)

    if interp == "nearest":
        xn, yn = _nearest_coords(coeffs, out_h, out_w)
        valid = ((xn >= 0) & (xn < w) & (yn >= 0) & (yn < h))[..., None]
        vals = _gather_taps(frames, yn, xn)
        return jnp.where(valid, vals, border_vec)

    x0, y0, fx, fy = _split_coords(coeffs, out_h, out_w)
    acc = jnp.zeros((n, out_h, out_w, c), jnp.float32)
    if interp == "bilinear":
        taps = _tap_weight_bilinear(fx, fy)
        for dy_t, dx_t, wgt in taps:
            ys = y0 + dy_t
            xs = x0 + dx_t
            valid = ((xs >= 0) & (xs < w) & (ys >= 0) & (ys < h))[..., None]
            vals = jnp.where(valid, _gather_taps(frames, ys, xs), border_vec)
            acc = acc + vals * wgt[..., None]
        return acc
    if interp == "bicubic":
        wxs = _cubic_weights(fx)
        wys = _cubic_weights(fy)
        for iy in range(4):
            for ix in range(4):
                ys = y0 + iy - 1
                xs = x0 + ix - 1
                valid = ((xs >= 0) & (xs < w) & (ys >= 0) & (ys < h))[..., None]
                vals = jnp.where(valid, _gather_taps(frames, ys, xs), border_vec)
                acc = acc + vals * (wys[iy] * wxs[ix])[..., None]
        return acc
    raise ValueError(f"Unsupported interpolation {interp!r}.")


@functools.partial(jax.jit, static_argnames=("out_h", "out_w", "interp"))
def _warp_xla(frames, coeffs, border, out_h, out_w, interp):
    return _sample(frames, coeffs, out_h, out_w, border, interp)


@functools.partial(jax.jit, static_argnames=("out_h", "out_w", "in_h", "in_w"))
def _coverage_xla(coeffs, out_h, out_w, in_h, in_w):
    xn, yn = _nearest_coords(coeffs, out_h, out_w)
    valid = (xn >= 0) & (xn < in_w) & (yn >= 0) & (yn < in_h)
    return valid.astype(jnp.float32)


def _mesh_frame_axis(n: int):
    """Name of the active mesh axis the frame dim can shard over, or None.

    The padding-stats program has no sharded INPUT (matrix coefficients
    are tiny host values), so without an explicit constraint GSPMD
    replicates its full-res output on every device of a production
    mesh.  Resolved at trace time — jax.jit keys its cache on the
    abstract mesh, so meshless runs trace a constraint-free program.
    """
    try:
        mesh = jax.sharding.get_abstract_mesh()
        if mesh is None or mesh.empty or "data" not in mesh.axis_names:
            return None
        return "data" if n % mesh.shape["data"] == 0 else None
    except Exception:
        return None


@functools.partial(jax.jit, static_argnames=("out_h", "out_w", "in_h", "in_w"))
def _padding_stats_xla(coeffs, out_h, out_w, in_h, in_w):
    """Padding mask AND per-frame padded fraction as ONE program.

    The padding mask of a plain warp is binary (1 - nearest-coverage),
    so ``zero_small`` is the identity on it; emitting mask + mean in a
    single fusion costs one HBM write instead of the three passes the
    eager ``1 - cover`` / ``zero_small`` / ``mean`` chain dispatches
    (measured ~31 ms -> ~10 ms for a 96-frame 1080p clip)."""
    xn, yn = _nearest_coords(coeffs, out_h, out_w)
    inside = (xn >= 0) & (xn < in_w) & (yn >= 0) & (yn < in_h)
    mask = 1.0 - inside.astype(jnp.float32)
    axis = _mesh_frame_axis(mask.shape[0])
    if axis is not None:
        from jax.sharding import PartitionSpec as P

        mask = jax.lax.with_sharding_constraint(mask, P(axis, None, None))
    ratios = mask.reshape(mask.shape[0], -1).mean(axis=1)
    return mask, ratios


@functools.partial(jax.jit, static_argnames=("out_h", "out_w", "in_h", "in_w"))
def _padding_stats_bucket(coeffs, out_wh, out_h, out_w, in_h, in_w):
    """_padding_stats_xla over a STATIC bucket canvas with a DYNAMIC
    true canvas size out_wh=(w_e, h_e) int32 (the expand fast path's
    speculative dispatch: the canvas is a device value at dispatch
    time).  The mask is valid within [:h_e, :w_e] (sliced by the
    caller); ratios average over the true canvas only."""
    xn, yn = _nearest_coords(coeffs, out_h, out_w)
    inside = (xn >= 0) & (xn < in_w) & (yn >= 0) & (yn < in_h)
    mask = 1.0 - inside.astype(jnp.float32)
    in_canvas = (
        (jnp.arange(out_w, dtype=jnp.int32)[None, :] < out_wh[0])
        & (jnp.arange(out_h, dtype=jnp.int32)[:, None] < out_wh[1])
    )
    area = jnp.maximum((out_wh[0] * out_wh[1]).astype(jnp.float32), 1.0)
    ratios = jnp.where(in_canvas[None], mask, 0.0).reshape(mask.shape[0], -1).sum(1) / area
    return mask, ratios


def padding_mask_stats(
    matrices: np.ndarray,
    in_size: Tuple[int, int],
    out_size: Tuple[int, int],
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(padding_masks (N, out_h, out_w), padded_ratios (N,)) on device.

    Bit-identical to ``zero_small(1 - coverage_mask(...))`` plus its
    per-frame mean, fused into one dispatch (see _padding_stats_xla).
    """
    in_w, in_h = int(in_size[0]), int(in_size[1])
    out_w, out_h = int(out_size[0]), int(out_size[1])
    coeffs = prepare_inverse_coeffs(matrices).astype(np.float32)
    if coeffs.shape[0] == 0:
        return (jnp.zeros((0, out_h, out_w), jnp.float32),
                jnp.zeros((0,), jnp.float32))
    return _padding_stats_xla(coeffs, out_h, out_w, in_h, in_w)


@functools.partial(jax.jit, static_argnames=("out_h", "out_w", "in_h", "in_w"))
def _coverage_mean_xla(coeffs_s, out_h, out_w, in_h, in_w):
    """Mean nearest-coverage over shutter samples, one device program.

    coeffs_s: (S, N, 8).  Scans over S so the (N, S, H, W) stack is
    never materialized; returns (N, out_h, out_w) mean coverage.
    """
    n = coeffs_s.shape[1]

    def body(acc, coeffs_one):
        return acc + _coverage_xla(coeffs_one, out_h, out_w, in_h, in_w), None

    acc0 = jnp.zeros((n, out_h, out_w), jnp.float32)
    acc, _ = jax.lax.scan(body, acc0, coeffs_s)
    return acc * (1.0 / coeffs_s.shape[0])


# ---------------------------------------------------------------------------
# Public API (device-resident pixels; host-resident matrices)
# ---------------------------------------------------------------------------


def _device_frames(frames) -> jnp.ndarray:
    """Upload numpy input once; pass device arrays through untouched."""
    if isinstance(frames, jnp.ndarray):
        return frames.astype(jnp.float32) if frames.dtype != jnp.float32 else frames
    return jnp.asarray(np.ascontiguousarray(frames, dtype=np.float32))

# Per-stage device-memory budget.  A v5e has 16 GB HBM; the warp stage's
# live set per frame is roughly src NHWC + padded planar copy (~1.75x) +
# planar out + NHWC out + mask — ~120 MB at 1080p, ~480 MB at 4K.  Clips
# beyond the budget (4K/300 = 29.8 GB raw) stream through in time chunks
# with host-resident accumulation.
CHUNK_BUDGET_BYTES = 13 << 30


def _chunk_frames(n: int, in_h: int, in_w: int, out_h: int, out_w: int) -> int:
    per_frame = (3 * in_h * in_w + 2 * out_h * out_w) * 3 * 4
    return max(1, min(n, CHUNK_BUDGET_BYTES // max(per_frame, 1)))


def will_stream(n: int, in_h: int, in_w: int, out_h: int, out_w: int) -> bool:
    """True when warp_clip would stream through host time-chunks."""
    return _chunk_frames(n, in_h, in_w, out_h, out_w) < n


def _use_pallas(interp: str) -> bool:
    try:
        dev = jax.devices()[0]
    except Exception:
        return False
    if dev.platform not in ("tpu", "axon"):
        return False
    return interp in ("bilinear", "bicubic", "nearest")


def warp_clip(
    frames,
    matrices: np.ndarray,
    out_size: Tuple[int, int],
    interp: Interp = "bilinear",
    border: Sequence[float] = (0.0, 0.0, 0.0),
) -> jnp.ndarray:
    """Warp a whole clip: frames (N,H,W,C) by per-frame src->dst matrices.

    out_size is (width, height), matching the cv2 convention.  frames
    may be a numpy array or a device array; the result STAYS on device
    (the pipelines are device-resident end-to-end; only the node API
    boundary downloads).  Matrices are host values by design — the
    trajectory solve runs on host and the Pallas fast path plans its
    tile windows from them.  Clips whose working set exceeds the HBM
    budget stream through in time chunks and return a HOST array.
    """
    frames = _device_frames(frames)
    out_w, out_h = int(out_size[0]), int(out_size[1])
    n = frames.shape[0]
    if n == 0:
        return jnp.zeros((0, out_h, out_w, frames.shape[-1]), jnp.float32)
    coeffs = prepare_inverse_coeffs(matrices).astype(np.float32)
    border_arr = np.asarray(border, np.float32)
    if border_arr.ndim == 0:
        border_arr = np.full((frames.shape[-1],), float(border_arr), np.float32)

    chunk = _chunk_frames(n, frames.shape[1], frames.shape[2], out_h, out_w)

    def run_chunk(fr, mat, co):
        if _use_pallas(interp):
            from . import warp_pallas

            out = warp_pallas.warp_clip_pallas(
                fr, mat, co, (out_w, out_h), interp, border_arr
            )
            if out is not None:
                return out
        return _warp_xla(_device_frames(fr), co, border_arr, out_h, out_w, interp)

    if chunk >= n:
        return run_chunk(frames, np.asarray(matrices, np.float64), coeffs)

    # Streaming path (e.g. 4K/300-frame clips): each time-chunk is
    # uploaded, warped and written back to a host buffer so device
    # memory holds one chunk at a time.
    mats64 = np.asarray(matrices, np.float64)
    host_src = frames if isinstance(frames, np.ndarray) else None
    out_np = np.empty((n, out_h, out_w, frames.shape[-1]), np.float32)
    for s in range(0, n, chunk):
        e = min(n, s + chunk)
        src = host_src[s:e] if host_src is not None else frames[s:e]
        out_np[s:e] = np.asarray(run_chunk(src, mats64[s:e], coeffs[s:e]))
    return out_np


def coverage_mask(
    matrices: np.ndarray,
    in_size: Tuple[int, int],
    out_size: Tuple[int, int],
) -> jnp.ndarray:
    """Closed-form of warping an all-ones (in_h, in_w) image with NEAREST.

    Returns float32 (N, out_h, out_w) ON DEVICE with 1.0 where the
    output pixel lands inside the source image.  Bit-equivalent to the
    reference's mask warps (cv2 INTER_NEAREST of ones, threshold 0.5).
    It never reads pixels, so it costs one elementwise pass.
    """
    in_w, in_h = int(in_size[0]), int(in_size[1])
    out_w, out_h = int(out_size[0]), int(out_size[1])
    coeffs = prepare_inverse_coeffs(matrices).astype(np.float32)
    if coeffs.shape[0] == 0:
        return jnp.zeros((0, out_h, out_w), jnp.float32)
    return _coverage_xla(coeffs, out_h, out_w, in_h, in_w)


def warp_clip_with_mask(
    frames,
    matrices: np.ndarray,
    out_size: Tuple[int, int],
    interp: Interp = "bilinear",
    border: Sequence[float] = (0.0, 0.0, 0.0),
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Warp + padding mask in one call (both device-resident).

    The padding mask is ``1 - coverage`` with tiny values zeroed, i.e.
    exactly the reference's per-frame ``mask = 1 - (content > 0.5)``
    (/root/reference/nodes/video_stabilizer_classic.py:506-519).
    """
    n = frames.shape[0]
    out_w, out_h = int(out_size[0]), int(out_size[1])
    mask_chunk = max(1, min(n, CHUNK_BUDGET_BYTES // max(out_h * out_w * 16, 1)))
    if mask_chunk >= n:
        # Dispatch the (cheap, closed-form) mask program BEFORE the big
        # frame warp: device streams execute in dispatch order, so a
        # caller that fetches mask-derived stats gets them while the
        # frame warp is still running instead of serializing a host
        # round-trip after it.
        cover = coverage_mask(matrices, (frames.shape[2], frames.shape[1]), out_size)
        padding = zero_small(1.0 - cover)
        warped = warp_clip(frames, matrices, out_size, interp, border)
        return warped, padding
    warped = warp_clip(frames, matrices, out_size, interp, border)
    if isinstance(warped, np.ndarray):
        padding = np.empty((n, out_h, out_w), np.float32)
        for s in range(0, n, mask_chunk):
            e = min(n, s + mask_chunk)
            cover = coverage_mask(matrices[s:e], (frames.shape[2], frames.shape[1]), out_size)
            padding[s:e] = np.asarray(zero_small(1.0 - cover))
        return warped, padding
    cover = coverage_mask(matrices, (frames.shape[2], frames.shape[1]), out_size)
    padding = zero_small(1.0 - cover)
    return warped, padding


@jax.jit
def zero_small(mask: jnp.ndarray) -> jnp.ndarray:
    """Zero sub-1e-3 mask values (reference mask[mask < 1e-3] = 0)."""
    return jnp.where(mask < 1e-3, 0.0, mask)


def warp_clip_blur(
    frames,
    sample_matrices: np.ndarray,
    out_size: Tuple[int, int],
    interp: Interp = "bilinear",
    border: Sequence[float] = (0.0, 0.0, 0.0),
    with_mask: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray | None]:
    """Shutter-sampled motion blur: average S warps per frame.

    sample_matrices has shape (N, S, 3, 3).  Frames are read once per
    sample from HBM but never replicated S-fold; the accumulation runs
    sample-major over the whole clip and stays on device.  Mirrors
    /root/reference/nodes/motion_apply.py:137-202 (mean of warps, soft
    mask = 1 - mean coverage).
    """
    n, s = sample_matrices.shape[:2]
    out_w, out_h = int(out_size[0]), int(out_size[1])
    if n == 0:
        empty = jnp.zeros((0, out_h, out_w, frames.shape[-1]), jnp.float32)
        return empty, (jnp.zeros((0, out_h, out_w), jnp.float32) if with_mask else None)

    chunk = _chunk_frames(n, frames.shape[1], frames.shape[2], out_h, out_w)
    if chunk < n:
        # stream big clips: accumulate each time-chunk's shutter average
        # on device, spill the finished chunk to host
        frames_host = frames if isinstance(frames, np.ndarray) else np.asarray(frames)
        out_np = np.empty((n, out_h, out_w, frames.shape[-1]), np.float32)
        mask_np = np.empty((n, out_h, out_w), np.float32) if with_mask else None
        for cs in range(0, n, chunk):
            ce = min(n, cs + chunk)
            sub, submask = warp_clip_blur(
                jnp.asarray(frames_host[cs:ce]), sample_matrices[cs:ce],
                out_size, interp, border, with_mask,
            )
            out_np[cs:ce] = np.asarray(sub)
            if with_mask:
                mask_np[cs:ce] = np.asarray(submask)
        return out_np, mask_np

    frames = _device_frames(frames)
    border_arr = np.asarray(border, np.float32)
    if border_arr.ndim == 0:
        border_arr = np.full((frames.shape[-1],), float(border_arr), np.float32)
    in_w, in_h = int(frames.shape[2]), int(frames.shape[1])

    # one (N*S)-coefficient host pass: feeds the fused Pallas plan and
    # the single-program coverage mean
    sample_coeffs = prepare_inverse_coeffs(
        np.asarray(sample_matrices, np.float64).reshape(n * s, 3, 3)
    ).reshape(n, s, 8)

    acc = None
    if _use_pallas(interp):
        from . import warp_pallas

        acc = warp_pallas.warp_clip_blur_pallas(
            frames, sample_coeffs, out_size, interp, border_arr
        )
    if acc is None:
        # XLA fallback: per-sample warps accumulated on device
        for k in range(s):
            w = warp_clip(frames, sample_matrices[:, k], out_size, interp, border)
            acc = w if acc is None else acc + w
        acc = acc / float(s)

    if with_mask:
        coeffs_s = jnp.asarray(
            np.transpose(sample_coeffs, (1, 0, 2)), jnp.float32
        )
        cover = _coverage_mean_xla(coeffs_s, out_h, out_w, in_h, in_w)
        return acc, zero_small(1.0 - cover)
    return acc, None
