"""FFT phase correlation — the Flow node's last-resort backend.

Batched jnp.fft implementation of cv2.phaseCorrelate semantics
(/root/reference/nodes/video_stabilizer_flow.py:110-130): cross-power
spectrum peak with 5x5 weighted-centroid subpixel refinement; the
response is the correlation peak energy fraction, used directly as the
confidence.  Sign convention matches cv2: the returned shift maps
src1 -> src2 (curr = shift(prev)), verified against the oracle in
tests/test_flow.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=())
def _phase_correlate_kernel(prev: jnp.ndarray, curr: jnp.ndarray):
    """prev/curr (B, H, W) float32 -> shifts (B, 2), responses (B,)."""
    B, H, W = prev.shape
    f1 = jnp.fft.rfft2(prev)
    f2 = jnp.fft.rfft2(curr)
    cross = f1 * jnp.conj(f2)
    mag = jnp.abs(cross)
    cross = cross / jnp.where(mag < 1e-12, 1.0, mag)
    r = jnp.fft.irfft2(cross, s=(H, W))                      # (B, H, W)

    flat = r.reshape(B, -1)
    peak = jnp.argmax(flat, axis=-1)
    py = peak // W
    px = peak % W

    # 5x5 weighted centroid around the peak (cv2's subpixel estimate),
    # gathered with wrap-around indexing.
    offs = jnp.arange(-2, 3)
    oy = (py[:, None, None] + offs[None, :, None]) % H       # (B, 5, 1)
    ox = (px[:, None, None] + offs[None, None, :]) % W       # (B, 1, 5)
    lin = (oy * W + ox).reshape(B, -1)                       # (B, 25)
    vals = jnp.take_along_axis(flat, lin, axis=-1).reshape(B, 5, 5)
    vals = jnp.maximum(vals, 0.0)
    wsum = jnp.maximum(vals.sum(axis=(1, 2)), 1e-12)
    cy = (vals.sum(axis=2) * offs[None]).sum(axis=1) / wsum
    cx = (vals.sum(axis=1) * offs[None]).sum(axis=1) / wsum

    sy = py + cy
    sx = px + cx
    # wrap to signed range
    sy = jnp.where(sy > H / 2, sy - H, sy)
    sx = jnp.where(sx > W / 2, sx - W, sx)
    # r is the inverse FFT of a unit-magnitude spectrum: a perfect match
    # concentrates (nearly) all energy at the peak, so the 5x5 peak-region
    # sum is already a 0..1 correlation response.
    response = vals.sum(axis=(1, 2))
    return jnp.stack([sx, sy], axis=-1), response


def phase_correlate_batch(prev: np.ndarray, curr: np.ndarray):
    """(B, H, W) gray pairs -> (shifts (B, 2) prev->curr, responses (B,)).

    The translation matrix for the pair is T(shift): warping prev by it
    aligns with curr (the reference builds exactly this matrix).
    """
    prev = np.asarray(prev, np.float32)
    curr = np.asarray(curr, np.float32)
    # remove DC so the untextured-border constant doesn't dominate
    p = prev - prev.mean(axis=(1, 2), keepdims=True)
    c = curr - curr.mean(axis=(1, 2), keepdims=True)
    shifts, resp = _phase_correlate_kernel(jnp.asarray(p), jnp.asarray(c))
    shifts = np.asarray(shifts, np.float64)
    resp = np.asarray(resp, np.float64)
    # cv2 returns the displacement of src2 relative to src1; reference
    # uses it directly as the prev->curr translation.
    shifts = -shifts
    bad = ~np.isfinite(shifts).all(axis=1) | ~np.isfinite(resp)
    shifts[bad] = 0.0
    resp[bad] = 0.0
    return shifts, np.clip(resp, 0.0, 1.0)
