"""Grayscale conversion and area resize for the estimation path.

TPU-first: INTER_AREA resampling is expressed as two dense matrix
multiplications (separable area-overlap weights, built on host since
shapes are static) so it rides the MXU instead of a gather, replacing
cv2.resize at /root/reference/nodes/stabilizer_utils.py:271-276.
Grayscale is a dot with the Rec.601 luma weights, then the reference's
"x255 -> uint8" quantization (floor) so estimation sees the same
integer-valued intensities as the cv2 pipeline.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

_LUMA = np.array([0.299, 0.587, 0.114], np.float32)


def area_weights(src: int, dst: int) -> np.ndarray:
    """(dst, src) area-overlap weights for 1-D INTER_AREA downscale."""
    scale = src / dst
    w = np.zeros((dst, src), np.float64)
    for i in range(dst):
        lo = i * scale
        hi = (i + 1) * scale
        j0 = int(np.floor(lo))
        j1 = int(np.ceil(hi))
        for j in range(j0, min(j1, src)):
            overlap = min(hi, j + 1) - max(lo, j)
            if overlap > 0:
                w[i, j] = overlap
        w[i] /= w[i].sum()
    return w.astype(np.float32)


@functools.lru_cache(maxsize=64)
def _cached_weights(src: int, dst: int) -> jax.Array:
    """Weights as a DEVICE-RESIDENT constant.

    Passing the (potentially multi-MB) numpy weight matrix into the jit
    per call would re-upload it host->device on every clip; device_put
    once and reuse the buffer (measured: 156 ms -> ~25 ms per 48-frame
    1080p grayscale+downscale through a slow host link).
    """
    return jax.device_put(area_weights(src, dst))


@functools.partial(jax.jit, static_argnames=("quantize",))
def _gray_kernel(frames: jnp.ndarray, quantize: bool) -> jnp.ndarray:
    gray = jnp.einsum("nhwc,c->nhw", frames, jnp.asarray(_LUMA))
    if quantize:
        gray = jnp.floor(jnp.clip(gray * 255.0, 0.0, 255.0))
    return gray


def make_gray(frames, quantize: bool = True) -> jnp.ndarray:
    """(N,H,W,3) float 0..1 -> (N,H,W) float gray, device-resident.

    quantize=True mimics the reference's uint8 staging (values are
    integers 0..255 stored as float32).
    """
    frames = jnp.asarray(frames, jnp.float32)
    if frames.ndim == 3:
        frames = frames[..., None]
    if frames.shape[-1] == 1:
        gray = frames[..., 0]
        if quantize:
            return jnp.floor(jnp.clip(gray * 255.0, 0, 255))
        return gray
    return _gray_kernel(frames, quantize)


@jax.jit
def _area_resize_kernel(stack: jnp.ndarray, wr: jnp.ndarray, wc: jnp.ndarray) -> jnp.ndarray:
    # (N, H, W) x (h, H) x (w, W) -> (N, h, w): two MXU matmuls.
    tmp = jnp.einsum("oh,nhw->now", wr, stack)
    return jnp.einsum("pw,now->nop", wc, tmp)


@functools.partial(jax.jit, static_argnames=("fy", "fx"))
def _box_pool_kernel(stack: jnp.ndarray, fy: int, fx: int) -> jnp.ndarray:
    n, h, w = stack.shape
    r = stack.reshape(n, h // fy, fy, w // fx, fx)
    return r.mean(axis=(2, 4))


@functools.partial(jax.jit, static_argnames=("fy", "fx", "quantize"))
def _gray_pool_kernel(frames: jnp.ndarray, fy: int, fx: int, quantize: bool) -> jnp.ndarray:
    """Fused grayscale + integer-factor INTER_AREA: one HBM pass.

    Avoids materializing the full-resolution gray intermediate (0.8 GB
    for a 96-frame 1080p clip) between two separate dispatches.
    """
    gray = jnp.einsum("nhwc,c->nhw", frames, jnp.asarray(_LUMA))
    if quantize:
        gray = jnp.floor(jnp.clip(gray * 255.0, 0.0, 255.0))
    n, h, w = gray.shape
    r = gray.reshape(n, h // fy, fy, w // fx, fx)
    return r.mean(axis=(2, 4))


def area_resize(stack, out_size: Tuple[int, int]) -> jnp.ndarray:
    """INTER_AREA downscale of an (N, H, W) stack to (w, h), on device.

    Integer shrink factors (1080p -> 2x, 4K -> 4x working size) take a
    box-pooling fast path: for integer factors the area-overlap weights
    are exactly uniform, so mean-pooling computes the identical result
    with fy*fx reads per output instead of an H-wide dense matmul row.
    """
    out_w, out_h = int(out_size[0]), int(out_size[1])
    n, h, w = stack.shape
    if (out_w, out_h) == (w, h):
        return jnp.asarray(stack, jnp.float32)
    if h % out_h == 0 and w % out_w == 0:
        return _box_pool_kernel(jnp.asarray(stack, jnp.float32), h // out_h, w // out_w)
    wr = _cached_weights(h, out_h)
    wc = _cached_weights(w, out_w)
    return _area_resize_kernel(jnp.asarray(stack, jnp.float32), wr, wc)


def can_decimate(
    width: int, height: int, working_size: Tuple[int, int] | None, decimation: int
) -> bool:
    """True when the fused gray+pool path reproduces working-res gray
    followed by ``log2(decimation)`` exact 2x area halvings.

    Requires the working resize itself to be an integer box factor and
    the working dims to be divisible by the decimation, so the single
    fused box-mean equals the reference chain up to f32 reassociation.
    """
    if decimation <= 1:
        return True
    tw, th = working_size if working_size is not None else (int(width), int(height))
    if int(width) % tw or int(height) % th:
        return False
    return th % decimation == 0 and tw % decimation == 0


def gray_for_estimation(
    frames,
    working_size: Tuple[int, int] | None,
    quantize: bool = True,
    decimation: int = 1,
) -> jnp.ndarray:
    """Reference's _make_gray_for_estimation, batched: gray then area resize.

    ``decimation`` > 1 additionally area-halves the working-res gray
    log2(decimation) times IN the same fused pass — used by the flow
    fit path, whose coarse-to-fine solve never reads pyramid levels
    finer than working/4 (ops/flow_dis.py finest scale).  The caller
    must have checked :func:`can_decimate`; this produces the same
    values as pooling the working gray (modulo f32 reassociation)
    without materializing the working-res intermediate.

    Clips too large for device memory (4K/300-frame class) stream
    through in time chunks; the downscaled grays are small and stay on
    device.
    """
    from .warp import CHUNK_BUDGET_BYTES

    n = frames.shape[0]
    h_in, w_in = int(frames.shape[1]), int(frames.shape[2])
    if decimation > 1:
        assert can_decimate(w_in, h_in, working_size, decimation)
        tw, th = working_size if working_size is not None else (w_in, h_in)
        working_size = (tw // decimation, th // decimation)

    per_frame = frames.shape[1] * frames.shape[2] * 3 * 4 * 2
    chunk = max(1, min(n, CHUNK_BUDGET_BYTES // max(per_frame, 1)))
    if chunk >= n or not isinstance(frames, np.ndarray):
        if working_size is not None and not isinstance(frames, np.ndarray):
            out_w, out_h = int(working_size[0]), int(working_size[1])
            fr = jnp.asarray(frames, jnp.float32)
            if fr.ndim == 4 and fr.shape[-1] == 3:
                h, w = fr.shape[1], fr.shape[2]
                if (h, w) != (out_h, out_w) and h % out_h == 0 and w % out_w == 0:
                    return _gray_pool_kernel(fr, h // out_h, w // out_w, quantize)
        gray = make_gray(frames, quantize=quantize)
        return gray if working_size is None else area_resize(gray, working_size)
    pieces = []
    for s in range(0, n, chunk):
        e = min(n, s + chunk)
        g = make_gray(frames[s:e], quantize=quantize)
        pieces.append(g if working_size is None else area_resize(g, working_size))
    return jnp.concatenate(pieces, axis=0)
