"""Pallas TPU fast path for the batched homography warp.

TPU has no hardware gather: XLA lowers the sampling gather in
``warp.py`` to a scalar loop (~26 fps at 1080p, measured).  This
kernel removes every gather by exploiting the structure of
stabilization warps:

* Matrices are host values (the trajectory solve is host float64), so
  the integer source-window origin of every output tile is computed
  on host and shipped as scalar-prefetch data.
* Within a tile, the integer displacement ``b = floor(src) - dst``
  varies by only a few pixels (near-identity warps), so the 4 bilinear
  taps of every pixel live in a small static offset range [0, K) of
  the tile's window.  Sampling becomes K x K masked shift-FMAs over
  static VMEM slices — pure VPU work.
* The source is pre-padded by one window extent so partially-visible
  tiles always have a legal (non-negative) DMA origin; out-of-image
  taps carry zero weight and the missing weight mass is filled with
  the border color (exact BORDER_CONSTANT semantics).

The kernel reproduces the XLA path's numerics exactly-by-construction
(same displacement-field coordinate math, same weights); equivalence
is asserted in tests/test_warp_pallas.py on CPU (interpret mode) and
on device.  Configurations it cannot serve (K too large for wild
warps, tiny images) return None and the caller falls back to XLA.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# (KH, KW) static window-span variants; K covers integer-displacement
# span + the +1 bilinear tap + 1 safety.  Bicubic needs +2 more.
_K_VARIANTS = (4, 5, 6, 10, 18)
_MAX_K = _K_VARIANTS[-1]


# Mosaic allocates one stack slot per unrolled temporary (no reuse), so
# the tile area shrinks as the window span K (= unrolled term count
# (K+8)*K) grows, keeping the per-kernel stack under the VMEM limit.
# The kernel is VPU-compute-bound (measured: bicubic runs ~2x bilinear
# at identical DMA traffic), so the K=4 variant — which gentle
# stabilization warps usually satisfy — cuts the K*K tap loop from 36
# to 16 slice-FMAs.  A device sweep of (th, tw) showed (64, 128) beats
# both smaller tiles (more per-tile fixed cost) and tw=256 (Mosaic's
# unaligned-lane slices of wide tiles run far slower).
_K_TILE = ((4, 64, 128), (5, 64, 128), (6, 64, 128), (10, 32, 128), (18, 16, 128))


# ---------------------------------------------------------------------------
# Host-side planning
# ---------------------------------------------------------------------------

def _displacement_fields(coeffs: np.ndarray, ys: np.ndarray, xs: np.ndarray):
    """Evaluate (dx, dy) displacement at sample coords, float64 host."""
    a, b, c, d, e, f, g, h = [coeffs[:, i][:, None, None] for i in range(8)]
    x = xs[None, None, :]
    y = ys[None, :, None]
    denom = 1.0 + g * x + h * y
    denom = np.where(np.abs(denom) < 1e-12, 1e-12, denom)
    qx = (a - 1.0) * x + b * y + c - (g * x) * x - (h * x) * y
    qy = d * x + (e - 1.0) * y + f - (g * y) * x - (h * y) * y
    return qx / denom, qy / denom


def _plan(coeffs: np.ndarray, out_h: int, out_w: int, in_h: int, in_w: int,
          cubic: bool):
    """Pick the (K, tile) variant and per-tile window origins, or None.

    Sampling displacement extrema on a 5-point-per-edge grid per tile
    is exact for affine warps and a <=1 px bound for the near-identity
    projective warps this framework produces; the +2 safety margin in
    the K selection absorbs it.
    """
    for k_cand, th, tw in _K_TILE:
        plan = _plan_for(coeffs, out_h, out_w, in_h, in_w, th, tw, cubic, k_cand)
        if plan is not None:
            return plan
    return None


def _plan_for(coeffs: np.ndarray, out_h: int, out_w: int, in_h: int, in_w: int,
              th: int, tw: int, cubic: bool, k_fixed: int):
    n = coeffs.shape[0]
    n_th = -(-out_h // th)
    n_tw = -(-out_w // tw)
    # displacement sampled on a th/4-spaced grid so samples 4t..4t+4
    # align exactly with tile t's extent (the last tile's padded tail
    # only widens the bound, never narrows it)
    ys = np.arange(n_th * 4 + 1) * (th / 4.0)
    xs = np.arange(n_tw * 4 + 1) * (tw / 4.0)
    dx, dy = _displacement_fields(coeffs, ys, xs)
    if not (np.isfinite(dx).all() and np.isfinite(dy).all()):
        return None
    bx = np.floor(dx + xs[None, None, :]) - np.floor(xs[None, None, :])
    by = np.floor(dy + ys[None, :, None]) - np.floor(ys[None, :, None])
    # reduce to per-tile min/max (tiles own 4 sample intervals each)
    def tile_minmax(field, n_tiles, axis):
        # field sampled at n_tiles*4+1 points along `axis`
        segs_min = []
        segs_max = []
        for t in range(n_tiles):
            sl = [slice(None)] * field.ndim
            sl[axis] = slice(4 * t, 4 * t + 5)
            sub = field[tuple(sl)]
            segs_min.append(sub.min(axis=axis))
            segs_max.append(sub.max(axis=axis))
        return np.stack(segs_min, axis=axis), np.stack(segs_max, axis=axis)

    bx_min, bx_max = tile_minmax(bx, n_tw, 2)
    bx_min, _ = tile_minmax(bx_min, n_th, 1)
    _, bx_max = tile_minmax(bx_max, n_th, 1)
    by_min, by_max = tile_minmax(by, n_tw, 2)
    by_min, _ = tile_minmax(by_min, n_th, 1)
    _, by_max = tile_minmax(by_max, n_th, 1)
    # Safety for the sampled bound.  For affine warps (g = h = 0: the
    # translation/similarity modes) the displacement field is linear,
    # so corner samples bound it exactly and floor() adds at most 1
    # (bx = h_affine(x) - frac(g(x)) with h_affine cornered exactly);
    # margin 1 is provably sufficient.  Projective fields need another
    # +1 for the sampled-bound looseness.
    affine = bool(np.all(np.abs(coeffs[:, 6:8]) < 1e-12))
    margin = 1 if affine else 2
    span = max(
        float((bx_max - bx_min).max(initial=0)),
        float((by_max - by_min).max(initial=0)),
    ) + margin
    extra = 4 if cubic else 2  # +1 tap (+2 more each side for bicubic)
    if span + extra > k_fixed:
        return None
    k = k_fixed

    # Mosaic only DMAs HBM slices whose offsets sit on the (8, 128)
    # tiling, so origins are aligned DOWN and the residuals (0..7 rows,
    # 0..127 cols) are removed in-kernel with dynamic rotates.  BOTH
    # window dims must hold a power-of-two number of hardware blocks:
    # the rotate is block-grouped otherwise (measured: width 384
    # rotates by shift+128).
    wh = 64
    while wh < th + k + 7:
        wh *= 2
    ww = 256
    while ww < tw + k - 1 + 127:
        ww *= 2
    pad_y = wh
    pad_x = ww

    gy0 = (np.arange(n_th) * th)[None, :, None]
    gx0 = (np.arange(n_tw) * tw)[None, None, :]
    off = 1 if cubic else 0  # bicubic taps start at floor-1
    oy = by_min.astype(np.int64) + gy0 - off      # conceptual origin, true coords
    ox = bx_min.astype(np.int64) + gx0 - off
    oy_pad = np.clip(oy + pad_y, 0, in_h + 2 * pad_y - wh)
    ox_pad = np.clip(ox + pad_x, 0, in_w + 2 * pad_x - ww)
    oy_al = (oy_pad // 8) * 8
    ox_al = (ox_pad // 128) * 128
    ry = oy_pad - oy_al  # 0..7
    rx = ox_pad - ox_al  # 0..127
    # a clamped origin means the tile has no valid taps in that direction
    # beyond the padding; weights there are zero so the clamp is safe.
    shape = (n, n_th, n_tw)
    origins = np.stack(
        [np.broadcast_to(a, shape) for a in (oy_al, ox_al, ry, rx)], axis=-1
    ).astype(np.int32)
    ww2 = -(-(tw + k - 1) // 128) * 128  # legacy field (unused by kernel)
    return dict(k=k, th=th, tw=tw, wh=wh, ww=ww, ww2=ww2, pad_y=pad_y, pad_x=pad_x,
                n_th=n_th, n_tw=n_tw, origins=origins.reshape(-1))


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------

def _cubic_w(t, idx):
    A = -0.75
    if idx == 0:
        return ((A * (t + 1) - 5 * A) * (t + 1) + 8 * A) * (t + 1) - 4 * A
    if idx == 1:
        return ((A + 2) * t - (A + 3)) * t * t + 1
    if idx == 2:
        u = 1 - t
        return ((A + 2) * u - (A + 3)) * u * u + 1
    return 1.0 - _cubic_w(t, 0) - _cubic_w(t, 1) - _cubic_w(t, 2)


def _make_kernel(*, th, tw, wh, ww, ww2, k, n_th, n_tw, in_h, in_w, pad_y, pad_x,
                 channels, interp):
    taps = 4 if interp == "bicubic" else 2
    tap_start = -1 if interp == "bicubic" else 0

    def kernel(origins_ref, coeffs_ref, border_ref, img_ref, out_ref, win, rolled, sem):
        n = pl.program_id(0)
        ty = pl.program_id(1)
        tx = pl.program_id(2)
        tile_id = (n * n_th + ty) * n_tw + tx
        total_tiles = pl.num_programs(0) * n_th * n_tw
        ry = origins_ref[4 * tile_id + 2]
        rx = origins_ref[4 * tile_id + 3]
        oy = pl.multiple_of(origins_ref[4 * tile_id], 8) + ry
        ox = pl.multiple_of(origins_ref[4 * tile_id + 1], 128) + rx

        # Double-buffered window DMA: grid steps run sequentially, so each
        # step prefetches the NEXT tile's window while computing its own.
        def dma_for(tid):
            slot = jax.lax.rem(tid, 2)
            fn = tid // (n_th * n_tw)
            rest = jax.lax.rem(tid, n_th * n_tw)
            oy_t = pl.multiple_of(origins_ref[4 * tid], 8)
            ox_t = pl.multiple_of(origins_ref[4 * tid + 1], 128)
            return pltpu.make_async_copy(
                img_ref.at[fn, :, pl.ds(oy_t, wh), pl.ds(ox_t, ww)],
                win.at[slot],
                sem.at[slot],
            )

        @pl.when(tile_id == 0)
        def _():
            dma_for(tile_id).start()

        @pl.when(tile_id + 1 < total_tiles)
        def _():
            dma_for(tile_id + 1).start()

        cp = dma_for(tile_id)

        ylo = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0).astype(jnp.float32)
        xlo = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1).astype(jnp.float32)
        ygf = ylo + (ty * th).astype(jnp.float32)
        xgf = xlo + (tx * tw).astype(jnp.float32)

        a = coeffs_ref[n * 8 + 0]
        b = coeffs_ref[n * 8 + 1]
        c = coeffs_ref[n * 8 + 2]
        d = coeffs_ref[n * 8 + 3]
        e = coeffs_ref[n * 8 + 4]
        f = coeffs_ref[n * 8 + 5]
        g = coeffs_ref[n * 8 + 6]
        h = coeffs_ref[n * 8 + 7]

        denom = 1.0 + g * xgf + h * ygf
        safe = denom != 0.0
        inv_d = jnp.where(safe, 1.0 / jnp.where(safe, denom, 1.0), 0.0)
        qx = (a - 1.0) * xgf + b * ygf + c - (g * xgf) * xgf - (h * xgf) * ygf
        qy = d * xgf + (e - 1.0) * ygf + f - (g * ygf) * xgf - (h * ygf) * ygf
        lim = 1.0e6
        dxf = jnp.clip(jnp.where(safe, qx * inv_d, -lim), -lim, lim)
        dyf = jnp.clip(jnp.where(safe, qy * inv_d, -lim), -lim, lim)

        fdx = jnp.floor(dxf)
        fdy = jnp.floor(dyf)
        fx = dxf - fdx
        fy = dyf - fdy
        ix = (xgf + fdx).astype(jnp.int32)
        iy = (ygf + fdy).astype(jnp.int32)
        # Window offset of the first tap RELATIVE to the pixel's own
        # tile-local position (the k-slice adds the local index back):
        #   e = (tile_base + floor(disp)) + tap_start + pad - origin
        ex = (tx * tw) + fdx.astype(jnp.int32) + tap_start + pad_x - ox
        ey = (ty * th) + fdy.astype(jnp.int32) + tap_start + pad_y - oy

        if interp == "bicubic":
            wx_tap = [_cubic_w(fx, i) for i in range(4)]
            wy_tap = [_cubic_w(fy, i) for i in range(4)]
        else:
            wx_tap = [1.0 - fx, fx]
            wy_tap = [1.0 - fy, fy]

        def axis_weights(e0, base, valid_lo, size, w_tap, kk):
            # weight of window-offset `kk` = sum over taps landing there
            out = None
            for t in range(taps):
                tap_coord = base + tap_start + t
                val = (tap_coord >= 0) & (tap_coord <= size - 1)
                m = jnp.where((e0 + t == kk) & val, w_tap[t], 0.0)
                out = m if out is None else out + m
            return out

        cp.wait()
        cur = jax.lax.rem(tile_id, 2)

        # Dynamic rotates remove both origin-alignment residuals: the
        # lane rotate needs ww to be a power of two (hardware rotates
        # are block-grouped otherwise) and the sublane rotate likewise
        # needs wh to be a power-of-two number of 8-row blocks — both
        # enforced in _plan.  Staged through scratch so the window
        # isn't a live vector value across the accumulation loop.
        for ch in range(channels):
            rolled[ch] = pltpu.roll(pltpu.roll(win[cur, ch], -rx, 1), -ry, 0)

        accs = [jnp.zeros((th, tw), jnp.float32) for _ in range(channels)]
        wsum = jnp.zeros((th, tw), jnp.float32)
        wxs = [axis_weights(ex, ix, None, in_w, wx_tap, kx) for kx in range(k)]
        # NOTE: wsum factors as (sum wy)*(sum wx) mathematically, but the
        # factored form measured no faster on device (precomputing all
        # wy rows raises live-value pressure); keep the accumulated form.
        for ky in range(k):
            wy = axis_weights(ey, iy, None, in_h, wy_tap, ky)
            for kx in range(k):
                wgt = wy * wxs[kx]
                wsum = wsum + wgt
                for ch in range(channels):
                    accs[ch] = accs[ch] + wgt * rolled[ch, ky : ky + th, kx : kx + tw]
        for ch in range(channels):
            out_ref[0, ch] = accs[ch] + border_ref[ch] * (1.0 - wsum)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("out_h", "out_w", "th", "tw", "wh", "ww", "ww2", "k",
                     "n_th", "n_tw", "in_h", "in_w", "pad_y", "pad_x",
                     "channels", "interp", "interpret"),
)
def _warp_pallas_call(
    frames_nhwc, origins, coeffs32, border, *,
    out_h, out_w, th, tw, wh, ww, ww2, k, n_th, n_tw, in_h, in_w,
    pad_y, pad_x, channels, interp, interpret=False,
):
    # layout conversion + padding run ON DEVICE inside this jit: the
    # wrapper receives NHWC frames that never leave the chip.
    planar_padded = jnp.pad(
        jnp.transpose(frames_nhwc, (0, 3, 1, 2)),
        ((0, 0), (0, 0), (pad_y, pad_y), (pad_x, pad_x)),
    )
    n = planar_padded.shape[0]
    kernel = _make_kernel(
        th=th, tw=tw, wh=wh, ww=ww, ww2=ww2, k=k, n_th=n_th, n_tw=n_tw,
        in_h=in_h, in_w=in_w, pad_y=pad_y, pad_x=pad_x,
        channels=channels, interp=interp,
    )
    # origins ride scalar prefetch (int32-only there); float coeffs and
    # border go in as SMEM-resident regular inputs.
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n, n_th, n_tw),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.SMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.SMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=pl.BlockSpec(
            (1, channels, th, tw),
            lambda i, j, kk, *_: (i, 0, j, kk),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, channels, wh, ww), jnp.float32),
            pltpu.VMEM((channels, wh, ww), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, channels, n_th * th, n_tw * tw), jnp.float32),
        interpret=interpret,
    )(origins, coeffs32, border, planar_padded)
    return jnp.transpose(out[:, :, :out_h, :out_w], (0, 2, 3, 1))


def warp_clip_pallas(
    frames,
    matrices: np.ndarray,
    coeffs: np.ndarray,
    out_size: Tuple[int, int],
    interp: str,
    border: Sequence[float],
    interpret: bool = False,
):
    """Attempt the Pallas path; None when unsupported (caller falls back).

    ``frames`` may be numpy or a device array; the result is a device
    array (NHWC float32).
    """
    if interp not in ("bilinear", "bicubic"):
        return None
    n, in_h, in_w, channels = frames.shape
    out_w, out_h = int(out_size[0]), int(out_size[1])
    if channels > 4 or min(in_h, in_w) < 32 or min(out_h, out_w) < 32:
        return None
    coeffs64 = np.asarray(coeffs, np.float64) if coeffs.dtype != np.float64 else coeffs
    plan = _plan(coeffs64, out_h, out_w, in_h, in_w, cubic=(interp == "bicubic"))
    if plan is None:
        return None
    th, tw = plan["th"], plan["tw"]

    return _warp_pallas_call(
        jnp.asarray(frames, jnp.float32),
        jnp.asarray(plan["origins"], jnp.int32),
        jnp.asarray(coeffs64, jnp.float32).reshape(-1),
        jnp.asarray(border, jnp.float32),
        out_h=out_h, out_w=out_w, th=th, tw=tw,
        wh=plan["wh"], ww=plan["ww"], ww2=plan["ww2"], k=plan["k"],
        n_th=plan["n_th"], n_tw=plan["n_tw"],
        in_h=in_h, in_w=in_w,
        pad_y=plan["pad_y"], pad_x=plan["pad_x"],
        channels=channels, interp=interp, interpret=interpret,
    )
