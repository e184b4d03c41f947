"""Pallas TPU fast path for the batched homography warp.

TPU has no hardware gather: XLA lowers the sampling gather in
``warp.py`` to a scalar loop (~26 fps at 1080p, measured).  This
kernel removes every gather by exploiting the structure of
stabilization warps:

* Within an output tile, the integer source displacement
  ``b = floor(src) - dst`` varies by only a few pixels (near-identity
  warps), so the bilinear/bicubic taps of every pixel live in a small
  static offset range [0, K) of the tile's source window.  Sampling
  becomes K x K masked shift-FMAs over static VMEM slices — pure VPU
  work.
* Each tile's source-window origin is computed IN-KERNEL from the
  displacement field (scalar math on the tile corners), so the host
  ships only the 8 coefficients per frame — no per-tile planning
  arrays, no host->device origin upload on the clip's critical path.
  The origin of tile t+1 is computed during tile t and carried in an
  SMEM scratch slot, where the double-buffered window DMA picks it up.
* Window DMAs must start on the (8, 128) HBM tiling and stay inside
  the source array, so origins are clamped then aligned down.  Both
  residuals VS THE CONCEPTUAL (unclamped) ORIGIN are removed with
  dynamic rolls of the window (lane roll for columns, sublane roll for
  rows), after which the tap loop runs exactly K statically-sliced
  iterations.  Because the rolls carry the full signed residual,
  in-image taps always land on their true window slots even when a
  clamp engages; only out-of-image taps (zero weight, border-filled —
  exact BORDER_CONSTANT semantics) can wrap around the window.  That
  invariant needs only one (8, 128) tile of pad slack per edge
  (_geometry) — 1.12x source bytes at 1080p vs 1.77x for a full-window
  pad.  Regression-tested at large translations in
  tests/test_warp_pallas.py.
* Shutter-blur runs the SAME kernel with the sample index as the
  innermost grid axis: the output tile stays resident in VMEM across
  the S samples and is written back once — S-fold fewer output
  round-trips to HBM than scanning whole-clip warps.

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

# (K, tile_h, tile_w) variants; K covers integer-displacement span +
# margins (see _plan).  Tile area shrinks as K grows to keep Mosaic's
# per-unrolled-temporary VMEM stack under the limit.  Device sweep
# (scripts/profile_kernel_ablate.py lineage): (64, 256) tiles beat
# (64, 128) by ~18% at 1080p (half the window-DMA amplification).
_K_TILE_BILINEAR = (
    # (4, 128, 256) first: 25% faster than 64-row tiles at 1080p (fewer
    # per-tile origin solves/DMA setups); the 64-row k=4 variant stays
    # for clips whose 128-row tile span no longer fits k=4.  At k>=5
    # the weight/FMA compute dominates and 128-row tiles stop paying.
    (4, 128, 256), (4, 64, 256), (5, 64, 256), (6, 64, 256), (8, 64, 256),
    (10, 32, 256), (14, 32, 128), (18, 16, 128),
)
_K_TILE_BICUBIC = (
    (6, 64, 256), (7, 64, 256), (8, 64, 256),
    (10, 32, 256), (14, 32, 128), (18, 16, 128),
)


# ---------------------------------------------------------------------------
# Host-side planning (scalar config only — no per-tile arrays)
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


def _geometry(k: int, th: int, tw: int, out_h: int, out_w: int,
              in_h: int, in_w: int):
    n_th = -(-out_h // th)
    n_tw = -(-out_w // tw)
    wh = -(-(th + k + 8) // 8) * 8
    ww = 256
    while ww < tw + k + 128:
        ww *= 2
    # Window origins are clamped into the (padded) source and BOTH
    # residuals (vs the conceptual origin) are rolled away in-kernel,
    # so in-image taps always resolve to their true window slots and
    # only zero-weight (out-of-image) taps can wrap.  That invariant
    # needs just one (8, 128) tile of slack: pad_y >= 7 keeps the
    # aligned-down clamp bound within a sublane tile of the true bound
    # and pad_x >= 127 within a lane tile, so the deepest in-image
    # row/col still lands inside the fetched window (proof sketch:
    # o_al >= padded_dim - w_dim - (tile-1), so in-image index
    # <= in_dim + pad - 1 - o_al <= w_dim - 2).  The minimal (8, 128)
    # pad is 1.12x the source bytes at 1080p vs 1.77x for the previous
    # full-window pad — and it forces the transposed source to
    # materialize in the default layout Pallas window DMAs assume
    # (a zero-pad variant was measured reading a layout-elided
    # transpose as garbage on device while interpret mode passed).
    # Tiny sources additionally pad up so the window DMA fits.
    pad_y = max(8, -(-(wh - in_h) // 2))
    pad_x = max(128, -(-(ww - in_w) // 2))
    return n_th, n_tw, wh, ww, pad_y, pad_x


def _tile_extrema(field: np.ndarray, sub: int, axis: int):
    """(min, max) over overlapping windows of sub+1 samples, stride sub."""
    main = np.moveaxis(field, axis, -1)
    n_t = (main.shape[-1] - 1) // sub
    body = main[..., : n_t * sub].reshape(main.shape[:-1] + (n_t, sub))
    edge = main[..., sub::sub][..., :n_t]
    mx = np.maximum(body.max(-1), edge)
    mn = np.minimum(body.min(-1), edge)
    return np.moveaxis(mn, -1, axis), np.moveaxis(mx, -1, axis)


def _max_tile_span(coeffs: np.ndarray, th: int, tw: int, n_th: int, n_tw: int,
                   affine: bool):
    """Largest per-tile range of the integer source-window base, or None.

    Affine fields are linear, so tile corners bound them exactly (one
    sample per tile corner); projective fields sample 5 points per tile
    edge — the same grids the kernel's in-kernel origin solve uses.
    """
    sub = 1 if affine else 4
    ys = np.arange(n_th * sub + 1) * (th / sub)
    xs = np.arange(n_tw * sub + 1) * (tw / sub)
    dx, dy = _displacement_fields(coeffs, ys, xs)
    if not (np.isfinite(dx).all() and np.isfinite(dy).all()):
        return None
    bx = np.floor(dx + xs[None, None, :]) - np.floor(xs[None, None, :])
    by = np.floor(dy + ys[None, :, None]) - np.floor(ys[None, :, None])
    span = 0.0
    for field in (bx, by):
        mn, mx = _tile_extrema(field, sub, 1)
        mn = _tile_extrema(mn, sub, 2)[0]
        mx = _tile_extrema(mx, sub, 2)[1]
        span = max(span, float((mx - mn).max(initial=0.0)))
    return span


def _plan(coeffs: np.ndarray, out_h: int, out_w: int, in_h: int, in_w: int,
          cubic: bool):
    """Pick the (K, tile) variant, or None when no variant fits.

    The margins absorb the sampled-bound looseness on projective
    fields, the in-kernel float32 origin evaluation, and the -1 origin
    bias the kernel applies.
    """
    affine = bool(np.all(np.abs(coeffs[:, 6:8]) < 1e-12))
    # Affine fields are linear, so corner samples bound the in-kernel
    # f32 evaluation up to ulp-scale floor flips at integer boundaries —
    # and a flipped floor's out-of-range tap carries ~0 weight by
    # continuity, so 1 covers the -1 origin bias alone.  Projective
    # fields keep the sampled-bound slack.
    margin = 1 if affine else 3
    extra = 4 if cubic else 2
    spans = {}
    for k_cand, th, tw in (_K_TILE_BICUBIC if cubic else _K_TILE_BILINEAR):
        n_th, n_tw, wh, ww, pad_y, pad_x = _geometry(k_cand, th, tw, out_h, out_w, in_h, in_w)
        key = (th, tw)
        if key not in spans:
            spans[key] = _max_tile_span(coeffs, th, tw, n_th, n_tw, affine)
        span = spans[key]
        if span is None:
            return None
        if span + margin + extra > k_cand:
            continue
        return dict(k=k_cand, th=th, tw=tw, wh=wh, ww=ww, pad_y=pad_y,
                    pad_x=pad_x, n_th=n_th, n_tw=n_tw, affine=affine)
    return None


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


def _make_kernel(*, th, tw, wh, ww, k, n_th, n_tw, n_samples, in_h, in_w,
                 pad_y, pad_x, channels, interp, affine):
    taps = 4 if interp == "bicubic" else 2
    tap_start = -1 if interp == "bicubic" else 0
    off = 1 if interp == "bicubic" else 0
    # scalar displacement samples per tile: corners suffice for affine
    # fields (linear -> extrema at corners); projective uses a 5x5 grid
    if affine:
        fracs = (0, 4)
    else:
        fracs = (0, 1, 2, 3, 4)
    lim = 1.0e6
    tiles_per_frame = n_th * n_tw * n_samples

    def kernel(coeffs_ref, border_ref, img_ref, out_ref, win, rolled, org, sem):
        n = pl.program_id(0)
        ty = pl.program_id(1)
        tx = pl.program_id(2)
        si = pl.program_id(3)
        tile_id = (((n * n_th + ty) * n_tw + tx) * n_samples) + si
        total_tiles = pl.num_programs(0) * tiles_per_frame

        def compute_origins(tid, slot):
            """Scalar window-origin solve for tile `tid` -> org[slot]."""
            sii = jax.lax.rem(tid, n_samples)
            rest = tid // n_samples
            txx = jax.lax.rem(rest, n_tw)
            rest = rest // n_tw
            tyy = jax.lax.rem(rest, n_th)
            fn = rest // n_th
            cb = (fn * n_samples + sii) * 8
            a = coeffs_ref[cb + 0]
            b = coeffs_ref[cb + 1]
            c = coeffs_ref[cb + 2]
            d = coeffs_ref[cb + 3]
            e = coeffs_ref[cb + 4]
            f = coeffs_ref[cb + 5]
            g = coeffs_ref[cb + 6]
            h = coeffs_ref[cb + 7]
            y0f = (tyy * th).astype(jnp.float32)
            x0f = (txx * tw).astype(jnp.float32)
            bx_min = jnp.float32(lim)
            by_min = jnp.float32(lim)
            for iy in fracs:
                for ix in fracs:
                    y = y0f + jnp.float32(iy * (th // 4))
                    x = x0f + jnp.float32(ix * (tw // 4))
                    denom = 1.0 + g * x + h * y
                    safe = denom != 0.0
                    inv_d = jnp.where(safe, 1.0 / jnp.where(safe, denom, 1.0), 0.0)
                    qx = (a - 1.0) * x + b * y + c - (g * x) * x - (h * x) * y
                    qy = d * x + (e - 1.0) * y + f - (g * y) * x - (h * y) * y
                    dx = jnp.clip(jnp.where(safe, qx * inv_d, -lim), -lim, lim)
                    dy = jnp.clip(jnp.where(safe, qy * inv_d, -lim), -lim, lim)
                    bx_min = jnp.minimum(bx_min, jnp.floor(dx))
                    by_min = jnp.minimum(by_min, jnp.floor(dy))
            # conceptual origin, padded coords; -1 biases against the
            # float32 evaluation of the same field in the tap pass
            oy_c = tyy * th + by_min.astype(jnp.int32) - (off + 1) + pad_y
            ox_c = txx * tw + bx_min.astype(jnp.int32) - (off + 1) + pad_x
            oy_p = jnp.clip(oy_c, 0, in_h + 2 * pad_y - wh)
            ox_p = jnp.clip(ox_c, 0, in_w + 2 * pad_x - ww)
            org[slot, 0] = (oy_p // 8) * 8
            org[slot, 1] = (ox_p // 128) * 128
            org[slot, 2] = oy_c
            org[slot, 3] = ox_c

        def dma_for(tid, slot):
            fn = tid // tiles_per_frame
            oy_t = pl.multiple_of(org[slot, 0], 8)
            ox_t = pl.multiple_of(org[slot, 1], 128)
            return pltpu.make_async_copy(
                img_ref.at[fn, :, pl.ds(oy_t, wh), pl.ds(ox_t, ww)],
                win.at[slot],
                sem.at[slot],
            )

        cur = jax.lax.rem(tile_id, 2)
        nxt = jax.lax.rem(tile_id + 1, 2)

        @pl.when(tile_id == 0)
        def _():
            compute_origins(tile_id, cur)
            dma_for(tile_id, cur).start()

        @pl.when(tile_id + 1 < total_tiles)
        def _():
            compute_origins(tile_id + 1, nxt)
            dma_for(tile_id + 1, nxt).start()

        oy_al = org[cur, 0]
        ox_al = org[cur, 1]
        oy_c = org[cur, 2]
        ox_c = org[cur, 3]

        ylo = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0).astype(jnp.float32)
        xlo = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1).astype(jnp.float32)
        ygf = ylo + (ty * th).astype(jnp.float32)
        xgf = xlo + (tx * tw).astype(jnp.float32)

        cb = (n * n_samples + si) * 8
        a = coeffs_ref[cb + 0]
        b = coeffs_ref[cb + 1]
        c = coeffs_ref[cb + 2]
        d = coeffs_ref[cb + 3]
        e = coeffs_ref[cb + 4]
        f = coeffs_ref[cb + 5]
        g = coeffs_ref[cb + 6]
        h = coeffs_ref[cb + 7]

        denom = 1.0 + g * xgf + h * ygf
        safe = denom != 0.0
        inv_d = jnp.where(safe, 1.0 / jnp.where(safe, denom, 1.0), 0.0)
        qx = (a - 1.0) * xgf + b * ygf + c - (g * xgf) * xgf - (h * xgf) * ygf
        qy = d * xgf + (e - 1.0) * ygf + f - (g * ygf) * xgf - (h * ygf) * ygf
        dxf = jnp.clip(jnp.where(safe, qx * inv_d, -lim), -lim, lim)
        dyf = jnp.clip(jnp.where(safe, qy * inv_d, -lim), -lim, lim)

        fdx = jnp.floor(dxf)
        fdy = jnp.floor(dyf)
        fx = dxf - fdx
        fy = dyf - fdy
        ix = (xgf + fdx).astype(jnp.int32)
        iy = (ygf + fdy).astype(jnp.int32)
        # tap window-offsets relative to the CONCEPTUAL origin: in [1, k)
        # by the plan bound, independent of clamping/alignment.  Both
        # residuals (ry rows, rx columns) are FULL signed rolls of the
        # window below, so the offsets index the rolled window directly;
        # when an origin clamp engages, in-image taps still map to their
        # true window slots and out-of-image taps (zero weight) are the
        # only ones that wrap (see the pad/no-pad invariant note above).
        ex = (tx * tw) + fdx.astype(jnp.int32) + tap_start + pad_x - ox_c
        ey = (ty * th) + fdy.astype(jnp.int32) + tap_start + pad_y - oy_c

        # Per-tile MINIMUM tap offsets fold into the alignment rolls for
        # free (the rolls are dynamic anyway), re-origining the offsets
        # to [0, span].  Most stabilization tiles then fit the reduced
        # k_fast tap loop below — (taps+2)^2 slice-FMAs instead of k^2 —
        # selected per tile by the ACTUAL offset spread, so the fast
        # branch is exact by construction (skipped taps carry zero
        # weight mass identically).
        # clamped to the sane [0, k-taps] range: a pathological pixel
        # (zero-denominator clip to +-lim) must not re-origin the whole
        # tile — with the clamp such tiles keep the pre-shift behavior
        # (its own taps carry zero weight either way)
        ey_min = jnp.clip(jnp.min(ey), 0, k - taps)
        ex_min = jnp.clip(jnp.min(ex), 0, k - taps)
        ey_spread = jnp.max(ey) - ey_min
        ex_spread = jnp.max(ex) - ex_min
        ey = ey - ey_min
        ex = ex - ex_min

        # Roll amounts NORMALIZED to [0, size): Mosaic/libtpu (0.0.34)
        # miscompiles dynamic sublane rolls with negative amounts on
        # device (interpret mode is fine) — measured: amounts in
        # [-wh, -3] read garbage.  rem twice = true floored modulo.
        ry = jax.lax.rem(jax.lax.rem(oy_al - oy_c - ey_min, wh) + wh, wh)
        rx = jax.lax.rem(jax.lax.rem(ox_al - ox_c - ex_min, ww) + ww, ww)

        if interp == "bicubic":
            wx_tap = [_cubic_w(fx, i) for i in range(4)]
            wy_tap = [_cubic_w(fy, i) for i in range(4)]
        else:
            wx_tap = [1.0 - fx, fx]
            wy_tap = [1.0 - fy, fy]

        def axis_weights(e0, base, size, w_tap, kn):
            # weight mass landing on each window offset kk in [0, kn);
            # out-of-image taps are zeroed once (per tap, not per kk)
            masked = []
            for t in range(taps):
                tap_coord = base + tap_start + t
                val = (tap_coord >= 0) & (tap_coord <= size - 1)
                masked.append(jnp.where(val, w_tap[t], 0.0))
            ws = []
            for kk in range(kn):
                out = None
                for t in range(taps):
                    m = jnp.where(e0 + t == kk, masked[t], 0.0)
                    out = m if out is None else out + m
                ws.append(out)
            return ws

        dma_for(tile_id, cur).wait()

        # Two dynamic rolls remove both residuals (lane roll for the
        # 0..127 column residual, sublane roll for the 0..7 row
        # residual) AND the per-tile minimum tap offset, so the tap
        # loops below run static-slice iterations with no guards and
        # accumulate in vregs.  Clamped (image-edge) origins never have
        # valid taps (pad_y == wh), so their garbage window contents
        # carry zero weight.
        for ch in range(channels):
            rolled[ch] = pltpu.roll(pltpu.roll(win[cur, ch], rx, 1), ry, 0)

        def tap_pass(kn):
            wxs = axis_weights(ex, ix, in_w, wx_tap, kn)
            wys = axis_weights(ey, iy, in_h, wy_tap, kn)
            accs = [None] * channels
            for kyo in range(kn):
                rows = [None] * channels
                for kx in range(kn):
                    for ch in range(channels):
                        v = wxs[kx] * rolled[ch, kyo : kyo + th, kx : kx + tw]
                        rows[ch] = v if rows[ch] is None else rows[ch] + v
                for ch in range(channels):
                    v = wys[kyo] * rows[ch]
                    accs[ch] = v if accs[ch] is None else accs[ch] + v

            sx = functools.reduce(lambda p, q: p + q, wxs)
            sy = functools.reduce(lambda p, q: p + q, wys)
            wsum = sy * sx
            for ch in range(channels):
                res = accs[ch] + border_ref[ch] * (1.0 - wsum)
                if n_samples == 1:
                    out_ref[0, ch] = res
                else:
                    # sample axis is innermost: the output tile stays
                    # resident in VMEM across the S revisits
                    @pl.when(si == 0)
                    def _(ch=ch, res=res):
                        out_ref[0, ch] = res

                    @pl.when(si > 0)
                    def _(ch=ch, res=res):
                        out_ref[0, ch] = out_ref[0, ch] + res

        # Tiered tap passes selected by the tile's ACTUAL offset spread
        # (exact by construction: with spread + taps <= kn every
        # nonzero-weight tap lands inside [0, kn), so the skipped
        # offsets carry zero weight mass identically).  Most
        # stabilization tiles have spread 0-1 — near-constant integer
        # displacement — so the taps^2 / (taps+1)^2 tiers carry the
        # bulk of the clip at 2.25-4x fewer slice-FMAs than the old
        # single taps+2 tier (device-measured on the bench clip).
        spread = jnp.maximum(ey_spread, ex_spread)
        tiers = [kn for kn in (taps, taps + 1, taps + 2) if kn < k] + [k]
        lo = None
        for kn in tiers:
            if kn == k:
                cond = spread + taps > lo

                @pl.when(cond)
                def _(kn=kn):
                    tap_pass(kn)
            else:
                cond = (spread + taps <= kn) if lo is None else (
                    (spread + taps > lo) & (spread + taps <= kn))

                @pl.when(cond)
                def _(kn=kn):
                    tap_pass(kn)
                lo = kn

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("out_h", "out_w", "th", "tw", "wh", "ww", "k",
                     "n_th", "n_tw", "in_h", "in_w", "pad_y", "pad_x",
                     "channels", "interp", "affine", "interpret",
                     "pre_padded", "planar"),
)
def _warp_pallas_call(
    frames, coeffs32, border, *,
    out_h, out_w, th, tw, wh, ww, k, n_th, n_tw, in_h, in_w,
    pad_y, pad_x, channels, interp, affine, interpret=False,
    pre_padded=False, planar=False,
):
    # any layout conversion + padding runs ON DEVICE inside this jit:
    # the wrapper receives frames that never leave the chip.
    # ``pre_padded``: frames are ALREADY the (N, C, in_h+2*pad_y,
    # in_w+2*pad_x) planar-padded source (built by a fused ingest pass
    # that shares its clip read with the grayscale kernel) — safe
    # because cross-jit array arguments always carry default layouts,
    # unlike intra-jit transposes (see _geometry's layout note).
    # ``planar``: return the raw (N, C, n_th*th, n_tw*tw) tile-grid
    # output without the NHWC transpose/slice — the expand fast path
    # fuses its dynamic canvas slice into one exact-size transpose
    # instead of materializing a bucket-size NHWC copy first.
    out = _pallas_warp_core(
        frames, coeffs32, border, n_samples=1,
        th=th, tw=tw, wh=wh, ww=ww, k=k, n_th=n_th, n_tw=n_tw,
        in_h=in_h, in_w=in_w, pad_y=pad_y, pad_x=pad_x,
        channels=channels, interp=interp, affine=affine,
        interpret=interpret, pre_padded=pre_padded,
    )
    if planar:
        return out
    return jnp.transpose(out[:, :, :out_h, :out_w], (0, 2, 3, 1))


def _pallas_warp_core(
    frames_nhwc, coeffs32, border, *, n_samples,
    th, tw, wh, ww, k, n_th, n_tw, in_h, in_w,
    pad_y, pad_x, channels, interp, affine, interpret, pre_padded=False,
):
    """Shared pallas_call: grid (N, n_th, n_tw, S), planar padded output.

    In the no-pad geometry (pad_y == pad_x == 0) the window DMAs read
    the planar source directly, so layout work is ONE transpose with no
    padded-copy pass (a 96-frame 1080p clip saves a 4.2 GB HBM buffer
    and its write pass).  For n_samples > 1 the output tile accumulates
    the S sample warps in VMEM (the caller divides by S)."""
    if pre_padded:
        assert frames_nhwc.shape[2] == in_h + 2 * pad_y, frames_nhwc.shape
        assert frames_nhwc.shape[3] == in_w + 2 * pad_x, frames_nhwc.shape
        planar_padded = frames_nhwc
    else:
        src = jnp.transpose(frames_nhwc, (0, 3, 1, 2))
        if pad_y or pad_x:
            src = jnp.pad(src, ((0, 0), (0, 0), (pad_y, pad_y), (pad_x, pad_x)))
        planar_padded = src
    n = planar_padded.shape[0]
    kernel = _make_kernel(
        th=th, tw=tw, wh=wh, ww=ww, k=k, n_th=n_th, n_tw=n_tw,
        n_samples=n_samples, in_h=in_h, in_w=in_w, pad_y=pad_y, pad_x=pad_x,
        channels=channels, interp=interp, affine=affine,
    )
    return pl.pallas_call(
        kernel,
        grid=(n, n_th, n_tw, n_samples),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.SMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.SMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=pl.BlockSpec(
            (1, channels, th, tw),
            lambda i, j, kk, ss: (i, 0, j, kk),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, channels, wh, ww), jnp.float32),
            pltpu.VMEM((channels, wh, ww), jnp.float32),
            pltpu.SMEM((2, 4), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        out_shape=jax.ShapeDtypeStruct((n, channels, n_th * th, n_tw * tw), jnp.float32),
        # the tile pipeline (SMEM origin carry + double-buffered window
        # DMA) requires strictly sequential grid execution
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",) * 4,
        ),
        interpret=interpret,
    )(coeffs32, border, planar_padded)


@functools.partial(
    jax.jit,
    static_argnames=("out_h", "out_w", "th", "tw", "wh", "ww", "k",
                     "n_th", "n_tw", "in_h", "in_w", "pad_y", "pad_x",
                     "channels", "interp", "affine", "n_samples", "interpret"),
)
def _warp_blur_pallas_call(
    frames_nhwc, coeffs32_s, border, *,
    out_h, out_w, th, tw, wh, ww, k, n_th, n_tw, in_h, in_w,
    pad_y, pad_x, channels, interp, affine, n_samples, interpret=False,
):
    """Shutter-blur fast path: ONE pallas_call with the shutter-sample
    index as the innermost grid axis.

    The output tile stays resident in VMEM across its S revisits and is
    written back to HBM exactly once — versus the round-2 scan of S
    whole-clip warps, which paid S full output read+write round-trips
    (and a 211 s cold compile for Ultra).  coeffs32_s: (N*S*8,) float32,
    sample-minor.
    """
    s = n_samples
    acc = _pallas_warp_core(
        frames_nhwc, coeffs32_s, border, n_samples=s,
        th=th, tw=tw, wh=wh, ww=ww, k=k, n_th=n_th, n_tw=n_tw,
        in_h=in_h, in_w=in_w, pad_y=pad_y, pad_x=pad_x,
        channels=channels, interp=interp, affine=affine,
        interpret=interpret,
    )
    acc = acc * (1.0 / s)
    return jnp.transpose(acc[:, :, :out_h, :out_w], (0, 2, 3, 1))


def warp_clip_blur_pallas(
    frames,
    sample_coeffs: np.ndarray,
    out_size: Tuple[int, int],
    interp: str,
    border: Sequence[float],
    interpret: bool = False,
):
    """Fused shutter-blur warp; None when the Pallas plan can't serve it.

    sample_coeffs: (N, S, 8) float64 inverse-map coefficients.
    Returns the (N, out_h, out_w, C) mean of the S sample warps.
    """
    if interp not in ("bilinear", "bicubic"):
        return None
    n, in_h, in_w, channels = frames.shape
    out_w, out_h = int(out_size[0]), int(out_size[1])
    if channels > 4 or min(in_h, in_w) < 32 or min(out_h, out_w) < 32:
        return None
    s = sample_coeffs.shape[1]
    flat = np.asarray(sample_coeffs, np.float64).reshape(n * s, 8)
    plan = _plan(flat, out_h, out_w, in_h, in_w, cubic=(interp == "bicubic"))
    if plan is None:
        return None
    # sample-minor flat layout: coeff row (fn * S + si) is frame fn,
    # shutter sample si — matching the kernel's grid decomposition
    return _warp_blur_pallas_call(
        jnp.asarray(frames, jnp.float32),
        jnp.asarray(flat, jnp.float32).reshape(-1),
        jnp.asarray(border, jnp.float32),
        out_h=out_h, out_w=out_w, th=plan["th"], tw=plan["tw"],
        wh=plan["wh"], ww=plan["ww"], k=plan["k"],
        n_th=plan["n_th"], n_tw=plan["n_tw"],
        in_h=in_h, in_w=in_w,
        pad_y=plan["pad_y"], pad_x=plan["pad_x"],
        channels=channels, interp=interp, affine=plan["affine"],
        n_samples=s, interpret=interpret,
    )


def warp_pallas_sharded(src, coeffs_flat, border, *, shards: int, **kw):
    """Per-shard speculative warp: ``_warp_pallas_call`` shard_map-ped
    over the mesh's ``data`` (frame) axis.

    Each frame's warp is independent of every other frame's, so the
    kernel partitions trivially: every shard runs the same static plan
    on its local n/shards frames with its local (n/shards, 8) inverse
    coefficients — no collectives at all.  This carries the zero-sync
    fast path (models/fastpath.py) and warp_clip onto a multi-chip
    mesh, where a bare pallas_call inside the GSPMD-partitioned jit
    could not run.
    """
    from jax.sharding import PartitionSpec as P

    from ..utils.meshinfo import active_abstract_mesh

    mesh = active_abstract_mesh()
    if mesh is None:
        raise ValueError("warp_pallas_sharded requires an active mesh")
    fn = jax.shard_map(
        lambda s, c, b: _warp_pallas_call(s, c, b, **kw),
        mesh=mesh,
        in_specs=(
            P("data", *([None] * (src.ndim - 1))),
            P("data"),
            P(None),
        ),
        out_specs=P("data", None, None, None),
        # pallas_call outputs carry no varying-mesh-axes annotation
        check_vma=False,
    )
    return fn(src, coeffs_flat, border)


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
    array (NHWC float32).  Under a sharding mesh the kernel runs
    shard_map-ped over the frame axis when the clip shards evenly;
    otherwise the caller's XLA path (which GSPMD partitions) runs.
    """
    from ..utils.meshinfo import data_shards, mesh_active

    if interp not in ("bilinear", "bicubic"):
        return None
    n, in_h, in_w, channels = frames.shape
    out_w, out_h = int(out_size[0]), int(out_size[1])
    if channels > 4 or min(in_h, in_w) < 32 or min(out_h, out_w) < 32:
        return None
    shards = data_shards(int(n))
    if mesh_active() and shards is None:
        return None
    coeffs64 = np.asarray(coeffs, np.float64) if coeffs.dtype != np.float64 else coeffs
    plan = _plan(coeffs64, out_h, out_w, in_h, in_w, cubic=(interp == "bicubic"))
    if plan is None:
        return None

    kw = dict(
        out_h=out_h, out_w=out_w, th=plan["th"], tw=plan["tw"],
        wh=plan["wh"], ww=plan["ww"], k=plan["k"],
        n_th=plan["n_th"], n_tw=plan["n_tw"],
        in_h=in_h, in_w=in_w,
        pad_y=plan["pad_y"], pad_x=plan["pad_x"],
        channels=channels, interp=interp, affine=plan["affine"],
        interpret=interpret,
    )
    args = (
        jnp.asarray(frames, jnp.float32),
        jnp.asarray(coeffs64, jnp.float32).reshape(-1),
        jnp.asarray(border, jnp.float32),
    )
    if shards is not None:
        return warp_pallas_sharded(*args, shards=shards, **kw)
    return _warp_pallas_call(*args, **kw)
