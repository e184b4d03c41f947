"""Sparse feature tracking: GFTT corners + pyramidal Lucas-Kanade.

TPU re-design of cv2.goodFeaturesToTrack / cv2.calcOpticalFlowPyrLK
(/root/reference/nodes/video_stabilizer_classic.py:76-96):

* corner quality is the structure-tensor minimum eigenvalue (Sobel-3
  gradients, 21x21 box aggregation) computed for ALL pair-leading
  frames in one batched conv stack; non-max suppression is a 3x3
  max-pool; the min-distance-7 greedy acceptance runs on host over the
  (small) candidate list, exactly like the reference's ordering.
* LK runs all features of all pairs as one vmapped Gauss-Newton solve
  per pyramid level (31x31 windows, Scharr template gradients, <=50
  iterations, eps 0.01), with a fixed-iteration lax.while on the
  batch's convergence state instead of per-feature Python loops.
"""

from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

MAX_CORNERS = 400
QUALITY_LEVEL = 0.01
MIN_DISTANCE = 7.0
BLOCK_SIZE = 21
WIN = 31
MAX_LEVEL = 3
MAX_ITERS = 50
EPS = 0.01


# ---------------------------------------------------------------------------
# Convolution helpers (batched over frames)
# ---------------------------------------------------------------------------

def _conv2(stack: jnp.ndarray, kernel: np.ndarray) -> jnp.ndarray:
    """(B, H, W) (x) (kh, kw) 'SAME' with reflect-101 edge handling.

    Computed as static shift-adds (separable when the kernel factors,
    which every kernel here does): conv_general_dilated reproducibly
    crashes the TPU worker on some (B, 540, 960)-class stacks, and the
    slice form is also faster for these small kernels.
    """
    kernel = np.asarray(kernel, np.float64)
    kh, kw = kernel.shape
    ph, pw = kh // 2, kw // 2
    B, H, Wd = stack.shape
    padded = jnp.pad(stack, ((0, 0), (ph, ph), (pw, pw)), mode="reflect")
    # rank-1 factorization (exact for all kernels used in this module):
    # pivot on the first nonzero so integer kernels keep exact weights
    r0, c0 = np.argwhere(kernel != 0.0)[0]
    ky64 = kernel[:, c0]
    kx64 = kernel[r0, :] / kernel[r0, c0]
    if np.array_equal(np.outer(ky64, kx64), kernel):
        ky = ky64.astype(np.float32)
        kx = kx64.astype(np.float32)
        v = None
        for i in range(kh):
            if ky[i] == 0.0:
                continue
            t = padded[:, i : i + H, :] * ky[i]
            v = t if v is None else v + t
        out = None
        for j in range(kw):
            if kx[j] == 0.0:
                continue
            t = v[:, :, j : j + Wd] * kx[j]
            out = t if out is None else out + t
        return out
    out = None
    for i in range(kh):
        for j in range(kw):
            kij = float(kernel[i, j])
            if kij == 0.0:
                continue
            t = padded[:, i : i + H, j : j + Wd] * kij
            out = t if out is None else out + t
    return out


_SOBEL_X = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], np.float32)
_SOBEL_Y = _SOBEL_X.T
_SCHARR_LK_X = np.outer([3, 10, 3], [-1, 0, 1]).astype(np.float32)  # cv2 LK deriv kernel
_SCHARR_LK_Y = _SCHARR_LK_X.T
_PYR_K = np.outer([1, 4, 6, 4, 1], [1, 4, 6, 4, 1]).astype(np.float32) / 256.0


def _box_sum(stack: jnp.ndarray, size: int) -> jnp.ndarray:
    """size x size box sum, 'SAME' with reflect-101 edges, via prefix
    sums: 2 passes per axis instead of `size` shift-adds — the 21x21
    structure-tensor aggregation was ~41 ms of the Classic path at 63
    pairs of 960x540 grays (126 shift-add passes over three arrays);
    the integral form is ~4 passes per array.  Values match the
    shift-add box up to f32 summation-order rounding (~1e-6 relative),
    which only reorders exact score ties."""
    ph = size // 2
    p = jnp.pad(stack, ((0, 0), (ph, ph), (ph, ph)), mode="reflect")
    c = jnp.cumsum(p, axis=1)
    rows = c[:, size - 1 :, :] - jnp.concatenate(
        [jnp.zeros_like(c[:, :1]), c[:, : -size]], axis=1
    )
    c2 = jnp.cumsum(rows, axis=2)
    return c2[:, :, size - 1 :] - jnp.concatenate(
        [jnp.zeros_like(c2[:, :, :1]), c2[:, :, : -size]], axis=2
    )


@jax.jit
def _min_eig_map(stack: jnp.ndarray) -> jnp.ndarray:
    dx = _conv2(stack, _SOBEL_X)
    dy = _conv2(stack, _SOBEL_Y)
    a = _box_sum(dx * dx, BLOCK_SIZE)
    b = _box_sum(dx * dy, BLOCK_SIZE)
    c = _box_sum(dy * dy, BLOCK_SIZE)
    return 0.5 * ((a + c) - jnp.sqrt((a - c) ** 2 + 4.0 * b * b))


@jax.jit
def _nms_candidates(eig: jnp.ndarray):
    pooled = jax.lax.reduce_window(eig, -jnp.inf, jax.lax.max, (1, 3, 3), (1, 1, 1), "SAME")
    quality = jnp.max(eig.reshape(eig.shape[0], -1), axis=-1) * QUALITY_LEVEL
    keep = (eig >= pooled) & (eig > quality[:, None, None])
    scores = jnp.where(keep, eig, -jnp.inf)
    return scores


@functools.partial(jax.jit, static_argnames=("k", "use_pallas"))
def _topk_packed(grays, k, use_pallas=False):
    """NMS + top-k candidate indices with validity packed as -1.

    One int32 array leaves the device (the scores were only ever used
    for the finite/positive filter, and the dev tunnel charges ~50 ms/MB
    for the float payload).  ``use_pallas`` swaps the box/min-eig/NMS
    scoring for the fused VMEM kernel (ops/gftt_pallas.py) — same
    contract, f32 summation-order differences only (~1e-6 relative,
    reorders exact ties at most)."""
    if use_pallas:
        from . import gftt_pallas as GP

        g = jnp.asarray(grays, jnp.float32)
        dx = _conv2(g, _SOBEL_X)
        dy = _conv2(g, _SOBEL_Y)
        raw = GP.gftt_scores(dx * dx, dx * dy, dy * dy)
        quality = jnp.max(raw.reshape(raw.shape[0], -1), axis=-1) * QUALITY_LEVEL
        scores = jnp.where(raw > quality[:, None, None], raw, -jnp.inf)
    else:
        scores = _nms_candidates(_min_eig_map(jnp.asarray(grays, jnp.float32)))
    flat = scores.reshape(scores.shape[0], -1)
    top_vals, top_idx = jax.lax.top_k(flat, k)
    ok = jnp.isfinite(top_vals) & (top_vals > 0)
    return jnp.where(ok, top_idx, -1).astype(jnp.int32)


_GREEDY_BLOCK = 16  # candidates resolved per scan step


@functools.partial(jax.jit, static_argnames=("w", "max_corners", "min_distance"))
def _greedy_device(top_idx, w, max_corners, min_distance):
    """Score-descending greedy min-distance acceptance ON DEVICE.

    Exact sequential-greedy semantics (a candidate is accepted iff its
    squared distance to every previously accepted corner is >=
    min_distance^2, score order; equality vs the host/native greedy is
    asserted in tests/test_classic.py), resolved _GREEDY_BLOCK
    candidates per lax.scan step: each step checks the whole block
    against the accepted set in one batched distance pass, resolves the
    intra-block dependencies with an unrolled triangular sweep (tiny —
    (bsz,)-vector ops), and scatters the block's winners into their
    slots.  The candidate-per-step scan ran 2048 sequential steps whose
    per-step overhead dominated (measured ~69 ms of the Classic path at
    1080p; blocked: a few ms).  Keeping this on device means the corner
    list never leaves the chip (the dev tunnel charged more for the
    0.5 MB candidate fetch than the whole scoring pass cost).
    """
    bsz, k = top_idx.shape
    q = _GREEDY_BLOCK
    kp = -(-k // q) * q
    top_idx = jnp.pad(top_idx, ((0, 0), (0, kp - k)), constant_values=-1)
    valid = top_idx >= 0
    ys = (top_idx // w).astype(jnp.float32)
    xs = (top_idx - (top_idx // w) * w).astype(jnp.float32)
    min_d2 = jnp.float32(min_distance * min_distance)
    slot_iota = jax.lax.broadcasted_iota(jnp.int32, (bsz, max_corners), 1)

    def step(carry, inp):
        acc_y, acc_x, n_acc = carry
        y, x, v = inp                                  # (q, bsz) each
        # block vs already-accepted set: one batched pass
        d2 = ((acc_y[None] - y[:, :, None]) ** 2
              + (acc_x[None] - x[:, :, None]) ** 2)    # (q, bsz, maxc)
        ok_acc = v & (jnp.min(d2, axis=2) >= min_d2)   # (q, bsz)
        # intra-block triangular resolve: candidate j also rejects on
        # an ACCEPTED earlier candidate i<j closer than min_distance
        flags = []
        offs = jnp.zeros(bsz, jnp.int32)
        for j in range(q):
            ok_j = ok_acc[j] & (n_acc + offs < max_corners)
            for i in range(j):
                d2ij = (y[i] - y[j]) ** 2 + (x[i] - x[j]) ** 2
                ok_j = ok_j & (~flags[i] | (d2ij >= min_d2))
            slot_j = n_acc + offs
            put = (slot_iota == slot_j[:, None]) & ok_j[:, None]
            acc_y = jnp.where(put, y[j][:, None], acc_y)
            acc_x = jnp.where(put, x[j][:, None], acc_x)
            flags.append(ok_j)
            offs = offs + ok_j.astype(jnp.int32)
        return (acc_y, acc_x, n_acc + offs), None

    far = jnp.full((bsz, max_corners), 1.0e9, jnp.float32)
    (acc_y, acc_x, n_acc), _ = jax.lax.scan(
        step, (far, far, jnp.zeros(bsz, jnp.int32)),
        (ys.T.reshape(kp // q, q, bsz), xs.T.reshape(kp // q, q, bsz),
         valid.T.reshape(kp // q, q, bsz)),
    )
    used = slot_iota < n_acc[:, None]
    pts = jnp.stack(
        [jnp.where(used, acc_x, 0.0), jnp.where(used, acc_y, 0.0)], axis=-1
    )
    return pts, n_acc


def gftt_batch(grays, max_corners: int = MAX_CORNERS):
    """(B, H, W) -> (pts (B, max_corners, 2) f32, counts (B,) int32).

    Fully on-device: candidate scoring + NMS + top-k + the greedy
    min-distance acceptance (score-descending, 7 px exclusion, same
    ordering semantics as the reference's cv2 GFTT).  Returns DEVICE
    arrays — the corners feed lk_track and the RANSAC fits without a
    host round-trip; the host greedy below is kept as the sequential
    oracle the device scan is tested against.
    """
    B, H, W = grays.shape
    k = min(2048, H * W)
    return _greedy_device(
        _topk_packed(grays, k, use_pallas=_use_pallas_lk()),
        W, max_corners, MIN_DISTANCE,
    )


def gftt_batch_host(grays, max_corners: int = MAX_CORNERS):
    """Host-greedy variant of gftt_batch (numpy outputs).

    Same scoring/NMS programs; the acceptance loop runs on host (C++
    native/rectangle.cpp greedy, python fallback).  This is the
    sequential-semantics oracle for _greedy_device — kept out of the
    product path, exercised by tests/test_classic.py.
    """
    B, H, W = grays.shape
    k = min(2048, H * W)
    top_idx = np.asarray(_topk_packed(grays, k))

    try:
        from ..native import rectangle as _native
        _native._load()
        greedy = _native.greedy_min_distance
    except Exception:
        greedy = None

    pts = np.zeros((B, max_corners, 2), np.float32)
    counts = np.zeros(B, np.int32)
    cell = max(1, int(MIN_DISTANCE))
    min_d2 = MIN_DISTANCE * MIN_DISTANCE
    for b in range(B):
        row = top_idx[b]
        n_cand = int((row != -1).sum())   # invalid (-inf) scores sort last
        idxs = row[:n_cand]
        ys = idxs // W
        xs = idxs % W
        if greedy is not None:
            accepted = greedy(ys, xs, H, W, MIN_DISTANCE, max_corners)
            n = accepted.shape[0]
            pts[b, :n] = accepted.astype(np.float32)
        else:  # pure-python fallback, same greedy ordering
            grid: dict[tuple[int, int], list[tuple[int, int]]] = {}
            n = 0
            for y, x in zip(ys, xs):
                cy, cx = int(y) // cell, int(x) // cell
                ok = True
                for gy in (cy - 1, cy, cy + 1):
                    for gx in (cx - 1, cx, cx + 1):
                        for (py, px) in grid.get((gy, gx), ()):
                            if (py - y) ** 2 + (px - x) ** 2 < min_d2:
                                ok = False
                                break
                        if not ok:
                            break
                    if not ok:
                        break
                if not ok:
                    continue
                grid.setdefault((cy, cx), []).append((int(y), int(x)))
                pts[b, n] = (x, y)
                n += 1
                if n >= max_corners:
                    break
        counts[b] = n
    return pts, counts


# ---------------------------------------------------------------------------
# Pyramids
# ---------------------------------------------------------------------------

@jax.jit
def _pyr_down(stack: jnp.ndarray) -> jnp.ndarray:
    """Gaussian blur + stride-2 as separable shift-adds.

    Numerically the same [1,4,6,4,1]/16-per-axis kernel as _conv2 with
    _PYR_K, but built from static slices: conv_general_dilated on
    certain (B, 540, 960)-class shapes crashes the TPU runtime (worker
    kernel fault, reproduced twice), and the shift-add form sidesteps
    that lowering entirely.
    """
    B, H, Wd = stack.shape
    w = (1.0, 4.0, 6.0, 4.0, 1.0)
    p = jnp.pad(stack, ((0, 0), (2, 2), (2, 2)), mode="reflect")
    v = None
    for i, wi in enumerate(w):
        t = p[:, i : i + H, :] * wi
        v = t if v is None else v + t
    out = None
    for j, wj in enumerate(w):
        t = v[:, :, j : j + Wd] * wj
        out = t if out is None else out + t
    return (out * (1.0 / 256.0))[:, ::2, ::2]


def gaussian_pyramid(stack, levels: int = MAX_LEVEL) -> List[jnp.ndarray]:
    pyr = [jnp.asarray(stack, jnp.float32)]
    for _ in range(levels):
        pyr.append(_pyr_down(pyr[-1]))
    return pyr


# ---------------------------------------------------------------------------
# Window-extracted matmul sampling
#
# TPU gathers are scalarized, so per-iteration bilinear patch gathers made
# LK catastrophically slow (measured 0.4 f/s at 480p).  Instead each
# feature's (WEXT x WEXT) integer-aligned window is extracted ONCE per
# level (a slice-gather XLA handles well), and every subsequent subpixel
# patch sample is two small matmuls with 2-nonzero interpolation
# matrices — exact bilinear, on the MXU, for all features of all pairs
# at once.  The Gauss-Newton update is therefore bounded to +-TRAVEL px
# per level (cv2 is unbounded, but coarse-to-fine keeps true per-level
# updates far smaller; the bound only bites on junk tracks, which the
# forward-backward/status logic discards anyway).
# ---------------------------------------------------------------------------

TRAVEL = 8                      # max displacement from the level's init
WEXT = WIN + 2 * TRAVEL + 2     # extracted window side


def _interp_matrix(offset: jnp.ndarray, out_size: int, in_size: int) -> jnp.ndarray:
    """(F,) fractional offsets -> (F, out_size, in_size) bilinear rows.

    Row i has weights (1-f, f) at columns (i + floor(offset)),
    (i + floor(offset) + 1); out-of-window rows are zero (the caller
    clamps offsets so that never happens for live tracks).
    """
    base = jnp.floor(offset)
    frac = (offset - base)[:, None, None]
    rows = jax.lax.broadcasted_iota(jnp.int32, (out_size, in_size), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (out_size, in_size), 1)
    k = cols - rows - base.astype(jnp.int32)[:, None, None]
    return jnp.where(k == 0, 1.0 - frac, jnp.where(k == 1, frac, 0.0))


def _sample_from_windows(windows: jnp.ndarray, off_y: jnp.ndarray, off_x: jnp.ndarray,
                         size: int) -> jnp.ndarray:
    """windows (F, WEXT, WEXT), offsets (F,) -> (F, size, size) patches.

    patch = A(off_y) @ window @ B(off_x)^T, exact bilinear.
    """
    wext = windows.shape[-1]
    A = _interp_matrix(off_y, size, wext)
    Bm = _interp_matrix(off_x, size, wext)
    tmp = jnp.einsum("fij,fjk->fik", A, windows, preferred_element_type=jnp.float32)
    return jnp.einsum("fik,flk->fil", tmp, Bm, preferred_element_type=jnp.float32)


def _extract_windows_batched(stack: jnp.ndarray, corners: jnp.ndarray, wext: int,
                             chunk: int = 8, bf16: bool = False) -> jnp.ndarray:
    """(B, H, W) stack + (B, F, 2) int xy corners -> (B, F, wext, wext).

    Window extraction as one-hot SELECTION MATMULS on the MXU instead
    of per-feature slices: a (vmapped) dynamic_slice per feature
    scalarizes into B*F separate slice+update kernel launches, and on
    TPU the per-launch runtime overhead dwarfs the copies (measured:
    8.6 s wall for 0.37 s of device work at 480p/64 frames/400
    features).  Row/column one-hot matmuls are exact in float32 (each
    output sums exactly one nonzero product) and run as TWO batched
    matmul kernels per chunk.  Chunking over pairs bounds the one-hot
    and row-strip intermediates to a few hundred MB.

    ``bf16`` runs the selection matmuls in bfloat16 — still BIT-EXACT
    when the image values are bf16-representable (the finest pyramid
    level is integer 0..255 grays; one-hot weights are 0/1 and every
    output sums exactly one product, accumulated in f32) and ~2-3x
    faster on the MXU.  Callers enable it only for the finest level;
    coarser levels carry x.25-step box means that bf16 would round.

    On TPU the selection runs as per-feature DMA copies instead
    (ops/extract_pallas.py): raw strided slices out of the
    VMEM-resident padded frame, no selection tensors at all — the
    one-hot matmul form moved ~1 GB of intermediates per 8-frame chunk
    at 480p and was the Classic path's last whale.  Both forms are
    exact slices, so they are interchangeable bit-for-bit (asserted in
    tests/test_classic.py).
    """
    B, H, W = stack.shape
    F = corners.shape[1]
    pad = wext
    padded = jnp.pad(stack, ((0, 0), (pad, pad), (pad, pad)))
    Hp, Wp = H + 2 * pad, W + 2 * pad
    # dynamic_slice semantics: clamp the start so the window stays inside
    cy = jnp.clip(corners[..., 1] + pad, 0, Hp - wext)
    cx = jnp.clip(corners[..., 0] + pad, 0, Wp - wext)

    import os

    # CVST_DMA_EXTRACT=1 swaps in the per-feature DMA kernel
    # (ops/extract_pallas.py).  Measured on v5e at 480p/63 pairs/512
    # features: ~31 ms per extraction, FLAT across pyramid levels (the
    # cost is per-DMA-descriptor, ~1 us/feature) — worse than the
    # one-hot matmuls everywhere except the finest level, where they
    # tie.  Kept as a verified alternative; the one-hot path stays the
    # default.
    if _use_pallas_lk() and os.environ.get("CVST_DMA_EXTRACT", "0") == "1":
        from . import extract_pallas as EP

        return EP.extract_windows_dma(padded, cy, cx, wext)

    nb = -(-B // chunk)
    pad_b = nb * chunk - B
    padded = jnp.pad(padded, ((0, pad_b), (0, 0), (0, 0)))
    cy = jnp.pad(cy, ((0, pad_b), (0, 0)))
    cx = jnp.pad(cx, ((0, pad_b), (0, 0)))
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, 1, wext), 2)

    dt = jnp.bfloat16 if bf16 else jnp.float32

    def one_chunk(_, args):
        img_c, cy_c, cx_c = args                       # (c,Hp,Wp), (c,F), (c,F)
        rows = cy_c[..., None] + idx                   # (c, F, wext)
        ysel = jax.nn.one_hot(rows, Hp, dtype=dt)
        strip = jnp.einsum("cfyh,chw->cfyw", ysel, img_c.astype(dt),
                           preferred_element_type=jnp.float32)
        cols = cx_c[..., None] + idx
        xsel = jax.nn.one_hot(cols, Wp, dtype=dt)
        out = jnp.einsum("cfyw,cfxw->cfyx", strip.astype(dt), xsel,
                         preferred_element_type=jnp.float32)
        return None, out

    _, wins = jax.lax.scan(
        one_chunk, None,
        (padded.reshape(nb, chunk, Hp, Wp),
         cy.reshape(nb, chunk, F), cx.reshape(nb, chunk, F)),
    )
    return wins.reshape(nb * chunk, F, wext, wext)[:B]


def _lk_level(wins_t, wins_gx, wins_gy, wins_j, pts_level, guess, valid,
              H, W, win, iters, eps, is_level0):
    """One pyramid level for one pair, all features batched.

    Windows are pre-extracted for ALL pairs at once (see
    _extract_windows_batched); this function only does the batched
    Gauss-Newton solve.  cv2 semantics: upper levels never kill a
    track — a point whose window leaves the image or whose normal
    matrix is ill-conditioned simply keeps its guess; only level 0
    folds those conditions into the returned status.
    """
    level_fits = min(H, W) >= win
    half = win // 2

    # integer window corners (top-left of the extracted block)
    tpl_corner = jnp.floor(pts_level).astype(jnp.int32) - half - 1
    cur_corner = jnp.floor(guess).astype(jnp.int32) - half - TRAVEL

    # template + gradients at the feature's exact subpixel position
    # (+1: the template window is shifted one cell by the reflect halo)
    t_off_y = pts_level[:, 1] - half - tpl_corner[:, 1].astype(jnp.float32) + 1.0
    t_off_x = pts_level[:, 0] - half - tpl_corner[:, 0].astype(jnp.float32) + 1.0
    T = _sample_from_windows(wins_t, t_off_y, t_off_x, win)
    gx = _sample_from_windows(wins_gx, t_off_y, t_off_x, win)
    gy = _sample_from_windows(wins_gy, t_off_y, t_off_x, win)

    a = (gx * gx).sum(axis=(1, 2))
    b = (gx * gy).sum(axis=(1, 2))
    c = (gy * gy).sum(axis=(1, 2))
    det = a * c - b * b
    min_eig = 0.5 * ((a + c) - jnp.sqrt((a - c) ** 2 + 4 * b * b)) / (win * win)
    solvable = (det > 1e-7) & (min_eig > 1e-4)
    in_t = (
        (pts_level[:, 0] - half >= 0) & (pts_level[:, 0] + half <= W - 1)
        & (pts_level[:, 1] - half >= 0) & (pts_level[:, 1] + half <= H - 1)
    )
    runnable = solvable & in_t & level_fits
    inv_det = jnp.where(det != 0, 1.0 / jnp.where(det != 0, det, 1.0), 0.0)

    # iterate in window-local coordinates; clamp keeps sampling in range
    base = cur_corner.astype(jnp.float32)
    lo = 0.5
    hi = WEXT - win - 0.5

    def body(state):
        it, g_cur, done, prev_step2, stall = state
        ly = jnp.clip(g_cur[:, 1] - half - base[:, 1], lo, hi)
        lx = jnp.clip(g_cur[:, 0] - half - base[:, 0], lo, hi)
        Jp = _sample_from_windows(wins_j, ly, lx, win)
        r = Jp - T
        bx = (gx * r).sum(axis=(1, 2))
        by = (gy * r).sum(axis=(1, 2))
        dx = -(c * bx - b * by) * inv_det
        dy = -(-b * bx + a * by) * inv_det
        step = jnp.stack([dx, dy], axis=-1)
        g_new = g_cur + jnp.where((runnable & ~done)[:, None], step, 0.0)
        # keep the track inside its extracted window
        g_new = jnp.stack(
            [jnp.clip(g_new[:, 0], base[:, 0] + half + lo, base[:, 0] + half + hi),
             jnp.clip(g_new[:, 1], base[:, 1] + half + lo, base[:, 1] + half + hi)],
            axis=-1,
        )
        small = (dx * dx + dy * dy) <= eps * eps
        # stall cutoff: a Gauss-Newton track whose step is not shrinking
        # is oscillating on junk (textureless / out-of-window content);
        # cv2 would burn the full 50 iterations on it and return an
        # equally-arbitrary position, but in this lockstep batch every
        # straggler costs ALL tracks an iteration.  Converging tracks
        # shrink geometrically and never trip the counter.
        step2 = dx * dx + dy * dy
        stall = jnp.where(step2 >= 0.98 * prev_step2, stall + 1, 0)
        return (it + 1, g_new, done | small | ~runnable | (stall >= 5),
                step2, stall)

    def cond(state):
        it, _, done, _, _ = state
        return (it < iters) & (~done.all())

    f0 = guess.shape[0]
    _, g_iter, _, _, _ = jax.lax.while_loop(
        cond, body,
        (0, guess, jnp.zeros(f0, bool),
         jnp.full((f0,), jnp.inf, jnp.float32), jnp.zeros(f0, jnp.int32)),
    )
    g_out = jnp.where(runnable[:, None], g_iter, guess)
    if is_level0:
        in_final = (
            (g_out[:, 0] - half >= 0) & (g_out[:, 0] + half <= W - 1)
            & (g_out[:, 1] - half >= 0) & (g_out[:, 1] + half <= H - 1)
        )
        status = valid & runnable & in_final
    else:
        status = valid
    return g_out, status


def lk_track(
    prev_pyr: List[np.ndarray],
    curr_pyr: List[np.ndarray],
    pts: np.ndarray,
    counts: np.ndarray,
    win: int = WIN,
    max_level: int = MAX_LEVEL,
    iters: int = MAX_ITERS,
    eps: float = EPS,
):
    """Track points pair-wise through the pyramids.

    prev_pyr/curr_pyr: per-level (B, h, w) stacks (prev = frames[:-1],
    curr = frames[1:] of the SAME clip pyramid, shifted views).
    pts: (B, F, 2); counts: valid feature count per pair.
    Returns (tracked (B, F, 2), status (B, F) bool).
    """
    B, F = pts.shape[:2]
    # jnp ops throughout: pts/counts may be device arrays (gftt_batch)
    # and must not be pulled to host here
    valid0 = jnp.arange(F)[None, :] < jnp.asarray(counts)[:, None]

    pts = jnp.asarray(pts)
    guesses = pts / (2.0 ** max_level)
    pts_scaled = {lvl: pts / (2.0 ** lvl) for lvl in range(max_level + 1)}
    valid = valid0
    g = jnp.asarray(guesses)
    level_solve = _lk_level_all_pallas if _use_pallas_lk() else _lk_level_all
    for lvl in range(max_level, -1, -1):
        g, status_l = level_solve(
            jnp.asarray(prev_pyr[lvl]),
            jnp.asarray(curr_pyr[lvl]),
            jnp.asarray(pts_scaled[lvl]),
            g,
            valid,
            win,
            iters,
            eps,
            lvl == 0,
        )
        if lvl > 0:
            g = g * 2.0
        valid = valid & status_l

    return g, valid  # device arrays; consumers are the RANSAC device fits


def _conv2_lanes(x: jnp.ndarray, kernel: np.ndarray) -> jnp.ndarray:
    """_conv2 twin for LANE-MAJOR window stacks (B, h, w, F).

    Same reflect-101 pad, same rank-1 factorization, same tap order —
    elementwise-identical arithmetic to _conv2 on the (B*F, h, w)
    layout, but every vreg carries F live lanes instead of w/128."""
    kernel = np.asarray(kernel, np.float64)
    kh, kw = kernel.shape
    ph, pw = kh // 2, kw // 2
    B, H, Wd, F = x.shape
    padded = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)), mode="reflect")
    r0, c0 = np.argwhere(kernel != 0.0)[0]
    ky = kernel[:, c0].astype(np.float32)
    kx = (kernel[r0, :] / kernel[r0, c0]).astype(np.float32)
    assert np.array_equal(
        np.outer(kernel[:, c0], kernel[r0, :] / kernel[r0, c0]), kernel
    ), "kernel must factor (all LK kernels do)"
    v = None
    for i in range(kh):
        if ky[i] == 0.0:
            continue
        t = padded[:, i : i + H, :, :] * ky[i]
        v = t if v is None else v + t
    out = None
    for j in range(kw):
        if kx[j] == 0.0:
            continue
        t = v[:, :, j : j + Wd, :] * kx[j]
        out = t if out is None else out + t
    return out


def _lk_prep(I_stack, J_stack, pts_level, guess, win, bf16_extract=False):
    """Window extraction + template sampling + normal equations.

    Feeds the Pallas iteration backend; everything here runs ONCE per
    level.  Returns the per-feature quantities the GN loop consumes in
    the kernel's own LANE-MAJOR layout — windows (B, h, w, F) with
    features on lanes, scalars (B, F).  The windows are transposed to
    that layout IMMEDIATELY after extraction: in the natural
    (B, F, h, w) layout every downstream op (Scharr convs, subpixel
    sampling, normal-equation sums) runs at h/128 ~ 28% lane
    utilization, which measured as a flat ~40 ms per level at 480p —
    more than the extraction itself.  ``bf16_extract`` speeds the
    selection matmuls bit-exactly on the integer-valued finest level
    (see _extract_windows_batched).
    """
    B, H, W = I_stack.shape
    half = win // 2
    wext_t = win + 5

    tpl_corner = jnp.floor(pts_level).astype(jnp.int32) - half - 1
    cur_corner = jnp.floor(guess).astype(jnp.int32) - half - TRAVEL
    # reflect halo shifts window row r to image row corner + r - 1
    Ir = jnp.pad(I_stack, ((0, 0), (1, 1), (1, 1)), mode="reflect")
    wins_t = _extract_windows_batched(Ir, tpl_corner, wext_t, bf16=bf16_extract)
    wins_j = _extract_windows_batched(J_stack, cur_corner, WEXT, bf16=bf16_extract)
    # feature axis -> lanes for ALL window-space math below
    wins_t = jnp.transpose(wins_t, (0, 2, 3, 1))      # (B, wt, wt, F)
    wins_j = jnp.transpose(wins_j, (0, 2, 3, 1))      # (B, WEXT, WEXT, F)
    wins_gx = _conv2_lanes(wins_t, _SCHARR_LK_X / 32.0)
    wins_gy = _conv2_lanes(wins_t, _SCHARR_LK_Y / 32.0)

    # Template + gradients at the feature's exact subpixel position.
    # The integer part of the template offset is the CONSTANT 2
    # (t_off = frac(pts) + 2: corner = floor(pts) - half - 1 plus the
    # one-cell reflect-halo shift), so exact bilinear is four STATIC
    # slices with per-feature scalar weights — same row-then-column
    # blend order as _sample_from_windows, minus its (31,36)@(36,36)
    # interp matmuls that ran at ~2% MXU utilization, 3x per level.
    fy = (pts_level[..., 1] - jnp.floor(pts_level[..., 1]))[:, None, None, :]
    fx = (pts_level[..., 0] - jnp.floor(pts_level[..., 0]))[:, None, None, :]

    def samp(wins):
        tmp = (1.0 - fy) * wins[:, 2 : 2 + win] + fy * wins[:, 3 : 3 + win]
        return (1.0 - fx) * tmp[:, :, 2 : 2 + win] + fx * tmp[:, :, 3 : 3 + win]

    T = samp(wins_t)
    gx = samp(wins_gx)
    gy = samp(wins_gy)

    a = (gx * gx).sum(axis=(1, 2))
    b = (gx * gy).sum(axis=(1, 2))
    c = (gy * gy).sum(axis=(1, 2))
    det = a * c - b * b
    min_eig = 0.5 * ((a + c) - jnp.sqrt((a - c) ** 2 + 4 * b * b)) / (win * win)
    solvable = (det > 1e-7) & (min_eig > 1e-4)
    in_t = (
        (pts_level[..., 0] - half >= 0) & (pts_level[..., 0] + half <= W - 1)
        & (pts_level[..., 1] - half >= 0) & (pts_level[..., 1] + half <= H - 1)
    )
    level_fits = min(H, W) >= win
    runnable = solvable & in_t & level_fits
    inv_det = jnp.where(det != 0, 1.0 / jnp.where(det != 0, det, 1.0), 0.0)
    return wins_j, T, gx, gy, a, b, c, inv_det, runnable, cur_corner


def _lk_post(g_iter, guess, valid, runnable, win, H, W, is_level0):
    """Fold the loop result into (positions, status) — cv2 semantics:
    upper levels never kill a track; level 0 folds runnability and the
    final in-image test into the status."""
    half = win // 2
    g_out = jnp.where(runnable[..., None], g_iter, guess)
    if is_level0:
        in_final = (
            (g_out[..., 0] - half >= 0) & (g_out[..., 0] + half <= W - 1)
            & (g_out[..., 1] - half >= 0) & (g_out[..., 1] + half <= H - 1)
        )
        return g_out, valid & runnable & in_final
    return g_out, valid


@functools.partial(
    jax.jit, static_argnames=("win", "iters", "eps", "is_level0", "interpret")
)
def _lk_level_all_pallas(I_stack, J_stack, pts_level, guess, valid, win, iters,
                         eps, is_level0, interpret=False):
    """Pallas iteration backend: same prep/post as the XLA path, the GN
    loop as one lane-major kernel (ops/lk_pallas.py).  Convergence is
    tracked per 128-feature block instead of across the whole clip, so
    a straggler track no longer costs every pair an iteration."""
    from . import lk_pallas as LKP

    B, H, W = I_stack.shape
    F = pts_level.shape[1]
    wins_j, T, gx, gy, a, b, c, inv_det, runnable, cur_corner = _lk_prep(
        I_stack, J_stack, pts_level, guess, win, bf16_extract=is_level0
    )
    fp = -(-F // LKP.FB) * LKP.FB
    padf = fp - F

    def lanes(x):  # already lane-major (B, h, w, F) -> padded (B, h, w, Fp)
        return jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, padf)))

    def vec(x):  # (B, F) -> (B, Fp) float32
        return jnp.pad(x.astype(jnp.float32), ((0, 0), (0, padf)))

    base = cur_corner.astype(jnp.float32)
    rows = [None] * LKP.N_ROWS
    rows[LKP.ROW_A] = vec(a)
    rows[LKP.ROW_B] = vec(b)
    rows[LKP.ROW_C] = vec(c)
    rows[LKP.ROW_INVD] = vec(inv_det)
    rows[LKP.ROW_RUN] = vec(runnable)
    rows[LKP.ROW_BASE_X] = vec(base[..., 0])
    rows[LKP.ROW_BASE_Y] = vec(base[..., 1])
    rows[LKP.ROW_GUESS_X] = vec(guess[..., 0])
    rows[LKP.ROW_GUESS_Y] = vec(guess[..., 1])
    zero = jnp.zeros((pts_level.shape[0], fp), jnp.float32)
    scal = jnp.stack([r if r is not None else zero for r in rows], axis=1)

    g = LKP.lk_gn_iterate(
        lanes(wins_j), lanes(T), lanes(gx), lanes(gy), scal,
        win=win, iters=iters, eps=float(eps), interpret=interpret,
    )
    g_iter = jnp.transpose(g[:, :2], (0, 2, 1))[:, :F]
    return _lk_post(g_iter, guess, valid, runnable, win, H, W, is_level0)


def _use_pallas_lk() -> bool:
    """Kernel path on single-device TPU runs; under a sharding mesh the
    XLA forms run instead — the estimation jits are GSPMD-partitioned
    there, and a pallas_call cannot be auto-partitioned."""
    from ..utils.meshinfo import mesh_active

    if mesh_active():
        return False
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


@functools.partial(jax.jit, static_argnames=("win", "iters", "is_level0"))
def _lk_level_all(I_stack, J_stack, pts_level, guess, valid, win, iters, eps,
                  is_level0):
    """One pyramid level for ALL pairs: batched window extraction
    (one-hot matmuls) + the vmapped per-pair Gauss-Newton solve.

    Template windows carry a 1-px halo (extracted from a reflect-101
    padded stack, matching the full-image derivative's edge handling)
    so the Scharr gradients come from a batched conv ON the windows
    instead of separate dIx/dIy extractions.  Sampled rows sit >= 2
    cells inside the window, so every conv tap reads a real extracted
    cell and the gradient values match the full-image convolution
    exactly for every live track.
    """
    B, H, W = I_stack.shape
    F = pts_level.shape[1]
    half = win // 2
    wext_t = win + 5

    tpl_corner = jnp.floor(pts_level).astype(jnp.int32) - half - 1
    cur_corner = jnp.floor(guess).astype(jnp.int32) - half - TRAVEL
    # reflect halo shifts window row r to image row corner + r - 1
    Ir = jnp.pad(I_stack, ((0, 0), (1, 1), (1, 1)), mode="reflect")
    wins_t = _extract_windows_batched(Ir, tpl_corner, wext_t)
    wins_j = _extract_windows_batched(J_stack, cur_corner, WEXT)
    wins_gx = _conv2(wins_t.reshape(B * F, wext_t, wext_t), _SCHARR_LK_X / 32.0)
    wins_gy = _conv2(wins_t.reshape(B * F, wext_t, wext_t), _SCHARR_LK_Y / 32.0)
    wins_gx = wins_gx.reshape(B, F, wext_t, wext_t)
    wins_gy = wins_gy.reshape(B, F, wext_t, wext_t)

    solve = jax.vmap(
        functools.partial(_lk_level, H=H, W=W, win=win, iters=iters, eps=eps,
                          is_level0=is_level0),
        in_axes=(0, 0, 0, 0, 0, 0, 0),
    )
    return solve(wins_t, wins_gx, wins_gy, wins_j, pts_level, guess, valid)
