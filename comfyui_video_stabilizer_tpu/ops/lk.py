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
from typing import List, Tuple

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
    """(B, H, W) (x) (kh, kw) 'SAME' with reflect-101 edge handling."""
    kh, kw = kernel.shape
    ph, pw = kh // 2, kw // 2
    padded = jnp.pad(stack, ((0, 0), (ph, ph), (pw, pw)), mode="reflect")
    out = jax.lax.conv_general_dilated(
        padded[:, None],
        jnp.asarray(kernel, jnp.float32)[None, None],
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return out[:, 0]


_SOBEL_X = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], np.float32)
_SOBEL_Y = _SOBEL_X.T
_SCHARR_LK_X = np.outer([3, 10, 3], [-1, 0, 1]).astype(np.float32)  # cv2 LK deriv kernel
_SCHARR_LK_Y = _SCHARR_LK_X.T
_PYR_K = np.outer([1, 4, 6, 4, 1], [1, 4, 6, 4, 1]).astype(np.float32) / 256.0


@jax.jit
def _min_eig_map(stack: jnp.ndarray) -> jnp.ndarray:
    dx = _conv2(stack, _SOBEL_X)
    dy = _conv2(stack, _SOBEL_Y)
    box = np.ones((BLOCK_SIZE, BLOCK_SIZE), np.float32)
    a = _conv2(dx * dx, box)
    b = _conv2(dx * dy, box)
    c = _conv2(dy * dy, box)
    return 0.5 * ((a + c) - jnp.sqrt((a - c) ** 2 + 4.0 * b * b))


@jax.jit
def _nms_candidates(eig: jnp.ndarray):
    pooled = jax.lax.reduce_window(eig, -jnp.inf, jax.lax.max, (1, 3, 3), (1, 1, 1), "SAME")
    quality = jnp.max(eig.reshape(eig.shape[0], -1), axis=-1) * QUALITY_LEVEL
    keep = (eig >= pooled) & (eig > quality[:, None, None])
    scores = jnp.where(keep, eig, -jnp.inf)
    return scores


def gftt_batch(grays, max_corners: int = MAX_CORNERS):
    """(B, H, W) -> (pts (B, max_corners, 2) f32, counts (B,) int).

    Candidate scoring + NMS is batched on device; the min-distance
    greedy acceptance (score-descending, 7 px exclusion) is a tiny
    host loop over <=2048 candidates per frame, matching the
    reference's greedy ordering semantics.
    """
    B, H, W = grays.shape
    scores = _nms_candidates(_min_eig_map(jnp.asarray(grays, jnp.float32)))
    k = min(2048, H * W)
    flat = scores.reshape(B, -1)
    top_vals, top_idx = jax.lax.top_k(flat, k)
    top_vals = np.asarray(top_vals)
    top_idx = np.asarray(top_idx)

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
        finite = np.isfinite(top_vals[b]) & (top_vals[b] > 0)
        n_cand = int(finite.sum())
        idxs = top_idx[b][:n_cand]
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
    blurred = _conv2(stack, _PYR_K)
    return blurred[:, ::2, ::2]


def gaussian_pyramid(stack, levels: int = MAX_LEVEL) -> List[jnp.ndarray]:
    pyr = [jnp.asarray(stack, jnp.float32)]
    for _ in range(levels):
        pyr.append(_pyr_down(pyr[-1]))
    return pyr


# ---------------------------------------------------------------------------
# Subpixel patch sampling (gather-based; feature data is tiny)
# ---------------------------------------------------------------------------

def _sample_patches(img: jnp.ndarray, centers: jnp.ndarray, size: int):
    """img (H, W), centers (F, 2) xy -> patches (F, size, size), inb (F,).

    Bilinear, patch grid centered: offsets -(size//2) .. +(size//2).
    """
    H, W = img.shape
    half = size // 2
    offs = jnp.arange(size, dtype=jnp.float32) - half
    gx = centers[:, 0, None, None] + offs[None, None, :]
    gy = centers[:, 1, None, None] + offs[None, :, None]
    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    fx = gx - x0
    fy = gy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(yi, xi):
        yc = jnp.clip(yi, 0, H - 1)
        xc = jnp.clip(xi, 0, W - 1)
        return img[yc, xc]

    v = (
        tap(y0i, x0i) * (1 - fy) * (1 - fx)
        + tap(y0i, x0i + 1) * (1 - fy) * fx
        + tap(y0i + 1, x0i) * fy * (1 - fx)
        + tap(y0i + 1, x0i + 1) * fy * fx
    )
    inb = (
        (centers[:, 0] - half >= 0)
        & (centers[:, 0] + half <= W - 1)
        & (centers[:, 1] - half >= 0)
        & (centers[:, 1] + half <= H - 1)
    )
    return v, inb


def _lk_level(I, J, dIx, dIy, pts_level, guess, valid, win, iters, eps, is_level0):
    """One pyramid level for one pair: vmapped over features.

    cv2 semantics: upper levels never kill a track — a point whose
    window leaves the image or whose normal matrix is ill-conditioned
    simply keeps its guess; only level 0 folds those conditions into
    the returned status.
    """
    level_fits = min(I.shape) >= win  # image big enough for the window

    def per_feature(pt, g, ok):
        T, in_t = _sample_patches(I, pt[None], win)
        T = T[0]
        gx, _ = _sample_patches(dIx, pt[None], win)
        gy, _ = _sample_patches(dIy, pt[None], win)
        gx = gx[0]
        gy = gy[0]
        a = (gx * gx).sum()
        b = (gx * gy).sum()
        c = (gy * gy).sum()
        det = a * c - b * b
        min_eig = 0.5 * ((a + c) - jnp.sqrt((a - c) ** 2 + 4 * b * b)) / (win * win)
        solvable = (det > 1e-7) & (min_eig > 1e-4)
        runnable = solvable & in_t[0] & level_fits

        def body(state):
            it, g_cur, done = state
            Jp, _ = _sample_patches(J, g_cur[None], win)
            r = Jp[0] - T
            bx = (gx * r).sum()
            by = (gy * r).sum()
            dx = -(c * bx - b * by) / jnp.where(det == 0, 1.0, det)
            dy = -(-b * bx + a * by) / jnp.where(det == 0, 1.0, det)
            g_new = g_cur + jnp.stack([dx, dy])
            small = (dx * dx + dy * dy) <= eps * eps
            return it + 1, jnp.where(done, g_cur, g_new), done | small

        def cond(state):
            it, _, done = state
            return (it < iters) & (~done)

        _, g_iter, _ = jax.lax.while_loop(cond, body, (0, g, jnp.asarray(False)))
        g_out = jnp.where(runnable, g_iter, g)
        if is_level0:
            _, in_final = _sample_patches(J, g_out[None], win)
            status = ok & runnable & in_final[0]
        else:
            status = ok
        return g_out, status

    return jax.vmap(per_feature)(pts_level, guess, valid)


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
    valid0 = np.arange(F)[None, :] < counts[:, None]
    tracked = np.zeros_like(pts)
    status = np.zeros((B, F), bool)

    # Precompute derivative stacks per level once (batched conv, on device).
    dIx_levels = []
    dIy_levels = []
    for lvl in range(max_level + 1):
        I_stack = jnp.asarray(prev_pyr[lvl])
        dIx_levels.append(_conv2(I_stack, _SCHARR_LK_X / 32.0))
        dIy_levels.append(_conv2(I_stack, _SCHARR_LK_Y / 32.0))

    guesses = pts / (2.0 ** max_level)
    pts_scaled = {lvl: pts / (2.0 ** lvl) for lvl in range(max_level + 1)}
    valid = jnp.asarray(valid0)
    g = jnp.asarray(guesses)
    level_fn = jax.jit(
        jax.vmap(_lk_level, in_axes=(0, 0, 0, 0, 0, 0, 0, None, None, None, None)),
        static_argnums=(7, 8, 10),
    )
    for lvl in range(max_level, -1, -1):
        g, status_l = level_fn(
            jnp.asarray(prev_pyr[lvl]),
            jnp.asarray(curr_pyr[lvl]),
            jnp.asarray(dIx_levels[lvl]),
            jnp.asarray(dIy_levels[lvl]),
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
