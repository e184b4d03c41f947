"""Batched RANSAC model fitting for all frame pairs at once.

Replaces cv2.findHomography(RANSAC) / cv2.estimateAffinePartial2D
(/root/reference/nodes/video_stabilizer_classic.py:114-141,
video_stabilizer_flow.py:163-190) with a fixed-shape, scan-friendly
design: OpenCV's sequential adaptive iterations (maxIters=2000,
conf=0.992) become K parallel minimal-sample hypotheses evaluated for
every pair in one vmapped kernel — hypothesis scoring is a lax.scan
over hypothesis chunks so peak memory stays bounded.  The winner is
least-squares refit on its inliers (one reweighted round), which is
where OpenCV's LM refinement parity comes from: both converge to the
same inlier set on stabilization-grade data.

Determinism: hypothesis sampling uses jax PRNG keys derived from a
fixed seed + pair index — same inputs, same fit, every run.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

SIM_THRESH = 2.0     # px reprojection, estimateAffinePartial2D default in reference
PERSP_THRESH = 2.5   # px reprojection, findHomography call in reference
DEFAULT_HYPOTHESES = 512
_CHUNK = 64


# ---------------------------------------------------------------------------
# Minimal solvers
# ---------------------------------------------------------------------------

def _solve_similarity_2pt(p: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """p, q: (2, 2) two correspondences -> (3, 3) similarity matrix."""
    dp = p[1] - p[0]
    dq = q[1] - q[0]
    den = dp[0] * dp[0] + dp[1] * dp[1]
    den = jnp.where(den == 0, 1e-12, den)
    a = (dq[0] * dp[0] + dq[1] * dp[1]) / den
    b = (dq[1] * dp[0] - dq[0] * dp[1]) / den
    tx = q[0, 0] - (a * p[0, 0] - b * p[0, 1])
    ty = q[0, 1] - (b * p[0, 0] + a * p[0, 1])
    return jnp.array([[a, -b, tx], [b, a, ty], [0.0, 0.0, 1.0]], jnp.float32)


def _solve_homography_4pt(p: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """p, q: (4, 2) -> (3, 3) homography with h22 = 1 (8x8 solve)."""
    x, y = p[:, 0], p[:, 1]
    u, v = q[:, 0], q[:, 1]
    zeros = jnp.zeros_like(x)
    ones = jnp.ones_like(x)
    rows_u = jnp.stack([x, y, ones, zeros, zeros, zeros, -x * u, -y * u], axis=-1)
    rows_v = jnp.stack([zeros, zeros, zeros, x, y, ones, -x * v, -y * v], axis=-1)
    A = jnp.concatenate([rows_u, rows_v], axis=0)            # (8, 8)
    b = jnp.concatenate([u, v], axis=0)                      # (8,)
    h = jnp.linalg.solve(A + 1e-12 * jnp.eye(8), b)
    H = jnp.concatenate([h, jnp.ones((1,), h.dtype)]).reshape(3, 3)
    return H.astype(jnp.float32)


def _apply_homography(H: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """H (3,3), pts (..., 2) -> (..., 2) with homogeneous divide."""
    x = pts[..., 0]
    y = pts[..., 1]
    w = H[2, 0] * x + H[2, 1] * y + H[2, 2]
    w = jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)
    u = (H[0, 0] * x + H[0, 1] * y + H[0, 2]) / w
    v = (H[1, 0] * x + H[1, 1] * y + H[1, 2]) / w
    return jnp.stack([u, v], axis=-1)


# ---------------------------------------------------------------------------
# Least-squares refits on inliers
# ---------------------------------------------------------------------------

def _refit_similarity(p, q, weight):
    """Weighted LS similarity (a, b, tx, ty); weight (P,) in {0,1}."""
    wsum = jnp.maximum(weight.sum(), 1e-6)
    pm = (p * weight[:, None]).sum(0) / wsum
    qm = (q * weight[:, None]).sum(0) / wsum
    pc = (p - pm) * weight[:, None]
    qc = (q - qm) * weight[:, None]
    den = jnp.maximum((pc * pc).sum(), 1e-12)
    a = (pc[:, 0] * qc[:, 0] + pc[:, 1] * qc[:, 1]).sum() / den
    b = (pc[:, 0] * qc[:, 1] - pc[:, 1] * qc[:, 0]).sum() / den
    tx = qm[0] - (a * pm[0] - b * pm[1])
    ty = qm[1] - (b * pm[0] + a * pm[1])
    return jnp.array([[a, -b, tx], [b, a, ty], [0.0, 0.0, 1.0]], jnp.float32)


def _refit_homography(p, q, weight):
    """Weighted normalized DLT via the smallest eigenvector of A^T A."""
    wsum = jnp.maximum(weight.sum(), 1e-6)
    pm = (p * weight[:, None]).sum(0) / wsum
    qm = (q * weight[:, None]).sum(0) / wsum
    ps = jnp.sqrt(jnp.maximum((((p - pm) ** 2).sum(-1) * weight).sum() / wsum, 1e-12))
    qs = jnp.sqrt(jnp.maximum((((q - qm) ** 2).sum(-1) * weight).sum() / wsum, 1e-12))
    pn = (p - pm) / ps
    qn = (q - qm) / qs
    x, y = pn[:, 0], pn[:, 1]
    u, v = qn[:, 0], qn[:, 1]
    zeros = jnp.zeros_like(x)
    ones = jnp.ones_like(x)
    r1 = jnp.stack([x, y, ones, zeros, zeros, zeros, -x * u, -y * u, -u], axis=-1)
    r2 = jnp.stack([zeros, zeros, zeros, x, y, ones, -x * v, -y * v, -v], axis=-1)
    A = jnp.concatenate([r1 * weight[:, None], r2 * weight[:, None]], axis=0)  # (2P, 9)
    ata = A.T @ A
    _, vecs = jnp.linalg.eigh(ata)
    h = vecs[:, 0]
    Hn = h.reshape(3, 3)
    Tp = jnp.array([[1.0 / ps, 0, -pm[0] / ps], [0, 1.0 / ps, -pm[1] / ps], [0, 0, 1.0]])
    Tq_inv = jnp.array([[qs, 0, qm[0]], [0, qs, qm[1]], [0, 0, 1.0]])
    H = Tq_inv @ Hn @ Tp
    H = H / jnp.where(jnp.abs(H[2, 2]) < 1e-12, 1e-12, H[2, 2])
    return H.astype(jnp.float32)


# ---------------------------------------------------------------------------
# Batched RANSAC core (one pair), vmapped over the clip
# ---------------------------------------------------------------------------

def _ransac_single(key, p, q, valid, model: str, n_hyp: int, thresh: float):
    P = p.shape[0]
    m = 2 if model == "similarity" else 4
    vcount = valid.sum()

    # Sample minimal sets over the VALID points only.  Raw-index
    # sampling kept just f^m of the hypothesis budget at valid
    # fraction f (the classic path pads tracks to max_corners with
    # status=false, so f can be 0.25 on hard frames -> ~2 surviving
    # perspective hypotheses out of 512).  Instead of a sort-based
    # compaction (slow on TPU), invert the exclusive-prefix-sum rank
    # of each valid point with one scatter, then draw ranks in
    # [0, vcount): every hypothesis lands on valid points.
    ranks = jnp.cumsum(valid) - valid.astype(jnp.int32)     # exclusive ranks
    lookup = jnp.zeros((P,), jnp.int32).at[jnp.where(valid, ranks, P)].set(
        jnp.arange(P, dtype=jnp.int32), mode="drop")
    u = jax.random.uniform(key, (n_hyp, m))
    denom = jnp.maximum(vcount, 1)
    r = jnp.minimum((u * denom).astype(jnp.int32), denom - 1)
    idx = lookup[r]
    ps = p[idx]                                  # (K, m, 2)
    qs = q[idx]
    draw_ok = valid[idx].all(axis=1) & (vcount >= m)        # (K,)

    solver = _solve_similarity_2pt if model == "similarity" else _solve_homography_4pt
    hyps = jax.vmap(solver)(ps, qs)              # (K, 3, 3)
    hyp_ok = draw_ok[:, None, None] & jnp.isfinite(hyps).all(axis=(1, 2), keepdims=True)
    hyps = jnp.where(hyp_ok, hyps, jnp.eye(3, dtype=jnp.float32))
    hyp_ok_f = hyp_ok[:, 0, 0].astype(jnp.float32)

    valid_f = valid.astype(jnp.float32)
    thresh_sq = thresh * thresh

    # Hypothesis ranking only needs a representative subset; the
    # winner's inlier set (and the acceptance confidence) is computed
    # on the full point set in refine().  The subset is a deterministic
    # prefix of the grid, i.e. an unbiased spatial sample.
    n_score = min(P, 2048)
    p_score = p[:n_score]
    q_score = q[:n_score]
    score_valid = valid_f[:n_score]

    def count_chunk(carry, hyp_chunk):
        proj = jax.vmap(lambda H: _apply_homography(H, p_score))(hyp_chunk)
        err = ((proj - q_score[None]) ** 2).sum(-1)
        counts = ((err < thresh_sq) * score_valid[None]).sum(-1)        # (C,)
        return carry, counts

    n_chunks = max(1, n_hyp // _CHUNK)
    hyp_chunks = hyps[: n_chunks * _CHUNK].reshape(n_chunks, -1, 3, 3)
    _, counts = jax.lax.scan(count_chunk, None, hyp_chunks)
    counts = counts.reshape(-1) * hyp_ok_f[: n_chunks * _CHUNK]

    best = jnp.argmax(counts)
    H_best = hyps[best]

    def refine(H):
        proj = _apply_homography(H, p)
        err = ((proj - q) ** 2).sum(-1)
        inlier = (err < thresh_sq) & valid
        w = inlier.astype(jnp.float32)
        refit = _refit_similarity if model == "similarity" else _refit_homography
        H2 = refit(p, q, w)
        H2 = jnp.where(jnp.isfinite(H2).all(), H2, H)
        return H2, inlier

    H1, _ = refine(H_best)
    H2, inliers = refine(H1)   # one reweighted round (LM-parity in practice)
    # guard: a refit that lost all inliers falls back to the best hypothesis
    n_in = inliers.sum()
    H2 = jnp.where(n_in >= m, H2, H_best)
    return H2, n_in, vcount


@functools.partial(jax.jit, static_argnames=("model", "n_hyp", "thresh"))
def _ransac_batched(keys, p, q, valid, model, n_hyp, thresh):
    return jax.vmap(lambda k, pi, qi, vi: _ransac_single(k, pi, qi, vi, model, n_hyp, thresh))(
        keys, p, q, valid
    )


def fit_model_batch(
    prev_pts: np.ndarray,
    curr_pts: np.ndarray,
    valid: np.ndarray,
    model: str,
    *,
    n_hypotheses: int = DEFAULT_HYPOTHESES,
    seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """RANSAC-fit every pair in the batch.

    prev_pts/curr_pts: (B, P, 2) float32, valid: (B, P) bool.
    Returns (matrices (B,3,3) f32, inlier_counts (B,), valid_counts (B,)).
    """
    B = prev_pts.shape[0]
    if B == 0:
        return np.zeros((0, 3, 3), np.float32), np.zeros(0), np.zeros(0)
    thresh = SIM_THRESH if model == "similarity" else PERSP_THRESH
    keys = jax.vmap(lambda i: jax.random.fold_in(jax.random.PRNGKey(seed), i))(jnp.arange(B))
    H, n_in, n_valid = _ransac_batched(
        keys,
        jnp.asarray(prev_pts, jnp.float32),
        jnp.asarray(curr_pts, jnp.float32),
        jnp.asarray(valid, bool),
        model,
        int(n_hypotheses),
        float(thresh),
    )
    return np.asarray(H), np.asarray(n_in), np.asarray(n_valid)


def _kth_smallest_bits(x_bits: jnp.ndarray, k: jnp.ndarray, iters: int = 32) -> jnp.ndarray:
    """Exact k-th smallest (0-based) of each row of monotonic int32 keys
    via bitwise binary search — ``iters`` compare+count passes instead
    of a TPU sort chain.  k may vary per row."""
    # pre-split on sign so hi - lo never overflows int32
    n_neg = (x_bits < 0).sum(axis=1)
    in_neg = k < n_neg
    lo = jnp.where(in_neg, jnp.int32(jnp.iinfo(jnp.int32).min), jnp.int32(0))
    hi = jnp.where(in_neg, jnp.int32(-1), jnp.int32(jnp.iinfo(jnp.int32).max))
    for _ in range(iters):
        mid = lo + ((hi - lo) >> 1)                             # no overflow
        below = (x_bits <= mid[:, None]).sum(axis=1)            # rank of mid
        go_up = below <= k                                      # kth is above mid
        lo = jnp.where(go_up, mid + 1, lo)
        hi = jnp.where(go_up, hi, mid)
    return lo


def _float_to_ordered_bits(x: jnp.ndarray) -> jnp.ndarray:
    b = jax.lax.bitcast_convert_type(x, jnp.int32)
    return jnp.where(b < 0, jnp.int32(-2147483648) - b - 1, b)


def _ordered_bits_to_float(b: jnp.ndarray) -> jnp.ndarray:
    raw = jnp.where(b < 0, jnp.int32(-2147483648) - b - 1, b)
    return jax.lax.bitcast_convert_type(raw, jnp.float32)


@jax.jit
def _masked_median_shift(prev_pts, curr_pts, valid):
    """np.median semantics per pair under a validity mask, on device.

    Selection runs as a bitwise binary search on the order-preserving
    int32 image of the floats (exact, no sort kernels).
    """
    shifts = curr_pts - prev_pts                                # (B, P, 2)
    big = jnp.float32(3.0e38)
    masked = jnp.where(valid[..., None], shifts, big)
    v = valid.sum(axis=1)                                       # (B,)
    lo_k = jnp.maximum((v - 1) // 2, 0)
    hi_k = v // 2
    meds = []
    for axis in range(2):
        bits = _float_to_ordered_bits(masked[..., axis])
        a = _ordered_bits_to_float(_kth_smallest_bits(bits, lo_k))
        b = _ordered_bits_to_float(_kth_smallest_bits(bits, hi_k))
        meds.append(0.5 * (a + b))
    med = jnp.stack(meds, axis=-1)
    return jnp.where((v > 0)[:, None], med, 0.0)


def median_translation_batch(prev_pts, curr_pts, valid) -> np.ndarray:
    """Median point shift per pair -> (B, 3, 3) translation matrices.

    Points stay on device; only the (B, 2) medians come back to host.
    """
    B = prev_pts.shape[0]
    out = np.tile(np.eye(3, dtype=np.float32), (B, 1, 1))
    if B == 0:
        return out
    med = np.asarray(
        _masked_median_shift(
            jnp.asarray(prev_pts, jnp.float32),
            jnp.asarray(curr_pts, jnp.float32),
            jnp.asarray(valid, bool),
        )
    )
    out[:, 0, 2] = med[:, 0]
    out[:, 1, 2] = med[:, 1]
    return out


@jax.jit
def _residuals_kernel(matrices, prev_pts, curr_pts, valid):
    m = matrices.astype(jnp.float32)
    proj = jnp.einsum("bij,bpj->bpi", m[:, :2, :2], prev_pts) + m[:, None, :2, 2]
    err = jnp.abs(proj - curr_pts)
    w = valid[..., None].astype(jnp.float32)
    total = (err * w).sum(axis=(1, 2))
    count = jnp.maximum(w.sum(axis=(1, 2)), 1.0)
    return jnp.where(valid.any(axis=1), total / count, 0.0)


def reprojection_residuals(matrices, prev_pts, curr_pts, valid) -> np.ndarray:
    """Mean |affine-projected prev - curr| per pair (flow's residual metric).

    Matches the reference's residual definition, which applies only the
    affine part (video_stabilizer_flow.py:174,189,207); device-side.
    """
    if matrices.shape[0] == 0:
        return np.zeros(0)
    return np.asarray(
        _residuals_kernel(
            jnp.asarray(matrices, jnp.float32),
            jnp.asarray(prev_pts, jnp.float32),
            jnp.asarray(curr_pts, jnp.float32),
            jnp.asarray(valid, bool),
        ),
        np.float64,
    )
