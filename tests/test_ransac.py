"""RANSAC robustness under sparse validity masks.

The classic path pads its track arrays to max_corners with
status=false, so RANSAC routinely sees point arrays where only a
fraction of slots is valid.  Hypothesis sampling must draw from the
valid subset (advisor round-2 finding: raw-index sampling kept only
f^m of the 512-hypothesis budget at valid fraction f — ~2 surviving
perspective hypotheses at f=0.25).
Reference semantics: cv2.findHomography / estimateAffinePartial2D are
handed already-compacted arrays (/root/reference/nodes/
video_stabilizer_classic.py:97-141), i.e. an effective valid
fraction of 1.0 regardless of tracking yield.
"""

import numpy as np
import pytest

from comfyui_video_stabilizer_tpu.ops import ransac


def _make_pair(model, n_valid, n_slots, outlier_frac, seed=0):
    rng = np.random.default_rng(seed)
    p = rng.uniform(40, 900, size=(n_slots, 2)).astype(np.float32)
    theta, s, tx, ty = 0.02, 1.01, 6.5, -3.25
    if model == "similarity":
        M = np.array([
            [s * np.cos(theta), -s * np.sin(theta), tx],
            [s * np.sin(theta), s * np.cos(theta), ty],
            [0, 0, 1],
        ])
    else:
        M = np.array([
            [s * np.cos(theta), -s * np.sin(theta), tx],
            [s * np.sin(theta), s * np.cos(theta), ty],
            [2e-5, -1e-5, 1],
        ])
    hom = np.concatenate([p, np.ones((n_slots, 1), np.float32)], axis=1) @ M.T
    q = (hom[:, :2] / hom[:, 2:3]).astype(np.float32)
    q += rng.normal(0, 0.3, size=q.shape).astype(np.float32)
    n_out = int(n_valid * outlier_frac)
    out_idx = rng.choice(n_valid, size=n_out, replace=False)
    q[out_idx] += rng.uniform(30, 80, size=(n_out, 2)).astype(np.float32)
    valid = np.zeros(n_slots, bool)
    valid[:n_valid] = True
    # scatter the valid slots through the array (padding is interleaved
    # in practice when features die mid-track)
    perm = rng.permutation(n_slots)
    return p[perm], q[perm], valid[perm], M


@pytest.mark.parametrize("model", ["similarity", "perspective"])
def test_sparse_validity_keeps_fit_quality(model):
    """25%-valid arrays must fit as well as fully-compacted ones."""
    n_valid, n_slots = 100, 400
    p, q, valid, M_true = _make_pair(model, n_valid, n_slots, outlier_frac=0.3)

    H_sparse, n_in_sparse, n_valid_out = ransac.fit_model_batch(
        p[None], q[None], valid[None], model)
    # same points, compacted (valid fraction 1.0) — the easy case
    sel = np.where(valid)[0]
    H_dense, n_in_dense, _ = ransac.fit_model_batch(
        p[sel][None], q[sel][None], np.ones((1, len(sel)), bool), model)

    assert int(n_valid_out[0]) == n_valid
    # both runs must find (essentially) the full inlier set
    assert int(n_in_sparse[0]) >= 0.85 * int(n_in_dense[0])
    # and the recovered matrix must match the ground truth
    corners = np.array([[0, 0], [960, 0], [0, 540], [960, 540], [480, 270]], np.float64)

    def proj(M, pts):
        h = np.concatenate([pts, np.ones((len(pts), 1))], axis=1) @ np.asarray(M, np.float64).T
        return h[:, :2] / h[:, 2:3]

    err = np.abs(proj(H_sparse[0], corners) - proj(M_true, corners)).max()
    assert err < 1.0, f"corner error {err} px at 25% validity"


def test_all_invalid_returns_identity_scale_fit():
    """vcount < m pairs must not produce garbage matrices."""
    p = np.random.default_rng(0).uniform(0, 100, (1, 64, 2)).astype(np.float32)
    q = p + 1.0
    valid = np.zeros((1, 64), bool)
    H, n_in, n_valid = ransac.fit_model_batch(p, q, valid, "perspective")
    assert np.isfinite(H).all()
    assert int(n_valid[0]) == 0
