"""Pallas warp kernel: exact equivalence with the XLA reference path.

Runs in Pallas interpret mode on CPU; the same kernel runs compiled on
TPU (device smoke test lives in scripts/device_smoke.py).
"""

import numpy as np
import pytest

from comfyui_video_stabilizer_tpu.ops import warp as W
from comfyui_video_stabilizer_tpu.ops import warp_pallas as WP


def _frames(n=2, h=96, w=160, seed=0):
    rng = np.random.default_rng(seed)
    return rng.random((n, h, w, 3), dtype=np.float32)


def _mats(n, seed=1, rot=0.01, t=8.0, persp=0.0):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        th = rng.uniform(-rot, rot)
        s = np.exp(rng.uniform(-0.01, 0.01))
        tx, ty = rng.uniform(-t, t, 2)
        m = np.array(
            [
                [s * np.cos(th), -s * np.sin(th), tx],
                [s * np.sin(th), s * np.cos(th), ty],
                [persp, -persp / 2, 1.0],
            ]
        )
        out.append(m)
    return np.stack(out)


def _run_both(frames, mats, out_size, interp, border):
    coeffs = W.prepare_inverse_coeffs(mats)
    pallas_out = WP.warp_clip_pallas(
        frames, mats, coeffs, out_size, interp, border, interpret=True
    )
    assert pallas_out is not None, "pallas path unexpectedly rejected config"
    xla_out = np.asarray(
        W._warp_xla(frames, coeffs.astype(np.float32), np.asarray(border, np.float32),
                    out_size[1], out_size[0], interp)
    )
    return pallas_out, xla_out


@pytest.mark.parametrize("interp", ["bilinear", "bicubic"])
def test_pallas_matches_xla(interp):
    frames = _frames()
    n, h, w = frames.shape[:3]
    mats = _mats(n)
    ours, ref = _run_both(frames, mats, (w, h), interp, (0.2, 0.4, 0.6))
    np.testing.assert_allclose(ours, ref, atol=2e-6)


def test_pallas_expand_canvas():
    frames = _frames(n=2)
    n, h, w = frames.shape[:3]
    mats = _mats(n, seed=3)
    shift = np.eye(3)
    shift[0, 2], shift[1, 2] = 31.0, 17.0
    mats = np.einsum("ij,njk->nik", shift, mats)
    out_size = (w + 64, h + 40)
    ours, ref = _run_both(frames, mats, out_size, "bilinear", (0, 0, 0))
    np.testing.assert_allclose(ours, ref, atol=2e-6)


def test_pallas_perspective():
    frames = _frames(n=2, h=128, w=192)
    n, h, w = frames.shape[:3]
    mats = _mats(n, seed=5, persp=2e-5)
    ours, ref = _run_both(frames, mats, (w, h), "bilinear", (0.5, 0.5, 0.5))
    np.testing.assert_allclose(ours, ref, atol=2e-6)


def test_pallas_identity_exact():
    frames = _frames(n=2)
    n, h, w = frames.shape[:3]
    mats = np.stack([np.eye(3)] * n)
    coeffs = W.prepare_inverse_coeffs(mats)
    out = WP.warp_clip_pallas(frames, mats, coeffs, (w, h), "bilinear",
                              (0, 0, 0), interpret=True)
    np.testing.assert_array_equal(out, frames)


def test_pallas_rejects_wild_warp():
    frames = _frames(n=1)
    n, h, w = frames.shape[:3]
    mats = np.array([[[3.0, 0, 0], [0, 3.0, 0], [0, 0, 1.0]]])  # 3x zoom-out
    coeffs = W.prepare_inverse_coeffs(mats)
    out = WP.warp_clip_pallas(frames, mats, coeffs, (w, h), "bilinear",
                              (0, 0, 0), interpret=True)
    assert out is None  # displacement span exceeds the largest K variant


@pytest.mark.parametrize("interp", ["bilinear", "bicubic"])
def test_pallas_large_translation_clamp_band(interp):
    """Origin-clamp regression: translations that push the source window
    against the padded image edge must not drop valid edge taps.

    With the old partial-pad geometry, a pure +dy translation of
    120..127 px on a 128-row clip engaged the bottom origin clamp while
    valid taps remained, replacing up to ~1024 pixels with border color
    (advisor round-2 finding).  The full-residual rolls now keep
    in-image taps on their true window slots whenever a clamp engages
    (see _geometry's invariant note).
    """
    frames = _frames(n=1, h=128, w=256, seed=7)
    h, w = frames.shape[1:3]
    for dy in (120, 123, 125, 127, -123, -127):
        m = np.eye(3)
        m[1, 2] = float(dy)
        mats = m[None]
        ours, ref = _run_both(frames, mats, (w, h), interp, (0.5, 0.25, 0.125))
        np.testing.assert_allclose(
            ours, ref, atol=2e-6,
            err_msg=f"clamp-band mismatch at dy={dy} interp={interp}")


def test_pallas_blur_matches_xla_blur():
    """Fused shutter-blur scan == per-sample XLA warps averaged."""
    frames = _frames(n=2, h=96, w=160)
    n, h, w = frames.shape[:3]
    s = 5
    base = _mats(n, seed=3, rot=0.008, t=5.0)
    nxt = _mats(n, seed=4, rot=0.008, t=5.0)
    ts = np.linspace(0.0, 0.5, s)
    sample_mats = np.stack([base + (nxt - base) * t for t in ts], axis=1)  # (N,S,3,3)
    coeffs = W.prepare_inverse_coeffs(sample_mats.reshape(n * s, 3, 3)).reshape(n, s, 8)
    border = (0.25, 0.5, 0.75)

    fused = WP.warp_clip_blur_pallas(frames, coeffs, (w, h), "bilinear", border,
                                     interpret=True)
    assert fused is not None

    ref = None
    for k in range(s):
        wk = np.asarray(W._warp_xla(
            frames, W.prepare_inverse_coeffs(sample_mats[:, k]).astype(np.float32),
            np.asarray(border, np.float32), h, w, "bilinear"))
        ref = wk if ref is None else ref + wk
    ref = ref / s
    np.testing.assert_allclose(np.asarray(fused), ref, atol=5e-6)


def test_pallas_minimal_pad_geometry_matches_xla():
    """The minimal (8, 128) pad geometry relies on full-residual rolls:
    parity must hold including at large translations where the origin
    clamps engage against the barely-padded image edges."""
    frames = _frames(n=2, h=256, w=640, seed=11)
    h, w = frames.shape[1:3]
    mats = _mats(2, seed=12, t=6.0)
    coeffs = W.prepare_inverse_coeffs(mats)
    plan = WP._plan(coeffs, h, w, h, w, cubic=False)
    assert plan is not None and plan["pad_y"] == 8 and plan["pad_x"] == 128
    for interp in ("bilinear", "bicubic"):
        ours, ref = _run_both(frames, mats, (w, h), interp, (0.3, 0.6, 0.9))
        np.testing.assert_allclose(ours, ref, atol=2e-6)
    # clamp band: push the window against every image edge
    for dy, dx in ((250, 0), (-250, 0), (0, 630), (0, -630), (250, -630)):
        m = np.eye(3)
        m[1, 2], m[0, 2] = float(dy), float(dx)
        ours, ref = _run_both(frames[:1], m[None], (w, h), "bilinear",
                              (0.5, 0.25, 0.125))
        np.testing.assert_allclose(
            np.asarray(ours), ref, atol=2e-6,
            err_msg=f"min-pad clamp mismatch at dy={dy} dx={dx}")


@pytest.mark.parametrize("rot", [0.002, 0.02])
def test_pallas_fast_tap_branch_speculative_plan(rot):
    """Per-tile fast/slow tap branches under a forced k=6 plan.

    The kernel folds each tile's minimum tap offset into the alignment
    rolls and runs a reduced (taps+2)^2 tap loop when the tile's actual
    offset spread fits (exact-by-construction: skipped taps carry zero
    weight).  rot=0.002 drives the fast branch on every tile; rot=0.02
    pushes some tiles' spread past k_fast so both branches execute in
    one clip.  Mirrors the fastpath's speculative k=6/64x256 dispatch
    (models/fastpath.py::_speculative_plan).
    """
    import jax.numpy as jnp

    frames = _frames(n=2, h=192, w=512, seed=21)
    n, h, w = frames.shape[:3]
    mats = _mats(n, seed=22, rot=rot, t=10.0)
    coeffs = W.prepare_inverse_coeffs(mats)
    k, th, tw = 6, 64, 256
    n_th, n_tw, wh, ww, pad_y, pad_x = WP._geometry(k, th, tw, h, w, h, w)
    span = WP._max_tile_span(coeffs, th, tw, n_th, n_tw, affine=True)
    if rot >= 0.02:
        assert span + 2 > 4, "slow-branch case no longer exercises slow taps"
    assert span + 1 + 2 <= k, "test warp no longer fits the forced plan"
    ours = WP._warp_pallas_call(
        jnp.asarray(frames), jnp.asarray(coeffs, jnp.float32).reshape(-1),
        jnp.asarray([0.2, 0.4, 0.6], jnp.float32),
        out_h=h, out_w=w, th=th, tw=tw, wh=wh, ww=ww, k=k,
        n_th=n_th, n_tw=n_tw, in_h=h, in_w=w, pad_y=pad_y, pad_x=pad_x,
        channels=3, interp="bilinear", affine=True, interpret=True)
    ref = np.asarray(
        W._warp_xla(frames, coeffs.astype(np.float32),
                    np.asarray([0.2, 0.4, 0.6], np.float32), h, w, "bilinear"))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-6)
