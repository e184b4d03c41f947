"""Parity of the Pallas LK Gauss-Newton backend with the XLA loop.

The Pallas kernel (ops/lk_pallas.py) must reproduce the XLA iteration
loop (ops/lk.py::_lk_level_all) — same prep, same per-iteration
formulas; only the summation layout differs (band shift-adds vs
interp-matrix matmuls), so positions may drift at f32-reassociation
scale.  Gate: status identical, live-track positions within 0.05 px
(the VERDICT round-3 contract for the Classic whale fix).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from comfyui_video_stabilizer_tpu.ops import lk as LK
from comfyui_video_stabilizer_tpu.ops import warp as W


def _tracking_fixture(seed=0, n=6, h=120, w=170):
    """Textured frames under known similarity shake + GFTT corners."""
    rng = np.random.default_rng(seed)
    base = rng.random((h + 60, w + 60)).astype(np.float32)
    # smooth a little so gradients are sane but keep texture
    base = 0.5 * base + 0.25 * (np.roll(base, 1, 0) + np.roll(base, 1, 1))
    mats = [np.eye(3)]
    for i in range(1, n):
        th = 0.005 * np.sin(i / 1.5)
        d = np.array([
            [np.cos(th), -np.sin(th), 2.5 * np.sin(i)],
            [np.sin(th), np.cos(th), 2.0 * np.cos(1.3 * i)],
            [0, 0, 1.0],
        ])
        mats.append(d @ mats[-1])
    crop = np.eye(3)
    crop[0, 2] = crop[1, 2] = -30
    view = np.stack([crop @ np.linalg.inv(m) for m in mats])
    rgb = np.repeat(base[..., None], 3, axis=-1)
    frames = np.asarray(
        W.warp_clip(np.repeat(rgb[None], n, 0), view, (w, h), "bilinear", (0.5, 0.5, 0.5))
    )
    grays = np.asarray(jnp.einsum("nhwc,c->nhw", jnp.asarray(frames),
                                  jnp.asarray([0.299, 0.587, 0.114], jnp.float32))) * 255.0
    grays = np.floor(grays)
    return grays


def _run_level(fn, I, J, pts, guess, valid, is_level0, **kw):
    g, status = fn(
        jnp.asarray(I), jnp.asarray(J), jnp.asarray(pts), jnp.asarray(guess),
        jnp.asarray(valid), LK.WIN, LK.MAX_ITERS, LK.EPS, is_level0, **kw
    )
    return np.asarray(g), np.asarray(status)


@pytest.mark.parametrize("is_level0", [False, True])
def test_pallas_level_matches_xla_loop(is_level0):
    grays = _tracking_fixture()
    pts, counts = map(np.asarray, LK.gftt_batch(grays[:-1]))
    b, f = pts.shape[:2]
    valid = np.arange(f)[None, :] < counts[:, None]
    I = grays[:-1]
    J = grays[1:]
    rng = np.random.default_rng(1)
    guess = pts + rng.uniform(-3, 3, pts.shape).astype(np.float32)

    g_ref, s_ref = _run_level(LK._lk_level_all, I, J, pts, guess, valid, is_level0)
    g_pal, s_pal = _run_level(
        LK._lk_level_all_pallas, I, J, pts, guess, valid, is_level0, interpret=True
    )

    live = np.asarray(valid) & (s_ref if is_level0 else np.ones_like(s_ref))
    assert (s_ref == s_pal).mean() > 0.995, (s_ref != s_pal).sum()
    agree = s_ref & s_pal & live
    assert agree.sum() > 0.5 * live.sum()
    dd = np.abs(g_ref - g_pal)[agree]
    assert dd.max() < 0.05, float(dd.max())


def test_lk_track_end_to_end_matches(monkeypatch):
    """Full pyramid tracking: force the Pallas backend (interpret mode)
    and compare against the XLA backend through lk_track."""
    grays = _tracking_fixture(seed=2)
    pts, counts = map(np.asarray, LK.gftt_batch(grays[:-1]))
    pyr = LK.gaussian_pyramid(grays)
    prev = [lvl[:-1] for lvl in pyr]
    curr = [lvl[1:] for lvl in pyr]

    t_ref, s_ref = LK.lk_track(prev, curr, pts, counts)
    t_ref, s_ref = np.asarray(t_ref), np.asarray(s_ref)

    import functools
    monkeypatch.setattr(LK, "_use_pallas_lk", lambda: True)
    monkeypatch.setattr(
        LK, "_lk_level_all_pallas",
        functools.partial(LK._lk_level_all_pallas, interpret=True),
    )
    t_pal, s_pal = LK.lk_track(prev, curr, pts, counts)
    t_pal, s_pal = np.asarray(t_pal), np.asarray(s_pal)

    assert (s_ref == s_pal).mean() > 0.99, (s_ref != s_pal).sum()
    both = s_ref & s_pal
    dd = np.abs(t_ref - t_pal)[both]
    assert dd.max() < 0.05, float(dd.max())
