"""TV-L1 middle flow tier: ground-truth EPE + edge-preservation gates.

cv2.optflow (the reference's TV-L1 provider) is not installable in this
environment — the exact contingency the reference degrades around — so
the oracle is synthetic known motion.  The hard-scene test is the one
TV-L1 exists for: an independently moving object whose motion boundary
patch-aggregated estimators blur away.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from comfyui_video_stabilizer_tpu.ops import tvl1 as TV
from comfyui_video_stabilizer_tpu.ops import warp as W


def _texture(h, w, seed):
    """Multi-octave value noise: trackable structure at every pyramid
    level (pure per-pixel noise has a ~1 px correlation basin, outside
    which any gradient-based data term — cv2's TV-L1 included — cannot
    lock on)."""
    import jax.image

    rng = np.random.default_rng(seed)
    out = np.zeros((h, w), np.float32)
    for octave, amp in ((2, 0.2), (8, 0.35), (32, 0.45)):
        coarse = rng.random((h // octave + 2, w // octave + 2)).astype(np.float32)
        up = np.asarray(jax.image.resize(jnp.asarray(coarse), (h, w), "bilinear"))
        out += amp * up
    out -= out.min()
    return out / max(out.max(), 1e-6)


def test_tvl1_recovers_global_translation():
    h, w = 128, 192
    pad = 16
    base = _texture(h + 2 * pad, w + 2 * pad, 0) * 255.0
    tx, ty = 2.3, -1.6
    I = base[pad : pad + h, pad : pad + w]
    rgb = np.repeat(base[None, :, :, None], 3, axis=-1)
    J = np.asarray(W.warp_clip(
        rgb,
        np.array([[[1, 0, -tx], [0, 1, -ty], [0, 0, 1.0]]]),
        (w + 2 * pad, h + 2 * pad), "bilinear", (127.5, 127.5, 127.5),
    ))[0, pad : pad + h, pad : pad + w, 0]
    # J(x) = base(x + t)  =>  flow I->J is -t ... construct directly:
    # frame0 = base crop, frame1 = base shifted so content moves by (tx, ty)
    grays = np.stack([I, J])
    flow, conf = TV.tvl1_flow(grays)
    flow = np.asarray(flow)
    m = 12  # ignore border band
    inner = flow[0, m:-m, m:-m]
    err = np.sqrt((inner[..., 0] - (-tx)) ** 2 + (inner[..., 1] - (-ty)) ** 2)
    assert np.median(err) < 0.25, float(np.median(err))
    assert np.quantile(err, 0.9) < 0.6, float(np.quantile(err, 0.9))


def test_tvl1_hard_scene_preserves_motion_discontinuity():
    """Moving block over a moving background: the TV prior must keep
    BOTH motions, with a sharp boundary — the property the reference's
    TV-L1 tier adds over patch-aggregated DIS."""
    h, w = 144, 208
    bg = _texture(h, w, 1) * 255.0
    fg = _texture(h, w, 2) * 255.0
    bx, by = 40, 48        # block origin
    bs = 56                # block size
    tb = np.array([2.0, 1.0])    # background motion (I -> J)
    tf = np.array([-3.0, 2.0])   # block motion

    def scene(shift_bg, shift_fg):
        img = np.roll(np.roll(bg, int(shift_bg[1]), 0), int(shift_bg[0]), 1).copy()
        block = np.roll(np.roll(fg, int(shift_fg[1]), 0), int(shift_fg[0]), 1)
        x0, y0 = bx + int(shift_fg[0]), by + int(shift_fg[1])
        img[y0 : y0 + bs, x0 : x0 + bs] = block[y0 : y0 + bs, x0 : x0 + bs]
        return img

    I = scene((0, 0), (0, 0))
    J = scene(tb, tf)
    flow, _ = TV.tvl1_flow(np.stack([I, J]))
    flow = np.asarray(flow)[0]

    # background region well away from the block
    bg_mask = np.ones((h, w), bool)
    bg_mask[max(0, by - 16) : by + bs + 20, max(0, bx - 16) : bx + bs + 20] = False
    bg_mask[:10] = bg_mask[-10:] = False
    bg_mask[:, :10] = bg_mask[:, -10:] = False
    bg_err = np.sqrt((flow[..., 0] - tb[0]) ** 2 + (flow[..., 1] - tb[1]) ** 2)[bg_mask]
    assert np.median(bg_err) < 0.3, float(np.median(bg_err))

    # block interior (shrunk to avoid the boundary band)
    fg_region = flow[by + 14 : by + bs - 10, bx + 14 : bx + bs - 10]
    fg_err = np.sqrt((fg_region[..., 0] - tf[0]) ** 2 + (fg_region[..., 1] - tf[1]) ** 2)
    assert np.median(fg_err) < 1.0, float(np.median(fg_err))

    # the two motions stay separated: median block flow is far from the
    # background motion (a blurred/global-only solver would pull it in)
    med_fg = np.median(fg_region.reshape(-1, 2), axis=0)
    assert np.linalg.norm(med_fg - tb) > 2.5, med_fg


def test_tvl1_backend_chain_integration():
    """flow_estimator degrades DIS -> TVL1 -> phase correlation."""
    from comfyui_video_stabilizer_tpu.models import flow as MF

    grays = np.stack([
        _texture(64, 96, 3) * 255.0,
        np.roll(_texture(64, 96, 3) * 255.0, 2, axis=1),
    ])
    orig = MF.FD.dis_flow_fit
    try:
        def boom(*a, **k):
            raise RuntimeError("forced DIS failure")
        MF.FD.dis_flow_fit = boom
        fits = MF.flow_estimator(grays, "similarity")
        assert fits.extra_meta["flow_backend"] == "TVL1", fits.extra_meta
        assert "similarity" in fits.matrices
        t = fits.matrices["similarity"][0] if "similarity" in fits.matrices else None
        assert np.isfinite(fits.matrices["translation"]).all()
        # the translation fallback matrix reflects the 2px x-shift
        assert abs(fits.matrices["translation"][0, 0, 2] - 2.0) < 0.75
    finally:
        MF.FD.dis_flow_fit = orig
