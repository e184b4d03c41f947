"""Zero-sync fast path (models/fastpath.py) vs the exact host engine.

The fast path moves sticky-mode selection, trajectory integration,
fps smoothing and the crop_and_pad recenter onto the device in float32
and inverts the final matrices on device.  Forced on here via
CVST_FASTPATH=1 (the CPU default keeps the host path and its bit-exact
replay contract); the gates below bound the f32-vs-f64 drift far under
the 1e-3 oracle contract (BASELINE.md).
"""

import numpy as np
import pytest

from comfyui_video_stabilizer_tpu.models import flow as FL
from comfyui_video_stabilizer_tpu.models import motion_apply as MA
from comfyui_video_stabilizer_tpu.ops import warp as W
from comfyui_video_stabilizer_tpu.utils.video_io import normalize_video_input

GRAY = (127, 127, 127)


@pytest.fixture()
def fastpath_on(monkeypatch):
    monkeypatch.setenv("CVST_FASTPATH", "1")
    monkeypatch.setenv("CVST_FASTPATH_STRICT", "1")
    # the fast path must actually RUN (None would silently compare
    # host-vs-host below)
    from comfyui_video_stabilizer_tpu.models import fastpath as FP

    taken = {"n": 0}
    orig = FP.run_flow_fast

    def spy(*a, **k):
        r = orig(*a, **k)
        if r is not None:
            taken["n"] += 1
        return r

    monkeypatch.setattr(FP, "run_flow_fast", spy)
    import comfyui_video_stabilizer_tpu.models.flow as _FL

    def hook(frames, *a, **k):
        return spy(frames, *a, **k)

    monkeypatch.setattr(_FL.flow_estimator, "fast_path", hook,
                        raising=False)
    yield taken


def _shaken_clip(n=8, h=144, w=256, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.random((h + 80, w + 80), np.float32)
    base = 0.5 * base + 0.25 * (np.roll(base, 1, 0) + np.roll(base, 1, 1))
    img = np.stack([base, base * 0.8 + 0.1, 1.0 - base], axis=-1)
    mats = [np.eye(3)]
    for i in range(1, n):
        th = rng.uniform(-0.008, 0.008)
        t = rng.uniform(-2.5, 2.5, 2)
        d = np.array([[np.cos(th), -np.sin(th), t[0]],
                      [np.sin(th), np.cos(th), t[1]], [0, 0, 1.0]])
        mats.append(d @ mats[-1])
    crop = np.eye(3)
    crop[0, 2] = crop[1, 2] = -40
    view = np.stack([crop @ np.linalg.inv(m) for m in mats])
    frames = np.asarray(W.warp_clip(
        np.repeat(np.clip(img, 0, 1)[None], n, 0), view, (w, h), "bilinear",
        (0.5, 0.5, 0.5)))
    return frames


def _run(frames, **kw):
    import jax.numpy as jnp

    args = dict(framing_mode="crop_and_pad", transform_mode="similarity",
                camera_lock=False, strength=0.8, smooth=0.6, keep_fov=0.6,
                padding_rgb=GRAY, frame_rate=24.0)
    args.update(kw)
    ctx = normalize_video_input(jnp.asarray(frames))
    return FL.stabilize_flow(ctx, **args)


@pytest.mark.parametrize("mode,lock", [("similarity", False),
                                       ("translation", False),
                                       ("perspective", False),
                                       ("similarity", True)])
def test_fastpath_matches_host_engine(fastpath_on, monkeypatch, mode, lock):
    frames = _shaken_clip(seed=3)
    res_fast = _run(frames, transform_mode=mode, camera_lock=lock)
    assert fastpath_on["n"] == 1, "fast path did not run"
    monkeypatch.setenv("CVST_FASTPATH", "0")
    res_host = _run(frames, transform_mode=mode, camera_lock=lock)

    # same pipeline decisions
    mh = res_host.meta
    mf = res_fast.meta
    assert mf["transform_mode_applied"] == mh["transform_mode_applied"]
    assert [t["mode"] for t in mf["estimated_motion"]["per_transition"]] == \
        [t["mode"] for t in mh["estimated_motion"]["per_transition"]]
    assert mf["flow_backend"] == "DIS"
    assert set(mf["framing"].keys()) == set(mh["framing"].keys())

    # f32 trajectory vs f64: matrices and paths agree to ~1e-4
    np.testing.assert_allclose(
        np.asarray(mf["estimated_motion"]["path"]),
        np.asarray(mh["estimated_motion"]["path"]), atol=1e-3)
    fa = np.array([f["applied_matrix"] for f in mf["stabilization_warp"]["per_frame"]])
    ha = np.array([f["applied_matrix"] for f in mh["stabilization_warp"]["per_frame"]])
    np.testing.assert_allclose(fa, ha, atol=2e-3)

    # pixel output within the oracle contract
    df = np.asarray(res_fast.frames, np.float32)
    dh = np.asarray(res_host.frames, np.float32)
    assert np.abs(df - dh).max() < 1e-2
    assert np.quantile(np.abs(df - dh), 0.99) < 1e-3
    np.testing.assert_allclose(np.asarray(res_fast.masks),
                               np.asarray(res_host.masks), atol=1e-3)


def test_fastpath_replay_round_trip(fastpath_on):
    """Motion Apply replay of fast-path meta reproduces the fast-path
    output (host f64 re-inversion of the fetched f32 matrices agrees
    with the device Newton inverse to ~1 ulp -> sub-1e-4-px warps)."""
    frames = _shaken_clip(seed=5)
    res = _run(frames)
    assert fastpath_on["n"] == 1, "fast path did not run"
    import jax.numpy as jnp
    replay = MA.apply_motion(
        normalize_video_input(jnp.asarray(frames)), res.meta, GRAY)
    d = np.abs(np.asarray(replay.frames, np.float32)
               - np.asarray(res.frames, np.float32))
    assert d.max() < 1e-3, float(d.max())
    dm = np.abs(np.asarray(replay.masks) - np.asarray(res.masks))
    assert dm.max() < 1e-3


@pytest.mark.parametrize("kf,mode", [(0.6, "similarity"),
                                     (0.85, "similarity"),
                                     (0.0, "similarity"),
                                     (0.6, "perspective")])
def test_fastpath_crop_matches_host_solver(fastpath_on, monkeypatch, kf, mode):
    """Crop framing runs the device keep_fov solver + no-padding refine
    (models/fastpath.py::_traj_program crop branch + _crop_finalize) and
    must reproduce the host solver's statuses and geometry.  The binary
    search midpoints are dyadic (exact in f32) so the selected scale is
    bit-equal unless a ratio comparison lands within f32 noise of the
    target; the refine rectangle is pure int32 and may differ by a pixel
    only where the f32 coverage mask flips a border pixel."""
    frames = _shaken_clip(seed=11)
    res_fast = _run(frames, framing_mode="crop", keep_fov=kf,
                    transform_mode=mode)
    assert fastpath_on["n"] == 1, "crop fast path did not run"
    monkeypatch.setenv("CVST_FASTPATH", "0")
    res_host = _run(frames, framing_mode="crop", keep_fov=kf,
                    transform_mode=mode)

    ff = res_fast.meta["framing"]
    fh = res_host.meta["framing"]
    assert set(ff.keys()) == set(fh.keys())
    assert ff["keep_fov_status"] == fh["keep_fov_status"]
    assert ff["keep_fov_effective"] == fh["keep_fov_effective"]
    assert ff.get("keep_fov_note") == fh.get("keep_fov_note")
    np.testing.assert_allclose(ff["stabilization_scale"],
                               fh["stabilization_scale"], atol=1e-3)
    np.testing.assert_allclose(ff["crop_origin"], fh["crop_origin"], atol=2.0)
    np.testing.assert_allclose(ff["crop_size"], fh["crop_size"], atol=3.0)

    fa = np.array([f["applied_matrix"]
                   for f in res_fast.meta["stabilization_warp"]["per_frame"]])
    ha = np.array([f["applied_matrix"]
                   for f in res_host.meta["stabilization_warp"]["per_frame"]])
    # the crop matrix scales translations by ~width/crop_w; compare at
    # pixel scale
    np.testing.assert_allclose(fa, ha, atol=5e-2)

    df = np.asarray(res_fast.frames, np.float32)
    dh = np.asarray(res_host.frames, np.float32)
    # a +-1 px rectangle difference moves edge pixels; gate the bulk
    assert np.quantile(np.abs(df - dh), 0.99) < 2e-2, \
        float(np.quantile(np.abs(df - dh), 0.99))

    # the whole point of crop framing: no padding in the output
    assert res_fast.meta["padding_fraction_max"] <= \
        res_host.meta["padding_fraction_max"] + 1e-4


def test_fastpath_crop_defers_keep_fov_bypass(fastpath_on):
    """keep_fov~=1 returns original frames through the host bypass; the
    fast path must not engage (models/stabilize.py crop early-out)."""
    frames = _shaken_clip(n=6, seed=7)
    res = _run(frames, framing_mode="crop", keep_fov=1.0)
    assert fastpath_on["n"] == 0, "fast path must not engage for keep_fov~=1"
    assert res.meta["framing"]["mode"] == "crop"
    np.testing.assert_array_equal(np.asarray(res.frames, np.float32), frames)
    assert res.meta["padding_fraction_max"] <= 1e-6


def test_fastpath_expand_matches_host_engine(fastpath_on, monkeypatch):
    """Expand framing through the speculative-bucket fast path: same
    canvas size, same matrices, pixels/masks within the oracle gates
    (mirrors the crop_and_pad gates above)."""
    frames = _shaken_clip(seed=3)
    res_fast = _run(frames, framing_mode="expand")
    assert fastpath_on["n"] == 1, "expand fast path did not run"
    monkeypatch.setenv("CVST_FASTPATH", "0")
    res_host = _run(frames, framing_mode="expand")

    mh, mf = res_host.meta, res_fast.meta
    assert mf["framing"]["expanded_size"] == mh["framing"]["expanded_size"]
    assert set(mf["framing"].keys()) == set(mh["framing"].keys())
    assert [t["mode"] for t in mf["estimated_motion"]["per_transition"]] == \
        [t["mode"] for t in mh["estimated_motion"]["per_transition"]]
    fa = np.array([f["applied_matrix"] for f in mf["stabilization_warp"]["per_frame"]])
    ha = np.array([f["applied_matrix"] for f in mh["stabilization_warp"]["per_frame"]])
    np.testing.assert_allclose(fa, ha, atol=2e-3)
    assert mf["stabilization_warp"]["output_size"] == mh["stabilization_warp"]["output_size"]

    df = np.asarray(res_fast.frames, np.float32)
    dh = np.asarray(res_host.frames, np.float32)
    assert df.shape == dh.shape
    assert np.abs(df - dh).max() < 1e-2
    assert np.quantile(np.abs(df - dh), 0.99) < 1e-3
    np.testing.assert_allclose(np.asarray(res_fast.masks),
                               np.asarray(res_host.masks), atol=1e-3)
    assert abs(mf["padding_fraction_mean"] - mh["padding_fraction_mean"]) < 1e-3

    # replay bit-consistency: Motion Apply on the fast-path meta must
    # reproduce the fast-path expand output
    replay = MA.apply_motion(
        normalize_video_input(np.asarray(frames)), mf, GRAY,
        framing_mode="expand")
    assert np.asarray(replay.frames).shape == df.shape


def test_fastpath_expand_pallas_planar_path(fastpath_on, monkeypatch):
    """The device expand route takes the Pallas warp's planar output
    and fuses the canvas slice into the NHWC transpose — drive it in
    interpret mode and gate against the host engine."""
    import comfyui_video_stabilizer_tpu.ops.warp as OW
    import comfyui_video_stabilizer_tpu.ops.warp_pallas as OWP

    monkeypatch.setattr(OW, "_use_pallas", lambda interp: True)
    real_call = OWP._warp_pallas_call
    seen = {}

    def interp_call(*a, **k):
        k["interpret"] = True
        seen["planar"] = k.get("planar")
        return real_call(*a, **k)

    monkeypatch.setattr(OWP, "_warp_pallas_call", interp_call)
    frames = _shaken_clip(seed=3)
    res_fast = _run(frames, framing_mode="expand")
    assert fastpath_on["n"] == 1
    assert seen.get("planar") is True
    monkeypatch.setenv("CVST_FASTPATH", "0")
    res_host = _run(frames, framing_mode="expand")
    df = np.asarray(res_fast.frames, np.float32)
    dh = np.asarray(res_host.frames, np.float32)
    assert df.shape == dh.shape
    assert np.quantile(np.abs(df - dh), 0.99) < 1e-3
    assert np.asarray(res_fast.masks).shape == np.asarray(res_host.masks).shape


def test_fastpath_expand_bucket_miss_rewarps_exact(fastpath_on, monkeypatch):
    """Corrections beyond EXPAND_MARGIN_PX must miss the bucket guard
    and re-warp at the exact canvas on the host planner."""
    from comfyui_video_stabilizer_tpu.models import fastpath as FP

    monkeypatch.setattr(FP, "EXPAND_MARGIN_PX", 0)
    frames = _shaken_clip(seed=3)
    res_fast = _run(frames, framing_mode="expand")
    assert fastpath_on["n"] == 1
    monkeypatch.setenv("CVST_FASTPATH", "0")
    res_host = _run(frames, framing_mode="expand")
    assert res_fast.meta["framing"]["expanded_size"] == \
        res_host.meta["framing"]["expanded_size"]
    df = np.asarray(res_fast.frames, np.float32)
    dh = np.asarray(res_host.frames, np.float32)
    assert df.shape == dh.shape
    assert np.quantile(np.abs(df - dh), 0.99) < 1e-3


def test_fastpath_classic_matches_host_engine(monkeypatch):
    """Classic-estimator fast path vs host engine (same gates as flow)."""
    from comfyui_video_stabilizer_tpu.models import classic as C
    import jax.numpy as jnp

    monkeypatch.setenv("CVST_FASTPATH", "1")
    monkeypatch.setenv("CVST_FASTPATH_STRICT", "1")
    from comfyui_video_stabilizer_tpu.models import fastpath as FP

    taken = {"n": 0}
    orig = FP.run_classic_fast

    def spy(*a, **k):
        r = orig(*a, **k)
        if r is not None:
            taken["n"] += 1
        return r

    monkeypatch.setattr(FP, "run_classic_fast", spy)

    frames = _shaken_clip(seed=11)
    ctx = normalize_video_input(jnp.asarray(frames))
    res_fast = C.stabilize_classic(ctx, "crop_and_pad", "perspective", False,
                                   0.8, 0.6, 0.6, GRAY, 24.0)
    assert taken["n"] == 1, "classic fast path did not run"
    monkeypatch.setenv("CVST_FASTPATH", "0")
    res_host = C.stabilize_classic(ctx, "crop_and_pad", "perspective", False,
                                   0.8, 0.6, 0.6, GRAY, 24.0)

    mh, mf = res_host.meta, res_fast.meta
    assert mf["transform_mode_applied"] == mh["transform_mode_applied"]
    pt_f = mf["estimated_motion"]["per_transition"]
    pt_h = mh["estimated_motion"]["per_transition"]
    assert [t["mode"] for t in pt_f] == [t["mode"] for t in pt_h]
    assert ("residual" in pt_f[0]) == ("residual" in pt_h[0])
    np.testing.assert_allclose(
        np.asarray(mf["estimated_motion"]["path"]),
        np.asarray(mh["estimated_motion"]["path"]), atol=1e-3)
    df = np.asarray(res_fast.frames, np.float32)
    dh = np.asarray(res_host.frames, np.float32)
    assert np.abs(df - dh).max() < 1e-2
    assert np.quantile(np.abs(df - dh), 0.99) < 1e-3


def _fastpath_spy(monkeypatch):
    monkeypatch.setenv("CVST_FASTPATH", "1")
    monkeypatch.setenv("CVST_FASTPATH_STRICT", "1")
    from comfyui_video_stabilizer_tpu.models import fastpath as FP

    taken = {"n": 0}
    orig = FP.run_flow_fast

    def spy(*a, **k):
        r = orig(*a, **k)
        if r is not None:
            taken["n"] += 1
        return r

    monkeypatch.setattr(FP, "run_flow_fast", spy)
    return taken


def test_fastpath_engages_sharded(monkeypatch):
    """Under an active mesh with an evenly frame-shardable clip, the
    fast path now runs SHARDED (GSPMD estimation + trajectory, sharded
    warp) and must match the meshless host engine within the fast
    path's parity bounds."""
    import jax
    import numpy as np
    from jax.sharding import Mesh
    from comfyui_video_stabilizer_tpu.parallel import production as PR

    taken = _fastpath_spy(monkeypatch)
    devs = np.array(jax.devices()[:8]).reshape(8)
    mesh = Mesh(devs, ("data",))
    frames = _shaken_clip(n=8, h=64, w=96, seed=13)
    res = PR.stabilize_flow_sharded(frames, mesh)
    assert taken["n"] == 1, "fast path must engage under an even mesh"

    # reference: the SHARDED host engine (same mesh) — isolates the
    # fast-path f32 trajectory drift from the sharded estimation's own
    # f32 reassociation (which the production parity test bounds
    # separately, parallel/production.py::sharded_stabilize_flow_check)
    monkeypatch.setenv("CVST_FASTPATH", "0")
    ref = PR.stabilize_flow_sharded(frames, mesh)
    df = np.asarray(res.frames, np.float32)
    dh = np.asarray(ref.frames, np.float32)
    assert df.shape == dh.shape
    assert np.quantile(np.abs(df - dh), 0.99) < 1e-3
    pt_s = res.meta["estimated_motion"]["per_transition"]
    pt_r = ref.meta["estimated_motion"]["per_transition"]
    assert [e["mode"] for e in pt_s] == [e["mode"] for e in pt_r]


def test_fastpath_sharded_pallas_warp(monkeypatch):
    """The sharded fast path's Pallas warp runs through shard_map
    (warp_pallas_sharded) — forced here via interpret mode on the CPU
    mesh — and must agree with the host engine."""
    import jax
    import numpy as np
    from jax.sharding import Mesh
    from comfyui_video_stabilizer_tpu.parallel import production as PR
    import comfyui_video_stabilizer_tpu.ops.warp as OW
    import comfyui_video_stabilizer_tpu.ops.warp_pallas as OWP

    taken = _fastpath_spy(monkeypatch)
    monkeypatch.setattr(OW, "_use_pallas", lambda interp: True)
    real_call = OWP._warp_pallas_call
    seen = {"n": 0}

    def interp_call(*a, **k):
        k["interpret"] = True
        seen["n"] += 1
        return real_call(*a, **k)

    monkeypatch.setattr(OWP, "_warp_pallas_call", interp_call)
    devs = np.array(jax.devices()[:8]).reshape(8)
    mesh = Mesh(devs, ("data",))
    frames = _shaken_clip(n=8, h=64, w=96, seed=13)
    res = PR.stabilize_flow_sharded(frames, mesh)
    assert taken["n"] == 1, "fast path must engage under an even mesh"
    assert seen["n"] >= 1, "shard_map warp must reach _warp_pallas_call"

    monkeypatch.setenv("CVST_FASTPATH", "0")
    monkeypatch.setattr(OW, "_use_pallas", lambda interp: False)
    ref = PR.stabilize_flow_sharded(frames, mesh)
    df = np.asarray(res.frames, np.float32)
    dh = np.asarray(ref.frames, np.float32)
    assert df.shape == dh.shape
    assert np.quantile(np.abs(df - dh), 0.99) < 1e-3


def test_fastpath_defers_uneven_mesh(monkeypatch):
    """A clip whose frame count does not divide the mesh's data axis
    cannot frame-shard: the fast path must defer to the host engine
    (spatial-sharding fallback, parallel/production.py)."""
    import jax
    import numpy as np
    from jax.sharding import Mesh
    from comfyui_video_stabilizer_tpu.parallel import production as PR

    taken = _fastpath_spy(monkeypatch)
    devs = np.array(jax.devices()[:8]).reshape(8)
    mesh = Mesh(devs, ("data",))
    frames = _shaken_clip(n=9, h=64, w=96, seed=13)
    res = PR.stabilize_flow_sharded(frames, mesh)
    assert taken["n"] == 0, "fast path must not engage on an uneven clip"
    assert np.isfinite(np.asarray(res.frames)).all()


def test_ingest_matches_separate_programs():
    """The fused ingest must reproduce gray_for_estimation (quantized
    luma + integer-factor pool) and the padded planar source exactly."""
    import jax.numpy as jnp
    from comfyui_video_stabilizer_tpu.models import fastpath as FP
    from comfyui_video_stabilizer_tpu.ops import resize as R

    rng = np.random.default_rng(3)
    frames = jnp.asarray(rng.random((3, 64, 256, 3)).astype(np.float32))
    for ws, dec in ((None, 1), ((128, 32), 1), ((128, 32), 2)):
        factors = FP._gray_pool_factors(256, 64, ws, dec)
        assert factors is not None, (ws, dec)
        padded, gray = FP._ingest(frames, 8, 128, factors[0], factors[1])
        ref = np.asarray(R.gray_for_estimation(frames, ws, decimation=dec))
        np.testing.assert_array_equal(np.asarray(gray), ref)
        ref_p = np.pad(np.transpose(np.asarray(frames), (0, 3, 1, 2)),
                       ((0, 0), (0, 0), (8, 8), (128, 128)))
        np.testing.assert_array_equal(np.asarray(padded), ref_p)
    # non-integer working resize must refuse the pooled ingest
    assert FP._gray_pool_factors(1200, 500, (960, 400), 1) is None


def test_fastpath_guard_miss_rewarps_on_host(monkeypatch):
    """Corrections too wild for the speculative plan must trigger the
    warp-only host replan (trajectory kept), not garbage output."""
    import functools
    import jax.numpy as jnp
    import comfyui_video_stabilizer_tpu.ops.warp as OW
    import comfyui_video_stabilizer_tpu.ops.warp_pallas as OWP
    from comfyui_video_stabilizer_tpu.models import fastpath as FP

    monkeypatch.setenv("CVST_FASTPATH", "1")
    monkeypatch.setenv("CVST_FASTPATH_STRICT", "1")
    # pretend we're on an accelerator; the speculative Pallas call runs
    # in interpret mode on CPU
    monkeypatch.setattr(OW, "_use_pallas", lambda interp: True)
    real_call = OWP._warp_pallas_call
    calls = {"spec": 0, "stats": 0}

    def interp_call(*a, **k):
        calls["spec"] += 1
        k["interpret"] = True
        return real_call(*a, **k)

    monkeypatch.setattr(OWP, "_warp_pallas_call", interp_call)
    real_stats = OW.padding_mask_stats

    def spy_stats(*a, **k):
        calls["stats"] += 1
        return real_stats(*a, **k)

    monkeypatch.setattr(OW, "padding_mask_stats", spy_stats)

    # violent rotation shake: camera-lock corrections rotate ~0.2 rad,
    # far beyond every Pallas K variant (host planner falls to XLA)
    rng = np.random.default_rng(17)
    base = rng.random((304, 416), np.float32)
    img = np.stack([base, base * 0.7, 1.0 - base], -1)
    mats = [np.eye(3)]
    for i in range(1, 6):
        th = 0.2 if i % 2 else -0.2
        c = np.eye(3)
        c[:2, :2] = [[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]]
        mats.append(c @ mats[-1])
    crop = np.eye(3); crop[0, 2] = crop[1, 2] = -80
    view = np.stack([crop @ np.linalg.inv(m) for m in mats])
    frames = np.asarray(W.warp_clip(np.repeat(img[None], 6, 0), view,
                                    (256, 144), "bilinear", (0.5, 0.5, 0.5)))

    res_fast = _run(frames, camera_lock=True, strength=1.0)
    # the speculative call always runs once; the guard-miss replan goes
    # through the host planner, which may legitimately pick a different
    # Pallas K variant (second call) or the XLA path (no second call)
    assert calls["spec"] in (1, 2)
    assert calls["stats"] >= 1, "host replan must recompute mask stats"
    monkeypatch.setenv("CVST_FASTPATH", "0")
    res_host = _run(frames, camera_lock=True, strength=1.0)
    df = np.asarray(res_fast.frames, np.float32)
    dh = np.asarray(res_host.frames, np.float32)
    assert np.quantile(np.abs(df - dh), 0.99) < 5e-3
