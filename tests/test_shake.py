"""Shake generator contract tests: determinism, spectra, round-trips.

Mirrors the reference's validation strategy
(/root/reference/scripts/check_motion_meta.py:198-311): spectral
assertions instead of golden arrays, determinism by exact JSON
equality, first-frame identity, recipe round-trips.
"""

import json

import numpy as np
import pytest

from comfyui_video_stabilizer_tpu.meta.motion_meta import resolve_motion_meta, validate_motion_meta
from comfyui_video_stabilizer_tpu.models import shake as S


def _meta(style="handheld", seed=0, frames=96, fps=16.0, w=320, h=240, **kw):
    return S.generate_shake_motion_meta(
        recipe=S.STYLES[style],
        frame_count=frames,
        width=w,
        height=h,
        fps=fps,
        amount=kw.pop("amount", 1.0),
        speed=kw.pop("speed", 1.0),
        seed=seed,
        node="shake_generator",
        style=style,
    )


def test_deterministic_and_seed_divergence():
    a = _meta(seed=7)
    b = _meta(seed=7)
    c = _meta(seed=8)
    assert json.dumps(a, sort_keys=True) == json.dumps(b, sort_keys=True)
    assert json.dumps(a, sort_keys=True) != json.dumps(c, sort_keys=True)


def test_valid_motion_meta_and_generator_block():
    block = _meta()
    validate_motion_meta(block)
    motion = resolve_motion_meta({"motion_meta": block})
    assert motion.source == "generated_shake"
    assert motion.generator["style"] == "handheld"
    assert motion.generator["recipe"] == S.recipe_to_dict(S.STYLES["handheld"])


def test_first_frame_identity():
    for style in S.STYLES:
        block = _meta(style=style, seed=3)
        first = np.asarray(block["per_frame"][0]["matrix"])
        np.testing.assert_allclose(first, np.eye(3), atol=1e-12)


def test_amount_zero_all_identity():
    block = _meta(amount=0.0)
    for entry in block["per_frame"]:
        np.testing.assert_allclose(np.asarray(entry["matrix"]), np.eye(3), atol=1e-12)


def test_recipe_roundtrip_all_styles():
    for style, recipe in S.STYLES.items():
        restored = S.recipe_from_mapping(S.recipe_to_dict(recipe))
        assert restored == S.clamp_recipe(recipe), style


def _tilt_series(style, seed=0, frames=256, fps=32.0):
    comp = S.generate_shake_components(
        recipe=S.STYLES[style], frame_count=frames, fps=fps, amount=1.0, speed=1.0, seed=seed
    )
    return comp.tilt_deg


def test_walking_gait_peak_near_1_9hz():
    fps = 32.0
    series = _tilt_series("walking", seed=11, frames=512, fps=fps)
    spectrum = np.abs(np.fft.rfft(series - series.mean()))
    freqs = np.fft.rfftfreq(series.size, d=1.0 / fps)
    # restrict to >1 Hz so drift doesn't dominate
    band = freqs > 1.0
    peak = freqs[band][np.argmax(spectrum[band])]
    assert abs(peak - 1.9) <= 0.35, peak


def test_vibration_has_more_highfreq_than_handheld():
    def hf_energy(style):
        series = _tilt_series(style, seed=5)
        second_diff = np.diff(series, n=2)
        return float(np.mean(second_diff**2))

    assert hf_energy("vibration") > hf_energy("handheld")


def test_tripod_much_smaller_than_handheld():
    tripod = np.abs(_tilt_series("tripod", seed=9)).max()
    handheld = np.abs(_tilt_series("handheld", seed=9)).max()
    assert tripod <= handheld / 10.0


def test_matrices_match_explicit_composition():
    """Closed-form translation fold == T(c+t) @ (R*S) @ T(-c)."""
    rng = np.random.default_rng(0)
    w, h = 211, 113
    comp = S.ShakeComponents(
        pan_deg=rng.uniform(-2, 2, 5),
        tilt_deg=rng.uniform(-2, 2, 5),
        roll_deg=rng.uniform(-3, 3, 5),
        zoom_log=rng.uniform(-0.02, 0.02, 5),
    )
    mats = S.shake_matrices(w, h, comp, 60.0)
    import math

    focal = 0.5 * min(w, h) / math.tan(math.radians(60.0) * 0.5)
    for i in range(5):
        tx = focal * math.tan(math.radians(comp.pan_deg[i]))
        ty = focal * math.tan(math.radians(comp.tilt_deg[i]))
        ang = math.radians(comp.roll_deg[i])
        sc = math.exp(comp.zoom_log[i])
        t_back = np.array([[1, 0, w * 0.5 + tx], [0, 1, h * 0.5 + ty], [0, 0, 1.0]])
        rot = np.array(
            [
                [sc * math.cos(ang), -sc * math.sin(ang), 0],
                [sc * math.sin(ang), sc * math.cos(ang), 0],
                [0, 0, 1.0],
            ]
        )
        t_fwd = np.array([[1, 0, -w * 0.5], [0, 1, -h * 0.5], [0, 0, 1.0]])
        np.testing.assert_allclose(mats[i], t_back @ rot @ t_fwd, atol=1e-9)


def test_clamping():
    wild = S.ShakeRecipe(99, -1, 99, 9, 9, -5, 99, -2, 99, 42, 999)
    clamped = S.clamp_recipe(wild)
    assert clamped.pan == 5.0 and clamped.tilt == 0.0 and clamped.zoom == 0.05
    assert clamped.tremor_freq == 15.0 and clamped.virtual_fov == 120.0
    assert clamped.randomness == 1.0


@pytest.mark.parametrize("frames", [0, 1, 2])
def test_tiny_frame_counts(frames):
    block = _meta(frames=frames)
    assert block["frame_count"] == frames
    assert len(block["per_frame"]) == frames
