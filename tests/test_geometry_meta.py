"""Geometry parameterization + motion_meta contract tests."""

import numpy as np
import pytest

from comfyui_video_stabilizer_tpu.meta import motion_meta as MM
from comfyui_video_stabilizer_tpu.models import geometry as G


def _random_matrices(n, mode, seed=0):
    rng = np.random.default_rng(seed)
    if mode == "translation":
        params = rng.uniform(-20, 20, (n, 2))
    elif mode == "similarity":
        params = np.stack(
            [
                rng.uniform(-20, 20, n),
                rng.uniform(-20, 20, n),
                rng.uniform(-0.2, 0.2, n),
                rng.uniform(-0.1, 0.1, n),
            ],
            axis=-1,
        )
    else:
        params = np.concatenate(
            [
                rng.uniform(-0.05, 0.05, (n, 2)),
                rng.uniform(-20, 20, (n, 1)),
                rng.uniform(-0.05, 0.05, (n, 2)),
                rng.uniform(-20, 20, (n, 1)),
                rng.uniform(-1e-4, 1e-4, (n, 2)),
            ],
            axis=-1,
        )
    return G.params_to_matrices(params, mode), params


@pytest.mark.parametrize("mode", ["translation", "similarity", "perspective"])
def test_param_matrix_roundtrip(mode):
    mats, params = _random_matrices(16, mode)
    back = G.matrices_to_params(mats, mode)
    np.testing.assert_allclose(back, params, atol=1e-5)
    mats2 = G.params_to_matrices(back, mode)
    np.testing.assert_allclose(mats2, mats, atol=1e-6)


def test_path_integration_matches_loop():
    rng = np.random.default_rng(1)
    deltas = rng.normal(size=(40, 4))
    path = G.integrate_path(deltas)
    ref = np.zeros((41, 4))
    for i, d in enumerate(deltas, start=1):
        ref[i] = ref[i - 1] + d
    np.testing.assert_allclose(path, ref, atol=1e-12)
    assert np.all(path[0] == 0)


def test_smooth_path_matches_reference_semantics():
    rng = np.random.default_rng(2)
    path = rng.normal(size=(60, 4)).cumsum(axis=0)
    for smooth, fps in [(0.0, 16), (0.5, 16), (1.0, 16), (0.5, 60), (1.0, 7)]:
        out = G.smooth_path(path, smooth, fps)
        if smooth <= 0.0:
            np.testing.assert_array_equal(out, path)
            continue
        window = G.smoothing_window(smooth, fps)
        assert window % 2 == 1 and window >= 3
        pad = window // 2
        kernel = np.ones(window) / window
        for dim in range(path.shape[1]):
            padded = np.pad(path[:, dim], (pad, pad), mode="edge")
            ref = np.convolve(padded, kernel, mode="valid")
            np.testing.assert_allclose(out[:, dim], ref, atol=1e-12)


def test_smoothing_window_values():
    # 3/16 s at 16 fps -> 3 frames; 13/16 s at 16 fps -> 13 frames
    assert G.smoothing_window(0.0, 16) == 3
    assert G.smoothing_window(1.0, 16) == 13
    assert G.smoothing_window(1.0, 32) == 27  # 26 forced odd


def test_bounding_boxes_and_expand():
    mats = np.stack(
        [
            np.eye(3),
            G.translation_matrix(10.0, -5.0).astype(np.float64),
        ]
    )
    mins, maxs = G.compute_bounding_boxes(mats, 100, 50)
    np.testing.assert_allclose(mins[0], [0, 0])
    np.testing.assert_allclose(maxs[0], [100, 50])
    np.testing.assert_allclose(mins[1], [10, -5])
    translate, (ow, oh) = G.prepare_expand_transform(mins, maxs)
    assert (ow, oh) == (110, 55)
    np.testing.assert_allclose(translate[:2, 2], [0.0, 5.0])
    # identity frame shifted by +5 in y must fit: top-left corner of frame 2
    ratio = G.min_content_ratio(mins, maxs, 100, 50)
    assert 0 < ratio <= 1.0


def test_working_estimation_size():
    assert G.working_estimation_size(640, 480) is None
    assert G.working_estimation_size(1920, 1080) == (960, 540)
    w, h = G.working_estimation_size(3840, 2160)
    assert max(w, h) == 960


def test_rescale_transform_roundtrip():
    m = G.params_to_matrix(np.array([3.0, -2.0, 0.05, 0.01]), "similarity").astype(np.float64)
    small = G.rescale_transforms_to_full(m[None], (1920, 1080), (960, 540))[0]
    # translations double, rotation/scale invariant
    assert abs(small[0, 2] - 2 * m[0, 2]) < 1e-4
    assert abs(small[0, 0] - m[0, 0]) < 1e-6


def test_motion_meta_validation_errors():
    good = MM.build_motion_meta_v2(
        source="estimated_classic",
        frame_count=2,
        fps=16.0,
        input_size=(10, 10),
        output_size=(10, 10),
        matrices=[np.eye(3), np.eye(3)],
    )
    MM.validate_motion_meta(good)

    bad = dict(good)
    bad["version"] = 1
    with pytest.raises(ValueError, match="version"):
        MM.validate_motion_meta(bad)

    bad = dict(good)
    bad["per_frame"] = good["per_frame"][:1]
    with pytest.raises(ValueError, match="mismatch"):
        MM.validate_motion_meta(bad)

    singular = [[1, 0, 0], [0, 0, 0], [0, 0, 1]]
    with pytest.raises(ValueError, match="not invertible"):
        MM.build_motion_meta_v2(
            source="estimated_classic",
            frame_count=1,
            fps=16.0,
            input_size=(10, 10),
            output_size=(10, 10),
            matrices=[np.asarray(singular, float)],
        )

    with pytest.raises(ValueError, match="generator"):
        MM.validate_motion_meta(
            MM.build_motion_meta_v2(
                source="estimated_classic",
                frame_count=0,
                fps=16.0,
                input_size=(4, 4),
                output_size=(4, 4),
                matrices=[],
            )
            | {"source": "generated_shake"}
        )


def test_legacy_warp_lift_and_inversion():
    mats = [np.array([[1.0, 0, 5], [0, 1, -3], [0, 0, 1]]), np.eye(3)]
    warp = MM.build_stabilization_warp_meta(
        source_size=(64, 48), output_size=(80, 60), framing_mode="expand", applied_matrices=mats
    )
    fwd = MM.applied_motion_meta_from_stabilization_warp(warp, fps=24.0, source="estimated_flow")
    assert fwd["input_size"] == [64, 48] and fwd["output_size"] == [80, 60]
    np.testing.assert_allclose(fwd["per_frame"][0]["matrix"], mats[0], atol=1e-6)

    inv = MM.motion_meta_from_stabilization_warp(warp, fps=24.0, source="legacy_stabilization")
    assert inv["input_size"] == [80, 60] and inv["output_size"] == [64, 48]
    np.testing.assert_allclose(
        np.asarray(inv["per_frame"][0]["matrix"]) @ mats[0], np.eye(3), atol=1e-9
    )

    resolved = MM.resolve_motion_meta({"stabilization_warp": warp})
    assert resolved.source == "legacy_stabilization"
    assert resolved.fps == 16.0  # legacy default

    preferred = MM.resolve_motion_meta({"motion_meta": fwd, "stabilization_warp": warp})
    assert preferred.source == "estimated_flow"
