"""Public-API freeze: node ids, display names, socket order, defaults.

Golden table matches the reference's static schema check
(/root/reference/scripts/check_node_schema.py:11-94) so workflows
built against the reference drop in unchanged.
"""

import asyncio

import numpy as np
import pytest

from comfyui_video_stabilizer_tpu import nodes as N

EXPECTED = {
    "VideoStabilizerClassic": {
        "node_id": "video_stabilizer_classic",
        "display_name": "Video Stabilizer Classic",
        "inputs": [
            "frames", "frame_rate", "framing_mode", "transform_mode",
            "camera_lock", "strength", "smooth", "keep_fov", "padding_color",
        ],
        "outputs": ["frames_stabilized", "padding_mask", "meta"],
    },
    "VideoStabilizerFlow": {
        "node_id": "video_stabilizer_flow",
        "display_name": "Video Stabilizer Flow",
        "inputs": [
            "frames", "frame_rate", "framing_mode", "transform_mode",
            "camera_lock", "strength", "smooth", "keep_fov", "padding_color",
        ],
        "outputs": ["frames_stabilized", "padding_mask", "meta"],
    },
    "VideoStabilizerInverse": {
        "node_id": "video_stabilizer_inverse",
        "display_name": "Video Stabilizer Inverse",
        "is_deprecated": True,
        "inputs": ["frames", "meta", "padding_color"],
        "outputs": ["frames_restored", "padding_mask", "meta"],
    },
    "VideoStabilizerMotionApply": {
        "node_id": "video_stabilizer_motion_apply",
        "display_name": "Video Stabilizer Motion Apply",
        "inputs": [
            "frames", "motion_meta", "framing_mode", "interpolation",
            "padding_color", "motion_blur", "motion_blur_quality",
        ],
        "outputs": ["frames", "padding_mask", "meta"],
    },
    "VideoStabilizerShakeGenerator": {
        "node_id": "video_stabilizer_shake_generator",
        "display_name": "Video Stabilizer Shake Generator",
        "inputs": ["frames_context", "frame_rate", "style", "amount", "speed", "seed"],
        "outputs": ["motion_meta"],
    },
    "VideoStabilizerShakeGeneratorManual": {
        "node_id": "video_stabilizer_shake_generator_manual",
        "display_name": "Video Stabilizer Shake Generator Manual",
        "inputs": [
            "frames_context", "frame_rate", "pan", "tilt", "roll", "zoom",
            "drift_freq", "tremor", "tremor_freq", "jitter_rate", "step",
            "randomness", "virtual_fov", "amount", "speed", "seed",
        ],
        "outputs": ["motion_meta"],
    },
}


@pytest.mark.parametrize("cls_name", sorted(EXPECTED))
def test_schema_freeze(cls_name):
    cls = getattr(N, cls_name)
    schema = cls.define_schema()
    exp = EXPECTED[cls_name]
    assert schema.node_id == exp["node_id"]
    assert schema.display_name == exp["display_name"]
    assert [s.id for s in schema.inputs] == exp["inputs"]
    assert [s.id for s in schema.outputs] == exp["outputs"]
    assert bool(getattr(schema, "is_deprecated", False)) == exp.get("is_deprecated", False)


def test_extension_lists_all_nodes():
    ext = asyncio.run(N.comfy_entrypoint())
    node_list = asyncio.run(ext.get_node_list())
    ids = [c.define_schema().node_id for c in node_list]
    assert ids == [
        "video_stabilizer_classic",
        "video_stabilizer_flow",
        "video_stabilizer_motion_apply",
        "video_stabilizer_shake_generator",
        "video_stabilizer_shake_generator_manual",
        "video_stabilizer_inverse",
    ]
    asyncio.run(ext.on_load())  # replacement registration is a no-op standalone


def test_defaults_contract():
    schema = N.VideoStabilizerClassic.define_schema()
    opts = {s.id: s.options for s in schema.inputs}
    assert opts["frame_rate"]["default"] == 16.0
    assert opts["framing_mode"]["default"] == "crop_and_pad"
    assert opts["framing_mode"]["options"] == ["crop", "crop_and_pad", "expand"]
    assert opts["transform_mode"]["default"] == "similarity"
    assert opts["strength"]["default"] == 0.7
    assert opts["smooth"]["default"] == 0.5
    assert opts["keep_fov"]["default"] == 0.6
    assert opts["padding_color"]["default"] == "#7F7F7F"

    apply_schema = N.VideoStabilizerMotionApply.define_schema()
    aopts = {s.id: s.options for s in apply_schema.inputs}
    assert aopts["motion_blur_quality"]["options"] == ["Draft", "Standard", "High", "Ultra"]
    assert aopts["interpolation"]["options"] == ["bilinear", "bicubic"]

    manual = N.VideoStabilizerShakeGeneratorManual.define_schema()
    mopts = {s.id: s.options for s in manual.inputs}
    # manual defaults == handheld preset (check_motion_meta contract)
    from comfyui_video_stabilizer_tpu.models.shake import STYLES

    hh = STYLES["handheld"]
    for field in ("pan", "tilt", "roll", "zoom", "drift_freq", "tremor",
                  "tremor_freq", "jitter_rate", "step", "randomness", "virtual_fov"):
        assert mopts[field]["default"] == getattr(hh, field), field


def test_node_level_shake_to_apply_roundtrip():
    """Config 2 of BASELINE: Shake Generator -> Motion Apply, node level."""
    rng = np.random.default_rng(0)
    frames = rng.random((6, 72, 96, 3)).astype(np.float32)
    shake_out = N.VideoStabilizerShakeGenerator.execute(
        frames, frame_rate=16.0, style="handheld", amount=1.0, speed=1.0, seed=42
    )
    meta = shake_out[0]
    assert meta["motion_meta"]["source"] == "generated_shake"

    apply_out = N.VideoStabilizerMotionApply.execute(
        frames, meta, "crop_and_pad", "bilinear", "#7F7F7F", 0.0, "Standard"
    )
    shaken = np.asarray(apply_out[0])
    masks = np.asarray(apply_out[1])
    assert shaken.shape == frames.shape
    assert masks.shape == frames.shape[:3]
    assert apply_out[2]["motion_apply"]["motion_blur_quality"] == "Standard"

    # determinism at node level
    shake_out2 = N.VideoStabilizerShakeGenerator.execute(
        frames, frame_rate=16.0, style="handheld", amount=1.0, speed=1.0, seed=42
    )
    import json

    assert json.dumps(shake_out2[0], sort_keys=True) == json.dumps(meta, sort_keys=True)


def test_node_level_inverse_matches_motion_apply_legacy():
    """Legacy meta through Motion Apply == deprecated Inverse node."""
    from comfyui_video_stabilizer_tpu.meta import motion_meta as MM

    rng = np.random.default_rng(1)
    frames = rng.random((4, 64, 80, 3)).astype(np.float32)
    mats = [np.array([[1.0, 0, 4.0], [0, 1, -3.0], [0, 0, 1]])] * 4
    warp_block = MM.build_stabilization_warp_meta(
        source_size=(80, 64), output_size=(80, 64), framing_mode="crop_and_pad",
        applied_matrices=mats,
    )
    meta = {"stabilization_warp": warp_block}

    inv_out = N.VideoStabilizerInverse.execute(frames, meta, "#7F7F7F")
    apply_out = N.VideoStabilizerMotionApply.execute(
        frames, meta, "crop_and_pad", "bilinear", "#7F7F7F", 0.0, "Standard"
    )
    np.testing.assert_array_equal(np.asarray(inv_out[0]), np.asarray(apply_out[0]))
    np.testing.assert_array_equal(np.asarray(inv_out[1]), np.asarray(apply_out[1]))
    assert "inverse_stabilization" in inv_out[2]
    assert "motion_apply" not in inv_out[2]


def test_replacement_spec():
    from comfyui_video_stabilizer_tpu.nodes.replacements import REPLACEMENT_SPEC

    assert REPLACEMENT_SPEC["new_node_id"] == "video_stabilizer_motion_apply"
    assert REPLACEMENT_SPEC["old_node_id"] == "video_stabilizer_inverse"
    mapping = {m.get("new_id"): m for m in REPLACEMENT_SPEC["input_mapping"]}
    assert mapping["motion_meta"]["old_id"] == "meta"
    assert mapping["framing_mode"]["set_value"] == "crop_and_pad"
    assert mapping["interpolation"]["set_value"] == "bilinear"


def test_node_level_classic_and_flow_execute():
    """Full node execute path for both stabilizers (engines are tested
    elsewhere; this covers the node shell: normalization, progress,
    payload reconstruction)."""
    rng = np.random.default_rng(5)
    base = rng.random((120, 140, 3)).astype(np.float32)
    frames = np.stack([np.roll(base, i * 2, axis=1)[10:106, 10:138] for i in range(5)])

    for cls_name in ("VideoStabilizerClassic", "VideoStabilizerFlow"):
        out = getattr(N, cls_name).execute(
            frames, 16.0, "crop_and_pad", "similarity", False, 0.7, 0.5, 0.6, "#404040"
        )
        stabilized = np.asarray(out[0])
        masks = np.asarray(out[1])
        meta = out[2]
        assert stabilized.shape == frames.shape, cls_name
        assert masks.shape == frames.shape[:3], cls_name
        assert meta["framing"]["padding_color_rgb"] == [64, 64, 64]
        assert meta["frames"] == 5
        assert "motion_meta" in meta

    # dict-payload round trip through a stabilizer node
    out = N.VideoStabilizerFlow.execute(
        {"frames": frames, "fps": 24.0}, 16.0, "expand", "translation",
        False, 0.8, 0.5, 0.6, "#7F7F7F",
    )
    assert isinstance(out[0], dict) and out[0]["fps"] == 24.0
    assert out[2]["fps_effective"] == 16.0  # widget wins over dict fps


def test_apply_pad_alias():
    from comfyui_video_stabilizer_tpu.models import motion_apply as MA
    from comfyui_video_stabilizer_tpu.models import shake as S
    from comfyui_video_stabilizer_tpu.utils.video_io import normalize_video_input

    rng = np.random.default_rng(2)
    frames = rng.random((3, 48, 64, 3)).astype(np.float32)
    meta = {"motion_meta": S.generate_shake_motion_meta(
        recipe=S.STYLES["handheld"], frame_count=3, width=64, height=48,
        fps=16.0, amount=1.0, speed=1.0, seed=1)}
    a = MA.apply_motion(normalize_video_input(frames), meta, (127, 127, 127),
                        framing_mode="pad")
    b = MA.apply_motion(normalize_video_input(frames), meta, (127, 127, 127),
                        framing_mode="crop_and_pad")
    np.testing.assert_array_equal(np.asarray(a.frames), np.asarray(b.frames))
    assert a.meta["motion_apply"]["framing_mode"] == "crop_and_pad"
