"""Auxiliary-subsystem contracts: determinism hygiene, timing, interrupts.

Mirrors the reference's forbidden-pattern scan
(/root/reference/scripts/check_motion_meta.py:417-440) and its
cooperative-cancellation design (SURVEY 5).
"""

import pathlib
import re

import numpy as np
import pytest

ROOT = pathlib.Path(__file__).resolve().parents[1] / "comfyui_video_stabilizer_tpu"

# determinism hygiene: no global RNG, no wall-clock in compute paths
FORBIDDEN = [
    (re.compile(r"np\.random\.seed"), "global numpy seed"),
    (re.compile(r"(?<![\w.])random\.(random|randint|uniform|seed)\b"), "stdlib random"),
    (re.compile(r"\btime\.time\(\)"), "wall clock in compute path"),
]
# profiling may use perf_counter; nothing else should need wall time
ALLOWED_TIME_FILES = {"profiling.py"}


def test_forbidden_patterns():
    offenders = []
    for path in ROOT.rglob("*.py"):
        text = path.read_text()
        for pattern, label in FORBIDDEN:
            if pattern.search(text):
                offenders.append((str(path), label))
        if "time.perf_counter" in text and path.name not in ALLOWED_TIME_FILES:
            offenders.append((str(path), "perf_counter outside profiling"))
    assert not offenders, offenders


def test_rng_is_explicitly_seeded_everywhere():
    """Every default_rng / PRNGKey call must take an explicit seed."""
    bad = []
    for path in ROOT.rglob("*.py"):
        for line in path.read_text().splitlines():
            if "default_rng()" in line or "PRNGKey()" in line:
                bad.append((str(path), line.strip()))
    assert not bad, bad


def test_stage_timing_attached_when_enabled():
    from comfyui_video_stabilizer_tpu.meta import motion_meta as MM
    from comfyui_video_stabilizer_tpu.models import motion_apply as MA
    from comfyui_video_stabilizer_tpu.utils import profiling as P
    from comfyui_video_stabilizer_tpu.utils.video_io import normalize_video_input

    frames = np.zeros((3, 40, 48, 3), np.float32)
    meta = {
        "motion_meta": MM.build_motion_meta_v2(
            source="estimated_classic", frame_count=3, fps=16.0,
            input_size=(48, 40), output_size=(48, 40), matrices=[np.eye(3)] * 3,
        )
    }
    P.enable_timing(True)
    try:
        res = MA.apply_motion(normalize_video_input(frames), meta, (127, 127, 127))
        assert "timing" in res.meta
        assert "warp" in res.meta["timing"]
    finally:
        P.enable_timing(False)
    res2 = MA.apply_motion(normalize_video_input(frames), meta, (127, 127, 127))
    assert "timing" not in res2.meta


def test_interrupt_propagates():
    from comfyui_video_stabilizer_tpu.models.classic import stabilize_classic
    from comfyui_video_stabilizer_tpu.utils.video_io import normalize_video_input

    class Cancelled(Exception):
        pass

    calls = {"n": 0}

    def interrupt():
        calls["n"] += 1
        if calls["n"] >= 2:
            raise Cancelled()

    rng = np.random.default_rng(0)
    frames = rng.random((6, 64, 80, 3)).astype(np.float32)
    with pytest.raises(Cancelled):
        stabilize_classic(
            normalize_video_input(frames), "crop", "similarity", False,
            0.7, 0.5, 0.6, (127, 127, 127), 16.0, interrupt_check=interrupt,
        )
    assert calls["n"] >= 2


def test_progress_monotonic():
    from comfyui_video_stabilizer_tpu.models.flow import stabilize_flow
    from comfyui_video_stabilizer_tpu.utils.video_io import normalize_video_input

    seen = []
    rng = np.random.default_rng(1)
    frames = rng.random((5, 64, 80, 3)).astype(np.float32)
    stabilize_flow(
        normalize_video_input(frames), "crop_and_pad", "translation", False,
        0.7, 0.5, 0.6, (127, 127, 127), 16.0,
        progress=lambda done, total: seen.append((done, total)),
    )
    assert seen, "progress callback never fired"
    dones = [d for d, _ in seen]
    assert dones == sorted(dones)
    assert seen[-1][0] == seen[-1][1]  # finishes at total
