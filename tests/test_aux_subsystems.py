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


def test_estimation_chunk_spans_cover_all_pairs_once():
    from comfyui_video_stabilizer_tpu.models.stabilize import (
        ESTIMATION_CHUNK_PAIRS,
        estimation_chunk_spans,
    )

    for n in (2, 10, 33, 34, 64, 65, 97, 256, 257):
        spans = estimation_chunk_spans(n)
        pairs = []
        for s, e, drop in spans:
            assert 0 <= s < e <= n
            chunk_pairs = list(range(s, e - 1))[drop:]
            pairs.extend(chunk_pairs)
            if len(spans) > 1:
                # one compiled shape: every chunk spans chunk+1 frames
                assert e - s == ESTIMATION_CHUNK_PAIRS + 1, (n, s, e)
        assert pairs == list(range(n - 1)), n


def test_estimation_progress_granularity_256_frames():
    """VERDICT r4 item 5: a long clip's estimation must tick at chunk
    granularity (>= N/32 progress events before the warp tick), not
    sit at 0% and jump (reference: classic:279-284 ticks stride-10)."""
    from comfyui_video_stabilizer_tpu.models.flow import stabilize_flow
    from comfyui_video_stabilizer_tpu.utils.video_io import normalize_video_input

    rng = np.random.default_rng(2)
    frames = rng.random((256, 48, 64, 3)).astype(np.float32)
    seen = []
    stabilize_flow(
        normalize_video_input(frames), "crop_and_pad", "translation", False,
        0.7, 0.5, 0.6, (127, 127, 127), 16.0,
        progress=lambda done, total: seen.append((done, total)),
    )
    estimation_ticks = [d for d, t in seen if d <= 255]
    assert len(estimation_ticks) >= 255 // 32, seen
    dones = [d for d, _ in seen]
    assert dones == sorted(dones)
    assert seen[-1][0] == seen[-1][1]


def test_interrupt_aborts_within_one_estimation_chunk():
    """VERDICT r4 item 5: an interrupt raised during estimation of a
    256-frame clip aborts before later chunks dispatch, and the
    original exception type propagates (not swallowed by the
    DIS->TV-L1 backend-degradation chain or the fast-path fallback)."""
    from comfyui_video_stabilizer_tpu.models.flow import stabilize_flow
    from comfyui_video_stabilizer_tpu.utils.video_io import normalize_video_input

    class Cancelled(Exception):
        pass

    state = {"ticks": 0}

    def interrupt():
        state["ticks"] += 1
        if state["ticks"] >= 3:
            raise Cancelled()

    rng = np.random.default_rng(3)
    frames = rng.random((256, 48, 64, 3)).astype(np.float32)
    with pytest.raises(Cancelled):
        stabilize_flow(
            normalize_video_input(frames), "crop_and_pad", "translation", False,
            0.7, 0.5, 0.6, (127, 127, 127), 16.0, interrupt_check=interrupt,
        )
    # aborted mid-estimation: far fewer polls than the 8 chunks + later
    # stages would produce
    assert state["ticks"] == 3, state


def test_chunked_estimation_matches_single_dispatch():
    """Chunk boundaries must not change any pair's estimate: the final
    chunk overlaps from the clip's end and drops duplicated pairs."""
    from comfyui_video_stabilizer_tpu.models.flow import flow_estimator

    rng = np.random.default_rng(4)
    base = rng.random((80, 100), np.float32)
    frames = np.stack(
        [np.roll(base, (int(2 * np.sin(i)), int(3 * np.cos(i))), (0, 1))
         for i in range(40)]
    )
    whole = flow_estimator(frames, "similarity")
    ticks = []
    chunked = flow_estimator(frames, "similarity", tick_pairs=ticks.append)
    assert ticks == [32, 39]
    np.testing.assert_array_equal(whole.degenerate, chunked.degenerate)
    for key in whole.matrices:
        np.testing.assert_array_equal(whole.matrices[key], chunked.matrices[key])
        np.testing.assert_array_equal(whole.confidences[key], chunked.confidences[key])
        np.testing.assert_array_equal(whole.accepted[key], chunked.accepted[key])


def test_chunked_classic_tracks_match_single_dispatch():
    from comfyui_video_stabilizer_tpu.models.classic import classic_estimator

    rng = np.random.default_rng(5)
    base = rng.random((80, 100), np.float32)
    frames = np.stack(
        [np.roll(base, (int(2 * np.sin(i)), int(3 * np.cos(i))), (0, 1))
         for i in range(40)]
    )
    whole = classic_estimator(frames, "similarity")
    ticks = []
    chunked = classic_estimator(frames, "similarity", tick_pairs=ticks.append)
    assert ticks == [32, 39]
    np.testing.assert_array_equal(whole.degenerate, chunked.degenerate)
    for key in whole.matrices:
        np.testing.assert_array_equal(whole.matrices[key], chunked.matrices[key])
