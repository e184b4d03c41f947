#!/usr/bin/env python3
"""Golden A/B harness: compare pipeline behavior between two git refs.

The reference pins refactor safety with a ref-vs-ref comparison
(/root/reference/scripts/compare_refactor_behavior.py); this is the
TPU framework's equivalent.  It materializes the package from a base
git ref into a temp directory, runs identical scenarios against the
working tree and the base ref on the CPU backend, and compares:

  * node schemas (ids, socket order, defaults),
  * the 9-input-layout normalization matrix (list / batch / dict /
    wrapped / float64 / uint8 / non-contiguous / torch f32 / torch
    uint8) through normalize + reconstruct — guards the L1 heuristics
    (reference compare_refactor_behavior.py:289-325),
  * matrix<->parameter round trips for all three transform modes
    (reference :327-340),
  * the smooth x fps smoothing grid (reference :342-357) and the
    expand-canvas solver (:359-365),
  * motion_meta JSON for the shake generators (must be byte-identical),
  * stabilizer frames/masks within atol/rtol 2e-5 + deep meta equality
    (floating point compared with tolerance) across three scenarios
    incl. the crop keep_fov~=1 bypass (reference :380-393).

Usage: python3 scripts/compare_refactor_behavior.py [BASE_REF=HEAD~1]
"""

from __future__ import annotations

import json
import math
import pathlib
import subprocess
import sys
import tempfile

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))
PKG = "comfyui_video_stabilizer_tpu"
ATOL = RTOL = 2e-5


def load_ref(base_ref: str, workdir: pathlib.Path):
    """Check the package out of git at base_ref and import it isolated."""
    archive = workdir / "base.tar"
    with open(archive, "wb") as fh:
        subprocess.run(
            ["git", "archive", base_ref, PKG],
            cwd=ROOT, stdout=fh, check=True,
        )
    subprocess.run(["tar", "xf", str(archive)], cwd=workdir, check=True)
    # rename so both packages can coexist in one process
    (workdir / PKG).rename(workdir / f"{PKG}_base")
    base_dir = workdir / f"{PKG}_base"
    for path in base_dir.rglob("*.py"):
        text = path.read_text()
        path.write_text(text.replace(PKG, f"{PKG}_base"))
    sys.path.insert(0, str(workdir))
    import importlib

    return importlib.import_module(f"{PKG}_base")


def deep_compare(a, b, path="meta") -> list[str]:
    diffs: list[str] = []
    if isinstance(a, dict) and isinstance(b, dict):
        for key in sorted(set(a) | set(b)):
            if key not in a or key not in b:
                diffs.append(f"{path}.{key}: missing on one side")
                continue
            diffs += deep_compare(a[key], b[key], f"{path}.{key}")
    elif isinstance(a, (list, tuple)) and isinstance(b, (list, tuple)):
        if len(a) != len(b):
            diffs.append(f"{path}: length {len(a)} vs {len(b)}")
        else:
            for i, (x, y) in enumerate(zip(a, b)):
                diffs += deep_compare(x, y, f"{path}[{i}]")
    elif isinstance(a, float) or isinstance(b, float):
        try:
            if not math.isclose(float(a), float(b), rel_tol=1e-4, abs_tol=1e-5):
                diffs.append(f"{path}: {a} != {b}")
        except (TypeError, ValueError):
            diffs.append(f"{path}: {a!r} vs {b!r}")
    elif a != b:
        diffs.append(f"{path}: {a!r} != {b!r}")
    return diffs


def scenario_frames(seed=0, n=6, h=72, w=96):
    rng = np.random.default_rng(seed)
    base = rng.random((h + 40, w + 40, 3)).astype(np.float32)
    frames = np.stack(
        [base[10 + i : 10 + i + h, 12 + (i % 3) : 12 + (i % 3) + w] for i in range(n)]
    )
    return np.ascontiguousarray(frames)


def compare_io_layouts(cur_io, base_io, frames: np.ndarray) -> int:
    """The reference's 9-input-layout normalization matrix
    (compare_refactor_behavior.py:289-325): every accepted layout must
    normalize and reconstruct identically across refs."""
    frame_list = [np.ascontiguousarray(f) for f in frames]
    cases: dict[str, object] = {
        "list": frame_list,
        "batch": frames,
        "dict": {"frames": frames, "fps": 24.0},
        "wrapped_frames": [f[np.newaxis] for f in frame_list],
        "float64": frames.astype(np.float64),
        "uint8": (frames * 255.0).round().clip(0, 255).astype(np.uint8),
        "noncontiguous": np.ascontiguousarray(frames[:, :, ::-1, :])[:, :, ::-1, :],
    }
    try:
        import torch

        cases["torch_f32"] = torch.from_numpy(frames.copy())
        cases["torch_uint8"] = torch.from_numpy(cases["uint8"].copy())
    except ImportError:
        pass

    failures = 0
    for name, value in cases.items():
        c = cur_io.normalize_video_input(value)
        b = base_io.normalize_video_input(value)
        diffs = []
        for attr in ("width", "height", "channels", "fps", "template_kind"):
            if getattr(c, attr) != getattr(b, attr):
                diffs.append(f"{attr}: {getattr(c, attr)} vs {getattr(b, attr)}")
        cf, bf = np.asarray(c.frames), np.asarray(b.frames)
        if cf.shape != bf.shape or not np.array_equal(cf, bf):
            diffs.append("normalized frames differ")
        cr = cur_io.reconstruct_video(c.frames, c)
        br = base_io.reconstruct_video(b.frames, b)
        cp = np.asarray(cr["frames"] if isinstance(cr, dict) else cr)
        bp = np.asarray(br["frames"] if isinstance(br, dict) else br)
        if cp.shape != bp.shape or not np.array_equal(cp, bp):
            diffs.append("reconstructed payloads differ")
        print(f"[normalize] {name}: {'OK' if not diffs else 'DIFF ' + '; '.join(diffs)}")
        failures += 1 if diffs else 0
    return failures


def compare_geometry(cur_g, base_g) -> int:
    """Param round trips, the smooth x fps grid and the expand solver
    (reference compare_refactor_behavior.py:327-365)."""
    failures = 0
    matrices = {
        "translation": np.array([[1.0, 0.0, 2.5], [0.0, 1.0, -1.25], [0, 0, 1]], np.float32),
        "similarity": np.array([[1.02, -0.03, 2.0], [0.03, 1.02, -3.0], [0, 0, 1]], np.float32),
        "perspective": np.array(
            [[1.01, 0.02, 2.0], [-0.01, 0.99, -1.0], [2e-4, -1e-4, 1]], np.float32
        ),
    }
    for mode, m in matrices.items():
        pc = cur_g.matrix_to_params(m, mode)
        pb = base_g.matrix_to_params(m, mode)
        ok = np.allclose(pc, pb, atol=ATOL, rtol=RTOL) and np.allclose(
            cur_g.params_to_matrix(pc, mode), base_g.params_to_matrix(pb, mode),
            atol=ATOL, rtol=RTOL,
        )
        print(f"[params] {mode}: {'OK' if ok else 'DIFF'}")
        failures += 0 if ok else 1

    path = np.stack(
        [np.linspace(0.0, 4.0, 8), np.linspace(1.0, -2.0, 8),
         np.sin(np.linspace(0.0, 1.5, 8)), np.cos(np.linspace(0.0, 1.5, 8))],
        axis=1,
    )
    grid_ok = True
    for smooth in (0.0, 0.5, 1.0):
        for fps in (16.0, 24.0, 60.0):
            if not np.allclose(
                cur_g.smooth_path(path, smooth, fps),
                base_g.smooth_path(path, smooth, fps),
                atol=ATOL, rtol=RTOL,
            ):
                grid_ok = False
                print(f"[smooth] smooth={smooth} fps={fps}: DIFF")
    print(f"[smooth] 3x3 smooth x fps grid: {'OK' if grid_ok else 'DIFF'}")
    failures += 0 if grid_ok else 1

    mins = np.array([[-2.0, 1.0], [0.5, -3.0], [1.5, 0.0]], np.float32)
    maxs = np.array([[73.5, 47.0], [75.0, 45.5], [72.0, 49.0]], np.float32)
    tc, sc = cur_g.prepare_expand_transform(mins, maxs)
    tb, sb = base_g.prepare_expand_transform(mins, maxs)
    ok = np.allclose(tc, tb) and tuple(sc) == tuple(sb)
    print(f"[expand] solver: {'OK' if ok else 'DIFF'}")
    return failures + (0 if ok else 1)


def main() -> int:
    base_ref = sys.argv[1] if len(sys.argv) > 1 else "HEAD~1"
    import jax

    jax.config.update("jax_platforms", "cpu")

    import importlib

    from comfyui_video_stabilizer_tpu import nodes as current
    cur_io = importlib.import_module("comfyui_video_stabilizer_tpu.utils.video_io")
    cur_g = importlib.import_module("comfyui_video_stabilizer_tpu.models.geometry")

    with tempfile.TemporaryDirectory() as tmp:
        base_pkg = load_ref(base_ref, pathlib.Path(tmp))
        base = importlib.import_module(f"{PKG}_base.nodes")
        base_io = importlib.import_module(f"{PKG}_base.utils.video_io")
        base_g = importlib.import_module(f"{PKG}_base.models.geometry")

        failures = 0
        failures += compare_io_layouts(cur_io, base_io, scenario_frames())
        failures += compare_geometry(cur_g, base_g)

        # schemas
        for cls_name in ("VideoStabilizerClassic", "VideoStabilizerFlow",
                         "VideoStabilizerMotionApply", "VideoStabilizerShakeGenerator",
                         "VideoStabilizerShakeGeneratorManual", "VideoStabilizerInverse"):
            s_new = getattr(current, cls_name).define_schema()
            s_old = getattr(base, cls_name).define_schema()
            same = (
                s_new.node_id == s_old.node_id
                and [x.id for x in s_new.inputs] == [x.id for x in s_old.inputs]
                and [x.id for x in s_new.outputs] == [x.id for x in s_old.outputs]
            )
            print(f"[schema] {cls_name}: {'OK' if same else 'DIFF'}")
            failures += 0 if same else 1

        frames = scenario_frames()

        # shake determinism across refs: byte-identical JSON
        for cls_name in ("VideoStabilizerShakeGenerator",):
            out_new = getattr(current, cls_name).execute(frames, 16.0, "handheld", 1.0, 1.0, 42)
            out_old = getattr(base, cls_name).execute(frames, 16.0, "handheld", 1.0, 1.0, 42)
            same = json.dumps(out_new[0], sort_keys=True) == json.dumps(out_old[0], sort_keys=True)
            print(f"[shake] byte-identical across refs: {'OK' if same else 'DIFF'}")
            failures += 0 if same else 1

        # full pipelines (3 scenarios incl. the crop keep_fov~=1 bypass,
        # matching the reference's scenario list :380-393)
        for cls_name, args in (
            ("VideoStabilizerClassic", (frames, 16.0, "crop_and_pad", "similarity", False, 0.7, 0.5, 0.6, "#7F7F7F")),
            ("VideoStabilizerFlow", (frames, 16.0, "expand", "translation", False, 0.8, 0.6, 0.6, "#7F7F7F")),
            ("VideoStabilizerClassic", (frames, 24.0, "crop", "translation", False, 0.7, 0.5, 1.0, "#7F7F7F")),
            ("VideoStabilizerFlow", (frames, 24.0, "crop", "similarity", False, 0.7, 0.5, 0.5, "#7F7F7F")),
        ):
            out_new = getattr(current, cls_name).execute(*args)
            out_old = getattr(base, cls_name).execute(*args)
            f_new, f_old = np.asarray(out_new[0]), np.asarray(out_old[0])
            m_new, m_old = np.asarray(out_new[1]), np.asarray(out_old[1])
            ok = (
                f_new.shape == f_old.shape
                and np.allclose(f_new, f_old, atol=ATOL, rtol=RTOL)
                and np.allclose(m_new, m_old, atol=ATOL, rtol=RTOL)
            )
            meta_diffs = deep_compare(out_new[2], out_old[2])
            # timing diagnostics are expected to differ
            meta_diffs = [d for d in meta_diffs if ".timing" not in d]
            print(f"[pipeline] {cls_name}: frames/masks {'OK' if ok else 'DIFF'}; "
                  f"meta diffs: {len(meta_diffs)}")
            for diff in meta_diffs[:10]:
                print(f"    {diff}")
            failures += 0 if ok and not meta_diffs else 1

        print("compare_refactor_behavior:", "OK" if failures == 0 else f"{failures} DIFF(S)")
        return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
