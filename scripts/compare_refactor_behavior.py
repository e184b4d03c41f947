#!/usr/bin/env python3
"""Golden A/B harness: compare pipeline behavior between two git refs.

The reference pins refactor safety with a ref-vs-ref comparison
(/root/reference/scripts/compare_refactor_behavior.py); this is the
TPU framework's equivalent.  It materializes the package from a base
git ref into a temp directory, runs identical scenarios against the
working tree and the base ref on the CPU backend, and compares:

  * node schemas (ids, socket order, defaults),
  * motion_meta JSON for the shake generators (must be byte-identical),
  * stabilizer frames/masks within atol/rtol 2e-5 + deep meta equality
    (floating point compared with tolerance).

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

    return importlib.import_module(f"{PKG}_base.nodes")


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


def main() -> int:
    base_ref = sys.argv[1] if len(sys.argv) > 1 else "HEAD~1"
    import jax

    jax.config.update("jax_platforms", "cpu")

    from comfyui_video_stabilizer_tpu import nodes as current

    with tempfile.TemporaryDirectory() as tmp:
        base = load_ref(base_ref, pathlib.Path(tmp))

        failures = 0

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

        # full pipelines
        for cls_name, args in (
            ("VideoStabilizerClassic", (frames, 16.0, "crop_and_pad", "similarity", False, 0.7, 0.5, 0.6, "#7F7F7F")),
            ("VideoStabilizerFlow", (frames, 16.0, "expand", "translation", False, 0.8, 0.6, 0.6, "#7F7F7F")),
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
