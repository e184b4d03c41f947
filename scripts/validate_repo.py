#!/usr/bin/env python3
"""Repository verification gate (the framework's L0 harness).

Aggregates exit codes from:
  1. byte-compiling every package module,
  2. the import-free AST schema freeze (scripts/check_node_schema_static.py),
  3. the pytest suite (schema freeze, oracle fidelity, replay/inverse
     equivalence, shake determinism + spectra, sharding, hygiene),
  4. example-workflow JSON validation.

Run:  python3 scripts/validate_repo.py [--fast]
"""

from __future__ import annotations

import json
import pathlib
import py_compile
import subprocess
import sys

ROOT = pathlib.Path(__file__).resolve().parents[1]
PACKAGE = ROOT / "comfyui_video_stabilizer_tpu"

KNOWN_NODE_IDS = {
    "video_stabilizer_classic",
    "video_stabilizer_flow",
    "video_stabilizer_motion_apply",
    "video_stabilizer_shake_generator",
    "video_stabilizer_shake_generator_manual",
    "video_stabilizer_inverse",
}


def check_compile() -> int:
    failures = 0
    for path in sorted(PACKAGE.rglob("*.py")) + [ROOT / "bench.py", ROOT / "__graft_entry__.py"]:
        try:
            py_compile.compile(str(path), doraise=True)
        except py_compile.PyCompileError as exc:
            print(f"[compile] FAIL {path}: {exc}")
            failures += 1
    print(f"[compile] {'OK' if not failures else f'{failures} failure(s)'}")
    return failures


def check_workflows() -> int:
    failures = 0
    for path in sorted((ROOT / "example_workflows").glob("*.json")):
        try:
            data = json.loads(path.read_text())
            types = {n.get("type") for n in data.get("nodes", [])}
            if not types & KNOWN_NODE_IDS:
                print(f"[workflows] FAIL {path.name}: no stabilizer node found")
                failures += 1
        except (json.JSONDecodeError, AttributeError) as exc:
            print(f"[workflows] FAIL {path.name}: {exc}")
            failures += 1
    print(f"[workflows] {'OK' if not failures else f'{failures} failure(s)'}")
    return failures


def check_schema_static() -> int:
    """Import-free AST schema freeze — catches drift even when the
    package cannot be imported (mirrors the reference's static gate)."""
    proc = subprocess.run(
        [sys.executable, str(ROOT / "scripts" / "check_node_schema_static.py")], cwd=ROOT
    )
    print(f"[schema-static] {'OK' if proc.returncode == 0 else 'FAIL'}")
    return proc.returncode


def run_pytest(fast: bool) -> int:
    args = [sys.executable, "-m", "pytest", "tests/", "-q"]
    if fast:
        args += ["-x", "-k", "schema or meta or shake or native or aux"]
    proc = subprocess.run(args, cwd=ROOT)
    print(f"[pytest] {'OK' if proc.returncode == 0 else 'FAIL'}")
    return proc.returncode


def main() -> int:
    fast = "--fast" in sys.argv
    failures = check_compile()
    failures += check_schema_static()
    failures += check_workflows()
    failures += run_pytest(fast)
    if failures:
        print(f"validate_repo: FAILED ({failures})")
        return 1
    print("validate_repo: all checks passed")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
