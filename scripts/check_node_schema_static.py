#!/usr/bin/env python3
"""Import-free (AST) freeze of the public node schema surface.

Mirrors the reference's static schema gate
(/root/reference/scripts/check_node_schema.py:105-137): the node files
are *parsed*, never imported, so a broken import or heavyweight
module-level initialization cannot mask a schema drift.  Unlike the
reference, this repo builds socket lists through shared helpers
(nodes/stabilizer_nodes.py::_stabilizer_inputs) and a dict-driven loop
(nodes/shake_nodes.py::_RECIPE_LIMITS), so the walker resolves two
extra static constructs:

  * calls to module-level functions / lambdas are inlined (socket
    names collected from the callee's body), and
  * an ``Input(field, ...)`` whose first argument is the loop variable
    of ``for field, ... in <DICT>.items():`` splices in the literal
    string keys of the module-level dict, in declaration order.

Everything else must be a literal string or the check fails loudly.

Run:  python3 scripts/check_node_schema_static.py
"""

from __future__ import annotations

import ast
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
NODES_DIR = ROOT / "comfyui_video_stabilizer_tpu" / "nodes"

# Golden table — matches the reference's
# scripts/check_node_schema.py:11-94 node ids / display names /
# deprecation flags and exact socket order.
EXPECTED = {
    "stabilizer_nodes.py": [
        {
            "node_id": "video_stabilizer_classic",
            "display_name": "Video Stabilizer Classic",
            "inputs": [
                "frames", "frame_rate", "framing_mode", "transform_mode",
                "camera_lock", "strength", "smooth", "keep_fov", "padding_color",
            ],
            "outputs": ["frames_stabilized", "padding_mask", "meta"],
        },
        {
            "node_id": "video_stabilizer_flow",
            "display_name": "Video Stabilizer Flow",
            "inputs": [
                "frames", "frame_rate", "framing_mode", "transform_mode",
                "camera_lock", "strength", "smooth", "keep_fov", "padding_color",
            ],
            "outputs": ["frames_stabilized", "padding_mask", "meta"],
        },
    ],
    "motion_apply_node.py": [
        {
            "node_id": "video_stabilizer_motion_apply",
            "display_name": "Video Stabilizer Motion Apply",
            "inputs": [
                "frames", "motion_meta", "framing_mode", "interpolation",
                "padding_color", "motion_blur", "motion_blur_quality",
            ],
            "outputs": ["frames", "padding_mask", "meta"],
        },
    ],
    "shake_nodes.py": [
        {
            "node_id": "video_stabilizer_shake_generator",
            "display_name": "Video Stabilizer Shake Generator",
            "inputs": ["frames_context", "frame_rate", "style", "amount", "speed", "seed"],
            "outputs": ["motion_meta"],
        },
        {
            "node_id": "video_stabilizer_shake_generator_manual",
            "display_name": "Video Stabilizer Shake Generator Manual",
            "inputs": [
                "frames_context", "frame_rate", "pan", "tilt", "roll", "zoom",
                "drift_freq", "tremor", "tremor_freq", "jitter_rate", "step",
                "randomness", "virtual_fov", "amount", "speed", "seed",
            ],
            "outputs": ["motion_meta"],
        },
    ],
    "inverse_node.py": [
        {
            "node_id": "video_stabilizer_inverse",
            "display_name": "Video Stabilizer Inverse",
            "is_deprecated": True,
            "inputs": ["frames", "meta", "padding_color"],
            "outputs": ["frames_restored", "padding_mask", "meta"],
        },
    ],
}


def _module_tables(tree: ast.Module):
    """Module-level helpers the walker may need to inline."""
    funcs: dict[str, ast.AST] = {}
    dicts: dict[str, list[str]] = {}
    for stmt in tree.body:
        if isinstance(stmt, (ast.FunctionDef, ast.AsyncFunctionDef)):
            funcs[stmt.name] = stmt
        elif isinstance(stmt, ast.Assign) and len(stmt.targets) == 1:
            target = stmt.targets[0]
            if not isinstance(target, ast.Name):
                continue
            if isinstance(stmt.value, ast.Lambda):
                funcs[target.id] = stmt.value
            elif isinstance(stmt.value, ast.Dict):
                keys = [
                    k.value
                    for k in stmt.value.keys
                    if isinstance(k, ast.Constant) and isinstance(k.value, str)
                ]
                if len(keys) == len(stmt.value.keys):
                    dicts[target.id] = keys
    return funcs, dicts


class _SocketWalker:
    """Ordered collection of Input/Output first-arg names."""

    def __init__(self, funcs, dicts):
        self.funcs = funcs
        self.dicts = dicts
        self.inputs: list[str] = []
        self.outputs: list[str] = []
        self.errors: list[str] = []
        self._loop_keys: dict[str, list[str]] = {}  # loop var -> spliceable dict keys

    def walk(self, node: ast.AST) -> None:
        for child in ast.iter_child_nodes(node):
            self._visit(child)

    def _visit(self, node: ast.AST) -> None:
        if isinstance(node, ast.For):
            bound = self._items_loop_binding(node)
            if bound:
                var, keys = bound
                self._loop_keys[var] = keys
                self.walk(node)
                del self._loop_keys[var]
                return
        if isinstance(node, ast.Call):
            func = node.func
            if isinstance(func, ast.Attribute) and func.attr in ("Input", "Output"):
                self._record(func.attr, node)
            elif isinstance(func, ast.Name) and func.id in self.funcs:
                self.walk(self.funcs[func.id])
        self.walk(node)

    def _items_loop_binding(self, node: ast.For):
        """``for field, ... in <DICT>.items():`` -> ('field', keys)."""
        it = node.iter
        if not (
            isinstance(it, ast.Call)
            and isinstance(it.func, ast.Attribute)
            and it.func.attr == "items"
            and isinstance(it.func.value, ast.Name)
            and it.func.value.id in self.dicts
        ):
            return None
        target = node.target
        first = target.elts[0] if isinstance(target, ast.Tuple) and target.elts else target
        if isinstance(first, ast.Name):
            return first.id, self.dicts[it.func.value.id]
        return None

    def _record(self, kind: str, call: ast.Call) -> None:
        dest = self.inputs if kind == "Input" else self.outputs
        if not call.args:
            self.errors.append(f"{kind} call with no positional name at line {call.lineno}")
            return
        arg = call.args[0]
        if isinstance(arg, ast.Constant) and isinstance(arg.value, str):
            dest.append(arg.value)
        elif isinstance(arg, ast.Name) and arg.id in self._loop_keys:
            dest.extend(self._loop_keys[arg.id])
        else:
            self.errors.append(
                f"unresolvable {kind} name at line {call.lineno} (not a literal or items-loop var)"
            )


def _schema_kwargs(fn: ast.FunctionDef) -> dict[str, object]:
    for node in ast.walk(fn):
        if (
            isinstance(node, ast.Call)
            and isinstance(node.func, ast.Attribute)
            and node.func.attr == "Schema"
        ):
            out: dict[str, object] = {}
            for kw in node.keywords:
                if kw.arg and isinstance(kw.value, ast.Constant):
                    out[kw.arg] = kw.value.value
            return out
    return {}


def _check_module(filename: str, expected_nodes: list[dict]) -> list[str]:
    path = NODES_DIR / filename
    try:
        tree = ast.parse(path.read_text(encoding="utf-8"), filename=str(path))
    except FileNotFoundError:
        return [f"{filename}: file not found"]
    except SyntaxError as exc:
        return [f"{filename}: syntax error: {exc.msg} at line {exc.lineno}"]

    funcs, dicts = _module_tables(tree)
    found: list[tuple[dict[str, object], list[str], list[str], list[str]]] = []
    for stmt in tree.body:
        if not isinstance(stmt, ast.ClassDef):
            continue
        define = next(
            (
                n
                for n in stmt.body
                if isinstance(n, ast.FunctionDef) and n.name == "define_schema"
            ),
            None,
        )
        if define is None:
            continue
        walker = _SocketWalker(funcs, dicts)
        walker.walk(define)
        found.append((_schema_kwargs(define), walker.inputs, walker.outputs, walker.errors))

    failures: list[str] = []
    if len(found) != len(expected_nodes):
        failures.append(
            f"{filename}: expected {len(expected_nodes)} schema class(es), found {len(found)}"
        )
        return failures
    for expected, (kwargs, inputs, outputs, errors) in zip(expected_nodes, found):
        tag = f"{filename}:{expected['node_id']}"
        failures.extend(f"{tag}: {e}" for e in errors)
        for key in ("node_id", "display_name"):
            if kwargs.get(key) != expected[key]:
                failures.append(f"{tag}: {key} expected {expected[key]!r}, got {kwargs.get(key)!r}")
        want_dep = expected.get("is_deprecated", False)
        if bool(kwargs.get("is_deprecated", False)) != want_dep:
            failures.append(f"{tag}: is_deprecated expected {want_dep!r}")
        if inputs != expected["inputs"]:
            failures.append(f"{tag}: input order mismatch: {inputs!r}")
        if outputs != expected["outputs"]:
            failures.append(f"{tag}: output order mismatch: {outputs!r}")
    return failures


def main() -> int:
    failures: list[str] = []
    for filename, expected_nodes in EXPECTED.items():
        failures.extend(_check_module(filename, expected_nodes))
    if failures:
        for failure in failures:
            print(f"[schema-static] {failure}")
        return 1
    total = sum(len(v) for v in EXPECTED.values())
    print(f"[schema-static] validated {total} node schema declaration(s) without importing")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
