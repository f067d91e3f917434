"""First-party lint gate (the image ships no ruff/flake8 and installs are
not allowed, so the checks are implemented directly on `ast`).

Mirrors the role of the reference CI's `cargo fmt --check` + `clippy
-D warnings` (/root/reference/.github/workflows/ci.yml:36-50): a fast,
zero-warning static gate over every first-party Python source.

Checks:
  unused-import       module-level import never referenced (`# noqa` opts out)
  mutable-default     list/dict/set literal as a parameter default
  bare-except         `except:` with no exception class
  dup-dict-key        duplicated literal key in a dict display
  all-undefined       name in __all__ not defined in the module
  tab-indent          tabs in indentation
  trailing-ws         trailing whitespace
  long-line           source line over 100 columns

Exit status is non-zero on any finding: warnings are errors, as in the
reference CI.
"""

from __future__ import annotations

import ast
import pathlib
import sys

ROOT = pathlib.Path(__file__).resolve().parents[1]
MAX_LINE = 100

TARGETS = ["curdleproofs_tpu", "tests", "scripts", "examples",
           "bench.py", "__graft_entry__.py"]


def iter_sources():
    for t in TARGETS:
        p = ROOT / t
        if p.is_file():
            yield p
        elif p.is_dir():
            yield from sorted(p.rglob("*.py"))


def _name_used(tree: ast.Module, name: str) -> bool:
    root = name.split(".")[0]
    for node in ast.walk(tree):
        if isinstance(node, ast.Name) and node.id == root:
            return True
        if isinstance(node, ast.Attribute):
            # covers `module.attr` chains rooted at the import
            inner = node
            while isinstance(inner, ast.Attribute):
                inner = inner.value
            if isinstance(inner, ast.Name) and inner.id == root:
                return True
    # referenced in __all__ as a string re-export
    for node in ast.walk(tree):
        if isinstance(node, ast.Assign):
            for t in node.targets:
                if isinstance(t, ast.Name) and t.id == "__all__":
                    if any(isinstance(e, ast.Constant) and e.value == root
                           for e in getattr(node.value, "elts", [])):
                        return True
    return False


def check_file(path: pathlib.Path) -> list[str]:
    rel = path.relative_to(ROOT)
    src = path.read_text()
    out = []
    lines = src.splitlines()
    for i, line in enumerate(lines, 1):
        if line != line.rstrip():
            out.append(f"{rel}:{i}: trailing-ws")
        if line[: len(line) - len(line.lstrip())].count("\t"):
            out.append(f"{rel}:{i}: tab-indent")
        if len(line) > MAX_LINE and "noqa" not in line:
            out.append(f"{rel}:{i}: long-line ({len(line)} cols)")
    try:
        tree = ast.parse(src, filename=str(rel))
    except SyntaxError as e:
        return out + [f"{rel}:{e.lineno}: syntax-error {e.msg}"]

    # unused module-level imports
    for node in tree.body:
        if isinstance(node, (ast.Import, ast.ImportFrom)):
            line = lines[node.lineno - 1]
            if "noqa" in line:
                continue
            if isinstance(node, ast.ImportFrom) and node.module == "__future__":
                continue
            for alias in node.names:
                if alias.name == "*":
                    continue
                bound = alias.asname or alias.name
                rest = ast.Module(
                    body=[n for n in tree.body if n is not node],
                    type_ignores=[])
                if not _name_used(rest, bound):
                    out.append(
                        f"{rel}:{node.lineno}: unused-import {bound}")

    for node in ast.walk(tree):
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            for d in node.args.defaults + node.args.kw_defaults:
                if isinstance(d, (ast.List, ast.Dict, ast.Set)):
                    out.append(
                        f"{rel}:{d.lineno}: mutable-default in {node.name}()")
        if isinstance(node, ast.ExceptHandler) and node.type is None:
            out.append(f"{rel}:{node.lineno}: bare-except")
        if isinstance(node, ast.Dict):
            seen: set = set()
            for k in node.keys:
                if isinstance(k, ast.Constant):
                    if k.value in seen:
                        out.append(
                            f"{rel}:{k.lineno}: dup-dict-key {k.value!r}")
                    seen.add(k.value)

    # __all__ names must exist
    defined = {n.name for n in ast.walk(tree)
               if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef,
                                 ast.ClassDef))}
    for node in ast.walk(tree):
        if isinstance(node, (ast.Assign, ast.AnnAssign)):
            targets = (node.targets if isinstance(node, ast.Assign)
                       else [node.target])
            for t in targets:
                if isinstance(t, ast.Name):
                    defined.add(t.id)
                elif isinstance(t, (ast.Tuple, ast.List)):
                    for e in t.elts:
                        if isinstance(e, ast.Name):
                            defined.add(e.id)
        if isinstance(node, (ast.Import, ast.ImportFrom)):
            for alias in node.names:
                defined.add((alias.asname or alias.name).split(".")[0])
    # module-level __getattr__ (PEP 562 lazy exports) makes __all__
    # membership dynamic — skip the static check for those modules
    has_module_getattr = any(
        isinstance(n, ast.FunctionDef) and n.name == "__getattr__"
        for n in tree.body)
    for node in tree.body:
        if (not has_module_getattr and isinstance(node, ast.Assign)
                and any(isinstance(t, ast.Name) and t.id == "__all__"
                        for t in node.targets)):
            for e in getattr(node.value, "elts", []):
                if isinstance(e, ast.Constant) and e.value not in defined:
                    out.append(
                        f"{rel}:{e.lineno}: all-undefined {e.value!r}")
    return out


def main() -> int:
    findings: list[str] = []
    n = 0
    for path in iter_sources():
        n += 1
        findings += check_file(path)
    for f in findings:
        print(f)
    print(f"lint: {n} files, {len(findings)} findings")
    return 1 if findings else 0


if __name__ == "__main__":
    sys.exit(main())
