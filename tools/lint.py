#!/usr/bin/env python3
"""Static lint gate (stdlib-only — this image has no ruff/pyflakes).

Mirrors the spirit of the reference's golangci-lint gate (.golangci.yml):
a real defect-finding pass wired into `make lint` / scripts/pre-commit,
not just a syntax check. Rules:

  F401  unused import
  E722  bare `except:`
  B006  mutable default argument (literal or dict()/list()/set() call)
  E711  comparison to None/True/False with ==/!=
  F811  redefinition of a top-level name in the same scope
  F541  f-string without any placeholder
  X001  exported-but-unused: a name in a library `__all__` that no other
        file in the repo (library, tests, tools, bench) ever references

A line containing `noqa` suppresses findings on that line.
Exit status 1 if any finding; prints file:line: code message.
"""

from __future__ import annotations

import ast
import pathlib
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent
TARGETS = ["go_mp3_tpu", "tests", "tools", "bench.py", "__graft_entry__.py",
           "example"]

def iter_files():
    for t in TARGETS:
        p = ROOT / t
        if p.is_file():
            yield p
        elif p.is_dir():
            yield from sorted(p.rglob("*.py"))


class Checker(ast.NodeVisitor):
    def __init__(self, path: pathlib.Path, src: str):
        self.path = path
        self.lines = src.splitlines()
        self.findings: list[tuple[int, str, str]] = []
        self.imported: dict[str, int] = {}
        self.used: set[str] = set()

    def add(self, lineno: int, code: str, msg: str) -> None:
        line = self.lines[lineno - 1] if lineno - 1 < len(self.lines) else ""
        if "noqa" in line:
            return
        self.findings.append((lineno, code, msg))

    # --- imports -----------------------------------------------------------
    def visit_Import(self, node: ast.Import) -> None:
        for a in node.names:
            name = (a.asname or a.name).split(".")[0]
            self.imported.setdefault(name, node.lineno)

    def visit_ImportFrom(self, node: ast.ImportFrom) -> None:
        if node.module == "__future__":
            return
        for a in node.names:
            if a.name == "*":
                continue
            name = a.asname or a.name
            self.imported.setdefault(name, node.lineno)

    def visit_Name(self, node: ast.Name) -> None:
        if isinstance(node.ctx, ast.Load):
            self.used.add(node.id)
        self.generic_visit(node)

    def visit_Attribute(self, node: ast.Attribute) -> None:
        self.used.add(node.attr)  # attribute access counts as symbol use
        self.generic_visit(node)

    # --- rules ---------------------------------------------------------------
    def visit_ExceptHandler(self, node: ast.ExceptHandler) -> None:
        if node.type is None:
            self.add(node.lineno, "E722", "bare `except:`")
        self.generic_visit(node)

    def _check_defaults(self, node) -> None:
        for d in list(node.args.defaults) + list(node.args.kw_defaults):
            if d is None:
                continue
            mutable = isinstance(d, (ast.List, ast.Dict, ast.Set)) or (
                isinstance(d, ast.Call)
                and isinstance(d.func, ast.Name)
                and d.func.id in ("dict", "list", "set", "bytearray")
            )
            if mutable:
                self.add(d.lineno, "B006", "mutable default argument")

    def visit_FunctionDef(self, node: ast.FunctionDef) -> None:
        self._check_defaults(node)
        self.generic_visit(node)

    def visit_AsyncFunctionDef(self, node: ast.AsyncFunctionDef) -> None:
        self._check_defaults(node)
        self.generic_visit(node)

    def visit_Compare(self, node: ast.Compare) -> None:
        for op, comp in zip(node.ops, node.comparators):
            if isinstance(op, (ast.Eq, ast.NotEq)) and (
                isinstance(comp, ast.Constant)
                and (comp.value is None or comp.value is True or comp.value is False)
            ):
                self.add(node.lineno, "E711",
                         "comparison to None/True/False with ==/!= "
                         "(use is/is not)")
        self.generic_visit(node)

    def visit_JoinedStr(self, node: ast.JoinedStr) -> None:
        if not any(isinstance(v, ast.FormattedValue) for v in node.values):
            self.add(node.lineno, "F541", "f-string without placeholders")
        # visit placeholder expressions but NOT format specs (format specs
        # are themselves JoinedStr nodes and would false-positive F541)
        for v in node.values:
            if isinstance(v, ast.FormattedValue):
                self.visit(v.value)


def check_redefinitions(tree: ast.Module, checker: Checker) -> None:
    seen: dict[str, int] = {}
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            if node.name in seen:
                checker.add(
                    node.lineno, "F811",
                    f"redefinition of {node.name!r} (first at line "
                    f"{seen[node.name]})",
                )
            seen[node.name] = node.lineno


def check_file(path: pathlib.Path):
    """Returns (findings, exports [(name, lineno)], used-name set)."""
    src = path.read_text()
    try:
        tree = ast.parse(src, filename=str(path))
    except SyntaxError as e:
        return ([f"{path}:{e.lineno}: E999 syntax error: {e.msg}"], [], set())
    c = Checker(path, src)
    c.visit(tree)
    check_redefinitions(tree, c)
    # unused imports: names imported but never loaded anywhere in the module
    dunder_all: list[tuple[str, int]] = []
    for node in tree.body:
        if (isinstance(node, ast.Assign)
                and any(isinstance(t, ast.Name) and t.id == "__all__"
                        for t in node.targets)
                and isinstance(node.value, (ast.List, ast.Tuple))):
            for elt in node.value.elts:
                if isinstance(elt, ast.Constant) and isinstance(elt.value, str):
                    dunder_all.append((elt.value, elt.lineno))
    all_names = {n for n, _ in dunder_all}
    if path.name != "__init__.py":  # re-export surfaces are exempt
        for name, lineno in c.imported.items():
            if name not in c.used and name not in all_names and name != "_":
                c.add(lineno, "F401", f"unused import {name!r}")
    out = []
    for lineno, code, msg in sorted(c.findings):
        out.append(f"{path.relative_to(ROOT)}:{lineno}: {code} {msg}")
    # importing a name is also a use, for the cross-file X001 pass
    used = c.used | set(c.imported)
    return out, dunder_all, used


def main() -> int:
    findings: list[str] = []
    exports: list[tuple[pathlib.Path, str, int]] = []  # library __all__ names
    used_elsewhere: dict[pathlib.Path, set[str]] = {}
    n = 0
    for f in iter_files():
        n += 1
        file_findings, dunder_all, used = check_file(f)
        findings.extend(file_findings)
        used_elsewhere[f] = used
        if f.parts[len(ROOT.parts)] == "go_mp3_tpu":
            exports.extend((f, name, lineno) for name, lineno in dunder_all)
    # X001: a library export no other file ever references (Name load,
    # attribute access, or import) is dead public API
    for f, name, lineno in exports:
        if not any(
            name in used for other, used in used_elsewhere.items()
            if other != f
        ):
            findings.append(
                f"{f.relative_to(ROOT)}:{lineno}: X001 exported-but-unused "
                f"{name!r} (no other file references it)"
            )
    for line in findings:
        print(line)
    print(f"lint: {n} files, {len(findings)} finding(s)", file=sys.stderr)
    return 1 if findings else 0


if __name__ == "__main__":
    sys.exit(main())
