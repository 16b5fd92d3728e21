"""Self-contained AST linter — the container has no ruff/mypy (and installs
are off-limits), so this provides the static-check gate locally; the
pyproject.toml [tool.ruff]/[tool.mypy] config is authoritative where those
tools exist. Mirrors the reference CI's `mix check` = format + credo
--strict + dialyzer (mix.exs:31-35) at the fidelity the environment allows.

Checks (each a real credo/ruff analog):
  F401  unused import
  F403  wildcard import
  E722  bare except
  B006  mutable default argument
  B008  function call in default argument (allowlist: frozenset/tuple)
  T201  print() in library code (tools/ and tests/ excluded)
  W291  trailing whitespace
  E501  line longer than 120 chars
"""

from __future__ import annotations

import ast
import sys
from pathlib import Path

MAX_LINE = 120
LIB_DIRS = ("trike_spark",)
ALL_DIRS = ("trike_spark", "tests", "tools")
ALLOWED_DEFAULT_CALLS = {"frozenset", "tuple"}


def _used_names(tree: ast.AST) -> set[str]:
    used: set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            used.add(node.id)
        elif isinstance(node, ast.Attribute):
            # for `a.b.c`, the load-bearing import name is the root `a`
            root = node
            while isinstance(root, ast.Attribute):
                root = root.value
            if isinstance(root, ast.Name):
                used.add(root.id)
    return used


def lint_file(path: Path) -> list[str]:
    src = path.read_text()
    problems: list[str] = []
    try:
        tree = ast.parse(src, filename=str(path))
    except SyntaxError as e:
        return [f"{path}:{e.lineno}: E999 syntax error: {e.msg}"]

    lines = src.splitlines()

    def noqa(lineno: int) -> bool:
        return 1 <= lineno <= len(lines) and "# noqa" in lines[lineno - 1]

    used = _used_names(tree)
    in_lib = str(path).split("/")[0] in LIB_DIRS

    for node in ast.walk(tree):
        if isinstance(node, ast.ImportFrom) and any(a.name == "*" for a in node.names):
            problems.append(f"{path}:{node.lineno}: F403 wildcard import from {node.module}")
        elif isinstance(node, (ast.Import, ast.ImportFrom)):
            for a in node.names:
                if a.name == "*":
                    continue
                bound = a.asname or a.name.split(".")[0]
                if bound not in used and not bound.startswith("_"):
                    # `import x as _x` / __future__ are deliberate
                    if isinstance(node, ast.ImportFrom) and node.module == "__future__":
                        continue
                    problems.append(f"{path}:{node.lineno}: F401 unused import {bound!r}")
        elif isinstance(node, ast.ExceptHandler) and node.type is None:
            problems.append(f"{path}:{node.lineno}: E722 bare except")
        elif isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            for d in list(node.args.defaults) + [x for x in node.args.kw_defaults if x]:
                if isinstance(d, (ast.List, ast.Dict, ast.Set)):
                    problems.append(
                        f"{path}:{d.lineno}: B006 mutable default argument in {node.name}()"
                    )
                elif isinstance(d, ast.Call):
                    fn = d.func
                    name = fn.id if isinstance(fn, ast.Name) else getattr(fn, "attr", "")
                    if name not in ALLOWED_DEFAULT_CALLS:
                        problems.append(
                            f"{path}:{d.lineno}: B008 call {name}() in default argument of {node.name}()"
                        )
        elif (
            in_lib
            and isinstance(node, ast.Call)
            and isinstance(node.func, ast.Name)
            and node.func.id == "print"
        ):
            problems.append(f"{path}:{node.lineno}: T201 print() in library code")

    for i, line in enumerate(lines, 1):
        if line != line.rstrip():
            problems.append(f"{path}:{i}: W291 trailing whitespace")
        if len(line) > MAX_LINE and "# noqa" not in line:
            problems.append(f"{path}:{i}: E501 line too long ({len(line)} > {MAX_LINE})")
    return [p for p in problems if not noqa(int(p.split(":")[1]))]


def main() -> int:
    root = Path(__file__).resolve().parent.parent
    targets = sys.argv[1:] or [str(root / d) for d in ALL_DIRS] + [
        str(root / "__spark_entry__.py"),
        str(root / "bench.py"),
    ]
    files: list[Path] = []
    for t in targets:
        p = Path(t)
        files += sorted(p.rglob("*.py")) if p.is_dir() else [p]
    all_problems: list[str] = []
    for f in files:
        all_problems += [m.replace(str(root) + "/", "") for m in lint_file(f)]
    for p in all_problems:
        print(p)
    print(f"{len(all_problems)} problems in {len(files)} files")
    return 1 if all_problems else 0


if __name__ == "__main__":
    raise SystemExit(main())
