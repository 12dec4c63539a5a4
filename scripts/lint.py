#!/usr/bin/env python
"""Static-analysis gate (stdlib-only; the image ships no ruff/mypy).

Plays the role the reference's clang-format/clang-tidy CI gates play
(/root/reference/ci/ubuntu.yml:63): every source file must parse, and a
set of AST checks catches the classic Python footguns:

  * unused imports (module scope)
  * duplicate top-level def/class names in one module
  * mutable default arguments (list/dict/set literals)
  * bare ``except:``
  * comparisons to None/True/False with ==/!=
  * wildcard imports
  * trailing whitespace / lines > 100 chars (style tier, warning only
    unless --strict)

Exit code: number of error-tier findings (0 = gate passes).
Run: python scripts/lint.py [--strict] [paths...]
"""
from __future__ import annotations

import ast
import sys
from pathlib import Path

ERROR, STYLE = "error", "style"


def check_file(path: Path):
    src = path.read_text()
    out = []
    try:
        tree = ast.parse(src, filename=str(path))
    except SyntaxError as e:
        return [(ERROR, path, e.lineno or 0, f"syntax error: {e.msg}")]

    # ---- unused imports (module scope only; '_' prefixed names exempt) ----
    imported: dict[str, int] = {}
    for node in tree.body:
        if isinstance(node, ast.Import):
            for a in node.names:
                name = (a.asname or a.name).split(".")[0]
                imported[name] = node.lineno
        elif isinstance(node, ast.ImportFrom):
            if any(a.name == "*" for a in node.names):
                out.append((ERROR, path, node.lineno, "wildcard import"))
                continue
            if node.module == "__future__":
                continue
            for a in node.names:
                imported[a.asname or a.name] = node.lineno
    used = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            used.add(node.id)
        elif isinstance(node, ast.Attribute):
            v = node.value
            while isinstance(v, ast.Attribute):
                v = v.value
            if isinstance(v, ast.Name):
                used.add(v.id)
    for name, lineno in imported.items():
        if name not in used and not name.startswith("_") \
                and f"__all__" not in src:
            out.append((ERROR, path, lineno, f"unused import: {name}"))

    # ---- duplicate top-level definitions ----
    seen: dict[str, int] = {}
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef,
                             ast.ClassDef)):
            if node.name in seen:
                out.append((ERROR, path, node.lineno,
                            f"duplicate top-level definition: {node.name} "
                            f"(first at line {seen[node.name]})"))
            seen[node.name] = node.lineno

    for node in ast.walk(tree):
        # ---- mutable default args ----
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            for d in list(node.args.defaults) + [
                    d for d in node.args.kw_defaults if d is not None]:
                if isinstance(d, (ast.List, ast.Dict, ast.Set)):
                    out.append((ERROR, path, node.lineno,
                                f"mutable default argument in {node.name}"))
        # ---- bare except ----
        if isinstance(node, ast.ExceptHandler) and node.type is None:
            out.append((ERROR, path, node.lineno, "bare except:"))
        # ---- ==/!= None/True/False ----
        if isinstance(node, ast.Compare):
            for op, cmp_ in zip(node.ops, node.comparators):
                if isinstance(op, (ast.Eq, ast.NotEq)) and (
                        isinstance(cmp_, ast.Constant)
                        and any(cmp_.value is v
                                for v in (None, True, False))):
                    out.append((ERROR, path, node.lineno,
                                f"comparison to {cmp_.value!r} with ==/!="))

    for i, line in enumerate(src.splitlines(), 1):
        if line != line.rstrip():
            out.append((STYLE, path, i, "trailing whitespace"))
        if len(line) > 100:
            out.append((STYLE, path, i, f"line too long ({len(line)} > 100)"))
    return out


def main(argv):
    strict = "--strict" in argv
    paths = [a for a in argv if not a.startswith("--")]
    roots = [Path(p) for p in paths] or [
        Path("trajopt_tpu"), Path("tests"), Path("scripts"),
        Path("bench.py"), Path("__graft_entry__.py")]
    files = []
    for r in roots:
        files.extend(sorted(r.rglob("*.py")) if r.is_dir() else [r])
    n_err = 0
    for f in files:
        for tier, path, lineno, msg in check_file(f):
            if tier == ERROR or strict:
                print(f"{path}:{lineno}: [{tier}] {msg}")
            if tier == ERROR:
                n_err += 1
    print(f"lint: {len(files)} files, {n_err} errors")
    return min(n_err, 125)


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
