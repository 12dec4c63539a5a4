"""Static-analysis gate (the role of the reference's clang-format /
clang-tidy CI workflows, /root/reference/ci/ubuntu.yml:63).  The image
ships no ruff/mypy; scripts/lint.py is a stdlib AST linter."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_lint_gate():
    r = subprocess.run([sys.executable, "scripts/lint.py"], cwd=REPO,
                       capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stdout + r.stderr


def test_sources_compile():
    r = subprocess.run([sys.executable, "-m", "compileall", "-q",
                        "trajopt_tpu", "tests", "scripts", "bench.py",
                        "__graft_entry__.py"], cwd=REPO,
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stdout + r.stderr
