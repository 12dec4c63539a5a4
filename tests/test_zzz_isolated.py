"""Run crash-prone heavy-compile modules in fresh child processes.

The PR2 reference-parity module passes in isolation but reproducibly
segfaults XLA:CPU's compiler when executed after ~100 other tests in the
same process (round-3 review: 2/2 full-suite runs died inside
``backend_compile_and_load`` at the arm_around_table_time compile).  The
suite must be green as ONE command (`python -m pytest tests -q`, exactly
what CI runs — the reference's ctest-everything discipline,
/root/reference/ci/ubuntu.yml:63), so conftest.py un-collects those
modules from the parent run and this module replays each one in a fresh
subprocess, where the crash has never reproduced.

Named zzz so the (long) parity replay runs last; the persistent compile
cache (zlib-compressed, see conftest.py) makes reruns cheap.
"""

import os
import subprocess
import sys

import pytest

from conftest import ISOLATED_MODULES

_HERE = os.path.dirname(os.path.abspath(__file__))


@pytest.mark.parametrize("module", ISOLATED_MODULES)
def test_isolated_module(module):
    env = dict(os.environ)
    env["TRAJOPT_TPU_ISOLATED_CHILD"] = "1"
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", os.path.join(_HERE, module),
         "-q", "--no-header", "-p", "no:cacheprovider"],
        env=env, capture_output=True, text=True, timeout=3600,
        cwd=_HERE,
    )
    if proc.returncode != 0:
        pytest.fail(
            f"isolated module {module} failed (rc={proc.returncode})\n"
            f"--- stdout ---\n{proc.stdout[-8000:]}\n"
            f"--- stderr ---\n{proc.stderr[-4000:]}")
