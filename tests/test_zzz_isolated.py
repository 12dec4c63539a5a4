"""The suite orchestrator: every test module runs in a fresh child process.

XLA:CPU on this image crashes nondeterministically in processes that
have accumulated several large compiles — SIGSEGV inside
``backend_compile_and_load`` or SIGABRT inside ``executable.serialize``
(cache writes, now disabled under pytest); the crash site moves between
runs and every affected program compiles fine in a fresh process (see
conftest.py).  The one-command suite (`python -m pytest tests -q`,
exactly what CI runs — the reference's ctest-everything discipline,
/root/reference/ci/ubuntu.yml:63) therefore collects ONLY this module;
the parent performs no XLA compiles, so it cannot crash.  Modules run as
whole-module children, or one child per test where a single module's
compiles are enough to crash (conftest.ISOLATED_MODULES).  The
persistent compile cache (zlib-compressed, populated by
scripts/warm_cache.py) keeps children fast on reruns.
"""

import os
import subprocess
import sys

import pytest

from conftest import ISOLATED_MODULES

_HERE = os.path.dirname(os.path.abspath(__file__))
_ROOT = os.path.dirname(_HERE)


def _run_child(target):
    env = dict(os.environ)
    env["TRAJOPT_TPU_ISOLATED_CHILD"] = "1"
    return subprocess.run(
        [sys.executable, "-m", "pytest", target,
         "-q", "--no-header", "-p", "no:cacheprovider"],
        env=env, capture_output=True, text=True, timeout=3600,
        cwd=_ROOT,
    )


def _collect_ids(module):
    env = dict(os.environ)
    env["TRAJOPT_TPU_ISOLATED_CHILD"] = "1"
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", os.path.join(_HERE, module),
         "--collect-only", "-q", "--no-header", "-p", "no:cacheprovider"],
        env=env, capture_output=True, text=True, timeout=600, cwd=_ROOT)
    ids = [ln.strip().split("::", 1)[1]
           for ln in proc.stdout.splitlines()
           if "::" in ln and not ln.startswith(" ")]
    assert ids, f"collection of {module} found no tests:\n{proc.stdout}"
    return ids


def _fail(target, proc):
    pytest.fail(
        f"isolated child {target} failed (rc={proc.returncode})\n"
        f"--- stdout ---\n{proc.stdout[-8000:]}\n"
        f"--- stderr ---\n{proc.stderr[-4000:]}")


@pytest.mark.parametrize(
    "module", [m for m, mode in ISOLATED_MODULES.items() if mode == "module"])
def test_isolated_module(module):
    proc = _run_child(os.path.join(_HERE, module))
    if proc.returncode != 0:
        _fail(module, proc)


@pytest.mark.parametrize(
    "module",
    [m for m, mode in ISOLATED_MODULES.items() if mode == "per-test"])
def test_isolated_per_test_module(module):
    for test_id in _collect_ids(module):
        proc = _run_child(os.path.join(_HERE, module) + "::" + test_id)
        if proc.returncode != 0:
            _fail(test_id, proc)
