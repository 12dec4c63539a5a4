"""Run crash-prone heavy-compile modules in fresh child processes.

XLA:CPU on this image intermittently crashes in processes that have
already performed several large planning-solve compiles: SIGSEGV inside
``backend_compile_and_load`` (round-3 review, 2/2 full-suite runs; round
4 at the 9-DoF rail compile after the pick-and-place compiles) or
SIGABRT inside ``executable.serialize`` (cache writes — now disabled
under pytest, conftest.py).  Every affected program compiles fine in a
fresh process, so the suite stays green as ONE command
(`python -m pytest tests -q`, exactly what CI runs — the reference's
ctest-everything discipline, /root/reference/ci/ubuntu.yml:63) by running
those modules in child processes: whole-module children where one test's
compiles are safe, per-test children where a single module accumulates
too many large compiles (conftest.ISOLATED_MODULES).

Named zzz so the heavy replays run last; the persistent compile cache
(zlib-compressed, populated by scripts/warm_cache.py) keeps children
fast on reruns.
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
