"""Populate the persistent XLA:CPU compile cache for the test suite.

pytest runs with persistent-cache WRITES disabled (see tests/conftest.py:
`executable.serialize()` intermittently aborts in long-lived processes
that have already done many large compiles, and the corruption can surface
in later unrelated compiles — the round-3 full-suite segfault class).
This script provides the warm path instead: it runs each test module in
its OWN short-lived pytest subprocess with writes enabled
(TRAJOPT_TPU_CACHE_WRITE=1).  In a fresh process the big executables
serialize reliably, and every entry written survives even if a late
serialize in some child does abort — rerunning simply resumes where the
cache left off (entries are content-keyed and monotone).

Usage:  python scripts/warm_cache.py [module.py ...]
        (default: every tests/test_*.py, heaviest first)
"""

import glob
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TESTS = os.path.join(HERE, "tests")

# heavy-compile modules first so a partial warm helps the most
HEAVY = [
    "test_reference_parity.py",
    "test_baseline_scenes.py",
    "test_collision_e2e.py",
    "test_trajectory_e2e.py",
    "test_time_param.py",
    "test_two_phase.py",
]


def main():
    mods = sys.argv[1:]
    if not mods:
        allmods = sorted(
            os.path.basename(p)
            for p in glob.glob(os.path.join(TESTS, "test_*.py")))
        mods = HEAVY + [m for m in allmods if m not in HEAVY]
    env = dict(os.environ)
    env["TRAJOPT_TPU_CACHE_WRITE"] = "1"
    env["TRAJOPT_TPU_ISOLATED_CHILD"] = "1"  # collect isolated modules too
    sys.path.insert(0, TESTS)
    from conftest import ISOLATED_MODULES  # per-test module set

    failures = []
    for m in mods:
        path = os.path.join(TESTS, m)
        if not os.path.exists(path):
            print(f"skip {m}: not found")
            continue
        targets = [path]
        if ISOLATED_MODULES.get(m) == "per-test":
            # one child per test: these modules accumulate enough large
            # compiles in one process to hit the XLA crash
            r = subprocess.run(
                [sys.executable, "-m", "pytest", path, "--collect-only",
                 "-q", "--no-header", "-p", "no:cacheprovider"],
                env=env, cwd=HERE, capture_output=True, text=True)
            ids = [ln.strip() for ln in r.stdout.splitlines() if "::" in ln]
            targets = [os.path.join(HERE, t) for t in ids] or [path]
        t0 = time.time()
        rcs = []
        for tgt in targets:
            r = subprocess.run(
                [sys.executable, "-m", "pytest", tgt, "-q", "--no-header",
                 "-p", "no:cacheprovider"],
                env=env, cwd=HERE, capture_output=True, text=True)
            rcs.append(r.returncode)
        status = "ok" if all(rc == 0 for rc in rcs) else f"rc={rcs}"
        print(f"{m}: {status} ({time.time() - t0:.0f}s)", flush=True)
        if any(rcs):
            failures.append((m, rcs))
    if failures:
        print("NOTE: some modules exited nonzero (late cache-write aborts "
              "after green tests are expected occasionally; entries written "
              "so far are kept):", failures)


if __name__ == "__main__":
    main()
