"""Minimal repro for the XLA:CPU multi-compile crash this suite contains.

Symptom (jax/jaxlib 0.9.0, linux x86-64, this image): a single process that
performs SEVERAL large, distinct XLA:CPU compiles eventually dies with
SIGSEGV inside ``backend_compile_and_load`` or SIGABRT inside
``executable.serialize()`` (persistent-cache write path).  The crash is
nondeterministic — the failing compile moves between runs and every
affected program compiles fine in a fresh process — which points at
accumulated process state in the CPU compiler, not at any one program.
Observed in-suite at: the PR2 parity compile after 108 tests (round 3),
the 9-DoF rail compile and a cast-jacfwd compile at 47% of the suite
(round 4).

Freshest in-the-wild instance (2026-08-21, this round): an explicit
``pytest tests/test_convex.py tests/test_collision.py tests/test_collision_e2e.py
tests/test_baseline_scenes.py tests/test_contact_reduction.py`` invocation
(which bypasses the conftest orchestrator's per-module children — explicit
module args defeat ``collect_ignore``) segfaulted in
``compiler.py:362 backend_compile_and_load`` after 29 tests of accumulated
compiles; the same modules pass when run one process per module.

This script is the isolated repro: it builds N distinct flagship-class
solve programs (batch size varies to force distinct executables) in ONE
process with persistent-cache writes ENABLED (both crash sites active).
Exit 0 = no crash this run (the bug is nondeterministic: rerun, or raise
N); a SIGSEGV/SIGABRT mid-run reproduces the containment's motivation.

Containment in tests/conftest.py: every test module runs in a fresh child
(test_zzz_isolated.py) and pytest processes never write the persistent
cache.  Canary for rollback: tests/test_zcanary_multicompile.py runs two
heavy compiles in one child — when a future jax/jaxlib stops crashing
here and in this repro, the per-module isolation can be retired.

Usage:  python scripts/xla_cpu_crash_repro.py [n_compiles=6]
"""

import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# cache writes ON (the serialize-on-write crash site), in a scratch dir so
# a crash cannot corrupt the suite's warm cache
jax.config.update("jax_compilation_cache_dir", "/tmp/xla_cpu_crash_repro_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    from trajopt_tpu.benchmarks import bench_params, make_glass_upright
    from trajopt_tpu.solver.sqp import _solve

    params = bench_params()
    for i in range(n):
        batch = 2 + i  # distinct batch => distinct executable, no cache hit
        spec, data, _, _ = make_glass_upright(batch=batch, n_steps=30,
                                              dtype=jnp.float64)
        print(f"[{i + 1}/{n}] compiling flagship solve at batch={batch} ...",
              flush=True)
        res = jax.jit(jax.vmap(lambda dd: _solve(spec, params, dd)))(data)
        jax.block_until_ready(res.x)
        print(f"    ok (statuses {res.status.tolist()})", flush=True)
    print("no crash in", n, "large compiles — rerun or raise N "
          "(the failure is nondeterministic)")


if __name__ == "__main__":
    main()
