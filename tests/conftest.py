"""Test configuration: run on a virtual 8-device CPU mesh with float64.

The driver benches on real TPU hardware; tests validate numerics (f64 on CPU)
and multi-device sharding (8 virtual CPU devices), per the multi-chip testing
strategy in SURVEY.md §4.

NOTE: this environment ships a sitecustomize that force-registers a remote
TPU ("axon") backend and sets JAX_PLATFORMS=axon, overriding the usual env
var route.  ``jax.config.update("jax_platforms", "cpu")`` after import is the
reliable way to pin tests to CPU.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache — READ-ONLY inside pytest.
#
# Writing large XLA:CPU executables to the persistent cache is unstable on
# this image: `executable.serialize()` (compilation_cache.py:265,
# put_executable_and_time) intermittently SIGABRTs in processes that have
# already done many large compiles (observed round 3 at the PR2 parity
# compile and round 4 at the 9-DoF rail compile; the same executables
# serialize fine in a fresh process).  The corruption can also surface in
# later unrelated compiles, so pytest processes never serialize at all:
# reads (deserialize) are stable and keep warm reruns fast.  Writes are
# enabled only when TRAJOPT_TPU_CACHE_WRITE=1 — set by
# scripts/warm_cache.py, which populates the cache from short-lived
# per-module subprocesses where writes happen early in process life.
#
# zstandard one-shot compress also crashed on large buffers; force the
# zlib fallback and use a compressor-specific directory so old
# zstd-written entries are never fed to zlib.decompress.
from jax._src import compilation_cache as _cc

_cc.zstandard = None
if hasattr(_cc, "zstd"):
    _cc.zstd = None
jax.config.update("jax_compilation_cache_dir", "/tmp/trajopt_tpu_jax_cache_zlib")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

if os.environ.get("TRAJOPT_TPU_CACHE_WRITE") != "1":
    def _no_cache_write(cache_key, compile_time, executable, backend):
        return None

    _cc.put_executable_and_time = _no_cache_write

# Modules that are run in fresh child processes by test_zzz_isolated.py
# rather than collected here.  XLA:CPU on this image reproducibly crashes
# (SIGSEGV in backend_compile_and_load, or SIGABRT in
# executable.serialize) in processes that have already done several large
# planning-solve compiles — each program alone compiles fine.  Process
# isolation makes the one-command suite (`pytest tests -q`, what CI runs)
# immune: "module" runs the whole module in one child; "per-test" gives
# EVERY test its own child (for modules whose tests each carry multiple
# large compiles — the baseline-scenes pair crashes within a single
# module run).  The persistent compile cache keeps children fast on
# reruns (see warm_cache.py).
ISOLATED_MODULES = {
    "test_reference_parity.py": "module",
    "test_baseline_scenes.py": "per-test",
}

if os.environ.get("TRAJOPT_TPU_ISOLATED_CHILD") != "1":
    collect_ignore = list(ISOLATED_MODULES)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
