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

# fail LOUDLY if a jax upgrade renames the patched internals (setting an
# attribute always succeeds, so a silent no-op would bring the crashy
# zstd/serialize paths back as nondeterministic suite SIGABRTs with no
# pointer here) — ADVICE r4: assert the symbols exist before patching
assert hasattr(_cc, "zstandard") and hasattr(_cc, "put_executable_and_time"), (
    "jax internals changed (jax " + jax.__version__ + "): the compilation-"
    "cache stability patch in tests/conftest.py no longer applies — "
    "re-verify the zstd-compress / serialize-on-write crash workaround")
_cc.zstandard = None
if hasattr(_cc, "zstd"):
    _cc.zstd = None
jax.config.update("jax_compilation_cache_dir", "/tmp/trajopt_tpu_jax_cache_zlib")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

if os.environ.get("TRAJOPT_TPU_CACHE_WRITE") != "1":
    # *args: jax 0.9 passes 5 positionals (the extra min_compile_time);
    # a fixed 4-arg signature made every call raise-and-warn instead of
    # silently skipping the write
    def _no_cache_write(*_args, **_kw):
        return None

    _cc.put_executable_and_time = _no_cache_write

# EVERY test module runs in a fresh child process, driven by
# test_zzz_isolated.py.  XLA:CPU on this image crashes nondeterministically
# (SIGSEGV in backend_compile_and_load, or SIGABRT in
# executable.serialize) in processes that have accumulated several large
# compiles; the crash site moves between runs (round-3 review: PR2 parity
# compile after 108 tests; round 4: the 9-DoF rail compile, then a cast
# jacfwd compile at 47% of the suite) and every affected program compiles
# fine in a fresh process.  The one-command suite (`pytest tests -q`,
# what CI runs) therefore collects ONLY the orchestrator, whose parent
# process performs no XLA compiles at all: "module" runs a module in one
# child; "per-test" gives every test its own child (modules whose single
# run accumulates enough compiles to crash).  The persistent compile
# cache keeps children fast on reruns (see scripts/warm_cache.py).
import glob as _glob

_PER_TEST = {"test_baseline_scenes.py"}
ISOLATED_MODULES = {
    m: ("per-test" if m in _PER_TEST else "module")
    for m in sorted(
        os.path.basename(p)
        for p in _glob.glob(os.path.join(os.path.dirname(__file__),
                                         "test_*.py")))
    if m != "test_zzz_isolated.py"
}

if os.environ.get("TRAJOPT_TPU_ISOLATED_CHILD") != "1":
    collect_ignore = list(ISOLATED_MODULES)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
