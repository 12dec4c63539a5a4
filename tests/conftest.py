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

# Persistent compilation cache: first run pays XLA compile, reruns are fast.
#
# The cache is compressed with zstandard when available; on this image the
# zstandard one-shot compress of the large PR2 XLA:CPU executables segfaults
# (reproducible at compilation_cache.put_executable_and_time).  zlib is
# stable, so force the zlib fallback before anything touches the cache, and
# use a compressor-specific directory so zstd-written entries from older
# runs are never fed to zlib.decompress.
from jax._src import compilation_cache as _cc

_cc.zstandard = None
if hasattr(_cc, "zstd"):
    _cc.zstd = None
jax.config.update("jax_compilation_cache_dir", "/tmp/trajopt_tpu_jax_cache_zlib")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

# Modules that are run in a fresh child process by test_zzz_isolated.py
# rather than collected here.  The PR2 reference-parity module reproducibly
# segfaults XLA:CPU's compiler when it runs after ~100 other tests in the
# same process (compile-state accumulation; each module alone is green).
# Process isolation makes the one-command suite (`pytest tests -q`, what CI
# runs) immune to that crash; the persistent compile cache keeps the child
# fast on reruns.
ISOLATED_MODULES = ("test_reference_parity.py",)

if os.environ.get("TRAJOPT_TPU_ISOLATED_CHILD") != "1":
    collect_ignore = list(ISOLATED_MODULES)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
