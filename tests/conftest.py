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
jax.config.update("jax_compilation_cache_dir", "/tmp/trajopt_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
