"""Containment-rollback canary: two heavy XLA:CPU compiles in ONE process.

The suite runs every module in a fresh child because XLA:CPU on this image
crashes nondeterministically after several large compiles in one process
(see tests/conftest.py and scripts/xla_cpu_crash_repro.py; jax/jaxlib
0.9.0).  This module deliberately performs two flagship-class compiles
back-to-back in its single child.  While the compiler bug exists this
usually still passes (two compiles rarely trip it — the in-suite crashes
appeared after many); the day a jax upgrade makes the REPRO script clean
too, the per-module isolation in conftest can be retired.  If THIS test
starts crashing, the bug got worse — tighten isolation to per-test.
"""

import jax
import jax.numpy as jnp
import numpy as np

from trajopt_tpu.benchmarks import bench_params, make_glass_upright
from trajopt_tpu.solver.sqp import _solve
from trajopt_tpu.solver.types import CONVERGED


def test_two_heavy_compiles_one_process():
    params = bench_params()
    for batch in (2, 3):  # distinct shapes -> two distinct executables
        spec, data, _, _ = make_glass_upright(batch=batch, n_steps=30,
                                              dtype=jnp.float64)
        res = jax.jit(jax.vmap(lambda dd: _solve(spec, params, dd)))(data)
        jax.block_until_ready(res.x)
        assert np.isfinite(np.asarray(res.x)).all()
        assert (np.asarray(res.status) == CONVERGED).all()
