"""Measure flagship solves/s vs batch size on the real TPU chip.

Answers VERDICT r2 Weak #2: does batch 128 underfill the chip?  Runs the
glass-upright flagship at several batch sizes and prints wall / solves/s
per size.  Usage: python scripts/batch_scaling_probe.py [sizes...]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", "/tmp/trajopt_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def run_size(batch: int, n_rep: int = 3, phase1: int = 0):
    from trajopt_tpu.benchmarks import bench_params, make_glass_upright
    from trajopt_tpu.solver.sqp import solve_batch_compact, _solve_batch_jit
    from trajopt_tpu.solver.types import CONVERGED
    from trajopt_tpu.terms.collision import trajectory_in_collision

    n_steps = 30
    spec, data, _, world = make_glass_upright(batch=batch, n_steps=n_steps,
                                              dtype=jnp.float32)
    params = bench_params()

    if phase1 > 0:
        run = lambda d: solve_batch_compact(spec, d, params,
                                            phase_qp_solves=phase1)
    else:
        run = lambda d: _solve_batch_jit(spec, params, d)

    t0 = time.perf_counter()
    res = run(data)
    jax.block_until_ready(res)
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(n_rep):
        res = run(data)
        jax.block_until_ready(res)
    dt = (time.perf_counter() - t0) / n_rep

    status = np.asarray(res.status)
    viols = np.asarray(res.cnt_viols)
    X = res.x.reshape(batch, n_steps, -1)
    min_dist = np.asarray(jax.jit(jax.vmap(
        lambda x: trajectory_in_collision(world, x)))(X))
    ok = (status == CONVERGED) & (viols.max(axis=1) < 1e-4) & (min_dist >= 0.0)
    n_ok = int(ok.sum())
    out = {
        "batch": batch,
        "phase1": phase1,
        "wall_s": round(dt, 3),
        "compile_s": round(compile_s, 1),
        "converged_ok": n_ok,
        "solves_per_sec": round(n_ok / dt, 1),
        "max_qp_solves": int(np.asarray(res.n_qp_solves).max()),
        "mean_qp_solves": round(float(np.asarray(res.n_qp_solves).mean()), 2),
    }
    print(json.dumps(out), flush=True)
    return out


if __name__ == "__main__":
    phase1 = int(os.environ.get("PROBE_PHASE1", "0"))
    sizes = [int(s) for s in sys.argv[1:]] or [128, 256, 512, 1024]
    for s in sizes:
        run_size(s, phase1=phase1)
