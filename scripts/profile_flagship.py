"""Stage breakdown of the flagship (glass-upright) benchmark.

Times the three stages of one SQP iteration separately, each as its own
jitted+vmapped program on the real bench batch, and compares their sum
against the full solve wall — the committed profile VERDICT r2 asked for
before any more perf tuning.

  convexify   — all term err/jac evaluations (FK + collision + autodiff)
  qp_solve    — the interior-point subproblem solve
  evaluate    — exact cost/violation re-evaluation at the candidate point

Usage:  python scripts/profile_flagship.py [batch] [n_steps]
Writes PROFILE_FLAGSHIP.json at the repo root.
"""
import json
import sys
import time

import jax

jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", "/tmp/trajopt_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from trajopt_tpu.benchmarks import bench_params, make_glass_upright
from trajopt_tpu.solver import sqp as S


def timeit(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    spec, data, chain, world = make_glass_upright(batch=batch,
                                                  n_steps=n_steps)
    params = bench_params()
    import dataclasses
    p = params
    plan = S._plan(spec)
    if p.qp.kkt_block == 0 and S._bandable(spec):
        p = dataclasses.replace(
            p, qp=dataclasses.replace(p.qp, kkt_block=spec.n_cols))
    banded_rows = (plan.all_rows_banded and p.qp.kkt_block == spec.n_cols
                   and S._bandable(spec))
    print(f"batch={batch} n_steps={n_steps} n_x={spec.n_x} "
          f"banded_rows={banded_rows}")
    for t in spec.cost_terms + spec.cnt_terms:
        print(f"  {t.name}: rows={t.n_rows}")

    X = data.x0  # (batch, n_x)

    @jax.jit
    def conv(d):
        return jax.vmap(
            lambda dd: S._convexify(plan, dd, dd.x0, banded_rows))(d)

    @jax.jit
    def qp(d):
        def one(dd):
            cvx = S._convexify(plan, dd, dd.x0, banded_rows)
            w_h, w_a = S._merit_row_weights(
                plan, cvx, jnp.full((plan.n_entries,),
                                    p.initial_merit_error_coeff, dd.x0.dtype))
            qd = S._assemble_qp(plan, cvx, w_h, w_a, dd.x0,
                                jnp.asarray(0.1, dd.x0.dtype), dd.lb, dd.ub)
            from trajopt_tpu.ops.ipm_qp import solve_ipm_qp
            return solve_ipm_qp(qd, p.qp).x
        return jax.vmap(one)(d)

    @jax.jit
    def ev(d):
        return jax.vmap(lambda dd: S._evaluate(spec, dd, dd.x0))(d)

    @jax.jit
    def full(d):
        return jax.vmap(lambda dd: S._solve(spec, p, dd))(d)

    t_conv = timeit(conv, data)
    t_convqp = timeit(qp, data)
    t_ev = timeit(ev, data)
    res = full(data)
    jax.block_until_ready(res)
    t_full = timeit(full, data, reps=3)
    n_qp = float(np.asarray(res.n_qp_solves).mean())
    t_qp = t_convqp - t_conv
    per_iter = t_conv + t_qp + t_ev
    out = {
        "batch": batch, "n_steps": n_steps, "n_x": spec.n_x,
        "banded_rows": bool(banded_rows),
        "convexify_s": round(t_conv, 4),
        "qp_solve_s": round(max(t_qp, 0.0), 4),
        "evaluate_s": round(t_ev, 4),
        "per_iter_s": round(per_iter, 4),
        "mean_qp_solves": round(n_qp, 2),
        "predicted_full_s": round(per_iter * n_qp, 4),
        "full_solve_s": round(t_full, 4),
        "solves_per_sec_all_lanes": round(batch / t_full, 2),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(out, indent=1))
    with open("/root/repo/PROFILE_FLAGSHIP.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
