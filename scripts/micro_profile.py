"""Fine-grained TPU timing of the flagship per-iteration stages.

Breaks convexify/evaluate into their constituents to aim the next
optimization (VERDICT r3: the 80% is collision convexify+evaluate):

  fk          — batched FK over all steps
  coll_primal — cast collision errors only (one term)
  coll_both   — cast errors of BOTH collision terms (CSE check: if XLA
                dedups the identical distance pass this is ~= coll_primal)
  coll_jac    — banded Jacobian of one cast term (jacfwd tangents)
  upright     — upright term err+jac
  convexify   — full _convexify (all terms)
  evaluate    — full _evaluate (all terms, exact values)
  qp          — one IPM subproblem solve

Usage: python scripts/micro_profile.py [batch]
"""
import json
import sys
import time

import jax

jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", "/tmp/trajopt_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from trajopt_tpu.benchmarks import bench_params, make_glass_upright
from trajopt_tpu.solver import sqp as S


def timeit(fn, *args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    spec, data, chain, world = make_glass_upright(batch=batch)
    params = bench_params()
    import dataclasses
    p = dataclasses.replace(
        params, qp=dataclasses.replace(params.qp, kkt_block=spec.n_cols))
    plan = S._plan(spec)
    T, D = spec.n_steps, chain.n_dof

    # device-resident inputs: numpy leaves would be re-transferred through
    # the (tunneled) device on EVERY call — a ~30 ms additive floor that
    # polluted the round-4 first-cut numbers
    data = jax.device_put(data)

    out = {"batch": batch}

    @jax.jit
    def floor_probe(d):
        return jax.tree.map(lambda x: x.ravel()[0] if x.size else 0.0, d)
    out["dispatch_floor_ms"] = round(1e3 * timeit(floor_probe, data), 2)

    coll_cost = spec.cost_terms[1]   # cast hinge cost
    coll_cnt = spec.cnt_terms[0]     # cast ineq constraint
    upright = spec.cnt_terms[2]

    X0 = data.x0

    @jax.jit
    def fk(d):
        def one(dd):
            Q = dd.x0.reshape(T, D)
            return jax.vmap(chain.fk)(Q)[1]
        return jax.vmap(one)(d)
    out["fk_ms"] = round(1e3 * timeit(fk, data), 2)

    @jax.jit
    def coll_primal(d):
        def one(dd):
            return coll_cost.err(dd.x0, dd.cost_params[1])
        return jax.vmap(one)(d)
    out["coll_primal_ms"] = round(1e3 * timeit(coll_primal, data), 2)

    @jax.jit
    def coll_both(d):
        def one(dd):
            return (coll_cost.err(dd.x0, dd.cost_params[1]),
                    coll_cnt.err(dd.x0, dd.cnt_params[0]))
        return jax.vmap(one)(d)
    out["coll_both_ms"] = round(1e3 * timeit(coll_both, data), 2)

    @jax.jit
    def coll_jac(d):
        def one(dd):
            return coll_cost.jac_banded(dd.x0, dd.cost_params[1])
        return jax.vmap(one)(d)
    out["coll_jac_ms"] = round(1e3 * timeit(coll_jac, data), 2)

    @jax.jit
    def coll_primal_and_jac(d):
        def one(dd):
            return (coll_cost.err(dd.x0, dd.cost_params[1]),
                    coll_cost.jac_banded(dd.x0, dd.cost_params[1]))
        return jax.vmap(one)(d)
    out["coll_primal_and_jac_ms"] = round(
        1e3 * timeit(coll_primal_and_jac, data), 2)

    @jax.jit
    def upright_ej(d):
        def one(dd):
            return (upright.err(dd.x0, dd.cnt_params[2]),
                    upright.jac_banded(dd.x0, dd.cnt_params[2]))
        return jax.vmap(one)(d)
    out["upright_err_jac_ms"] = round(1e3 * timeit(upright_ej, data), 2)

    @jax.jit
    def conv(d):
        return jax.vmap(
            lambda dd: S._convexify(plan, dd, dd.x0, True))(d)
    out["convexify_ms"] = round(1e3 * timeit(conv, data), 2)

    @jax.jit
    def ev(d):
        return jax.vmap(lambda dd: S._evaluate(spec, dd, dd.x0))(d)
    out["evaluate_ms"] = round(1e3 * timeit(ev, data), 2)

    @jax.jit
    def qp(d):
        def one(dd):
            cvx = S._convexify(plan, dd, dd.x0, True)
            w_h, w_a = S._merit_row_weights(
                plan, cvx, jnp.full((plan.n_entries,), 10.0, dd.x0.dtype))
            qd = S._assemble_qp(plan, cvx, w_h, w_a, dd.x0,
                                jnp.asarray(0.1, dd.x0.dtype), dd.lb, dd.ub)
            from trajopt_tpu.ops.ipm_qp import solve_ipm_qp
            return solve_ipm_qp(qd, p.qp).x
        return jax.vmap(one)(d)
    out["convexify_plus_qp_ms"] = round(1e3 * timeit(qp, data), 2)

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
