"""Probe flagship throughput vs the IPM iteration cap (and KKT superblock).

The per-lane IPM while_loop locksteps the vmapped batch to its cap when
any lane is slow; the SQP layer tolerates QP_SOLVED_INACCURATE results
(best-iterate tracking guarantees descent), so a tighter cap trades QP
accuracy for wall clock.  The bench gate (all lanes converged AND
independently swept-verified) decides what is acceptable.

Usage: python scripts/ipm_iter_probe.py "k,iters" ["k,iters" ...]
"""
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", "/tmp/trajopt_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)



def main():
    from trajopt_tpu.benchmarks import bench_params, make_glass_upright
    from trajopt_tpu.solver.sqp import solve_batch_compact
    from trajopt_tpu.solver.types import CONVERGED
    from trajopt_tpu.terms.collision import trajectory_in_collision

    cfgs = [tuple(int(x) for x in a.split(",")) for a in sys.argv[1:]] \
        or [(1, 25), (1, 16), (1, 12)]
    batch, n_steps = 128, 30
    spec, data, chain, world = make_glass_upright(batch=batch,
                                                  n_steps=n_steps)
    data = jax.device_put(data)
    verify = jax.jit(jax.vmap(lambda x: trajectory_in_collision(world, x)))
    for k, iters in cfgs:
        p = bench_params()
        p = dataclasses.replace(
            p, qp=dataclasses.replace(p.qp, kkt_block=k * spec.n_cols,
                                      max_ipm_iter=iters))
        run = lambda d: solve_batch_compact(spec, d, p, phase_qp_solves=8)
        res = run(data)
        jax.block_until_ready(res)
        t0 = time.perf_counter()
        for _ in range(3):
            res = run(data)
            jax.block_until_ready(res)
        dt = (time.perf_counter() - t0) / 3
        X = res.x.reshape(batch, n_steps, -1)
        status, viols, min_d = jax.device_get(
            (res.status, res.cnt_viols, verify(X)))
        ok = int(((status == CONVERGED) & (viols.max(axis=1) < 1e-4)
                  & (min_d >= 0.0)).sum())
        print(json.dumps({
            "k": k, "max_ipm_iter": iters, "wall_s": round(dt, 3),
            "verified_ok": ok, "solves_per_sec": round(ok / dt, 2),
            "min_swept": round(float(min_d.min()), 4),
        }), flush=True)


if __name__ == "__main__":
    main()
