"""Probe flagship throughput vs KKT superblock size on the real TPU.

The block-tridiagonal Cholesky is a sequential scan over n_x/kkt_block
blocks; coarser superblocks trade scan length (seriality) for O(k^2)
per-block arithmetic and window padding.  Usage:
  python scripts/kkt_block_probe.py [k ...]    (k = kkt_block / n_cols)
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

    ks = [int(a) for a in sys.argv[1:]] or [1, 2, 3, 5]
    batch, n_steps = 128, 30
    spec, data, chain, world = make_glass_upright(batch=batch,
                                                  n_steps=n_steps)
    data = jax.device_put(data)
    for k in ks:
        p = bench_params()
        p = dataclasses.replace(
            p, qp=dataclasses.replace(p.qp, kkt_block=k * spec.n_cols))
        run = lambda d: solve_batch_compact(spec, d, p, phase_qp_solves=8)
        res = run(data)
        jax.block_until_ready(res)
        t0 = time.perf_counter()
        for _ in range(3):
            res = run(data)
            jax.block_until_ready(res)
        dt = (time.perf_counter() - t0) / 3
        status, viols = jax.device_get((res.status, res.cnt_viols))
        ok = int(((status == CONVERGED) & (viols.max(axis=1) < 1e-4)).sum())
        print(json.dumps({
            "k": k, "kkt_block": k * spec.n_cols, "wall_s": round(dt, 3),
            "converged": ok, "solves_per_sec": round(ok / dt, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
