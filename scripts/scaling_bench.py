#!/usr/bin/env python
"""Scaling-efficiency harness: solves/s at 1..N devices.

SURVEY.md §5.8 deliverable: measure batched-solve throughput and scaling
efficiency across the device mesh (virtual CPU devices by default so the
harness runs anywhere; on a real pod slice the same code measures ICI
scaling).

Usage:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/scaling_bench.py --devices 1 2 4 8 --batch-per-device 8
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--batch-per-device", type=int, default=8)
    ap.add_argument("--n-steps", type=int, default=10)
    ap.add_argument("--cpu", action="store_true",
                    help="force CPU backend (virtual devices)")
    ap.add_argument("--fixed-total", type=int, default=0,
                    help="fixed TOTAL batch sharded over each mesh size: "
                    "on virtual devices (which share the host's cores) this "
                    "isolates the SHARDING overhead — wall_1dev/wall_ndev "
                    "~= 1.0 means partitioning+collectives add nothing; "
                    "real ICI scaling needs real chips")
    ap.add_argument("--out", type=str, default="",
                    help="write the JSON summary to this path")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    import jax.numpy as jnp
    import numpy as np

    from trajopt_tpu.benchmarks import bench_params, make_glass_upright
    from trajopt_tpu.parallel.sharding import make_mesh, solve_batch_sharded
    from trajopt_tpu.solver.types import CONVERGED

    params = bench_params()
    results = []
    base_rate = None
    base_wall = None
    for nd in args.devices:
        if nd > len(jax.devices()):
            continue
        batch = args.fixed_total or nd * args.batch_per_device
        if batch % nd:
            continue
        spec, data, _, _ = make_glass_upright(batch=batch,
                                              n_steps=args.n_steps,
                                              dtype=jnp.float32)
        mesh = make_mesh(nd)
        res, tel = solve_batch_sharded(spec, data, params, mesh)  # compile
        jax.block_until_ready(res)
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            res, tel = solve_batch_sharded(spec, data, params, mesh)
            jax.block_until_ready(res)
        dt = (time.perf_counter() - t0) / reps
        ok = int(np.sum(np.asarray(res.status) == CONVERGED))
        rate = ok / dt
        if base_rate is None:
            base_rate = rate
            base_wall = dt
        row = {"devices": nd, "batch": batch, "converged": ok,
               "wall_s": round(dt, 3),
               "solves_per_sec": round(rate, 2)}
        if args.fixed_total:
            # virtual devices share the host cores: the honest quantity is
            # the sharding OVERHEAD at fixed work, not fake "speedup"
            row["sharding_efficiency_vs_1dev"] = round(base_wall / dt, 3)
        else:
            row["scaling_efficiency"] = round(rate / (base_rate * nd), 3)
        results.append(row)
        print(json.dumps(row), flush=True)
    summary = {
        "mode": "fixed_total_sharding_overhead" if args.fixed_total
                else "weak_scaling",
        "backend": str(jax.devices()[0].platform),
        "note": ("virtual CPU devices share the physical cores; "
                 "fixed-total efficiency measures partitioning/collective "
                 "overhead, the component measurable without a pod slice")
                if args.cpu else "",
        "scaling": results,
    }
    print(json.dumps(summary))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
