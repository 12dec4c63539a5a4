"""Command-line front end: ``python -m trajopt_tpu <command>``.

The analog of the reference's CLI layer (boost::program_options wrapper,
trajopt_common/config.hpp:16-71) plus its JSON problem entry point
(``ConstructProblem``/``OptimizeProblem``,
trajopt/src/problem_description.cpp:394-408, 544).

Commands:
  solve       solve a reference-format JSON problem document
  bench       run the named benchmark problem and print solves/s
  decompose   approximate-convex-decompose an OBJ mesh (V-HACD analog)

Environment: TRAJOPT_LOG_THRESH controls log level (reference
logging.cpp:17); JAX_PLATFORMS / XLA_FLAGS select the backend.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _cmd_solve(args) -> int:
    import jax

    if args.platform:
        # the image's sitecustomize can force a remote TPU backend; the
        # config update (not the env var) is the reliable selector
        jax.config.update("jax_platforms", args.platform)
    if args.f64:
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np

    from . import models
    from .collision.world import build_collision_world
    from .problem.json_io import load_problem
    from .solver.sqp import solve
    from .solver.types import STATUS_NAMES
    from .utils.telemetry import format_history, format_result, write_logs

    with open(args.problem) as f:
        doc = json.load(f)

    if args.model == "urdf":
        if not args.urdf:
            print("--urdf required with --model urdf", file=sys.stderr)
            return 2
        from .kinematics.chain import build_chain
        from .kinematics.urdf import parse_urdf
        model = parse_urdf(open(args.urdf).read())
        joints = args.joints.split(",") if args.joints else [
            j for j in model.joint_names if model.joint_type(j) != "fixed"]
        chain = build_chain(model, joints)
    else:
        model, chain = getattr(models, args.model)()
    world = build_collision_world(model, chain)

    spec, data, params = load_problem(doc, chain, world, n_sub=args.n_sub)
    t0 = time.perf_counter()
    res = solve(spec, data, params)
    jax.block_until_ready(res.x)
    dt = time.perf_counter() - t0

    D = chain.n_dof + (1 if spec.n_x // doc["basic_info"]["n_steps"] >
                       chain.n_dof else 0)
    X = np.asarray(res.x).reshape(-1, D)
    print(format_result(res, spec))
    if args.verbose:
        print(format_history(res))
    print(f"wall: {dt:.3f}s")
    print("trajectory:")
    for row in X:
        print("  " + " ".join(f"{v: .4f}" for v in row))
    if args.log_dir:
        write_logs(res, spec, args.log_dir)
        print(f"iteration logs written to {args.log_dir}")
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"status": STATUS_NAMES[int(res.status)],
                       "trajectory": X.tolist(),
                       "total_cost": float(res.total_cost),
                       "n_qp_solves": int(res.n_qp_solves)}, f, indent=1)
    return 0 if int(res.status) == 1 else 1


def _cmd_bench(args) -> int:
    from .benchmarks import run_benchmarks
    results = run_benchmarks(names=args.names.split(",") if args.names else None,
                             batch=args.batch, repeats=args.repeats)
    print(json.dumps(results, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
    return 0


def _cmd_decompose(args) -> int:
    import dataclasses

    import numpy as np

    from .collision.decompose import decompose

    verts = []
    with open(args.mesh) as f:  # minimal OBJ vertex parse
        for line in f:
            if line.startswith("v "):
                verts.append([float(v) for v in line.split()[1:4]])
    parts = decompose(np.asarray(verts), max_pieces=args.max_hulls)
    out = [dataclasses.asdict(g) for g in parts]
    for g in out:
        for k, v in g.items():
            if isinstance(v, np.ndarray):
                g[k] = v.tolist()
    with open(args.out, "w") as f:
        json.dump({"primitives": out}, f, indent=1, default=str)
    print(f"{len(parts)} convex primitives -> {args.out}")
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="trajopt_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("solve", help="solve a JSON problem document")
    sp.add_argument("problem", help="path to reference-format JSON problem")
    sp.add_argument("--model", default="arm7",
                    help="model zoo name (spherebot|boxbot|arm7) or 'urdf'")
    sp.add_argument("--urdf", help="URDF path when --model urdf")
    sp.add_argument("--joints", help="comma-separated joint names (urdf mode)")
    sp.add_argument("--n-sub", type=int, default=8,
                    help="swept-collision substates per gap")
    sp.add_argument("--f64", action="store_true", help="enable float64")
    sp.add_argument("--platform", help="jax platform (cpu|tpu|axon)")
    sp.add_argument("--log-dir", help="write per-iteration CSV logs here")
    sp.add_argument("--out", help="write result JSON here")
    sp.add_argument("-v", "--verbose", action="store_true")
    sp.set_defaults(fn=_cmd_solve)

    bp = sub.add_parser("bench", help="run benchmark suite")
    bp.add_argument("--names", help="comma-separated benchmark names")
    bp.add_argument("--batch", type=int, default=32)
    bp.add_argument("--repeats", type=int, default=3)
    bp.add_argument("--out", help="write results JSON here (the analog of "
                    "the reference's TRAJOPT_ENABLE_RUN_BENCHMARKING output)")
    bp.set_defaults(fn=_cmd_bench)

    dp = sub.add_parser("decompose", help="convex-decompose an OBJ mesh")
    dp.add_argument("mesh", help="OBJ file")
    dp.add_argument("--max-hulls", type=int, default=16)
    dp.add_argument("--out", default="decomposed.json")
    dp.set_defaults(fn=_cmd_decompose)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
