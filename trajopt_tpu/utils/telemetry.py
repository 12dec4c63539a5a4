"""Host-side solve telemetry: iteration tables and CSV log streams.

The analog of the reference's ``BasicTrustRegionSQPResults::print``
(optimizers.cpp:423-526) and the ``trajopt_solver.log`` /
``trajopt_costs.log`` / ``trajopt_constraints.log`` CSV writers
(optimizers.cpp:528-642, plotted by trajopt/scripts/plot_optimization.py).
"""

from __future__ import annotations

import os

import numpy as np

from ..solver.types import HISTORY_FIELDS, STATUS_NAMES, ProblemSpec, SQPResult


def format_result(res: SQPResult, spec: ProblemSpec) -> str:
    """Reference-style result summary (OptResults operator<<)."""
    lines = [
        "Optimization results:",
        f"status: {STATUS_NAMES.get(int(res.status), '?')}",
        f"total cost: {float(res.total_cost):.6g}",
        f"n func evals: {int(res.n_func_evals)}",
        f"n qp solves: {int(res.n_qp_solves)}",
    ]
    for t, v in zip(spec.cost_terms, np.asarray(res.cost_vals)):
        lines.append(f"  cost {t.name}: {float(v):.6g}")
    for t, v, m in zip(spec.cnt_terms, np.asarray(res.cnt_viols),
                       np.asarray(res.merit_coeffs)):
        lines.append(f"  cnt {t.name}: viol={float(v):.3g} merit={float(m):.3g}")
    return "\n".join(lines)


def format_history(res: SQPResult) -> str:
    """Per-iteration table (printStepInfo analog); needs record_history > 0."""
    H = np.asarray(res.history)
    n = int(res.n_qp_solves)
    rows = [" | ".join(f"{f:>13s}" for f in HISTORY_FIELDS)]
    for i in range(min(n, H.shape[0])):
        rows.append(" | ".join(f"{v:13.4e}" for v in H[i]))
    return "\n".join(rows)


def write_logs(res: SQPResult, spec: ProblemSpec, log_dir: str = "/tmp",
               prefix: str = "trajopt") -> list[str]:
    """Write the CSV log streams (solver history + final per-term values)."""
    os.makedirs(log_dir, exist_ok=True)
    paths = []

    H = np.asarray(res.history)
    n = int(res.n_qp_solves)
    p = os.path.join(log_dir, f"{prefix}_solver.log")
    with open(p, "w") as f:
        f.write(",".join(HISTORY_FIELDS) + "\n")
        for i in range(min(n, H.shape[0])):
            f.write(",".join(f"{v:.9g}" for v in H[i]) + "\n")
    paths.append(p)

    p = os.path.join(log_dir, f"{prefix}_costs.log")
    with open(p, "w") as f:
        f.write(",".join(t.name for t in spec.cost_terms) + "\n")
        f.write(",".join(f"{float(v):.9g}"
                         for v in np.asarray(res.cost_vals)) + "\n")
    paths.append(p)

    p = os.path.join(log_dir, f"{prefix}_constraints.log")
    with open(p, "w") as f:
        f.write(",".join(t.name for t in spec.cnt_terms) + "\n")
        f.write(",".join(f"{float(v):.9g}"
                         for v in np.asarray(res.cnt_viols)) + "\n")
    paths.append(p)

    p = os.path.join(log_dir, f"{prefix}_vars.log")
    with open(p, "w") as f:
        HX = np.asarray(res.history_x)
        if HX.shape[0]:  # per-iteration iterates (record_history_x)
            for i in range(min(n, HX.shape[0])):
                f.write(",".join(f"{float(v):.9g}" for v in HX[i]) + "\n")
        f.write(",".join(f"{float(v):.9g}" for v in np.asarray(res.x)) + "\n")
    paths.append(p)
    return paths
