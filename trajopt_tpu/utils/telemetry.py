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


def constraint_entry_names(spec: ProblemSpec) -> list[str]:
    """One name per violation entry (terms with viol_groups > 1 expand to
    ``name[g]`` — the reference hatches one constraint per step/gap,
    problem_description.cpp:1726, so entries ARE its per-constraint
    columns)."""
    names = []
    for t in spec.cnt_terms:
        if t.viol_groups == 1:
            names.append(t.name)
        else:
            names.extend(f"{t.name}[{g}]" for g in range(t.viol_groups))
    return names


def per_term_history(res: SQPResult, spec: ProblemSpec, data):
    """Exact per-term costs and per-entry violations at EVERY recorded
    iterate, reconstructed from ``history_x`` (requires ``record_history >
    0`` and ``record_history_x=True``; ``data`` is the lane's
    ProblemData).  Returns (costs (n, n_cost), viols (n, n_entries)) —
    the per-iteration columns of the reference's ``trajopt_costs.log`` /
    ``trajopt_constraints.log`` (optimizers.cpp:528-642)."""
    import jax

    from ..solver.sqp import _evaluate

    HX = np.asarray(res.history_x)
    n = min(int(res.n_qp_solves), HX.shape[0])
    if n == 0:
        raise ValueError("per_term_history needs record_history_x=True "
                         "and at least one recorded iterate")
    cv, vv = jax.jit(jax.vmap(lambda x: _evaluate(spec, data, x)))(
        res.history_x[:n])
    return np.asarray(cv), np.asarray(vv)


def write_logs(res: SQPResult, spec: ProblemSpec, log_dir: str = "/tmp",
               prefix: str = "trajopt", data=None) -> list[str]:
    """Write the CSV log streams (solver history + per-term values).

    With ``data`` (the lane's ProblemData) and ``record_history_x`` on,
    ``{prefix}_costs.log`` / ``{prefix}_constraints.log`` carry one row
    per iteration (every term's exact value at every recorded iterate —
    the reference's per-iteration streams, optimizers.cpp:528-642, which
    plot_optimization.py plots as per-term curves); otherwise they carry
    the final values only."""
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

    iter_cv = iter_vv = None
    if data is not None and np.asarray(res.history_x).shape[0]:
        iter_cv, iter_vv = per_term_history(res, spec, data)

    p = os.path.join(log_dir, f"{prefix}_costs.log")
    with open(p, "w") as f:
        f.write(",".join(t.name for t in spec.cost_terms) + "\n")
        if iter_cv is not None:
            for row in iter_cv:
                f.write(",".join(f"{float(v):.9g}" for v in row) + "\n")
        f.write(",".join(f"{float(v):.9g}"
                         for v in np.asarray(res.cost_vals)) + "\n")
    paths.append(p)

    p = os.path.join(log_dir, f"{prefix}_constraints.log")
    with open(p, "w") as f:
        if iter_vv is not None:
            f.write(",".join(constraint_entry_names(spec)) + "\n")
            for row in iter_vv:
                f.write(",".join(f"{float(v):.9g}" for v in row) + "\n")
            f.write(",".join(f"{float(v):.9g}"
                             for v in np.asarray(res.cnt_viols)) + "\n")
        else:
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
