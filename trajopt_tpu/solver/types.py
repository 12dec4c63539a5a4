"""SQP solver types: parameters, statuses, state, results.

Parameter names/defaults mirror the reference
``BasicTrustRegionSQPParameters`` (trajopt_sco/include/trajopt_sco/
optimizers.hpp:92-135) so configs translate 1:1.
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Optional

import jax

from ..ops.qp import QPSettings
from ..terms.base import Term

# Status codes (reference OptStatus, trajopt_sco/include/trajopt_sco/
# optimizers.hpp:25-33; RUNNING is the in-progress sentinel).
RUNNING = 0
CONVERGED = 1
SCO_ITERATION_LIMIT = 2
PENALTY_ITERATION_LIMIT = 3
FAILED = 4
STOPPED_BY_CALLBACK = 5  # modern stack's kStoppedByCallback (types.h:216-225)
TIME_LIMIT = 6  # reference OPT_TIME_LIMIT (optimizers.hpp:25-33)

STATUS_NAMES = {
    RUNNING: "RUNNING",
    CONVERGED: "OPT_CONVERGED",
    SCO_ITERATION_LIMIT: "OPT_SCO_ITERATION_LIMIT",
    PENALTY_ITERATION_LIMIT: "OPT_PENALTY_ITERATION_LIMIT",
    FAILED: "OPT_FAILED",
    STOPPED_BY_CALLBACK: "OPT_STOPPED_BY_CALLBACK",
    TIME_LIMIT: "OPT_TIME_LIMIT",
}

_NEG_INF = float("-inf")


@dataclasses.dataclass(frozen=True)
class SQPParams:
    """Trust-region penalty SQP knobs (hashable; jit-static)."""

    improve_ratio_threshold: float = 0.25
    min_trust_box_size: float = 1e-4
    min_approx_improve: float = 1e-4
    min_approx_improve_frac: float = _NEG_INF
    max_iter: int = 50
    trust_shrink_ratio: float = 0.1
    trust_expand_ratio: float = 1.5
    cnt_tolerance: float = 1e-4
    max_merit_coeff_increases: int = 5
    max_qp_solver_failures: int = 3
    merit_coeff_increase_ratio: float = 10.0
    initial_merit_error_coeff: float = 10.0
    inflate_constraints_individually: bool = True
    trust_box_size: float = 1e-1
    # optional expansion cap (opt-in knob; the reference's trust-region
    # expansion is uncapped, so the default must not change iterates —
    # joint ranges can exceed any fixed constant)
    max_trust_box_size: float = float("inf")
    # device-loop safety cap on total QP solves (the reference caps via
    # max_iter per penalty round + bounded trust shrinks; this is a backstop)
    max_total_qp_solves: int = 3000
    # wall-clock limit in seconds (reference max_time enforcement,
    # optimizers.cpp:735 -> OPT_TIME_LIMIT).  Single-instance solves check
    # a host clock each iteration; batched ``solve_batch_compact`` solves
    # enforce it at phase boundaries (still-running lanes are stamped
    # OPT_TIME_LIMIT — the lockstep-safe batched equivalent).
    max_time: float = float("inf")
    # >0 allocates an on-device iteration-history buffer of that many rows
    # (the analog of the reference's trajopt_solver.log CSV stream,
    # optimizers.cpp:703-713); see HISTORY_FIELDS.
    record_history: int = 0
    # with record_history > 0: also record the iterate x per QP solve (the
    # trajopt_vars.log stream the reference writes each iteration and
    # plot_optimization.py plots, optimizers.cpp:528-642)
    record_history_x: bool = False
    # Optional host callback (the SQPCallback analog,
    # trust_region_sqp_solver.cpp:441-447): called with a dict
    # {x, merit, viols, box, n_qp}; returning True aborts the solve
    # (OPT_STOPPED_BY_CALLBACK).  Single-instance solves call it every
    # iteration; ``solve_batch_compact`` calls it at phase boundaries with
    # the batched arrays and aborts the still-running lanes.
    callback: Optional[Any] = None
    qp: QPSettings = QPSettings()


# columns of SQPResult.history when record_history > 0
HISTORY_FIELDS = (
    "old_merit", "model_merit", "new_merit", "approx_improve",
    "exact_improve", "ratio", "trust_box_size", "max_cnt_viol",
    "accepted", "qp_status",
)


@dataclasses.dataclass(frozen=True, eq=False)
class ProblemSpec:
    """Static problem-class description (shapes + term functions).

    The TPU analog of ``sco::OptProb`` (trajopt_sco/include/trajopt_sco/
    modeling.hpp:188-267): decision-variable count, cost terms, constraint
    terms.  Per-instance numbers (bounds, targets, initial point) live in
    ``ProblemData`` so a single compiled solve serves a whole batch.
    """

    n_x: int
    cost_terms: tuple[Term, ...] = ()
    cnt_terms: tuple[Term, ...] = ()
    # trajectory grid shape (n_x == n_steps * n_cols when set): lets the
    # solver pick the block-tridiagonal KKT factorization when every term's
    # step_coupling is <= 1 (ops.btridiag; SURVEY §5.7(a) band structure)
    n_steps: int = 0
    n_cols: int = 0

    def __post_init__(self):
        for t in self.cost_terms:
            assert t.is_cost, f"{t.name} is not a cost term"
        for t in self.cnt_terms:
            assert not t.is_cost, f"{t.name} is not a constraint term"


class ProblemData(NamedTuple):
    """Per-instance dynamic data (a pytree; add a leading axis to batch)."""

    x0: jax.Array  # (n_x,) initial iterate
    lb: jax.Array  # (n_x,) variable lower bounds (joint limits / fixed vars)
    ub: jax.Array  # (n_x,)
    cost_params: tuple  # pytree params per cost term, in spec order
    cnt_params: tuple  # pytree params per constraint term, in spec order
    # optional mid-solve resume state (None = fresh solve): a dict with
    # "merit" (n_entries,), "box" (), "penalty_it" () int32, "it" () int32 —
    # the solver state beyond the iterate itself (which goes in x0).  Used
    # by two-phase batched solves (run all lanes N iterations, compact the
    # stragglers, continue them in a smaller batch) and by
    # utils.checkpoint restore; the reference analog is GIVEN_TRAJ resume +
    # OSQP warm starts (SURVEY §5.4).
    resume: Any = None


class SQPResult(NamedTuple):
    """Solve outcome (reference OptResults, optimizers.hpp:40-59)."""

    x: jax.Array  # (n_x,) final iterate
    status: jax.Array  # () int32
    cost_vals: jax.Array  # (n_cost,) per-term exact costs at x
    cnt_viols: jax.Array  # (n_cnt,) per-term violations at x
    total_cost: jax.Array  # () sum of cost_vals
    n_func_evals: jax.Array  # () int32
    n_qp_solves: jax.Array  # () int32
    n_admm_iters: jax.Array  # () int32 total inner ADMM iterations
    merit_coeffs: jax.Array  # (n_cnt,) final penalty coefficients
    trust_box_size: jax.Array  # () final trust region size
    sqp_it: jax.Array  # () int32 accepted steps in the current penalty round
    penalty_it: jax.Array  # () int32 merit-coefficient increases so far
    history: jax.Array  # (record_history, len(HISTORY_FIELDS)); (0, F) if off
    history_x: jax.Array  # (record_history, n_x) iterates; (0, n_x) if off
