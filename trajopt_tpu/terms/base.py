"""Term system: costs and constraints as pure JAX functions.

A *term* is the TPU-native analog of the reference's ``sco::Cost`` /
``sco::Constraint`` objects (trajopt_sco/include/trajopt_sco/modeling.hpp) and
the ``CostFromErrFunc`` / ``ConstraintFromErrFunc`` factories
(trajopt_sco/include/trajopt_sco/modeling_utils.hpp:53-113): a pure function
``fn(x, params) -> err_rows`` with a penalty kind attached.  Convexification
is linearization (autodiff or user-supplied analytic Jacobian), so a term
never builds expression objects — the SQP engine assembles dense QP blocks
directly from ``(err, jac)``.

Kinds and their exact values (reference semantics):

- ``SQUARED``   cost  = sum_i w_i * err_i^2
- ``ABS``       cost  = sum_i w_i * |err_i|
- ``HINGE``     cost  = sum_i w_i * max(0, err_i)
- ``GENERIC``   scalar cost f(x); convexified with grad + PSD-projected
                Hessian (reference: trajopt_sco/src/modeling_utils.cpp:79-88)
- ``EQ``        constraint rows err_i = 0;   violation = sum_i |err_i|
- ``INEQ``      constraint rows err_i <= 0;  violation = sum_i max(0, err_i)

Constraint coefficients are folded into ``fn`` (the reference scales the
error inside the constraint, so violation and penalty scale together).
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp


class TermKind(enum.IntEnum):
    SQUARED = 0
    ABS = 1
    HINGE = 2
    GENERIC = 3  # scalar cost, full-Hessian convexification
    EQ = 4
    INEQ = 5


COST_KINDS = (TermKind.SQUARED, TermKind.ABS, TermKind.HINGE, TermKind.GENERIC)
CNT_KINDS = (TermKind.EQ, TermKind.INEQ)


@dataclasses.dataclass(frozen=True, eq=False)
class Term:
    """Static term specification (hashable by identity; safe as jit static).

    ``fn(x, params)`` returns the error rows ``(n_rows,)`` (or a scalar for
    GENERIC).  ``params`` is an arbitrary pytree carried in ``ProblemData``;
    per-instance values (targets, tolerances, obstacle poses, ...) live there
    so one compiled solver serves a whole batch of problem instances.

    ``weight_fn(params)`` returns per-row cost weights ``(n_rows,)`` —
    ignored for constraints (their merit coefficient is the penalty weight).

    ``jac_fn(x, params)`` optionally overrides autodiff linearization with an
    analytic Jacobian ``(n_rows, n_x)`` (the reference's analytic-Jacobian
    term evaluators, e.g. trajopt/src/kinematic_terms.cpp:444-470).
    """

    name: str
    kind: TermKind
    n_rows: int
    fn: Callable[[jax.Array, Any], jax.Array]
    weight_fn: Optional[Callable[[Any], jax.Array]] = None
    jac_fn: Optional[Callable[[jax.Array, Any], jax.Array]] = None
    # constraint violation granularity: rows split into this many equal
    # groups; violation = MAX over groups of the per-group sum.  This
    # reproduces the reference's one-term-per-timestep/per-gap hatching
    # (problem_description.cpp:1726) with a single batched term — per-step
    # FK/collision stays fused instead of launching one tiny evaluation
    # per step.
    viol_groups: int = 1
    # trajectory band structure: the maximum |i - j| over pairs of steps a
    # single error row couples (0 = per-step, 1 = adjacent steps, ...);
    # None = unknown/dense.  When every term of a problem couples <= 1 the
    # condensed KKT matrix is block-tridiagonal and the solver uses the
    # scan-based block Cholesky (ops.btridiag) instead of a dense one.
    step_coupling: Optional[int] = None
    # banded Jacobian: ``jac_banded_fn(x, params) -> (B, G)`` in the
    # ops.banded_rows group format — B (n_groups, rows_per_group, 2*n_cols)
    # window values in the same row order as ``fn``, G (n_groups,) int32
    # window start blocks.  When every hinge/abs/constraint term of a
    # problem provides this, the QP never materializes a dense (m, n)
    # Jacobian (the flagship's dense row matrix is ~15x its nonzeros and
    # dominates HBM traffic otherwise).
    jac_banded_fn: Optional[Callable[[jax.Array, Any], Any]] = None
    # shared precompute: an object with ``value(x)`` and ``value_jac(x)``
    # methods whose outputs feed this term's fns as a third ``aux``
    # argument.  Terms sharing the SAME object (by identity) are evaluated
    # from ONE precompute pass per linearization point by the SQP engine —
    # the analog of the reference's per-x contact-result cache shared by a
    # CollisionCost and CollisionConstraint over the same evaluator
    # (GetContactResultCached, trajopt/src/collision_terms.cpp:440-466).
    # ``err``/``value``/``violations`` receive ``aux = pre_fn.value(x)``;
    # ``jac``/``jac_banded`` receive ``aux = pre_fn.value_jac(x)`` (which
    # includes the value).  All fns must also accept ``aux=None`` and fall
    # back to computing the precompute internally (direct callers, tests).
    pre_fn: Optional[Any] = None

    @property
    def is_cost(self) -> bool:
        return self.kind in COST_KINDS

    def weights(self, params: Any) -> jax.Array:
        if self.weight_fn is None:
            return jnp.ones((self.n_rows,))
        return jnp.asarray(self.weight_fn(params))

    def err(self, x: jax.Array, params: Any, aux: Any = None) -> jax.Array:
        e = self.fn(x, params) if self.pre_fn is None \
            else self.fn(x, params, aux)
        if self.kind == TermKind.GENERIC:
            return jnp.reshape(e, ())
        return jnp.reshape(e, (self.n_rows,))

    def jac(self, x: jax.Array, params: Any, aux: Any = None) -> jax.Array:
        """Linearization (n_rows, n_x); GENERIC uses grad+Hessian elsewhere."""
        if self.jac_fn is not None:
            j = self.jac_fn(x, params) if self.pre_fn is None \
                else self.jac_fn(x, params, aux)
            return jnp.reshape(j, (self.n_rows, x.shape[0]))
        return jnp.reshape(
            jax.jacfwd(lambda xx: self.err(xx, params))(x), (self.n_rows, x.shape[0])
        )

    def jac_banded(self, x: jax.Array, params: Any, aux: Any = None):
        """Banded-window linearization (see jac_banded_fn); None if the
        term has no banded form."""
        if self.jac_banded_fn is None:
            return None
        if self.pre_fn is None:
            return self.jac_banded_fn(x, params)
        return self.jac_banded_fn(x, params, aux)

    def value(self, x: jax.Array, params: Any, aux: Any = None) -> jax.Array:
        """Exact cost value (reference Cost::value semantics)."""
        if self.kind == TermKind.GENERIC:
            return self.err(x, params, aux)
        e = self.err(x, params, aux)
        w = self.weights(params)
        if self.kind == TermKind.SQUARED:
            return jnp.sum(w * e * e)
        if self.kind == TermKind.ABS:
            return jnp.sum(w * jnp.abs(e))
        if self.kind == TermKind.HINGE:
            return jnp.sum(w * jnp.maximum(e, 0.0))
        raise ValueError(f"value() on constraint term {self.name}")

    def violation(self, x: jax.Array, params: Any, aux: Any = None) -> jax.Array:
        """Total exact violation (reference Constraint::violation,
        trajopt_sco/src/modeling.cpp:150-169)."""
        return jnp.sum(self.violations(x, params, aux))

    def violations(self, x: jax.Array, params: Any,
                   aux: Any = None) -> jax.Array:
        """Per-group violations, shape (viol_groups,).  Each group is one
        reference-granularity constraint (its own merit coefficient and
        convergence entry); groups are consecutive equal row blocks."""
        e = self.err(x, params, aux)
        if self.kind == TermKind.EQ:
            v = jnp.abs(e)
        elif self.kind == TermKind.INEQ:
            v = jnp.maximum(e, 0.0)
        else:
            raise ValueError(f"violation() on cost term {self.name}")
        return jnp.sum(v.reshape(self.viol_groups, -1), axis=1)


def squared_cost(name, n_rows, fn, weight_fn=None, jac_fn=None,
                 step_coupling=None, jac_banded_fn=None) -> Term:
    return Term(name, TermKind.SQUARED, n_rows, fn, weight_fn, jac_fn,
                step_coupling=step_coupling, jac_banded_fn=jac_banded_fn)


def abs_cost(name, n_rows, fn, weight_fn=None, jac_fn=None,
             step_coupling=None, jac_banded_fn=None) -> Term:
    return Term(name, TermKind.ABS, n_rows, fn, weight_fn, jac_fn,
                step_coupling=step_coupling, jac_banded_fn=jac_banded_fn)


def hinge_cost(name, n_rows, fn, weight_fn=None, jac_fn=None,
               step_coupling=None, jac_banded_fn=None, pre_fn=None) -> Term:
    return Term(name, TermKind.HINGE, n_rows, fn, weight_fn, jac_fn,
                step_coupling=step_coupling, jac_banded_fn=jac_banded_fn,
                pre_fn=pre_fn)


def generic_cost(name, fn) -> Term:
    # GENERIC terms carry a dense PSD-projected Hessian — never bandable
    return Term(name, TermKind.GENERIC, 1, fn)


def eq_constraint(name, n_rows, fn, jac_fn=None, viol_groups=1,
                  step_coupling=None, jac_banded_fn=None) -> Term:
    return Term(name, TermKind.EQ, n_rows, fn, None, jac_fn, viol_groups,
                step_coupling=step_coupling, jac_banded_fn=jac_banded_fn)


def ineq_constraint(name, n_rows, fn, jac_fn=None, viol_groups=1,
                    step_coupling=None, jac_banded_fn=None, pre_fn=None) -> Term:
    return Term(name, TermKind.INEQ, n_rows, fn, None, jac_fn, viol_groups,
                step_coupling=step_coupling, jac_banded_fn=jac_banded_fn,
                pre_fn=pre_fn)
