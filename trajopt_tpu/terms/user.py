"""User-defined terms.

Reference: UserDefinedTermInfo (trajopt/src/problem_description.cpp:599-675)
— an arbitrary per-step error function (+ optional analytic Jacobian)
attached as a cost or constraint.  The TPU analog is thinner because
:class:`~trajopt_tpu.terms.base.Term` already *is* a user function; these
helpers add the per-step plumbing over the (n_steps, n_dof) grid.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .base import (
    Term,
    TermKind,
    abs_cost,
    eq_constraint,
    hinge_cost,
    ineq_constraint,
    squared_cost,
)

_BUILDERS = {
    TermKind.SQUARED: squared_cost,
    TermKind.ABS: abs_cost,
    TermKind.HINGE: hinge_cost,
    TermKind.EQ: eq_constraint,
    TermKind.INEQ: ineq_constraint,
}


def user_defined_term(
    name: str,
    kind: TermKind,
    n_steps: int,
    n_dof: int,
    err_fn: Callable,  # (q (n_dof,), params) -> (rows_per_step,)
    rows_per_step: int,
    first_step: int = 0,
    last_step: Optional[int] = None,
    jac_fn: Optional[Callable] = None,  # (q, params) -> (rows, n_dof)
) -> Term:
    """Apply a per-configuration error function at each step in range.

    params may carry anything ``err_fn`` needs; cost kinds read per-row
    weights from params["coeffs"] when present.
    """
    last = (n_steps - 1) if last_step is None else last_step
    span = last - first_step + 1
    n_rows = span * rows_per_step

    def fn(x, p):
        X = x.reshape(n_steps, n_dof)[first_step:last + 1]
        return jax.vmap(lambda q: jnp.reshape(err_fn(q, p),
                                              (rows_per_step,)))(X).reshape(-1)

    builder = _BUILDERS[kind]
    kwargs = {}
    if kind in (TermKind.SQUARED, TermKind.ABS, TermKind.HINGE):
        def wf(p):
            if isinstance(p, dict) and "coeffs" in p:
                w = jnp.broadcast_to(jnp.asarray(p["coeffs"]),
                                     (span, rows_per_step))
                return w.reshape(-1)
            return jnp.ones((n_rows,))
        kwargs["weight_fn"] = wf
    if jac_fn is not None:
        step_starts = [first_step + i for i in range(span)]

        def full_jac(x, p):
            X = x.reshape(n_steps, n_dof)
            blocks = []
            for i, t in enumerate(step_starts):
                Jq = jnp.reshape(jac_fn(X[t], p), (rows_per_step, n_dof))
                row = jnp.zeros((rows_per_step, n_steps * n_dof), x.dtype)
                row = jax.lax.dynamic_update_slice(
                    row, Jq, (0, t * n_dof))
                blocks.append(row)
            return jnp.concatenate(blocks, axis=0)
        kwargs["jac_fn"] = full_jac

    return builder(name, n_rows, fn, **kwargs)
