"""Time-parameterized terms: 1/dt column, time-scaled velocity, total time.

Reference semantics (SURVEY.md §2.2): with ``use_time`` the variable grid
grows a per-step column storing **1/dt** (TrajOptProb dt vars,
problem_description.cpp:553-592).  Velocity between steps t-1, t is
``(x_t - x_{t-1}) * inv_dt_t`` (JointVelErrCalculator,
kinematic_terms.cpp:427-442); total time is ``sum_t 1/inv_dt_t`` with a
limit (TimeCostCalculator, kinematic_terms.cpp:572-584).

Layout: x = flatten (n_steps, n_dof + 1), the last column is inv_dt.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from .base import (
    Term,
    eq_constraint,
    hinge_cost,
    ineq_constraint,
    squared_cost,
)


def _cols(x, n_steps, n_dof):
    X = x.reshape(n_steps, n_dof + 1)
    return X[:, :n_dof], X[:, n_dof]


def timed_joint_vel_term(
    name: str,
    n_steps: int,
    n_dof: int,
    first_step: int = 0,
    last_step: Optional[int] = None,
    is_constraint: bool = False,
    toleranced: bool = False,
) -> Term:
    """vel_t = (x_{t+1} - x_t) * inv_dt_{t+1}; params like joint_vel_term."""
    last = (n_steps - 1) if last_step is None else last_step
    span = last - first_step
    assert span >= 1

    def rows(x, p):
        Q, inv_dt = _cols(x, n_steps, n_dof)
        dq = Q[first_step + 1:last + 1] - Q[first_step:last]
        vel = dq * inv_dt[first_step + 1:last + 1, None]  # (span, n_dof)
        targ = jnp.broadcast_to(jnp.asarray(p["targets"], x.dtype),
                                (span, n_dof))
        return vel, targ

    def wf(p, doubled=False):
        w = jnp.broadcast_to(jnp.asarray(p["coeffs"]), (span, n_dof)).reshape(-1)
        return jnp.concatenate([w, w]) if doubled else w

    n = span * n_dof
    if not toleranced:
        def fn(x, p):
            vel, targ = rows(x, p)
            return (vel - targ).reshape(-1)
        if is_constraint:
            def cfn(x, p):
                return fn(x, p) * wf(p)
            return eq_constraint(name, n, cfn, step_coupling=1)
        return squared_cost(name, n, fn, weight_fn=wf, step_coupling=1)

    def fn(x, p):
        vel, targ = rows(x, p)
        up = jnp.broadcast_to(jnp.asarray(p["upper_tols"], x.dtype),
                              (span, n_dof))
        lo = jnp.broadcast_to(jnp.asarray(p["lower_tols"], x.dtype),
                              (span, n_dof))
        hi_rows = (vel - targ - up).reshape(-1)
        lo_rows = (targ + lo - vel).reshape(-1)
        return jnp.concatenate([hi_rows, lo_rows])

    if is_constraint:
        def cfn(x, p):
            return fn(x, p) * wf(p, doubled=True)
        return ineq_constraint(name, 2 * n, cfn, step_coupling=1)
    return hinge_cost(name, 2 * n, fn,
                      weight_fn=lambda p: wf(p, doubled=True),
                      step_coupling=1)


def total_time_term(
    name: str,
    n_steps: int,
    n_dof: int,
    is_constraint: bool = False,
    as_equality: bool = False,
) -> Term:
    """sum_t dt_t (= sum 1/inv_dt over steps 1..T-1) minus params["limit"].

    Cost form: hinge (penalize exceeding the limit) scaled by
    params["coeff"]; constraint form: INEQ (or EQ with ``as_equality``),
    matching TotalTimeTermInfo (problem_description.cpp:1851-1892).
    """

    def fn(x, p):
        _, inv_dt = _cols(x, n_steps, n_dof)
        total = jnp.sum(1.0 / inv_dt[1:])
        return jnp.reshape(total - jnp.asarray(p["limit"], x.dtype), (1,))

    if is_constraint:
        if as_equality:
            def cfn(x, p):
                return fn(x, p) * jnp.asarray(p.get("coeff", 1.0), x.dtype)
            return eq_constraint(name, 1, cfn)
        def cfn(x, p):
            return fn(x, p) * jnp.asarray(p.get("coeff", 1.0), x.dtype)
        return ineq_constraint(name, 1, cfn)
    return hinge_cost(name, 1, fn,
                      weight_fn=lambda p: jnp.reshape(
                          jnp.asarray(p.get("coeff", 1.0)), (1,)))
