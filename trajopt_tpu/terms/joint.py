"""Joint-motion terms: position / velocity / acceleration / jerk.

TPU-native equivalents of the reference's matrix joint costs
(trajopt/src/trajectory_costs.cpp — prebuilt quadratic/hinge forms) and the
``Joint{Pos,Vel,Acc,Jerk}TermInfo::hatch`` lowerings
(trajopt/src/problem_description.cpp:1197-1372):

- finite-difference stencils over the (n_steps, n_dof) trajectory grid:
    vel  =  x[t+1] - x[t]                      t in [first, last-1]
    acc  =  x[t] - 2 x[t+1] + x[t+2]           t in [first, last-2]
    jerk = -x[t] + 3 x[t+1] - 3 x[t+2] + x[t+3]  (trajectory_costs.cpp:775)
- equality targets -> SQUARED cost or EQ constraint rows;
- toleranced targets (upper/lower) -> HINGE cost or INEQ rows, two per
  element:  (v - targ - upper_tol)  and  (targ + lower_tol - v).

Rows are laid out step-major then dof; weights broadcast per-dof coeffs.
All parameters (targets/tolerances/coeffs) are dynamic ``params`` entries so
one compiled problem serves a batch of instances.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from .base import (
    Term,
    eq_constraint,
    hinge_cost,
    ineq_constraint,
    squared_cost,
)


def _stencil(order: int):
    if order == 0:
        return (1.0,)
    if order == 1:
        return (-1.0, 1.0)
    if order == 2:
        return (1.0, -2.0, 1.0)
    if order == 3:
        return (-1.0, 3.0, -3.0, 1.0)
    raise ValueError(order)


def _diff_rows(x, n_steps, n_dof, first, last, order, n_cols=None):
    """(n_rows,) stencil values over [first, last-order], step-major.

    ``n_cols`` > n_dof when the variable grid carries extra columns (the
    1/dt column of use_time problems, problem_description.cpp:553-592);
    the stencil only touches the joint columns.
    """
    X = x.reshape(n_steps, n_cols or n_dof)[:, :n_dof]
    coefs = _stencil(order)
    span = last - order - first + 1
    out = jnp.zeros((span, n_dof), x.dtype)
    for k, c in enumerate(coefs):
        out = out + c * X[first + k:first + k + span]
    return out.reshape(-1)


def _eq_err_fn(n_steps, n_dof, first, last, order, n_cols=None):
    def fn(x, p):
        vals = _diff_rows(x, n_steps, n_dof, first, last, order, n_cols)
        span = last - order - first + 1
        targ = jnp.broadcast_to(jnp.asarray(p["targets"]), (span, n_dof))
        return vals - targ.reshape(-1)
    return fn


def _tol_err_fn(n_steps, n_dof, first, last, order, n_cols=None):
    """Two-sided tolerance rows: [v - t - upper; t + lower - v]."""
    def fn(x, p):
        vals = _diff_rows(x, n_steps, n_dof, first, last, order, n_cols)
        span = last - order - first + 1
        targ = jnp.broadcast_to(jnp.asarray(p["targets"]), (span, n_dof)).reshape(-1)
        up = jnp.broadcast_to(jnp.asarray(p["upper_tols"]), (span, n_dof)).reshape(-1)
        lo = jnp.broadcast_to(jnp.asarray(p["lower_tols"]), (span, n_dof)).reshape(-1)
        hi_rows = vals - targ - up
        lo_rows = targ + lo - vals
        return jnp.concatenate([hi_rows, lo_rows])
    return fn


def _weight_fn(span, n_dof, doubled=False):
    def wf(p):
        w = jnp.broadcast_to(jnp.asarray(p["coeffs"]), (span, n_dof)).reshape(-1)
        return jnp.concatenate([w, w]) if doubled else w
    return wf


def _stencil_jac(n_steps, n_dof, first, last, order, n_cols=None):
    """Analytic banded Jacobian of the stencil rows — a CONSTANT matrix
    (the reference pre-builds these quadratic forms once,
    trajectory_costs.cpp:28-55); autodiff here would push n_x tangents
    through pure data movement every convexification."""
    nc = n_cols or n_dof
    span = last - order - first + 1
    J = np.zeros((span, n_dof, n_steps, nc))
    for k, c in enumerate(_stencil(order)):
        for s in range(span):
            for d in range(n_dof):
                J[s, d, first + k + s, d] += c
    return jnp.asarray(J.reshape(span * n_dof, n_steps * nc))




def _stencil_banded(n_steps, n_dof, first, last, order, n_cols=None):
    """Static banded window blocks (ops.banded_rows format):
    (B0 (span, n_dof, w*nc), G (span,)) with w = max(order + 1, 2) fine
    blocks per window.  Orders 2-3 (acc/jerk, trajectory_costs.cpp:775)
    produce wider-than-2 windows; ops.banded_rows.regroup folds them into
    2-superblock windows at the coarser KKT block size c * nc."""
    nc = n_cols or n_dof
    span = last - order - first + 1
    coefs = _stencil(order)
    w = max(order + 1, 2)
    B0 = np.zeros((span, n_dof, w * nc))
    if order == 0:
        steps = first + np.arange(span)
        G = np.minimum(steps, n_steps - 2)
        off = steps - G
        for s in range(span):
            for d in range(n_dof):
                B0[s, d, off[s] * nc + d] = coefs[0]
    else:
        G = first + np.arange(span)
        for s in range(span):
            for d in range(n_dof):
                for k, cf in enumerate(coefs):
                    B0[s, d, k * nc + d] = cf
    return B0, np.asarray(G, np.int32)




def joint_motion_term(
    name: str,
    order: int,
    n_steps: int,
    n_dof: int,
    first_step: int = 0,
    last_step: Optional[int] = None,
    is_constraint: bool = False,
    toleranced: bool = False,
    n_cols: Optional[int] = None,
) -> Term:
    """Build a joint pos(0)/vel(1)/acc(2)/jerk(3) term.

    params pytree: {"targets", "coeffs"} (+ "upper_tols"/"lower_tols" when
    toleranced), each broadcastable to (span, n_dof).
    """
    last = (n_steps - 1) if last_step is None else last_step
    span = last - order - first_step + 1
    assert span >= 1, f"{name}: trajectory too short for order {order}"
    n = span * n_dof
    S = _stencil_jac(n_steps, n_dof, first_step, last, order, n_cols)
    if n_steps >= 2:
        B0_np, G_np = _stencil_banded(
            n_steps, n_dof, first_step, last, order, n_cols)
    else:
        B0_np = None

    def _wvec(p, dt):
        return jnp.broadcast_to(jnp.asarray(p["coeffs"], dt),
                                (span, n_dof))

    if not toleranced:
        fn = _eq_err_fn(n_steps, n_dof, first_step, last, order, n_cols)
        if is_constraint:
            # constraint rows are coeff-scaled (reference folds coeffs in)
            def cfn(x, p, base=fn):
                return base(x, p) * _wvec(p, x.dtype).reshape(-1)
            def cjac(x, p):
                w = _wvec(p, x.dtype).reshape(-1)
                return w[:, None] * S.astype(x.dtype)
            jb = None
            if B0_np is not None:
                def jb(x, p):
                    B = jnp.asarray(B0_np, x.dtype) * _wvec(p, x.dtype)[..., None]
                    return B, jnp.asarray(G_np)
            return eq_constraint(name, n, cfn, jac_fn=cjac,
                                 step_coupling=order, jac_banded_fn=jb)
        jb = None
        if B0_np is not None:
            def jb(x, p):
                return jnp.asarray(B0_np, x.dtype), jnp.asarray(G_np)
        return squared_cost(name, n, fn, weight_fn=_weight_fn(span, n_dof),
                            jac_fn=lambda x, p: S.astype(x.dtype),
                            step_coupling=order, jac_banded_fn=jb)

    fn = _tol_err_fn(n_steps, n_dof, first_step, last, order, n_cols)
    # tolerance rows are [v - t - up; t + lo - v] => jac = [S; -S]
    S2 = jnp.concatenate([S, -S])
    if is_constraint:
        def cfn(x, p, base=fn):
            w = _wvec(p, x.dtype).reshape(-1)
            return base(x, p) * jnp.concatenate([w, w])
        def cjac2(x, p):
            w = _wvec(p, x.dtype).reshape(-1)
            return jnp.concatenate([w, w])[:, None] * S2.astype(x.dtype)
        jb = None
        if B0_np is not None:
            def jb(x, p):
                B = jnp.asarray(B0_np, x.dtype) * _wvec(p, x.dtype)[..., None]
                return [(B, jnp.asarray(G_np)), (-B, jnp.asarray(G_np))]
        return ineq_constraint(name, 2 * n, cfn, jac_fn=cjac2,
                               step_coupling=order, jac_banded_fn=jb)
    jb = None
    if B0_np is not None:
        def jb(x, p):
            B = jnp.asarray(B0_np, x.dtype)
            return [(B, jnp.asarray(G_np)), (-B, jnp.asarray(G_np))]
    return hinge_cost(name, 2 * n, fn,
                      weight_fn=_weight_fn(span, n_dof, doubled=True),
                      jac_fn=lambda x, p: S2.astype(x.dtype),
                      step_coupling=order, jac_banded_fn=jb)


def joint_pos_term(name, n_steps, n_dof, **kw) -> Term:
    return joint_motion_term(name, 0, n_steps, n_dof, **kw)


def joint_vel_term(name, n_steps, n_dof, **kw) -> Term:
    return joint_motion_term(name, 1, n_steps, n_dof, **kw)


def joint_acc_term(name, n_steps, n_dof, **kw) -> Term:
    return joint_motion_term(name, 2, n_steps, n_dof, **kw)


def joint_jerk_term(name, n_steps, n_dof, **kw) -> Term:
    return joint_motion_term(name, 3, n_steps, n_dof, **kw)
