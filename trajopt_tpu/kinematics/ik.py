"""Inverse kinematics: damped-least-squares solver + IK trajectory term.

TPU-native analog of the reference's ``InverseKinematicsConstraint``
(trajopt_ifopt/src/constraints/inverse_kinematics_constraint.cpp), which
constrains trajectory variables to the output of an external IK query
(x - IK(target) = 0).  The reference delegates IK to tesseract; here IK is
a jittable damped-least-squares (Levenberg-Marquardt) iteration over the
chain's analytic Jacobian, batched with ``vmap``.

All loops are ``lax``-based with static iteration counts, so ``solve_ik``
composes under jit/vmap/grad.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..ops.lie import transform_error
from .chain import Chain


class IKResult(NamedTuple):
    q: jax.Array  # (n_dof,) solution configuration
    err_norm: jax.Array  # () final pose-error norm
    converged: jax.Array  # () bool
    iters: jax.Array  # () int32


@partial(jax.jit, static_argnums=(0, 1, 4, 5, 6, 7))
def solve_ik(
    chain: Chain,
    link: int,
    target_R: jax.Array,
    target_p: jax.Array,
    max_iters: int = 60,
    tol: float = 1e-6,
    damping: float = 1e-3,
    pos_only: bool = False,
    q0: Optional[jax.Array] = None,
) -> IKResult:
    """Damped-least-squares IK for one link pose.

    The update is dq = J'(J J' + lambda^2 I)^-1 e with joint-limit clamping;
    lambda adapts multiplicatively on error increase (LM-style).  ``vmap``
    over (target_R, target_p, q0) for batched/multi-seed IK.
    """
    lb = jnp.asarray(chain.lb)
    ub = jnp.asarray(chain.ub)
    dt = target_p.dtype
    q_init = jnp.clip(jnp.zeros((chain.n_dof,), dt) if q0 is None else q0,
                      lb, ub)
    n_e = 3 if pos_only else 6

    def pose_err(q):
        R, p = chain.fk(q)
        e = transform_error(target_R, target_p, R[link], p[link])
        return e[:3] if pos_only else e

    def body(carry):
        q, lam, it, err = carry
        e = pose_err(q)
        J = jax.jacfwd(pose_err)(q)  # (n_e, n_dof)
        A = J @ J.T + (lam * lam) * jnp.eye(n_e, dtype=dt)
        dq = J.T @ jnp.linalg.solve(A, -e)
        q_new = jnp.clip(q + dq, lb, ub)
        err_new = jnp.linalg.norm(pose_err(q_new))
        improved = err_new < err
        q = jnp.where(improved, q_new, q)
        lam = jnp.where(improved, jnp.maximum(lam * 0.5, 1e-5), lam * 2.0)
        return (q, lam, it + 1, jnp.minimum(err, err_new))

    def cond(carry):
        _, _, it, err = carry
        return (it < max_iters) & (err > tol)

    e0 = jnp.linalg.norm(pose_err(q_init))
    q, _, it, err = jax.lax.while_loop(
        cond, body, (q_init, jnp.asarray(damping, dt), jnp.int32(0), e0))
    return IKResult(q=q, err_norm=err, converged=err <= tol, iters=it)


def ik_term(
    name: str,
    chain: Chain,
    n_steps: int,
    step: int,
    link: str,
    is_constraint: bool = True,
    n_cols: Optional[int] = None,
):
    """Constrain step ``step`` to an IK solution of the target pose.

    params: {"target_R" (3,3), "target_p" (3,), "coeffs" (n_dof,)}.
    Rows are coeffs * (q_step - IK(target, seed=q_step)) — the reference's
    InverseKinematicsConstraint semantics (error in joint space, identity
    jacobian blocks), with the current step as the IK seed so the constraint
    tracks the nearest IK branch.
    """
    from ..terms.base import eq_constraint, squared_cost

    n_dof = chain.n_dof
    nc = n_cols or n_dof
    li = chain.link_index(link)

    def fn(x, p):
        q = x.reshape(n_steps, nc)[step, :n_dof]
        tR = jnp.asarray(p["target_R"], x.dtype)
        tp = jnp.asarray(p["target_p"], x.dtype)
        ik = solve_ik(chain, li, tR, tp, q0=jax.lax.stop_gradient(q))
        c = jnp.broadcast_to(jnp.asarray(p.get("coeffs", 1.0), x.dtype),
                             (n_dof,))
        return c * (q - jax.lax.stop_gradient(ik.q))

    if is_constraint:
        return eq_constraint(name, n_dof, fn, step_coupling=0)
    return squared_cost(name, n_dof, fn, step_coupling=0)
