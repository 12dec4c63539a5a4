"""Cartesian terms: pose targets, dynamic (link-to-link) poses, velocity.

TPU-native equivalents of the reference's cartesian evaluators
(trajopt/src/kinematic_terms.cpp):

- ``cart_pose_term``: FK(source link)*source_offset vs a world target pose
  (or a moving target link*offset — DynamicCartPose, kinematic_terms.cpp:
  98-184); error = [translation; angle-axis] of target^-1 * source
  (CartPoseErrCalculator, kinematic_terms.cpp:187-346), rows scaled by
  pos_coeffs/rot_coeffs (zero coeff disables a row).
- ``cart_vel_term``: per-axis two-sided bound on the end-effector
  displacement between consecutive steps (CartVelErrCalculator,
  kinematic_terms.cpp:376-425): rows [dp - limit; -dp - limit] <= 0.

Linearization is autodiff (jacfwd) through the statically unrolled FK; this
is exact (the reference uses numeric differentiation for most pose
Jacobians, kinematic_terms.cpp:158-185).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ..kinematics.chain import Chain
from ..ops.lie import transform_error
from .base import Term, abs_cost, eq_constraint, ineq_constraint, squared_cost


def _link_pose_with_offset(chain: Chain, q, link: int, off_R, off_p):
    R, p = chain.fk(q)
    Rl, pl = R[link], p[link]
    return Rl @ off_R, Rl @ off_p + pl


def _apply_tolerances(err, lo, hi):
    """Tolerance band on a pose error (tesseract::common::applyTolerances,
    consumed at kinematic_terms.cpp:92,234): per index, error inside
    [lo, hi] is zero; outside, it is the distance to the violated bound.
    Piecewise-linear, so autodiff matches the reference's FD-through-band
    Jacobians (DynamicCartPoseJacCalculator, kinematic_terms.cpp:158-185)."""
    return jnp.where(err > hi, err - hi,
                     jnp.where(err < lo, err - lo, jnp.zeros_like(err)))


def cart_pose_term(
    name: str,
    chain: Chain,
    n_steps: int,
    step: int,
    source_link: str,
    target_link: Optional[str] = None,
    is_constraint: bool = True,
    kind: str = "eq",  # constraints: "eq"; costs: "abs" or "squared"
    n_cols: Optional[int] = None,
) -> Term:
    """Pose term at one trajectory step.

    params pytree:
      target_R (3,3), target_p (3,)    — world target pose, or the offset in
                                         the target link's frame when
                                         ``target_link`` is given
      source_off_R (3,3), source_off_p (3,)
      coeffs (6,)                      — [pos_coeffs, rot_coeffs]
      lower_tols/upper_tols (6,)       — OPTIONAL tolerance band
                                         (CartPoseTermInfo lower_tolerance /
                                         upper_tolerance,
                                         problem_description.hpp:330-373):
                                         error inside [lo, hi] is zero.
                                         Presence of BOTH keys enables the
                                         band (a static pytree property).
    """
    n_dof = chain.n_dof
    nc = n_cols or n_dof
    src = chain.link_index(source_link)
    tgt = chain.link_index(target_link) if target_link is not None else None

    def _err_q(q, p, dtype):
        Rs, ps = _link_pose_with_offset(
            chain, q, src, jnp.asarray(p["source_off_R"], dtype),
            jnp.asarray(p["source_off_p"], dtype))
        if tgt is None:
            Rt = jnp.asarray(p["target_R"], dtype)
            pt = jnp.asarray(p["target_p"], dtype)
        else:
            Rt, pt = _link_pose_with_offset(
                chain, q, tgt, jnp.asarray(p["target_R"], dtype),
                jnp.asarray(p["target_p"], dtype))
        err = transform_error(Rt, pt, Rs, ps)
        if "lower_tols" in p and "upper_tols" in p:
            err = _apply_tolerances(err, jnp.asarray(p["lower_tols"], dtype),
                                    jnp.asarray(p["upper_tols"], dtype))
        return err * jnp.asarray(p["coeffs"], dtype)

    def fn(x, p):
        q = x.reshape(n_steps, nc)[step, :n_dof]
        return _err_q(q, p, x.dtype)

    def jac_fn(x, p):
        """Rows depend on one step's joints: differentiate w.r.t. q_step
        (n_dof tangents) and pad, instead of n_x tangents through FK."""
        import jax
        q = x.reshape(n_steps, nc)[step, :n_dof]
        Jq = jax.jacfwd(lambda qq: _err_q(qq, p, x.dtype))(q)  # (6, D)
        J = jnp.zeros((6, n_steps, nc), x.dtype)
        J = J.at[:, step, :n_dof].set(Jq)
        return J.reshape(6, n_steps * nc)

    if is_constraint:
        return eq_constraint(name, 6, fn, jac_fn=jac_fn, step_coupling=0)
    if kind == "squared":
        return squared_cost(name, 6, fn, jac_fn=jac_fn, step_coupling=0)
    return abs_cost(name, 6, fn, jac_fn=jac_fn, step_coupling=0)


def default_cart_pose_params(target_R=None, target_p=None, pos_coeffs=1.0,
                             rot_coeffs=1.0, source_off_R=None,
                             source_off_p=None, lower_tols=None,
                             upper_tols=None):
    eye = jnp.eye(3)
    zero = jnp.zeros(3)
    pos = jnp.broadcast_to(jnp.asarray(pos_coeffs, jnp.float64), (3,))
    rot = jnp.broadcast_to(jnp.asarray(rot_coeffs, jnp.float64), (3,))
    out = {
        "target_R": eye if target_R is None else jnp.asarray(target_R),
        "target_p": zero if target_p is None else jnp.asarray(target_p),
        "source_off_R": eye if source_off_R is None else jnp.asarray(source_off_R),
        "source_off_p": zero if source_off_p is None else jnp.asarray(source_off_p),
        "coeffs": jnp.concatenate([pos, rot]),
    }
    if lower_tols is not None or upper_tols is not None:
        lo = jnp.broadcast_to(
            jnp.asarray(0.0 if lower_tols is None else lower_tols,
                        jnp.float64), (6,))
        hi = jnp.broadcast_to(
            jnp.asarray(0.0 if upper_tols is None else upper_tols,
                        jnp.float64), (6,))
        if bool(jnp.any(lo > hi)):
            raise ValueError(
                "inverted cart_pose tolerance band: lower > upper "
                "(validateTolerances, kinematic_terms.cpp:41-56)")
        out["lower_tols"] = lo
        out["upper_tols"] = hi
    return out


def cart_line_term(
    name: str,
    chain: Chain,
    n_steps: int,
    step: int,
    source_link: str,
    is_constraint: bool = True,
) -> Term:
    """Constrain a link pose to a line segment (trajopt_ifopt
    CartLineConstraint analog, trajopt_ifopt/src/constraints/
    cartesian_line_constraint.cpp).

    params: line_a (3,), line_b (3,) segment endpoints; target_R (3,3)
    orientation target; coeffs (6,) [pos, rot] row scaling.
    Position rows: p_source - closest point on segment; rotation rows:
    log(target_R^-1 R_source).
    """
    n_dof = chain.n_dof
    src = chain.link_index(source_link)

    def fn(x, p):
        q = x.reshape(n_steps, n_dof)[step]
        R, pos = chain.fk(q)
        ps = pos[src]
        a = jnp.asarray(p["line_a"], x.dtype)
        b = jnp.asarray(p["line_b"], x.dtype)
        d = b - a
        t = jnp.clip(jnp.dot(ps - a, d) /
                     jnp.maximum(jnp.dot(d, d), 1e-12), 0.0, 1.0)
        closest = a + t * d
        pos_err = ps - closest
        Rt = jnp.asarray(p["target_R"], x.dtype)
        err = jnp.concatenate([pos_err, transform_error(
            Rt, closest, R[src], ps)[3:]])
        return err * jnp.asarray(p["coeffs"], x.dtype)

    if is_constraint:
        return eq_constraint(name, 6, fn, step_coupling=0)
    return abs_cost(name, 6, fn, step_coupling=0)


def upright_term(
    name: str,
    chain: Chain,
    n_steps: int,
    link: str,
    first_step: int = 0,
    last_step: Optional[int] = None,
    is_constraint: bool = True,
) -> Term:
    """Keep a link's local +z axis parallel to world +z (the classic
    "glass upright" task): rows are the world x/y components of the link
    z-axis at each step, scaled by params["coeffs"] (2,).

    Equivalent to a coeff-masked cart_pose orientation constraint with the
    yaw row disabled (reference: CartPoseTermInfo rot_coeffs masking,
    problem_description.cpp:901-987) but cheaper: no log map.
    """
    n_dof = chain.n_dof
    li = chain.link_index(link)
    last = (n_steps - 1) if last_step is None else last_step
    span = last - first_step + 1

    def fn(x, p):
        import jax
        X = x.reshape(n_steps, n_dof)[first_step:last + 1]
        zaxes = jax.vmap(lambda q: chain.fk(q)[0][li][:2, 2])(X)  # (span, 2)
        c = jnp.broadcast_to(jnp.asarray(p["coeffs"], x.dtype), (2,))
        return (zaxes * c[None, :]).reshape(-1)

    def _jac_steps(x, p):
        import jax
        X = x.reshape(n_steps, n_dof)[first_step:last + 1]
        c = jnp.broadcast_to(jnp.asarray(p["coeffs"], x.dtype), (2,))
        return jax.vmap(jax.jacfwd(
            lambda q: chain.fk(q)[0][li][:2, 2] * c))(X)  # (span, 2, D)

    def jac_fn(x, p):
        """Per-step differentiation (n_dof tangents per step, banded
        scatter) — rows at step t depend only on q_t."""
        Js = _jac_steps(x, p)
        J = jnp.zeros((span, 2, n_steps, n_dof), x.dtype)
        s = jnp.arange(span)
        J = J.at[s, :, first_step + s, :].set(Js)
        return J.reshape(2 * span, n_steps * n_dof)

    def jac_banded_fn(x, p):
        from ..ops.banded_rows import step_window
        return step_window(_jac_steps(x, p),
                           first_step + jnp.arange(span), n_steps)

    n = 2 * span
    if is_constraint:
        # per-step groups: the reference hatches one pose term per timestep
        return eq_constraint(name, n, fn, jac_fn=jac_fn, viol_groups=span,
                             step_coupling=0, jac_banded_fn=jac_banded_fn)
    return squared_cost(name, n, fn, jac_fn=jac_fn, step_coupling=0,
                        jac_banded_fn=jac_banded_fn)


def cart_vel_term(
    name: str,
    chain: Chain,
    n_steps: int,
    source_link: str,
    first_step: int = 0,
    last_step: Optional[int] = None,
    is_constraint: bool = True,
    n_cols: Optional[int] = None,
) -> Term:
    """Displacement limit between consecutive steps.

    params: {"max_displacement": ()} scalar.
    Rows per gap: [dp - limit (3); -dp - limit (3)] <= 0.
    """
    n_dof = chain.n_dof
    src = chain.link_index(source_link)
    last = (n_steps - 1) if last_step is None else last_step
    n_gaps = last - first_step
    assert n_gaps >= 1

    def fn(x, p):
        X = x.reshape(n_steps, n_cols or n_dof)[:, :n_dof]
        lim = jnp.asarray(p["max_displacement"], x.dtype)
        import jax
        ps = jax.vmap(lambda q: chain.fk(q)[1][src])(X[first_step:last + 1])
        dp = ps[1:] - ps[:-1]  # (n_gaps, 3)
        rows = jnp.concatenate([dp - lim, -dp - lim], axis=-1)  # (n_gaps, 6)
        return rows.reshape(-1)

    n = 6 * n_gaps
    if is_constraint:
        return ineq_constraint(name, n, fn, viol_groups=n_gaps,
                               step_coupling=1)
    from .base import hinge_cost
    return hinge_cost(name, n, fn, step_coupling=1)
