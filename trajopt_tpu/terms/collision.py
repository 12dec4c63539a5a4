"""Collision cost/constraint terms: discrete and swept (cast/LVS).

TPU-native equivalents of the reference collision terms
(trajopt/src/collision_terms.cpp):

- err rows are ``margin - dist`` per candidate pair per (sub)step;
  hinge cost ``coeff * max(0, margin - dist)``  (CollisionCost::convex,
  collision_terms.cpp:1283-1327) or INEQ constraint rows
  (CollisionConstraint::convex, :1368-1389);
- discrete: one row block per trajectory step in [first, last]
  (SingleTimestepCollisionEvaluator);
- cast: one row block per step gap, swept distance between consecutive
  configurations (CastCollisionEvaluator / LVS evaluators — see
  collision.world.cast_pair_distances for the exact-sphere-sweep +
  substate-min strategy); autodiff through the interpolation reproduces the
  reference's cc_time-weighted two-endpoint gradient split
  (collision_terms.cpp:262-323).

params: {"margins": (n_pairs,), "coeffs": (n_pairs,)} (scalars broadcast).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..collision.world import CollisionWorld
from .base import Term, hinge_cost, ineq_constraint


def _bcast(v, n, dtype):
    return jnp.broadcast_to(jnp.asarray(v, dtype), (n,))


def _coeff_scalar(p, dtype):
    """Scalar coefficient for weighted (use_weighted_sum) aggregation.

    json_io rejects per-pair coeff overrides when weighted=True, so the
    (n_pairs,) coeff array is uniform — element 0 is THE coefficient.
    (Broadcasting a multi-pair array to shape (1,) raised at trace time.)"""
    return jnp.ravel(jnp.asarray(p["coeffs"], dtype))[0]


def _weighted_rows(errs, Js):
    """Error-weighted average of per-pair gradients (the reference's
    weighted-average contact aggregation, trajopt_ifopt/src/constraints/
    collision/weighted_average_methods.cpp:31-68): one row per step/gap
    with err = max over pairs and grad = sum_p w_p grad_p / sum_p w_p,
    w_p = max(err_p, 0) / max_err."""
    max_err = jnp.max(errs, axis=1)  # (G,)
    w = jnp.maximum(errs, 0.0) / jnp.maximum(max_err[:, None], 1e-12)
    tot = jnp.maximum(jnp.sum(w, axis=1), 1e-12)
    Jrow = jnp.einsum("gp,gpw->gw", w, Js) / tot[:, None]
    return max_err, Jrow


def _topk_rows(errs, K, buffer, dtype):
    """Contact reduction: per group (step/gap), keep the K worst rows and
    deactivate rows outside the contact window (unscaled err < -buffer).

    This is the TPU-native analog of the reference's contact pipeline:
    tesseract's contact managers only *report* contacts within
    margin + safety_margin_buffer (CollisionTermInfo::fromJson default 0.5,
    problem_description.cpp:1630), and the constraint keeps at most
    max_num_cnt worst of them (collision_types.h:162).  Returns
    (vals (G,K), idx (G,K), active (G,K)); deactivated rows are clamped to
    the constant -buffer (zero value, zero gradient — exactly a contact the
    manager never reported).
    """
    vals, idx = jax.lax.top_k(errs, K)  # (G, K) worst-first
    active = vals >= -jnp.asarray(buffer, dtype)
    vals = jnp.where(active, vals, -jnp.asarray(buffer, dtype))
    return vals, idx, active


def discrete_collision_term(
    name: str,
    world: CollisionWorld,
    n_steps: int,
    first_step: int = 0,
    last_step: Optional[int] = None,
    is_constraint: bool = False,
    n_cols: Optional[int] = None,
    weighted: bool = False,
    max_contacts: Optional[int] = None,
    buffer: float = 0.5,
) -> Term:
    """``weighted=True`` aggregates all pairs of a step into ONE row via
    error-weighted average gradients (reference use_weighted_sum,
    collision_types.h:130-141 / weighted_average_methods.cpp).

    ``max_contacts`` caps the QP rows per step at the K worst contacts
    within the ``buffer`` window (see _topk_rows) — per-pair coeffs are
    folded into the selected rows (coeff * max(0, e) == max(0, coeff * e)
    for coeff > 0, so values/penalties are unchanged)."""
    n_dof = world.chain.n_dof
    nc = n_cols or n_dof
    last = (n_steps - 1) if last_step is None else last_step
    span = last - first_step + 1
    P = world.n_pairs
    n = span * P

    def _errs(x, p):
        X = x.reshape(n_steps, nc)[first_step:last + 1, :n_dof]
        dists = jax.vmap(world.pair_distances)(X)  # (span, P)
        margins = _bcast(p["margins"], P, x.dtype)
        return margins[None, :] - dists

    def fn(x, p):
        return _errs(x, p).reshape(-1)

    def wf(p):
        w = _bcast(p["coeffs"], P, jnp.asarray(p["coeffs"]).dtype)
        return jnp.tile(w, span)

    def _jac_steps(x, p, cf=None):
        X = x.reshape(n_steps, nc)
        Q = X[first_step:last + 1, :n_dof]
        Js = jax.vmap(jax.jacfwd(world.pair_distances))(Q)  # (span, P, D)
        if cf is not None:
            Js = Js * cf(p)[None, :, None]
        if nc != n_dof:  # pad the inv-dt column (no collision dependence)
            Js = jnp.concatenate(
                [Js, jnp.zeros((span, P, nc - n_dof), x.dtype)], axis=-1)
        return -Js

    def jac_fn(x, p, cf=None):
        """Structure-aware Jacobian: each row block depends on ONE step's
        n_dof joints, so differentiate per-step (n_dof tangents) and scatter
        into the banded (span*P, n_x) layout instead of pushing n_x tangents
        through the whole FK/SDF stack (a ~n_steps x convexification
        speedup; the band structure is SURVEY.md §5.7(a))."""
        Js = _jac_steps(x, p, cf)
        J = jnp.zeros((span, P, n_steps, nc), x.dtype)
        sidx = jnp.arange(span)
        J = J.at[sidx, :, first_step + sidx, :].set(Js)
        return J.reshape(span * P, n_steps * nc)

    def jac_banded_fn(x, p, cf=None):
        from ..ops.banded_rows import step_window
        return step_window(_jac_steps(x, p, cf),
                           first_step + jnp.arange(span), n_steps)

    if max_contacts is not None and max_contacts < P:
        from ..ops.banded_rows import step_window
        K = max_contacts

        def sfn(x, p):
            vals, idx, act = _topk_rows(_errs(x, p), K, buffer, x.dtype)
            cof = _bcast(p["coeffs"], P, x.dtype)[idx]
            # deactivated rows become the constant -1: strictly inactive in
            # the hinge/INEQ model AND in the exact value/violation
            return jnp.where(act, cof * vals, -1.0).reshape(-1)

        def _sel_jac_steps(x, p):
            vals, idx, act = _topk_rows(_errs(x, p), K, buffer, x.dtype)
            Js = _jac_steps(x, p)  # (span, P, nc)
            cof = _bcast(p["coeffs"], P, x.dtype)[idx]
            sc = jnp.where(act, cof, 0.0)
            return jnp.take_along_axis(
                Js, idx[:, :, None], axis=1) * sc[:, :, None]

        def sjac(x, p):
            Js = _sel_jac_steps(x, p)
            J = jnp.zeros((span, K, n_steps, nc), x.dtype)
            sidx = jnp.arange(span)
            J = J.at[sidx, :, first_step + sidx, :].set(Js)
            return J.reshape(span * K, n_steps * nc)

        def sjac_banded(x, p):
            return step_window(_sel_jac_steps(x, p),
                               first_step + jnp.arange(span), n_steps)

        if is_constraint:
            return ineq_constraint(name, span * K, sfn, jac_fn=sjac,
                                   viol_groups=span, step_coupling=0,
                                   jac_banded_fn=sjac_banded)
        return hinge_cost(name, span * K, sfn, jac_fn=sjac,
                          step_coupling=0, jac_banded_fn=sjac_banded)

    if weighted:
        from ..ops.banded_rows import step_window

        def wfn(x, p):
            errs = _errs(x, p)  # (span, P)
            werr = jnp.max(errs, axis=1)
            if is_constraint:
                werr = werr * _coeff_scalar(p, x.dtype)
            return werr

        def wjac_banded(x, p):
            errs = _errs(x, p)
            Js = _jac_steps(x, p)  # (span, P, nc), already negated
            werr, Jrow = _weighted_rows(errs, Js)
            if is_constraint:
                Jrow = Jrow * _coeff_scalar(p, x.dtype)
            return step_window(Jrow[:, None, :],
                               first_step + jnp.arange(span), n_steps)

        def wjac(x, p):
            from ..ops.banded_rows import bb_to_dense
            B, G = wjac_banded(x, p)
            return bb_to_dense([B], [G], n_steps * nc, nc)

        def wwf(p):
            c = _coeff_scalar(p, jnp.asarray(p["coeffs"]).dtype)
            return jnp.full((span,), c)

        if is_constraint:
            return ineq_constraint(name, span, wfn, jac_fn=wjac,
                                   viol_groups=span, step_coupling=0,
                                   jac_banded_fn=wjac_banded)
        return hinge_cost(name, span, wfn, weight_fn=wwf, jac_fn=wjac,
                          step_coupling=0, jac_banded_fn=wjac_banded)

    if is_constraint:
        def cfn(x, p):
            w = _bcast(p["coeffs"], P, x.dtype)
            return fn(x, p) * jnp.tile(w, span)
        ccf = lambda pp, x: _bcast(pp["coeffs"], P, x.dtype)
        return ineq_constraint(
            name, n, cfn,
            jac_fn=lambda x, p: jac_fn(x, p, cf=lambda pp: ccf(pp, x)),
            viol_groups=span,  # one reference constraint per timestep
            step_coupling=0,
            jac_banded_fn=lambda x, p: jac_banded_fn(
                x, p, cf=lambda pp: ccf(pp, x)))
    return hinge_cost(name, n, fn, weight_fn=wf, jac_fn=jac_fn,
                      step_coupling=0, jac_banded_fn=jac_banded_fn)


def cast_collision_term(
    name: str,
    world: CollisionWorld,
    n_steps: int,
    first_step: int = 0,
    last_step: Optional[int] = None,
    n_sub: int = 8,
    is_constraint: bool = False,
    n_cols: Optional[int] = None,
    weighted: bool = False,
    max_contacts: Optional[int] = None,
    buffer: float = 0.5,
) -> Term:
    """Swept-volume collision over each step gap in [first, last-1].

    One hinge/constraint row per (gap, sub-segment, pair) — the
    reference's LVS_CONTINUOUS lowering where every interpolated motion
    segment contributes its own cast contact expressions
    (CollisionsToDistanceExpressions over the per-segment ContactResultMap,
    collision_terms.cpp:343-383 + continuous_collision_evaluators.cpp:
    171-240).  Two properties matter: (a) a min-over-substates single row
    loses model fidelity and stalls the trust region — the linearization
    at the argmin substate wildly overpromises what a step can fix; (b)
    each segment is evaluated with the exact sweep kernels (spheres ->
    capsules, translating boxes), so between-substate tunneling cannot
    slip through a CONVERGED verdict.  The endpoint (cc_time) gradient
    split is autodiff through the interpolation.

    ``weighted=True`` aggregates all rows of a gap into ONE via
    error-weighted average gradients (reference use_weighted_sum,
    weighted_average_methods.cpp:31-68)."""
    n_dof = world.chain.n_dof
    nc = n_cols or n_dof
    last = (n_steps - 1) if last_step is None else last_step
    n_gaps = last - first_step
    assert n_gaps >= 1
    P = world.n_pairs
    n_seg = max(n_sub - 1, 1)
    R = n_seg * P  # rows per gap
    n = n_gaps * R

    def _errs(x, p):
        X = x.reshape(n_steps, nc)[:, :n_dof]
        qa = X[first_step:last]
        qb = X[first_step + 1:last + 1]
        dists = jax.vmap(
            lambda a, b: world.cast_pair_distances_seg(
                a, b, n_seg + 1))(qa, qb)
        margins = _bcast(p["margins"], P, x.dtype)
        return (margins[None, None, :] - dists).reshape(n_gaps, R)

    def fn(x, p):
        return _errs(x, p).reshape(-1)

    def wf(p):
        w = _bcast(p["coeffs"], P, jnp.asarray(p["coeffs"]).dtype)
        return jnp.tile(w, n_gaps * n_seg)

    def _jac_gaps(x, p, cf=None):
        X = x.reshape(n_steps, nc)
        Q = X[:, :n_dof]
        qa = Q[first_step:last]
        qb = Q[first_step + 1:last + 1]
        Jab = jax.vmap(jax.jacfwd(
            lambda a, b: world.cast_pair_distances_seg(a, b, n_seg + 1),
            argnums=(0, 1)))(qa, qb)  # 2 x (n_gaps, n_seg, P, D)
        Ja_, Jb_ = Jab
        Ja_ = Ja_.reshape(n_gaps, R, n_dof)
        Jb_ = Jb_.reshape(n_gaps, R, n_dof)
        if cf is not None:
            w = jnp.tile(cf(p), n_seg)
            Ja_ = Ja_ * w[None, :, None]
            Jb_ = Jb_ * w[None, :, None]
        if nc != n_dof:  # pad the inv-dt column (no collision dependence)
            z = jnp.zeros((n_gaps, R, nc - n_dof), x.dtype)
            Ja_ = jnp.concatenate([Ja_, z], axis=-1)
            Jb_ = jnp.concatenate([Jb_, z], axis=-1)
        return -Ja_, -Jb_

    def jac_fn(x, p, cf=None):
        """Banded scatter of the per-gap row blocks (each depends on the
        two adjacent steps only)."""
        Ja_, Jb_ = _jac_gaps(x, p, cf)
        J = jnp.zeros((n_gaps, R, n_steps, nc), x.dtype)
        g = jnp.arange(n_gaps)
        J = J.at[g, :, first_step + g, :n_dof].set(Ja_[..., :n_dof])
        J = J.at[g, :, first_step + 1 + g, :n_dof].set(Jb_[..., :n_dof])
        return J.reshape(n_gaps * R, n_steps * nc)

    def jac_banded_fn(x, p, cf=None):
        Ja_, Jb_ = _jac_gaps(x, p, cf)
        B = jnp.concatenate([Ja_, Jb_], axis=-1)  # (n_gaps, R, 2*nc)
        return B, first_step + jnp.arange(n_gaps, dtype=jnp.int32)

    if max_contacts is not None and max_contacts < P:
        # PAIR-level selection: keep the K worst pairs per gap (ranked by
        # their worst sub-segment error) with ALL their per-segment rows —
        # the reference's contact granularity is per link-pair set
        # (max_num_cnt caps contacts WITHIN a pair set, collision_types.h:
        # 162; pairs outside margin+buffer simply have no contacts).  Row
        # selection would starve multi-pair scenes: K rows can be one
        # pair's segments.
        K = max_contacts
        KR = n_seg * K

        def _sel(x, p):
            errs = _errs(x, p).reshape(n_gaps, n_seg, P)
            key = jnp.max(errs, axis=1)  # (n_gaps, P) worst err per pair
            _, idx = jax.lax.top_k(key, K)  # (n_gaps, K)
            vals = jnp.take_along_axis(errs, idx[:, None, :], axis=2)
            act = vals >= -jnp.asarray(buffer, x.dtype)
            cof = _bcast(p["coeffs"], P, x.dtype)[idx]  # (n_gaps, K)
            return idx, vals, act, cof  # vals/act: (n_gaps, n_seg, K)

        def sfn(x, p):
            idx, vals, act, cof = _sel(x, p)
            return jnp.where(act, cof[:, None, :] * vals, -1.0).reshape(-1)

        def _sel_jac_gaps(x, p):
            idx, vals, act, cof = _sel(x, p)
            Ja_, Jb_ = _jac_gaps(x, p)  # (n_gaps, R, nc)
            sc = jnp.where(act, cof[:, None, :], 0.0)  # (n_gaps, n_seg, K)

            def g(J):
                J = J.reshape(n_gaps, n_seg, P, nc)
                Js = jnp.take_along_axis(J, idx[:, None, :, None], axis=2)
                return (Js * sc[..., None]).reshape(n_gaps, KR, nc)

            return g(Ja_), g(Jb_)

        def sjac(x, p):
            Ja_s, Jb_s = _sel_jac_gaps(x, p)
            J = jnp.zeros((n_gaps, KR, n_steps, nc), x.dtype)
            g = jnp.arange(n_gaps)
            J = J.at[g, :, first_step + g, :].set(Ja_s)
            J = J.at[g, :, first_step + 1 + g, :].set(Jb_s)
            return J.reshape(n_gaps * KR, n_steps * nc)

        def sjac_banded(x, p):
            Ja_s, Jb_s = _sel_jac_gaps(x, p)
            B = jnp.concatenate([Ja_s, Jb_s], axis=-1)  # (n_gaps, KR, 2*nc)
            return B, first_step + jnp.arange(n_gaps, dtype=jnp.int32)

        if is_constraint:
            return ineq_constraint(name, n_gaps * KR, sfn, jac_fn=sjac,
                                   viol_groups=n_gaps, step_coupling=1,
                                   jac_banded_fn=sjac_banded)
        return hinge_cost(name, n_gaps * KR, sfn, jac_fn=sjac,
                          step_coupling=1, jac_banded_fn=sjac_banded)

    if weighted:
        def wfn(x, p):
            werr = jnp.max(_errs(x, p), axis=1)  # (n_gaps,)
            if is_constraint:
                werr = werr * _coeff_scalar(p, x.dtype)
            return werr

        def wjac_banded(x, p):
            errs = _errs(x, p)
            Ja_, Jb_ = _jac_gaps(x, p)
            Js = jnp.concatenate([Ja_, Jb_], axis=-1)  # (n_gaps, R, 2nc)
            werr, Jrow = _weighted_rows(errs, Js)
            if is_constraint:
                Jrow = Jrow * _coeff_scalar(p, x.dtype)
            return (Jrow[:, None, :],
                    first_step + jnp.arange(n_gaps, dtype=jnp.int32))

        def wjac(x, p):
            from ..ops.banded_rows import bb_to_dense
            B, G = wjac_banded(x, p)
            return bb_to_dense([B], [G], n_steps * nc, nc)

        def wwf(p):
            c = _coeff_scalar(p, jnp.asarray(p["coeffs"]).dtype)
            return jnp.full((n_gaps,), c)

        if is_constraint:
            return ineq_constraint(name, n_gaps, wfn, jac_fn=wjac,
                                   viol_groups=n_gaps, step_coupling=1,
                                   jac_banded_fn=wjac_banded)
        return hinge_cost(name, n_gaps, wfn, weight_fn=wwf, jac_fn=wjac,
                          step_coupling=1, jac_banded_fn=wjac_banded)

    if is_constraint:
        def cfn(x, p):
            w = _bcast(p["coeffs"], P, x.dtype)
            return fn(x, p) * jnp.tile(w, n_gaps * n_seg)
        ccf = lambda pp, x: _bcast(pp["coeffs"], P, x.dtype)
        return ineq_constraint(
            name, n, cfn,
            jac_fn=lambda x, p: jac_fn(x, p, cf=lambda pp: ccf(pp, x)),
            viol_groups=n_gaps,  # one reference constraint per step gap
            step_coupling=1,
            jac_banded_fn=lambda x, p: jac_banded_fn(
                x, p, cf=lambda pp: ccf(pp, x)))
    return hinge_cost(name, n, fn, weight_fn=wf, jac_fn=jac_fn,
                      step_coupling=1, jac_banded_fn=jac_banded_fn)


def trajectory_in_collision(world: CollisionWorld, X: jax.Array,
                            margin: float = 0.0, n_sub: int = 16,
                            pair_mask=None) -> jax.Array:
    """Independent swept check of a final trajectory (the reference's
    post-solve verification pattern, planning_unit.cpp:98-148).

    Returns the minimum swept distance over all gaps/pairs; >= margin means
    collision-free.  ``pair_mask`` (n_pairs,) restricts the check to a pair
    subset (e.g. environment pairs only, the reference's contact-manager
    scoping).
    """
    qa, qb = X[:-1], X[1:]
    d = jax.vmap(lambda a, b: world.cast_pair_distances(a, b, n_sub))(qa, qb)
    if pair_mask is not None:
        big = jnp.asarray(jnp.inf, d.dtype)
        d = jnp.where(jnp.asarray(pair_mask, bool)[None, :], d, big)
    return jnp.min(d)
