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

Shared distance precompute: a scene is typically covered by BOTH a hinge
cost (soft margin) and an INEQ constraint (hard margin) over the same
world — the reference shares their contact queries through a per-x result
cache (GetContactResultCached, collision_terms.cpp:440-466).  Here the
same sharing is structural: :class:`CastDistancePre` /
:class:`DiscreteDistancePre` own the FK + distance (+ Jacobian) pipeline,
and every term built over the same pre object receives its output as an
``aux`` argument from the SQP engine — ONE distance pass and ONE Jacobian
pass per linearization point regardless of how many terms consume them
(margins/coefficients are per-term epilogues).

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


class DiscreteDistancePre:
    """Shared per-step distance (+ per-step Jacobian) pipeline.

    ``value(x)`` -> D (span, P) signed distances; ``value_jac(x)`` ->
    (D, Js) with Js (span, P, nc) the raw distance Jacobian wrt that
    step's columns (inv-dt column zero-padded).  Differentiation is
    per-step (n_dof tangents) instead of n_x tangents through the whole
    FK/SDF stack (the band structure of SURVEY.md §5.7(a))."""

    def __init__(self, world: CollisionWorld, n_steps: int,
                 first_step: int = 0, last_step: Optional[int] = None,
                 n_cols: Optional[int] = None):
        self.world = world
        self.n_steps = n_steps
        self.first_step = first_step
        self.last = (n_steps - 1) if last_step is None else last_step
        self.span = self.last - first_step + 1
        self.n_dof = world.chain.n_dof
        self.nc = n_cols or self.n_dof
        self.P = world.n_pairs

    def _q(self, x):
        X = x.reshape(self.n_steps, self.nc)
        return X[self.first_step:self.last + 1, :self.n_dof]

    def value(self, x):
        return jax.vmap(self.world.pair_distances)(self._q(x))  # (span, P)

    def value_jac(self, x):
        def f(q):
            d = self.world.pair_distances(q)
            return d, d

        Js, D = jax.vmap(jax.jacfwd(f, has_aux=True))(self._q(x))
        if self.nc != self.n_dof:  # pad the inv-dt column (no dependence)
            Js = jnp.concatenate(
                [Js, jnp.zeros((self.span, self.P, self.nc - self.n_dof),
                               x.dtype)], axis=-1)
        return D, Js


class CastDistancePre:
    """Shared swept-distance (+ two-endpoint Jacobian) pipeline.

    ``value(x)`` -> D (n_gaps, n_seg, P) swept distances per gap segment;
    ``value_jac(x)`` -> (D, (Ja, Jb)) with Ja/Jb (n_gaps, n_seg * P, nc)
    raw distance Jacobians wrt the gap's two endpoint steps (the cc_time
    gradient split via autodiff through the interpolation,
    collision_terms.cpp:262-323)."""

    def __init__(self, world: CollisionWorld, n_steps: int,
                 first_step: int = 0, last_step: Optional[int] = None,
                 n_sub: int = 8, n_cols: Optional[int] = None):
        self.world = world
        self.n_steps = n_steps
        self.first_step = first_step
        self.last = (n_steps - 1) if last_step is None else last_step
        self.n_gaps = self.last - first_step
        assert self.n_gaps >= 1
        self.n_dof = world.chain.n_dof
        self.nc = n_cols or self.n_dof
        self.P = world.n_pairs
        self.n_seg = max(n_sub - 1, 1)
        self.R = self.n_seg * self.P

    def _qab(self, x):
        X = x.reshape(self.n_steps, self.nc)[:, :self.n_dof]
        return (X[self.first_step:self.last],
                X[self.first_step + 1:self.last + 1])

    def value(self, x):
        qa, qb = self._qab(x)
        return jax.vmap(
            lambda a, b: self.world.cast_pair_distances_seg(
                a, b, self.n_seg + 1))(qa, qb)  # (n_gaps, n_seg, P)

    def value_jac(self, x):
        qa, qb = self._qab(x)

        def f(a, b):
            d = self.world.cast_pair_distances_seg(a, b, self.n_seg + 1)
            return d, d

        (Ja, Jb), D = jax.vmap(
            jax.jacfwd(f, argnums=(0, 1), has_aux=True))(qa, qb)
        Ja = Ja.reshape(self.n_gaps, self.R, self.n_dof)
        Jb = Jb.reshape(self.n_gaps, self.R, self.n_dof)
        if self.nc != self.n_dof:  # pad the inv-dt column (no dependence)
            z = jnp.zeros((self.n_gaps, self.R, self.nc - self.n_dof),
                          x.dtype)
            Ja = jnp.concatenate([Ja, z], axis=-1)
            Jb = jnp.concatenate([Jb, z], axis=-1)
        return D, (Ja, Jb)


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
    pre: Optional[DiscreteDistancePre] = None,
) -> Term:
    """``weighted=True`` aggregates all pairs of a step into ONE row via
    error-weighted average gradients (reference use_weighted_sum,
    collision_types.h:130-141 / weighted_average_methods.cpp).

    ``max_contacts`` caps the QP rows per step at the K worst contacts
    within the ``buffer`` window (see _topk_rows) — per-pair coeffs are
    folded into the selected rows (coeff * max(0, e) == max(0, coeff * e)
    for coeff > 0, so values/penalties are unchanged).

    ``pre``: a shared :class:`DiscreteDistancePre` — pass the same object
    to several terms (cost + constraint over one world) to share the
    distance/Jacobian passes."""
    if pre is None:
        pre = DiscreteDistancePre(world, n_steps, first_step, last_step,
                                  n_cols)
    assert (pre.world is world and pre.n_steps == n_steps
            and pre.first_step == first_step
            and pre.last == ((n_steps - 1) if last_step is None else last_step)
            and pre.nc == (n_cols or world.chain.n_dof))
    span, P, nc, n_dof = pre.span, pre.P, pre.nc, pre.n_dof
    n = span * P

    def _errs(x, p, aux=None):
        D = aux if aux is not None else pre.value(x)  # (span, P)
        margins = _bcast(p["margins"], P, x.dtype)
        return margins[None, :] - D

    def fn(x, p, aux=None):
        return _errs(x, p, aux).reshape(-1)

    def wf(p):
        w = _bcast(p["coeffs"], P, jnp.asarray(p["coeffs"]).dtype)
        return jnp.tile(w, span)

    def _jac_steps(x, p, aux=None, cf=None):
        _, Js = aux if aux is not None else pre.value_jac(x)
        if cf is not None:
            Js = Js * cf(p)[None, :, None]
        return -Js  # d(margin - dist)/dq

    def jac_fn(x, p, aux=None, cf=None):
        """Structure-aware Jacobian: each row block depends on ONE step's
        n_dof joints; scatter the per-step blocks into the banded
        (span*P, n_x) layout (SURVEY.md §5.7(a))."""
        Js = _jac_steps(x, p, aux, cf)
        J = jnp.zeros((span, P, n_steps, nc), x.dtype)
        sidx = jnp.arange(span)
        J = J.at[sidx, :, first_step + sidx, :].set(Js)
        return J.reshape(span * P, n_steps * nc)

    def jac_banded_fn(x, p, aux=None, cf=None):
        from ..ops.banded_rows import step_window
        return step_window(_jac_steps(x, p, aux, cf),
                           first_step + jnp.arange(span), n_steps)

    if max_contacts is not None and max_contacts < P:
        from ..ops.banded_rows import step_window
        K = max_contacts

        def sfn(x, p, aux=None):
            vals, idx, act = _topk_rows(_errs(x, p, aux), K, buffer, x.dtype)
            cof = _bcast(p["coeffs"], P, x.dtype)[idx]
            # deactivated rows become the constant -1: strictly inactive in
            # the hinge/INEQ model AND in the exact value/violation
            return jnp.where(act, cof * vals, -1.0).reshape(-1)

        def _sel_jac_steps(x, p, aux):
            if aux is None:
                aux = pre.value_jac(x)
            D = aux[0]
            vals, idx, act = _topk_rows(_errs(x, p, D), K, buffer, x.dtype)
            Js = _jac_steps(x, p, aux)  # (span, P, nc)
            cof = _bcast(p["coeffs"], P, x.dtype)[idx]
            sc = jnp.where(act, cof, 0.0)
            return jnp.take_along_axis(
                Js, idx[:, :, None], axis=1) * sc[:, :, None]

        def sjac(x, p, aux=None):
            Js = _sel_jac_steps(x, p, aux)
            J = jnp.zeros((span, K, n_steps, nc), x.dtype)
            sidx = jnp.arange(span)
            J = J.at[sidx, :, first_step + sidx, :].set(Js)
            return J.reshape(span * K, n_steps * nc)

        def sjac_banded(x, p, aux=None):
            return step_window(_sel_jac_steps(x, p, aux),
                               first_step + jnp.arange(span), n_steps)

        if is_constraint:
            return ineq_constraint(name, span * K, sfn, jac_fn=sjac,
                                   viol_groups=span, step_coupling=0,
                                   jac_banded_fn=sjac_banded, pre_fn=pre)
        return hinge_cost(name, span * K, sfn, jac_fn=sjac,
                          step_coupling=0, jac_banded_fn=sjac_banded,
                          pre_fn=pre)

    if weighted:
        from ..ops.banded_rows import step_window

        def wfn(x, p, aux=None):
            errs = _errs(x, p, aux)  # (span, P)
            werr = jnp.max(errs, axis=1)
            if is_constraint:
                werr = werr * _coeff_scalar(p, x.dtype)
            return werr

        def wjac_banded(x, p, aux=None):
            if aux is None:
                aux = pre.value_jac(x)
            errs = _errs(x, p, aux[0])
            Js = _jac_steps(x, p, aux)  # (span, P, nc), already negated
            werr, Jrow = _weighted_rows(errs, Js)
            if is_constraint:
                Jrow = Jrow * _coeff_scalar(p, x.dtype)
            return step_window(Jrow[:, None, :],
                               first_step + jnp.arange(span), n_steps)

        def wjac(x, p, aux=None):
            from ..ops.banded_rows import bb_to_dense
            B, G = wjac_banded(x, p, aux)
            return bb_to_dense([B], [G], n_steps * nc, nc)

        def wwf(p):
            c = _coeff_scalar(p, jnp.asarray(p["coeffs"]).dtype)
            return jnp.full((span,), c)

        if is_constraint:
            return ineq_constraint(name, span, wfn, jac_fn=wjac,
                                   viol_groups=span, step_coupling=0,
                                   jac_banded_fn=wjac_banded, pre_fn=pre)
        return hinge_cost(name, span, wfn, weight_fn=wwf, jac_fn=wjac,
                          step_coupling=0, jac_banded_fn=wjac_banded,
                          pre_fn=pre)

    if is_constraint:
        def cfn(x, p, aux=None):
            w = _bcast(p["coeffs"], P, x.dtype)
            return fn(x, p, aux) * jnp.tile(w, span)
        ccf = lambda pp, x: _bcast(pp["coeffs"], P, x.dtype)
        return ineq_constraint(
            name, n, cfn,
            jac_fn=lambda x, p, aux=None: jac_fn(
                x, p, aux, cf=lambda pp: ccf(pp, x)),
            viol_groups=span,  # one reference constraint per timestep
            step_coupling=0,
            jac_banded_fn=lambda x, p, aux=None: jac_banded_fn(
                x, p, aux, cf=lambda pp: ccf(pp, x)),
            pre_fn=pre)
    return hinge_cost(name, n, fn, weight_fn=wf, jac_fn=jac_fn,
                      step_coupling=0, jac_banded_fn=jac_banded_fn,
                      pre_fn=pre)


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
    pre: Optional[CastDistancePre] = None,
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
    weighted_average_methods.cpp:31-68).

    ``pre``: a shared :class:`CastDistancePre` — pass the same object to
    several terms (cost + constraint over one world) to share the
    distance/Jacobian passes."""
    if pre is None:
        pre = CastDistancePre(world, n_steps, first_step, last_step, n_sub,
                              n_cols)
    assert (pre.world is world and pre.n_steps == n_steps
            and pre.first_step == first_step
            and pre.last == ((n_steps - 1) if last_step is None else last_step)
            and pre.n_seg == max(n_sub - 1, 1)
            and pre.nc == (n_cols or world.chain.n_dof))
    n_gaps, P, n_seg, R, nc = pre.n_gaps, pre.P, pre.n_seg, pre.R, pre.nc
    n = n_gaps * R

    def _errs(x, p, aux=None):
        D = aux if aux is not None else pre.value(x)  # (n_gaps, n_seg, P)
        margins = _bcast(p["margins"], P, x.dtype)
        return (margins[None, None, :] - D).reshape(n_gaps, R)

    def fn(x, p, aux=None):
        return _errs(x, p, aux).reshape(-1)

    def wf(p):
        w = _bcast(p["coeffs"], P, jnp.asarray(p["coeffs"]).dtype)
        return jnp.tile(w, n_gaps * n_seg)

    def _jac_gaps(x, p, aux=None, cf=None):
        _, (Ja, Jb) = aux if aux is not None else pre.value_jac(x)
        if cf is not None:
            w = jnp.tile(cf(p), n_seg)
            Ja = Ja * w[None, :, None]
            Jb = Jb * w[None, :, None]
        return -Ja, -Jb  # d(margin - dist)/dq

    def jac_fn(x, p, aux=None, cf=None):
        """Banded scatter of the per-gap row blocks (each depends on the
        two adjacent steps only)."""
        Ja_, Jb_ = _jac_gaps(x, p, aux, cf)
        J = jnp.zeros((n_gaps, R, n_steps, nc), x.dtype)
        g = jnp.arange(n_gaps)
        J = J.at[g, :, first_step + g, :pre.n_dof].set(Ja_[..., :pre.n_dof])
        J = J.at[g, :, first_step + 1 + g, :pre.n_dof].set(
            Jb_[..., :pre.n_dof])
        return J.reshape(n_gaps * R, n_steps * nc)

    def jac_banded_fn(x, p, aux=None, cf=None):
        Ja_, Jb_ = _jac_gaps(x, p, aux, cf)
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

        def _sel(x, p, D=None):
            errs = _errs(x, p, D).reshape(n_gaps, n_seg, P)
            key = jnp.max(errs, axis=1)  # (n_gaps, P) worst err per pair
            _, idx = jax.lax.top_k(key, K)  # (n_gaps, K)
            vals = jnp.take_along_axis(errs, idx[:, None, :], axis=2)
            act = vals >= -jnp.asarray(buffer, x.dtype)
            cof = _bcast(p["coeffs"], P, x.dtype)[idx]  # (n_gaps, K)
            return idx, vals, act, cof  # vals/act: (n_gaps, n_seg, K)

        def sfn(x, p, aux=None):
            idx, vals, act, cof = _sel(x, p, aux)
            return jnp.where(act, cof[:, None, :] * vals, -1.0).reshape(-1)

        def _sel_jac_gaps(x, p, aux):
            if aux is None:
                aux = pre.value_jac(x)
            D = aux[0]
            idx, vals, act, cof = _sel(x, p, D)
            Ja_, Jb_ = _jac_gaps(x, p, aux)  # (n_gaps, R, nc)
            sc = jnp.where(act, cof[:, None, :], 0.0)  # (n_gaps, n_seg, K)

            def g(J):
                J = J.reshape(n_gaps, n_seg, P, nc)
                Js = jnp.take_along_axis(J, idx[:, None, :, None], axis=2)
                return (Js * sc[..., None]).reshape(n_gaps, KR, nc)

            return g(Ja_), g(Jb_)

        def sjac(x, p, aux=None):
            Ja_s, Jb_s = _sel_jac_gaps(x, p, aux)
            J = jnp.zeros((n_gaps, KR, n_steps, nc), x.dtype)
            g = jnp.arange(n_gaps)
            J = J.at[g, :, first_step + g, :].set(Ja_s)
            J = J.at[g, :, first_step + 1 + g, :].set(Jb_s)
            return J.reshape(n_gaps * KR, n_steps * nc)

        def sjac_banded(x, p, aux=None):
            Ja_s, Jb_s = _sel_jac_gaps(x, p, aux)
            B = jnp.concatenate([Ja_s, Jb_s], axis=-1)  # (n_gaps, KR, 2*nc)
            return B, first_step + jnp.arange(n_gaps, dtype=jnp.int32)

        if is_constraint:
            return ineq_constraint(name, n_gaps * KR, sfn, jac_fn=sjac,
                                   viol_groups=n_gaps, step_coupling=1,
                                   jac_banded_fn=sjac_banded, pre_fn=pre)
        return hinge_cost(name, n_gaps * KR, sfn, jac_fn=sjac,
                          step_coupling=1, jac_banded_fn=sjac_banded,
                          pre_fn=pre)

    if weighted:
        def wfn(x, p, aux=None):
            werr = jnp.max(_errs(x, p, aux), axis=1)  # (n_gaps,)
            if is_constraint:
                werr = werr * _coeff_scalar(p, x.dtype)
            return werr

        def wjac_banded(x, p, aux=None):
            if aux is None:
                aux = pre.value_jac(x)
            errs = _errs(x, p, aux[0])
            Ja_, Jb_ = _jac_gaps(x, p, aux)
            Js = jnp.concatenate([Ja_, Jb_], axis=-1)  # (n_gaps, R, 2nc)
            werr, Jrow = _weighted_rows(errs, Js)
            if is_constraint:
                Jrow = Jrow * _coeff_scalar(p, x.dtype)
            return (Jrow[:, None, :],
                    first_step + jnp.arange(n_gaps, dtype=jnp.int32))

        def wjac(x, p, aux=None):
            from ..ops.banded_rows import bb_to_dense
            B, G = wjac_banded(x, p, aux)
            return bb_to_dense([B], [G], n_steps * nc, nc)

        def wwf(p):
            c = _coeff_scalar(p, jnp.asarray(p["coeffs"]).dtype)
            return jnp.full((n_gaps,), c)

        if is_constraint:
            return ineq_constraint(name, n_gaps, wfn, jac_fn=wjac,
                                   viol_groups=n_gaps, step_coupling=1,
                                   jac_banded_fn=wjac_banded, pre_fn=pre)
        return hinge_cost(name, n_gaps, wfn, weight_fn=wwf, jac_fn=wjac,
                          step_coupling=1, jac_banded_fn=wjac_banded,
                          pre_fn=pre)

    if is_constraint:
        def cfn(x, p, aux=None):
            w = _bcast(p["coeffs"], P, x.dtype)
            return fn(x, p, aux) * jnp.tile(w, n_gaps * n_seg)
        ccf = lambda pp, x: _bcast(pp["coeffs"], P, x.dtype)
        return ineq_constraint(
            name, n, cfn,
            jac_fn=lambda x, p, aux=None: jac_fn(
                x, p, aux, cf=lambda pp: ccf(pp, x)),
            viol_groups=n_gaps,  # one reference constraint per step gap
            step_coupling=1,
            jac_banded_fn=lambda x, p, aux=None: jac_banded_fn(
                x, p, aux, cf=lambda pp: ccf(pp, x)),
            pre_fn=pre)
    return hinge_cost(name, n, fn, weight_fn=wf, jac_fn=jac_fn,
                      step_coupling=1, jac_banded_fn=jac_banded_fn,
                      pre_fn=pre)


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
