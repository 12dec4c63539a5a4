"""Proximal ADMM for the SQP subproblem — the slack-free TPU formulation.

The reference lowers hinge/abs penalties to slack variables + constraint
rows (ConvexObjective::addHinge/addAbs, trajopt_sco/src/modeling.cpp:18-51;
QP layout trajopt_qp_problem.cpp:28-34) because off-the-shelf QP solvers
speak (P, q, A, l, u).  On TPU that formulation is wasteful: slacks inflate
the KKT factorization from n_x to n_x + n_slack (5x the dimension, ~100x
the Cholesky flops on the flagship problem).

Instead we solve the *composite* subproblem directly:

    minimize  0.5 x'Px + q'x
              + sum_h w_h * max(0, e_h + (A_h x)_h)     (hinge penalties)
              + sum_a w_a * |e_a + (A_a x)_a|           (abs penalties)
    subject to lb <= x <= ub                            (trust region ∩ limits)

with ADMM splitting z = A~x, A~ = [A_h; A_a; I].  The z-update is a
closed-form per-row proximal operator (shifted shrinkage for |.|, one-sided
shrinkage for hinge, clip for the box) — pure VPU element-wise work — and
the x-update factorizes K = P + sigma*I + A~' R A~ of size n_x only.
This solves the *same* convex program as the slack QP (exact penalty
equivalence), so SQP behavior is unchanged.

A further TPU win: penalty-coefficient (merit) updates change only the prox
weights, never K — penalty escalation costs zero refactorizations.

Scaling: Ruiz equilibration as in ops.qp; a row scaling E transforms
(e, w) -> (E e, c w / E) since  w*hinge(e + z/E) = (w/E)*hinge(E e + z).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .qp import (
    OSQP_INFTY,
    QPSettings,
    QP_MAX_ITER,
    QP_SOLVED,
    QP_SOLVED_INACCURATE,
    QP_UNSOLVED,
    _cho_solve,
)


class ProxQPData(NamedTuple):
    P: jax.Array  # (n, n)
    q: jax.Array  # (n,)
    A_h: jax.Array  # (m_h, n) hinge rows; None when rows are banded
    e_h: jax.Array  # (m_h,)
    w_h: jax.Array  # (m_h,) hinge weights (>=0)
    A_a: jax.Array  # (m_a, n) abs rows; None when rows are banded
    e_a: jax.Array  # (m_a,)
    w_a: jax.Array  # (m_a,)
    lb: jax.Array  # (n,)
    ub: jax.Array  # (n,)
    # banded row windows (ops.banded_rows group format) — set with
    # A_h/A_a = None.  Only ops.ipm_qp consumes these; the ADMM paths
    # require dense rows.
    Bh: tuple = ()  # tuple of (n_g, r, 2b) window blocks
    Gh: tuple = ()  # tuple of (n_g,) int32 window start blocks
    Ba: tuple = ()
    Ga: tuple = ()


class ProxQPSolution(NamedTuple):
    x: jax.Array
    y: jax.Array  # (m_h + m_a + n,) duals for warm starting
    status: jax.Array
    iters: jax.Array
    prim_res: jax.Array
    dual_res: jax.Array


def _ruiz(data: ProxQPData, iters: int):
    """Equilibrate [[P, A~'], [A~, 0]]; returns scaled data + (d, e_sc, c)."""
    n = data.q.shape[0]
    A = jnp.concatenate([data.A_h, data.A_a, jnp.eye(n, dtype=data.q.dtype)])
    m = A.shape[0]
    dt = data.q.dtype

    def body(_, carry):
        P, q, A, d, e, c = carry
        norm_x = jnp.maximum(jnp.max(jnp.abs(P), axis=0),
                             jnp.max(jnp.abs(A), axis=0))
        norm_z = jnp.max(jnp.abs(A), axis=1)
        gx = jnp.where(norm_x > 1e-12, 1.0 / jnp.sqrt(norm_x), 1.0)
        gz = jnp.where(norm_z > 1e-12, 1.0 / jnp.sqrt(norm_z), 1.0)
        P = gx[:, None] * P * gx[None, :]
        A = gz[:, None] * A * gx[None, :]
        q = gx * q
        d = d * gx
        e = e * gz
        pc = jnp.mean(jnp.max(jnp.abs(P), axis=0))
        qn = jnp.max(jnp.abs(q))
        denom = jnp.maximum(pc, qn)
        # P == 0 and q == 0 (pure penalty objective) must NOT explode c
        gamma = jnp.where(denom > 1e-12, 1.0 / jnp.maximum(denom, 1e-12), 1.0)
        return (P * gamma, q * gamma, A, d, e, c * gamma)

    P, q, A, d, e, c = jax.lax.fori_loop(
        0, iters, body,
        (data.P, data.q, A, jnp.ones((n,), dt), jnp.ones((m,), dt),
         jnp.asarray(1.0, dt)))
    return P, q, A, d, e, c


@partial(jax.jit, static_argnums=(1,))
def solve_prox_qp(data: ProxQPData, settings: QPSettings = QPSettings(),
                  x0: Optional[jax.Array] = None,
                  y0: Optional[jax.Array] = None) -> ProxQPSolution:
    s = settings
    n = data.q.shape[0]
    m_h = data.e_h.shape[0]
    m_a = data.e_a.shape[0]
    m = m_h + m_a + n
    dt = data.q.dtype

    P, q, A, d_sc, e_sc, c_sc = _ruiz(data, s.scaling_iters)

    # scaled per-row shifts/weights/bounds
    E_h = e_sc[:m_h]
    E_a = e_sc[m_h:m_h + m_a]
    E_x = e_sc[m_h + m_a:]
    eh = E_h * data.e_h
    wh = c_sc * data.w_h / jnp.maximum(E_h, 1e-300 if dt == jnp.float64 else 1e-30)
    ea = E_a * data.e_a
    wa = c_sc * data.w_a / jnp.maximum(E_a, 1e-300 if dt == jnp.float64 else 1e-30)
    lb = jnp.clip(E_x * data.lb, -OSQP_INFTY, OSQP_INFTY)
    ub = jnp.clip(E_x * data.ub, -OSQP_INFTY, OSQP_INFTY)

    # Per-row rho.  Penalty rows scale rho with their weight: a w-weighted
    # hinge/abs term approaches a hard constraint as w grows (merit
    # escalation multiplies w by 10 each penalty round), and keeping the
    # prox threshold w/rho bounded is what keeps ADMM convergent there —
    # the same reasoning as OSQP's rho_eq_scale on equality rows.  Pinned
    # box rows (lb == ub) act like equalities.
    w_pen = jnp.clip(jnp.concatenate([wh, wa]), 1e-2, 1e4)

    def rho_vec(rho):
        r_pen = rho * w_pen
        is_eq = (ub - lb) < 1e-9
        r_box = jnp.where(is_eq, rho * s.rho_eq_scale, rho)
        return jnp.clip(jnp.concatenate([r_pen, r_box]), s.rho_min, s.rho_max)

    def factorize(rv):
        K = P + s.sigma * jnp.eye(n, dtype=dt) + (A.T * rv[None, :]) @ A
        return jnp.linalg.cholesky(K)

    def kkt_solve(chol, rv, rhs):
        d = _cho_solve(chol, rhs)
        for _ in range(s.refine_steps):
            r = rhs - (P @ d + s.sigma * d + A.T @ (rv * (A @ d)))
            d = d + _cho_solve(chol, r)
        return d

    def prox(u, rv):
        """Row-wise prox of g/rho at u."""
        inv_r = 1.0 / rv
        # hinge rows
        t = u[:m_h] + eh
        thr = wh * inv_r[:m_h]
        v = jnp.where(t > thr, t - thr, jnp.minimum(t, 0.0))
        z_h = v - eh
        # abs rows
        t = u[m_h:m_h + m_a] + ea
        thr = wa * inv_r[m_h:m_h + m_a]
        v = jnp.sign(t) * jnp.maximum(jnp.abs(t) - thr, 0.0)
        z_a = v - ea
        # box rows
        z_x = jnp.clip(u[m_h + m_a:], lb, ub)
        return jnp.concatenate([z_h, z_a, z_x])

    x = jnp.zeros((n,), dt) if x0 is None else x0 / d_sc
    y = jnp.zeros((m,), dt) if y0 is None else y0 * c_sc / e_sc
    z = prox(A @ x, rho_vec(jnp.asarray(s.rho, dt)))

    rho0 = jnp.asarray(s.rho, dt)
    rv0 = rho_vec(rho0)
    chol0 = factorize(rv0)
    big = jnp.asarray(jnp.inf, dt)

    def admm_iter(_, carry):
        x, z, y, rv, chol = carry
        rhs = s.sigma * x - q + A.T @ (rv * z - y)
        xt = kkt_solve(chol, rv, rhs)
        zt = A @ xt
        x1 = s.alpha * xt + (1 - s.alpha) * x
        z_cand = s.alpha * zt + (1 - s.alpha) * z
        z1 = prox(z_cand + y / rv, rv)
        y1 = y + rv * (z_cand - z1)
        return (x1, z1, y1, rv, chol)

    def residuals(x, z, y):
        rp = jnp.max(jnp.abs(A @ x - z))
        rd = jnp.max(jnp.abs(P @ x + q + A.T @ y))
        eps_p = s.eps_abs + s.eps_rel * jnp.maximum(jnp.max(jnp.abs(A @ x)),
                                                    jnp.max(jnp.abs(z)))
        eps_d = s.eps_abs + s.eps_rel * jnp.maximum(
            jnp.maximum(jnp.max(jnp.abs(P @ x)), jnp.max(jnp.abs(q))),
            jnp.max(jnp.abs(A.T @ y)))
        return rp, rd, eps_p, eps_d

    class _St(NamedTuple):
        x: jax.Array
        z: jax.Array
        y: jax.Array
        rho: jax.Array
        chol: jax.Array
        it: jax.Array
        status: jax.Array
        rp: jax.Array
        rd: jax.Array

    st0 = _St(x, z, y, rho0, chol0, jnp.int32(0), jnp.int32(QP_UNSOLVED),
              big, big)

    def cond(st):
        return (st.status == QP_UNSOLVED) & (st.it < s.max_iter)

    def body(st):
        rv = rho_vec(st.rho)
        x, z, y, _, _ = jax.lax.fori_loop(
            0, s.check_interval, admm_iter, (st.x, st.z, st.y, rv, st.chol))
        it = st.it + s.check_interval
        rp, rd, eps_p, eps_d = residuals(x, z, y)
        converged = (rp <= eps_p) & (rd <= eps_d)
        status = jnp.where(converged, jnp.int32(QP_SOLVED), st.status)

        do_adapt = (jnp.asarray(s.adaptive_rho)
                    & (it % s.adaptive_rho_interval == 0) & ~converged)
        nrp = rp / jnp.maximum(jnp.maximum(jnp.max(jnp.abs(A @ x)),
                                           jnp.max(jnp.abs(z))), 1e-12)
        nrd = rd / jnp.maximum(
            jnp.maximum(jnp.max(jnp.abs(P @ x + q)),
                        jnp.max(jnp.abs(A.T @ y))), 1e-12)
        rho_new = jnp.clip(st.rho * jnp.sqrt(nrp / jnp.maximum(nrd, 1e-12)),
                           s.rho_min, s.rho_max)
        big_change = (rho_new > st.rho * s.adaptive_rho_tol) | (
            rho_new < st.rho / s.adaptive_rho_tol)
        rho = jnp.where(do_adapt & big_change, rho_new, st.rho)
        chol = factorize(rho_vec(rho))
        return _St(x, z, y, rho, chol, it, status, rp, rd)

    fin = jax.lax.while_loop(cond, body, st0)
    status = jnp.where(
        fin.status == QP_UNSOLVED,
        jnp.where((fin.rp < 1e-2) & (fin.rd < 1e-2),
                  jnp.int32(QP_SOLVED_INACCURATE), jnp.int32(QP_MAX_ITER)),
        fin.status)
    xu = d_sc * fin.x
    yu = e_sc * fin.y / c_sc
    return ProxQPSolution(xu, yu, status, fin.it, fin.rp, fin.rd)
