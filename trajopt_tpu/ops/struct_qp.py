"""Structure-exploiting OSQP ADMM + polish for the SQP subproblem.

Solves the reference's slack-variable subproblem formulation
(hinge/abs lowering, trajopt_sco/src/modeling.cpp:18-51; QP layout
trajopt_sqp/src/trajopt_qp_problem.cpp:28-34) with *exactly* the OSQP ADMM
iteration, but never materializes the slack-augmented KKT system:

  variables u = [dx (n) | h (m_h) | p (m_a) | n (m_a)]
  rows    z1 = J_h dx - h        <= -e_h          (hinge coupling)
          z2 = J_a dx - p + q_n   = -e_a          (abs coupling)
          z3 = dx                in [lb, ub]      (trust box ∩ limits)
          z4 = (h, p, q_n)       >= 0             (slack bounds)
  cost    0.5 dx'P dx + q'dx + w_h'h + w_a'(p + q_n)

The x-update matrix K = P_full + sigma I + A~' R A~ has a diagonal /
2x2-block-diagonal slack-slack block, so a Schur complement reduces every
KKT solve to an n x n Cholesky (generalized to per-row weights so the same
code path serves the final *polish* step):

  K_sc = P + (sigma + r3) I + J_h' D_h J_h + J_a' D_a J_a
  D_h  = r1 - r1^2 / (sigma + r1 + w4h)
  D_a  = r2 - r2^2 (s00 + s11 - 2 r2) / (s00 s11 - r2^2),
         s00 = sigma + r2 + w4p,  s11 = sigma + r2 + w4n

Polish (OSQP's polishing=true, which the reference enables at
trajopt_sco/src/osqp_interface.cpp:78-90): after ADMM termination, the
active rows (by dual sign) are enforced with a large quadratic weight and
the reduced system re-solved with iterative refinement; the polished point
is kept only if it reduces both residuals.  This recovers near-exact
solutions — essential for trust-region merit arithmetic near convergence.

Merit-coefficient updates only touch q — no refactorization.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .prox_qp import ProxQPData
from .qp import (
    OSQP_INFTY,
    QPSettings,
    QP_MAX_ITER,
    QP_SOLVED,
    QP_SOLVED_INACCURATE,
    QP_UNSOLVED,
)


class StructQPSolution(NamedTuple):
    x: jax.Array  # (n,) primal dx
    u: jax.Array  # (n + m_h + 2 m_a,) full primal incl. slacks (warm start)
    y: jax.Array  # (m,) duals (warm start)
    status: jax.Array
    iters: jax.Array
    prim_res: jax.Array
    dual_res: jax.Array


@partial(jax.jit, static_argnums=(1,))
def solve_struct_qp(data: ProxQPData, settings: QPSettings = QPSettings(),
                    u0: Optional[jax.Array] = None,
                    y0: Optional[jax.Array] = None) -> StructQPSolution:
    s = settings
    n = data.q.shape[0]
    mh = data.e_h.shape[0]
    ma = data.e_a.shape[0]
    m = mh + ma + n + mh + 2 * ma
    nu = n + mh + 2 * ma
    dt = data.q.dtype

    # ---- pre-scaling: row-normalize J rows; cost-scale the objective ----
    rh = jnp.maximum(jnp.max(jnp.abs(data.A_h), axis=1), 1e-8) if mh else jnp.ones((0,), dt)
    ra = jnp.maximum(jnp.max(jnp.abs(data.A_a), axis=1), 1e-8) if ma else jnp.ones((0,), dt)
    Jh = data.A_h / rh[:, None] if mh else data.A_h
    Ja = data.A_a / ra[:, None] if ma else data.A_a
    eh = data.e_h / rh
    ea = data.e_a / ra
    wh = data.w_h * rh  # h' = h / r  =>  cost weight w*r on h'
    wa = data.w_a * ra
    cnorm = jnp.maximum(jnp.maximum(jnp.mean(jnp.abs(data.P)),
                                    jnp.max(jnp.abs(data.q))), 1.0)
    c = 1.0 / cnorm
    P = data.P * c
    q = data.q * c
    wh_s = wh * c
    wa_s = wa * c
    lb, ub = data.lb, data.ub

    inf = jnp.asarray(OSQP_INFTY, dt)
    l = jnp.concatenate([jnp.full((mh,), -inf, dt), -ea, lb,
                         jnp.zeros((mh + 2 * ma,), dt)])
    u_bnd = jnp.concatenate([-eh, -ea, ub, jnp.full((mh + 2 * ma,), inf, dt)])
    q_full = jnp.concatenate([q, wh_s, wa_s, wa_s])

    # ---- generalized structured KKT:  K = P_full + sigma I + A~' R A~ ----
    # R split into row blocks (r1 hinge, r2 abs, r3 box, w4h/w4p/w4n slacks)

    def factorize(r1, r2, r3, w4h, w4p, w4n, sigma):
        """Explicit inverse of the Schur-reduced KKT matrix.

        TPU-first choice: per-ADMM-iteration triangular solves lower to
        *sequential* row sweeps on TPU, while an inverse computed once per
        rho segment turns every subsequent KKT solve into a single MXU
        matvec.  The inverse is built from the Cholesky factor
        (Linv' Linv), and every solve is followed by iterative refinement
        against the exact K matvec, which restores backward accuracy lost
        to the explicit inverse.
        """
        Dh = r1 - r1 * r1 / (sigma + r1 + w4h)
        s00 = sigma + r2 + w4p
        s11 = sigma + r2 + w4n
        det = s00 * s11 - r2 * r2
        Da = r2 - r2 * r2 * (s00 + s11 - 2 * r2) / det
        K = P + jnp.diag(sigma + r3) + (Jh.T * Dh[None, :]) @ Jh \
            + (Ja.T * Da[None, :]) @ Ja
        L = jnp.linalg.cholesky(0.5 * (K + K.T))
        Linv = jax.scipy.linalg.solve_triangular(
            L, jnp.eye(n, dtype=dt), lower=True)
        Kinv = Linv.T @ Linv
        # One Newton-Schulz step: quadratically sharpens the f32 inverse
        # (Kinv <- Kinv (2I - K Kinv)); costs two n^3 matmuls once per rho
        # segment and keeps per-ADMM-iteration solves at one matvec.
        Kinv = Kinv @ (2.0 * jnp.eye(n, dtype=dt) - K @ Kinv)
        return 0.5 * (Kinv + Kinv.T)

    def kkt_solve(Kinv, r1, r2, r3, w4h, w4p, w4n, sigma, r_full):
        r_x = r_full[:n]
        r_h = r_full[n:n + mh]
        r_p = r_full[n + mh:n + mh + ma]
        r_n = r_full[n + mh + ma:]
        ah = sigma + r1 + w4h
        s00 = sigma + r2 + w4p
        s11 = sigma + r2 + w4n
        det = s00 * s11 - r2 * r2
        r_xp = r_x + Jh.T @ (r1 * r_h / ah) \
            - Ja.T @ (r2 * ((r2 - s11) * r_p + (s00 - r2) * r_n) / det)
        dx = Kinv @ r_xp
        Jhdx = Jh @ dx
        Jadx = Ja @ dx
        h = (r_h + r1 * Jhdx) / ah
        a = r_p + r2 * Jadx
        b = r_n - r2 * Jadx
        p = (s11 * a + r2 * b) / det
        nn = (r2 * a + s00 * b) / det
        return jnp.concatenate([dx, h, p, nn])

    def K_matvec(r1, r2, r3, w4h, w4p, w4n, sigma, u):
        dx, h, p, nn = (u[:n], u[n:n + mh], u[n + mh:n + mh + ma],
                        u[n + mh + ma:])
        z1 = Jh @ dx - h
        z2 = Ja @ dx - p + nn
        out_x = P @ dx + sigma * dx + Jh.T @ (r1 * z1) + Ja.T @ (r2 * z2) \
            + r3 * dx
        out_h = sigma * h - r1 * z1 + w4h * h
        out_p = sigma * p - r2 * z2 + w4p * p
        out_n = sigma * nn + r2 * z2 + w4n * nn
        return jnp.concatenate([out_x, out_h, out_p, out_n])

    def A_mul(u):
        dx, h, p, nn = (u[:n], u[n:n + mh], u[n + mh:n + mh + ma],
                        u[n + mh + ma:])
        return jnp.concatenate([Jh @ dx - h, Ja @ dx - p + nn, dx, h, p, nn])

    def At_mul(v):
        v1 = v[:mh]
        v2 = v[mh:mh + ma]
        v3 = v[mh + ma:mh + ma + n]
        v4h = v[mh + ma + n:mh + ma + n + mh]
        v4p = v[mh + ma + n + mh:mh + ma + n + mh + ma]
        v4n = v[mh + ma + n + mh + ma:]
        out_x = Jh.T @ v1 + Ja.T @ v2 + v3
        return jnp.concatenate([out_x, -v1 + v4h, -v2 + v4p, v2 + v4n])

    # ---- ADMM rho blocks (OSQP rules) ----
    def rho_blocks(rho):
        r1 = jnp.full((mh,), rho, dt)
        r2 = jnp.full((ma,), rho * s.rho_eq_scale, dt)
        is_eq = (ub - lb) < 1e-9
        r3 = jnp.where(is_eq, rho * s.rho_eq_scale, rho)
        r4 = jnp.full((mh + 2 * ma,), rho, dt)
        cl = lambda r: jnp.clip(r, s.rho_min, s.rho_max)
        return cl(r1), cl(r2), cl(r3), cl(r4)

    def rho_vec_full(rb):
        r1, r2, r3, r4 = rb
        return jnp.concatenate([r1, r2, r3, r4])

    def split4(r4):
        return r4[:mh], r4[mh:mh + ma], r4[mh + ma:]

    uvar = jnp.zeros((nu,), dt) if u0 is None else u0
    y = jnp.zeros((m,), dt) if y0 is None else y0 * c
    z = jnp.clip(A_mul(uvar), l, u_bnd)

    rho0 = jnp.asarray(s.rho, dt)
    rb0 = rho_blocks(rho0)
    w4h0, w4p0, w4n0 = split4(rb0[3])
    Kinv0 = factorize(rb0[0], rb0[1], rb0[2], w4h0, w4p0, w4n0, s.sigma)
    big = jnp.asarray(jnp.inf, dt)

    def admm_iter(_, carry):
        uvar, z, y, rb, Kinv = carry
        r1, r2, r3, r4 = rb
        w4h, w4p, w4n = split4(r4)
        rv = rho_vec_full(rb)
        rhs = s.sigma * uvar - q_full + At_mul(rv * z - y)
        ut = kkt_solve(Kinv, r1, r2, r3, w4h, w4p, w4n, s.sigma, rhs)
        if s.refine_steps > 0:
            def refine(_, ut):
                r = rhs - K_matvec(r1, r2, r3, w4h, w4p, w4n, s.sigma, ut)
                return ut + kkt_solve(Kinv, r1, r2, r3, w4h, w4p, w4n,
                                      s.sigma, r)
            ut = jax.lax.fori_loop(0, s.refine_steps, refine, ut)
        zt = A_mul(ut)
        u1 = s.alpha * ut + (1 - s.alpha) * uvar
        z_cand = s.alpha * zt + (1 - s.alpha) * z
        z1 = jnp.clip(z_cand + y / rv, l, u_bnd)
        y1 = y + rv * (z_cand - z1)
        return (u1, z1, y1, rb, Kinv)

    def residuals(uvar, z, y):
        Au = A_mul(uvar)
        rp = jnp.max(jnp.abs(Au - z))
        Pu = jnp.concatenate([P @ uvar[:n], jnp.zeros((nu - n,), dt)])
        rd = jnp.max(jnp.abs(Pu + q_full + At_mul(y))) / c  # unscaled dual
        eps_p = s.eps_abs + s.eps_rel * jnp.maximum(jnp.max(jnp.abs(Au)),
                                                    jnp.max(jnp.abs(z)))
        eps_d = s.eps_abs + s.eps_rel * jnp.maximum(
            jnp.maximum(jnp.max(jnp.abs(Pu)) / c,
                        jnp.max(jnp.abs(q_full)) / c),
            jnp.max(jnp.abs(At_mul(y))) / c)
        return rp, rd, eps_p, eps_d

    class _St(NamedTuple):
        u: jax.Array
        z: jax.Array
        y: jax.Array
        rho: jax.Array
        Kinv: jax.Array
        it: jax.Array
        status: jax.Array
        rp: jax.Array
        rd: jax.Array

    st0 = _St(uvar, z, y, rho0, Kinv0, jnp.int32(0), jnp.int32(QP_UNSOLVED),
              big, big)

    def cond(st):
        return (st.status == QP_UNSOLVED) & (st.it < s.max_iter)

    def body(st):
        rb = rho_blocks(st.rho)
        uvar, z, y, _, _ = jax.lax.fori_loop(
            0, s.check_interval, admm_iter, (st.u, st.z, st.y, rb, st.Kinv))
        it = st.it + s.check_interval
        rp, rd, eps_p, eps_d = residuals(uvar, z, y)
        converged = (rp <= eps_p) & (rd <= eps_d)
        status = jnp.where(converged, jnp.int32(QP_SOLVED), st.status)

        do_adapt = (jnp.asarray(s.adaptive_rho)
                    & (it % s.adaptive_rho_interval == 0) & ~converged)
        Au = A_mul(uvar)
        nrp = rp / jnp.maximum(jnp.maximum(jnp.max(jnp.abs(Au)),
                                           jnp.max(jnp.abs(z))), 1e-12)
        Pu = jnp.concatenate([P @ uvar[:n], jnp.zeros((nu - n,), dt)])
        nrd = (rd * c) / jnp.maximum(
            jnp.maximum(jnp.max(jnp.abs(Pu + q_full)),
                        jnp.max(jnp.abs(At_mul(y)))), 1e-12)
        rho_new = jnp.clip(st.rho * jnp.sqrt(nrp / jnp.maximum(nrd, 1e-12)),
                           s.rho_min, s.rho_max)
        big_change = (rho_new > st.rho * s.adaptive_rho_tol) | (
            rho_new < st.rho / s.adaptive_rho_tol)
        rho_nxt = jnp.where(do_adapt & big_change, rho_new, st.rho)
        rbn = rho_blocks(rho_nxt)
        w4h, w4p, w4n = split4(rbn[3])
        Kinv = factorize(rbn[0], rbn[1], rbn[2], w4h, w4p, w4n, s.sigma)
        return _St(uvar, z, y, rho_nxt, Kinv, it, status, rp, rd)

    fin = jax.lax.while_loop(cond, body, st0)

    # ---- polish: enforce active rows with a large weight, refine, accept
    # only on residual improvement (OSQP polish semantics) ----
    W = jnp.asarray(1e5 if dt == jnp.float32 else 1e9, dt)
    ytol = 1e-10
    act1 = (fin.y[:mh] > ytol).astype(dt)  # hinge rows: upper side only
    act3_l = fin.y[mh + ma:mh + ma + n] < -ytol
    act3_u = fin.y[mh + ma:mh + ma + n] > ytol
    act3 = (act3_l | act3_u).astype(dt)
    b3 = jnp.where(act3_l, lb, ub)
    y4 = fin.y[mh + ma + n:]
    act4 = (y4 < -ytol).astype(dt)
    w4h_p, w4p_p, w4n_p = split4(W * act4)

    r1p = W * act1
    r2p = jnp.full((ma,), W, dt)  # equality rows always active
    r3p = W * act3
    sigma_p = jnp.asarray(1e-7 if dt == jnp.float32 else 1e-12, dt)
    Kinv_p = factorize(r1p, r2p, r3p, w4h_p, w4p_p, w4n_p, sigma_p)
    b_act = jnp.concatenate([-eh, -ea, b3, jnp.zeros((mh + 2 * ma,), dt)])
    Wv = jnp.concatenate([r1p, r2p, r3p, w4h_p, w4p_p, w4n_p])
    rhs_p = -q_full + At_mul(Wv * b_act)

    up = kkt_solve(Kinv_p, r1p, r2p, r3p, w4h_p, w4p_p, w4n_p, sigma_p, rhs_p)
    for _ in range(3):
        r = rhs_p - K_matvec(r1p, r2p, r3p, w4h_p, w4p_p, w4n_p, sigma_p, up)
        up = up + kkt_solve(Kinv_p, r1p, r2p, r3p, w4h_p, w4p_p, w4n_p,
                            sigma_p, r)
    # polished duals on active rows: y_pol = W (A u - b) on active rows
    y_pol = Wv * (A_mul(up) - b_act)
    z_pol = jnp.clip(A_mul(up), l, u_bnd)
    rp_p, rd_p, eps_p_, eps_d_ = residuals(up, z_pol, y_pol)
    better = (rp_p <= jnp.maximum(fin.rp, 1e-30)) & (rd_p <= jnp.maximum(fin.rd, 1e-30))
    u_out = jnp.where(better, up, fin.u)
    y_out = jnp.where(better, y_pol, fin.y)
    rp_out = jnp.where(better, rp_p, fin.rp)
    rd_out = jnp.where(better, rd_p, fin.rd)
    pol_solved = (rp_p <= eps_p_) & (rd_p <= eps_d_)

    status = jnp.where(
        (fin.status == QP_UNSOLVED) & pol_solved, jnp.int32(QP_SOLVED),
        fin.status)
    status = jnp.where(
        status == QP_UNSOLVED,
        jnp.where((rp_out < 1e-2) & (rd_out < 1e-2),
                  jnp.int32(QP_SOLVED_INACCURATE), jnp.int32(QP_MAX_ITER)),
        status)

    # ---- descent guarantee (what the trust-region SQP relies on) ----
    # The returned step never increases the composite objective: evaluate
    # the exact (unscaled) composite at the box-clipped primal and fall
    # back to dx = 0 — always feasible — if the ADMM iterate is worse.
    # An exact solver satisfies this trivially (dx = 0 is feasible); ADMM
    # truncated at max_iter may not, and a model-worsening step must never
    # reach the SQP merit logic (it would read as false convergence).
    def composite(dx):
        d = jnp.clip(dx, data.lb, data.ub)
        f = 0.5 * d @ (data.P @ d) + data.q @ d
        if mh:
            f = f + jnp.sum(data.w_h
                            * jnp.maximum(data.e_h + data.A_h @ d, 0.0))
        if ma:
            f = f + jnp.sum(data.w_a * jnp.abs(data.e_a + data.A_a @ d))
        return f

    dx_fin = jnp.clip(u_out[:n], data.lb, data.ub)
    f_fin = composite(dx_fin)
    f_zero = composite(jnp.zeros((n,), dt))
    ok = jnp.isfinite(f_fin) & (f_fin <= f_zero)
    dx_ret = jnp.where(ok, dx_fin, jnp.zeros((n,), dt))
    u_ret = jnp.where(ok, u_out, jnp.zeros_like(u_out))
    # a residual-converged solve whose optimum offers no improvement over
    # dx = 0 is an ACCURATE "no improvement" answer (the SQP reads it as
    # convergence); only truncated runs without descent are failures
    status = jnp.where(ok | (status == QP_SOLVED), status,
                       jnp.int32(QP_MAX_ITER))
    return StructQPSolution(dx_ret, u_ret, y_out / c, status, fin.it,
                            rp_out, rd_out)
