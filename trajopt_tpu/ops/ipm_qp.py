"""Batched primal-dual interior-point solver for the SQP subproblem.

The TPU-native analog of the reference's interior-point backend (BPMPD,
trajopt_sco/src/bpmpd_interface.cpp) specialized to the trust-region SQP
subproblem (hinge/abs slack form, trajopt_sqp/src/trajopt_qp_problem.cpp:
28-34):

  min  0.5 dx'P dx + q'dx + w_h'h + w_a'(p + nn)
  s.t. Jh dx + e_h <= h,  h >= 0          (hinge penalties)
       Ja dx - p + nn = -e_a,  p, nn >= 0 (abs / equality penalties)
       lb <= dx <= ub                      (trust region ∩ limits)

Why IPM here: these trajectory QPs are stiff enough that OSQP-style ADMM
needs >1000 iterations to the reference accuracy contract, while Mehrotra
predictor-corrector converges in ~10-30 steps whose per-step cost is one
n-sized factorization + two solves.  ADMM (ops.struct_qp) remains available
as the OSQP-parity backend.

Structure exploitation, in two layers:

1. Eliminating (h, p, nn) slack/dual blocks condenses every Newton system to
   K = P + Jh' D_h Jh + Ja' D_a Ja + D_box  (n x n, SPD) with
   iteration-dependent positive diagonals — the QP never materializes
   slack-augmented KKT matrices.
2. When the rows are BANDED (ops.banded_rows format: every row a 2-block
   window on the trajectory grid — data.A_h is None and data.Bh/Gh carry
   the windows) the solver touches only the nonzero windows: matvecs are
   per-group einsums, K is accumulated directly in block-tridiagonal form,
   and the factorization is the scan-based block Cholesky (ops.btridiag).
   At flagship shapes the dense row matrix is ~15x its nonzeros; the banded
   path removes that HBM traffic entirely.

Dual structure: the hinge dual satisfies z1 in (0, w_h) (its complement
z2 = w_h - z1), the abs dual y in (-w_a, w_a) (z3 = w_a - y, z4 = w_a + y)
— the IPM keeps every pair strictly interior and drives the barrier
parameter mu -> 0 with Mehrotra's adaptive sigma = (mu_aff/mu)^3.

Robustness contract (what the trust-region SQP relies on):

* The returned step NEVER increases the composite objective: the solver
  tracks the best iterate by exact composite-objective value (evaluated on
  the box-clipped candidate) with dx = 0 as the starting incumbent, so
  ``f(dx) <= f(0)`` and the SQP-level model improvement ``approx >= 0``
  always holds — exactly the property an exact QP solver would give the
  reference (dx = 0 is feasible, trajopt_sco/src/optimizers.cpp:806-837).
* Every iterate update is NaN-guarded: a non-finite Newton step (Cholesky
  breakdown at extreme barrier parameters) terminates the loop with the
  incumbent, never propagates.
* Pinned coordinates (lb == ub: fixed timesteps/dofs enter as equal bounds,
  problem_description.cpp:484-506) are eliminated EXACTLY by masking, not
  by a synthetic epsilon interior: the pinned value is substituted into
  q/e_h/e_a, the corresponding columns are zeroed, and the coordinate is
  replaced by a dummy variable with unit curvature on a unit box.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .banded_rows import (
    bb_mv,
    bb_quad,
    bb_rmv,
    bb_rowmax,
    bb_scale_cols,
    bb_scale_rows,
)
from .btridiag import (
    blocks_from_dense,
    btd_factor_scalar,
    btd_solve_scalar,
)
from .prox_qp import ProxQPData
from .qp import (
    QPSettings,
    QP_MAX_ITER,
    QP_SOLVED,
    QP_SOLVED_INACCURATE,
    QP_UNSOLVED,
)
from .struct_qp import StructQPSolution

_FTB = 0.99  # fraction-to-boundary
_WMIN = 1e-10  # weight floor so zero-weight rows stay formally interior


@partial(jax.jit, static_argnums=(1,))
def solve_ipm_qp(data: ProxQPData, settings: QPSettings = QPSettings(),
                 u0: Optional[jax.Array] = None,
                 y0: Optional[jax.Array] = None) -> StructQPSolution:
    """Drop-in replacement for ops.struct_qp.solve_struct_qp.

    (u0, y0) are accepted for interface parity; IPM re-initializes from a
    well-centered point (warm starts don't help interior-point methods).
    """
    s = settings
    n = data.q.shape[0]
    mh = data.e_h.shape[0]
    ma = data.e_a.shape[0]
    m = mh + ma + n + mh + 2 * ma  # ADMM-layout dual vector length
    dt = data.q.dtype
    tiny = jnp.asarray(1e-30 if dt == jnp.float64 else 1e-25, dt)

    banded = data.A_h is None  # static: rows in ops.banded_rows format
    bsz = s.kkt_block
    use_btd = bsz > 0 and n % bsz == 0 and n >= 2 * bsz
    if banded:
        assert use_btd, "banded rows require kkt_block to be set"
        nb = n // bsz

    # ---- exact elimination of pinned coordinates (lb == ub) ----
    width0 = data.ub - data.lb
    free = (width0 >= 1e-9).astype(dt)  # (n,) 1 = optimized, 0 = pinned
    pin_val = jnp.where(free > 0, 0.0, 0.5 * (data.lb + data.ub))
    # substitute dx_pinned = pin_val into the objective/rows, then replace
    # the pinned coordinate by a dummy on [-1, 1] with unit curvature
    q0 = free * (data.q + data.P @ pin_val)
    P0 = free[:, None] * data.P * free[None, :] + jnp.diag(1.0 - free)
    lb = jnp.where(free > 0, data.lb, -1.0)
    ub = jnp.where(free > 0, data.ub, 1.0)

    # ---- row normalization + cost scaling (as the ADMM path) ----
    if banded:
        Bh0 = bb_scale_cols(data.Bh, data.Gh, free, bsz) if mh else ()
        Ba0 = bb_scale_cols(data.Ba, data.Ga, free, bsz) if ma else ()
        eh0 = data.e_h + (bb_mv(data.Bh, data.Gh, pin_val, bsz) if mh else 0.0)
        ea0 = data.e_a + (bb_mv(data.Ba, data.Ga, pin_val, bsz) if ma else 0.0)
        rh = jnp.maximum(bb_rowmax(Bh0).astype(dt), 1e-8) if mh \
            else jnp.ones((0,), dt)
        ra = jnp.maximum(bb_rowmax(Ba0).astype(dt), 1e-8) if ma \
            else jnp.ones((0,), dt)
        BhS = bb_scale_rows(Bh0, 1.0 / rh) if mh else ()
        BaS = bb_scale_rows(Ba0, 1.0 / ra) if ma else ()

        def jh_mv(v):
            return bb_mv(BhS, data.Gh, v, bsz)

        def jh_rmv(w):
            return bb_rmv(BhS, data.Gh, w, n, bsz)

        def ja_mv(v):
            return bb_mv(BaS, data.Ga, v, bsz)

        def ja_rmv(w):
            return bb_rmv(BaS, data.Ga, w, n, bsz)

        def ah_mv_raw(v):  # original unscaled rows (composite objective)
            return bb_mv(data.Bh, data.Gh, v, bsz)

        def aa_mv_raw(v):
            return bb_mv(data.Ba, data.Ga, v, bsz)
    else:
        eh0 = data.e_h + data.A_h @ pin_val if mh else data.e_h
        ea0 = data.e_a + data.A_a @ pin_val if ma else data.e_a
        Ah0 = data.A_h * free[None, :]
        Aa0 = data.A_a * free[None, :]
        rh = jnp.maximum(jnp.max(jnp.abs(Ah0), axis=1), 1e-8) if mh \
            else jnp.ones((0,), dt)
        ra = jnp.maximum(jnp.max(jnp.abs(Aa0), axis=1), 1e-8) if ma \
            else jnp.ones((0,), dt)
        Jh = Ah0 / rh[:, None] if mh else Ah0
        Ja = Aa0 / ra[:, None] if ma else Aa0

        def jh_mv(v):
            return Jh @ v

        def jh_rmv(w):
            return Jh.T @ w

        def ja_mv(v):
            return Ja @ v

        def ja_rmv(w):
            return Ja.T @ w

        def ah_mv_raw(v):
            return data.A_h @ v

        def aa_mv_raw(v):
            return data.A_a @ v

    eh = eh0 / rh if mh else eh0
    ea = ea0 / ra if ma else ea0
    cnorm = jnp.maximum(jnp.maximum(jnp.mean(jnp.abs(P0)),
                                    jnp.max(jnp.abs(q0))), 1.0)
    c = 1.0 / cnorm
    P = P0 * c
    q = q0 * c
    wh = jnp.maximum(data.w_h * rh * c, _WMIN)
    wa = jnp.maximum(data.w_a * ra * c, _WMIN)

    if use_btd:
        P_D, P_O = blocks_from_dense(P, n // bsz, bsz)
        eye_b = jnp.eye(bsz, dtype=dt)

    def composite_unscaled(dx):
        """Exact composite objective of the ORIGINAL problem at clip(dx)."""
        d = jnp.clip(dx, data.lb, data.ub)
        f = 0.5 * d @ (data.P @ d) + data.q @ d
        if mh:
            f = f + jnp.sum(data.w_h * jnp.maximum(data.e_h + ah_mv_raw(d), 0.0))
        if ma:
            f = f + jnp.sum(data.w_a * jnp.abs(data.e_a + aa_mv_raw(d)))
        return f

    f_zero = composite_unscaled(jnp.zeros((n,), dt))

    # ---- initial interior point ----
    dx = jnp.clip(jnp.zeros((n,), dt), lb + 0.01 * (ub - lb),
                  ub - 0.01 * (ub - lb))
    g = jh_mv(dx) + eh if mh else jnp.zeros((0,), dt)
    h = jnp.maximum(g, 0.0) + 1.0
    s1 = h - g  # >= 1
    r0 = ja_mv(dx) + ea if ma else jnp.zeros((0,), dt)
    p = jnp.maximum(r0, 0.0) + 1.0
    nn = p - r0  # >= 1, makes the equality exact at the start
    z1 = 0.5 * wh
    y = jnp.zeros((ma,), dt)
    z5 = jnp.ones((n,), dt)
    z6 = jnp.ones((n,), dt)

    n_pairs = mh + mh + ma + ma + n + n

    def mu_of(z1, s1, h, p, nn, y, dx, z5, z6):
        z2 = wh - z1
        z3 = wa - y
        z4 = wa + y
        tot = (z1 @ s1 + z2 @ h if mh else 0.0)
        tot = tot + (z3 @ p + z4 @ nn if ma else 0.0)
        tot = tot + z5 @ (dx - lb) + z6 @ (ub - dx)
        return tot / n_pairs

    def residuals(dx, h, p, nn, z1, y, z5, z6):
        rdx = P @ dx + q + (jh_rmv(z1) if mh else 0.0) \
            + (ja_rmv(y) if ma else 0.0) - z5 + z6
        re = (ja_mv(dx) - p + nn + ea) if ma else jnp.zeros((0,), dt)
        return rdx, re

    class _St(NamedTuple):
        dx: jax.Array
        h: jax.Array
        p: jax.Array
        nn: jax.Array
        z1: jax.Array
        y: jax.Array
        z5: jax.Array
        z6: jax.Array
        it: jax.Array
        status: jax.Array
        rp: jax.Array
        rd: jax.Array
        f_best: jax.Array
        dx_best: jax.Array

    # barrier-diagonal cap: near convergence the complementarity diagonals
    # grow like 1/mu and the f32 block Cholesky breaks down (~1e12 dynamic
    # range); capping bounds the Newton system's conditioning — an active
    # row still behaves like a 1e7-stiff penalty, far beyond the QP
    # tolerance, while iterates stay finite (standard practical-IPM
    # safeguard).  f64 keeps a wider cap.
    dcap = jnp.asarray(1e14 if dt == jnp.float64 else 1e10, dt)

    def kkt_diags(st):
        z2 = wh - st.z1
        z3 = wa - st.y
        z4 = wa + st.y
        s1 = st.h - (jh_mv(st.dx) + eh) if mh else jnp.zeros((0,), dt)
        denom = jnp.maximum(st.h * st.z1 + s1 * z2, tiny) if mh else s1
        dh = jnp.minimum(st.z1 * z2 / denom, dcap) if mh else s1
        da = jnp.minimum(
            1.0 / jnp.maximum(st.p / z3 + st.nn / z4, tiny), dcap) \
            if ma else jnp.zeros((0,), dt)
        dbox = jnp.minimum(
            st.z5 / (st.dx - lb) + st.z6 / (ub - st.dx), dcap)
        return s1, z2, z3, z4, dh, da, dbox

    def newton(st, kkt_solve, s1, z2, z3, z4, rc1, rc2, rc3, rc4, rc5, rc6,
               rdx, re):
        """Solve the condensed Newton system for given complementarity rhs.

        Sign convention: steps DECREASE the residuals (we solve J dW = -r).
        """
        denom_h = jnp.maximum(st.h * st.z1 + s1 * z2, tiny) if mh else s1
        b_h = (rc1 * z2 - st.z1 * rc2) / denom_h if mh else rc1
        da = jnp.minimum(
            1.0 / jnp.maximum(st.p / z3 + st.nn / z4, tiny), dcap) \
            if ma else jnp.zeros((0,), dt)
        b_a = -re + rc3 / z3 - rc4 / z4 if ma else re
        rhs = -rdx - (jh_rmv(b_h) if mh else 0.0) \
            + (ja_rmv(da * b_a) if ma else 0.0) \
            + rc5 / (st.dx - lb) - rc6 / (ub - st.dx)
        ddx = kkt_solve(rhs)
        # one refinement step against the exact condensed matrix
        dh_diag = jnp.minimum(st.z1 * z2 / denom_h, dcap) if mh else denom_h
        dbox = jnp.minimum(
            st.z5 / (st.dx - lb) + st.z6 / (ub - st.dx), dcap)
        K_mv = (P @ ddx + (jh_rmv(dh_diag * jh_mv(ddx)) if mh else 0.0)
                + (ja_rmv(da * ja_mv(ddx)) if ma else 0.0) + dbox * ddx)
        ddx = ddx + kkt_solve(rhs - K_mv)

        dz1 = dh_diag * jh_mv(ddx) + b_h if mh else b_h
        dh = (rc2 + st.h * dz1) / z2 if mh else st.h
        dy = da * (ja_mv(ddx) - b_a) if ma else jnp.zeros((0,), dt)
        dp = (rc3 + st.p * dy) / z3 if ma else st.p
        dnn = (rc4 - st.nn * dy) / z4 if ma else st.nn
        dz5 = (rc5 - st.z5 * ddx) / (st.dx - lb)
        dz6 = (rc6 + st.z6 * ddx) / (ub - st.dx)
        ds1 = dh - jh_mv(ddx) if mh else dh
        return ddx, dh, dp, dnn, dz1, dy, dz5, dz6, ds1

    def max_step(v, dv, cap=1e10):
        """Largest alpha in (0, 1] with v + alpha*dv >= (1-_FTB)*v."""
        bad = dv < 0
        a = jnp.where(bad, -_FTB * v / jnp.where(bad, dv, -1.0), cap)
        return jnp.minimum(jnp.min(a, initial=1.0), 1.0)

    def make_kkt_solve(dh_d, da_d, dbox):
        """Factorize K = P + Jh' Dh Jh + Ja' Da Ja + Dbox; return solver."""
        # relative regularization: keeps the Cholesky PD through the late
        # barrier stages where D-blocks span ~12 decades
        if banded:
            D = P_D + jax.vmap(jnp.diag)(dbox.reshape(nb, bsz))
            O = P_O
            if mh:
                Dh, Oh = bb_quad(BhS, data.Gh, dh_d, nb, bsz)
                D, O = D + Dh, O + Oh
            if ma:
                Da, Oa = bb_quad(BaS, data.Ga, da_d, nb, bsz)
                D, O = D + Da, O + Oa
            diag_max = jnp.max(jax.vmap(jnp.diag)(D))
            reg = (1e-12 * diag_max + 1e-11) if dt == jnp.float64 \
                else (1e-7 * diag_max + 1e-8)
            fac = btd_factor_scalar(D + reg * eye_b[None], O)

            def kkt_solve(r):
                return btd_solve_scalar(fac, r.reshape(nb, bsz)).reshape(n)

            return kkt_solve

        K = P + jnp.diag(dbox)
        if mh:
            K = K + (Jh.T * dh_d[None, :]) @ Jh
        if ma:
            K = K + (Ja.T * da_d[None, :]) @ Ja
        reg = 1e-12 * jnp.max(jnp.diag(K)) + 1e-11 if dt == jnp.float64 \
            else 1e-7 * jnp.max(jnp.diag(K)) + 1e-8
        Ksym = 0.5 * (K + K.T)
        if use_btd:
            Db, Ob = blocks_from_dense(Ksym, n // bsz, bsz)
            Db = Db + reg * jnp.eye(bsz, dtype=dt)[None]
            fac = btd_factor_scalar(Db, Ob)

            def kkt_solve(r):
                return btd_solve_scalar(
                    fac, r.reshape(n // bsz, bsz)).reshape(n)

            return kkt_solve

        L = jnp.linalg.cholesky(Ksym + reg * jnp.eye(n, dtype=dt))
        Linv = jax.scipy.linalg.solve_triangular(
            L, jnp.eye(n, dtype=dt), lower=True)
        Kinv = Linv.T @ Linv

        def kkt_solve(r):
            return Kinv @ r

        return kkt_solve

    def body(st: _St):
        s1, z2, z3, z4, dh_d, da_d, dbox = kkt_diags(st)
        kkt_solve = make_kkt_solve(dh_d, da_d, dbox)

        rdx, re = residuals(st.dx, st.h, st.p, st.nn, st.z1, st.y,
                            st.z5, st.z6)
        mu = mu_of(st.z1, s1, st.h, st.p, st.nn, st.y, st.dx, st.z5, st.z6)

        # ---- affine (predictor) step: rc = -z*s ----
        aff = newton(st, kkt_solve, s1, z2, z3, z4,
                     -st.z1 * s1 if mh else s1,
                     -z2 * st.h if mh else s1,
                     -z3 * st.p if ma else st.p,
                     -z4 * st.nn if ma else st.nn,
                     -st.z5 * (st.dx - lb),
                     -st.z6 * (ub - st.dx),
                     rdx, re)
        ddx, dh, dp, dnn, dz1, dy, dz5, dz6, ds1 = aff
        # primal/dual max steps (z2 = wh - z1 decreases when dz1 > 0;
        # z3 = wa - y with dy > 0; z4 = wa + y with dy < 0)
        a = jnp.minimum(max_step(st.dx - lb, ddx),
                        max_step(ub - st.dx, -ddx))
        a = jnp.minimum(a, max_step(st.z5, dz5))
        a = jnp.minimum(a, max_step(st.z6, dz6))
        if mh:
            a = jnp.minimum(a, max_step(s1, ds1))
            a = jnp.minimum(a, max_step(st.h, dh))
            a = jnp.minimum(a, max_step(st.z1, dz1))
            a = jnp.minimum(a, max_step(z2, -dz1))
        if ma:
            a = jnp.minimum(a, max_step(st.p, dp))
            a = jnp.minimum(a, max_step(st.nn, dnn))
            a = jnp.minimum(a, max_step(z3, -dy))
            a = jnp.minimum(a, max_step(z4, dy))
        mu_aff = mu_of(st.z1 + a * dz1, s1 + a * ds1, st.h + a * dh,
                       st.p + a * dp, st.nn + a * dnn, st.y + a * dy,
                       st.dx + a * ddx, st.z5 + a * dz5, st.z6 + a * dz6)
        sigma = jnp.clip((mu_aff / jnp.maximum(mu, tiny)) ** 3, 1e-8, 1.0)

        # ---- corrector step with Mehrotra second-order terms ----
        smu = sigma * mu
        cor = newton(st, kkt_solve, s1, z2, z3, z4,
                     smu - st.z1 * s1 - dz1 * ds1 if mh else s1,
                     smu - z2 * st.h - (-dz1) * dh if mh else s1,
                     smu - z3 * st.p - (-dy) * dp if ma else st.p,
                     smu - z4 * st.nn - dy * dnn if ma else st.nn,
                     smu - st.z5 * (st.dx - lb) - dz5 * ddx,
                     smu - st.z6 * (ub - st.dx) - dz6 * (-ddx),
                     rdx, re)
        ddx, dh, dp, dnn, dz1, dy, dz5, dz6, ds1 = cor
        a = jnp.minimum(max_step(st.dx - lb, ddx),
                        max_step(ub - st.dx, -ddx))
        a = jnp.minimum(a, max_step(st.z5, dz5))
        a = jnp.minimum(a, max_step(st.z6, dz6))
        if mh:
            a = jnp.minimum(a, max_step(s1, ds1))
            a = jnp.minimum(a, max_step(st.h, dh))
            a = jnp.minimum(a, max_step(st.z1, dz1))
            a = jnp.minimum(a, max_step(z2, -dz1))
        if ma:
            a = jnp.minimum(a, max_step(st.p, dp))
            a = jnp.minimum(a, max_step(st.nn, dnn))
            a = jnp.minimum(a, max_step(z3, -dy))
            a = jnp.minimum(a, max_step(z4, dy))

        dx1 = st.dx + a * ddx
        h1 = st.h + a * dh if mh else st.h
        p1 = st.p + a * dp if ma else st.p
        nn1 = st.nn + a * dnn if ma else st.nn
        z1_1 = st.z1 + a * dz1 if mh else st.z1
        y1 = st.y + a * dy if ma else st.y
        z5_1 = st.z5 + a * dz5
        z6_1 = st.z6 + a * dz6

        # ---- NaN guard: a broken Newton step keeps the incumbent ----
        finite = (jnp.all(jnp.isfinite(dx1)) & jnp.all(jnp.isfinite(z5_1))
                  & jnp.all(jnp.isfinite(z6_1)))
        if mh:
            finite = finite & jnp.all(jnp.isfinite(h1)) \
                & jnp.all(jnp.isfinite(z1_1))
        if ma:
            finite = finite & jnp.all(jnp.isfinite(p1)) \
                & jnp.all(jnp.isfinite(nn1)) & jnp.all(jnp.isfinite(y1))
        dx1 = jnp.where(finite, dx1, st.dx)
        h1 = jnp.where(finite, h1, st.h)
        p1 = jnp.where(finite, p1, st.p)
        nn1 = jnp.where(finite, nn1, st.nn)
        z1_1 = jnp.where(finite, z1_1, st.z1)
        y1 = jnp.where(finite, y1, st.y)
        z5_1 = jnp.where(finite, z5_1, st.z5)
        z6_1 = jnp.where(finite, z6_1, st.z6)

        # ---- best-iterate tracking by exact composite objective ----
        f1 = composite_unscaled(dx1)
        better = finite & (f1 < st.f_best)
        f_best = jnp.where(better, f1, st.f_best)
        dx_best = jnp.where(better, dx1, st.dx_best)

        # ---- termination ----
        # primal: equality residual (hinge/box rows are feasible by
        # construction); dual: stationarity; gap: total complementarity —
        # all unscaled, measured against eps_abs + eps_rel * scale
        # (the OSQP criterion the reference configures,
        # osqp_interface.cpp:78-90)
        rdx1, re1 = residuals(dx1, h1, p1, nn1, z1_1, y1, z5_1, z6_1)
        mu1 = mu_of(z1_1, h1 - (jh_mv(dx1) + eh) if mh else h1, h1,
                    p1, nn1, y1, dx1, z5_1, z6_1)
        rp_u = jnp.max(jnp.abs(re1), initial=jnp.asarray(0.0, dt))
        rd_u = jnp.max(jnp.abs(rdx1)) / c
        gap_u = (n_pairs * mu1) / c
        d_scale = jnp.maximum(jnp.max(jnp.abs(P @ dx1)),
                              jnp.max(jnp.abs(q)))
        # merit escalation scales the stationarity terms by the row weights
        # (up to 1e6 x) — an absolute-only dual test is unreachable then
        if mh:
            d_scale = jnp.maximum(d_scale, jnp.max(jnp.abs(jh_rmv(z1_1))))
        if ma:
            d_scale = jnp.maximum(d_scale, jnp.max(jnp.abs(ja_rmv(y1))))
        d_scale = d_scale / c
        p_scale = (jnp.maximum(jnp.max(jnp.abs(ja_mv(dx1))),
                               jnp.max(jnp.abs(ea)))
                   if ma else jnp.asarray(0.0, dt))
        f_scale = jnp.maximum(jnp.abs(f1), jnp.abs(f_zero)) + 1.0
        eps_p = s.eps_abs + s.eps_rel * p_scale
        eps_d = s.eps_abs + s.eps_rel * d_scale
        eps_g = s.eps_abs * f_scale
        rp_r = rp_u / eps_p
        rd_r = jnp.maximum(rd_u / eps_d, gap_u / eps_g)
        conv = finite & (rp_r <= 1.0) & (rd_r <= 1.0)
        # non-finite breakdown: exit with the incumbent, labeled by whether
        # it made progress — same test as the iteration-cap exit below (a
        # no-progress breakdown must NOT read as a usable "no improvement"
        # step, which would re-open the false-convergence hole)
        broke = jnp.where(f_best < f_zero, jnp.int32(QP_SOLVED_INACCURATE),
                          jnp.int32(QP_MAX_ITER))
        status = jnp.where(conv, jnp.int32(QP_SOLVED),
                           jnp.where(finite, st.status, broke))
        return _St(dx1, h1, p1, nn1, z1_1, y1, z5_1, z6_1,
                   st.it + 1, status, rp_r, rd_r, f_best, dx_best)

    def cond(st: _St):
        return (st.status == QP_UNSOLVED) & (st.it < s.max_ipm_iter)

    big = jnp.asarray(jnp.inf, dt)
    st0 = _St(dx, h, p, nn, z1, y, z5, z6, jnp.int32(0),
              jnp.int32(QP_UNSOLVED), big, big,
              f_zero, jnp.zeros((n,), dt))
    fin = jax.lax.while_loop(cond, body, st0)

    # iteration cap without residual convergence: the incumbent is still a
    # descent (or zero) step; label it by whether it made progress
    status = jnp.where(
        fin.status == QP_UNSOLVED,
        jnp.where(fin.f_best < f_zero, jnp.int32(QP_SOLVED_INACCURATE),
                  jnp.int32(QP_MAX_ITER)),
        fin.status)
    # converged final iterate may still be (marginally) worse than the
    # incumbent in composite value — return the best
    f_fin = composite_unscaled(fin.dx)
    use_fin = (status == QP_SOLVED) & (f_fin <= fin.f_best)
    dx_out = jnp.clip(jnp.where(use_fin, fin.dx, fin.dx_best),
                      data.lb, data.ub)

    # warm-start slacks recomputed from dx_out so the returned u is ONE
    # consistent iterate (not best-primal + final-iterate slacks)
    g_out = jh_mv(dx_out) + eh if mh else fin.h
    h_out = jnp.maximum(g_out, 0.0)
    r_out = ja_mv(dx_out) + ea if ma else jnp.zeros((0,), dt)
    p_out = jnp.maximum(r_out, 0.0)
    nn_out = jnp.maximum(-r_out, 0.0)
    u_out = jnp.concatenate([dx_out, h_out, p_out, nn_out])
    # duals in the ADMM row layout (hinge, abs, box, slack bounds); like the
    # ADMM path these stay in row-normalized space, unscaled by the cost
    # factor only (they serve as warm starts for the next related solve)
    z2f = wh - fin.z1
    z3f = wa - fin.y
    z4f = wa + fin.y
    y_out = jnp.concatenate([
        fin.z1 / c,
        fin.y / c,
        (fin.z6 - fin.z5) / c,
        -z2f / c,
        -z3f / c,
        -z4f / c,
    ])
    return StructQPSolution(dx_out, u_out, y_out, status, fin.it,
                            fin.rp, fin.rd)
