"""Block-tridiagonal Cholesky (ops.btridiag) against dense references."""

import jax
import jax.numpy as jnp
import numpy as np

from trajopt_tpu.ops.btridiag import (
    blocks_from_dense,
    btd_factor,
    btd_solve,
    chol_small,
    solve_lower_small,
    solve_upper_small,
)


def _rand_spd(rng, b):
    A = rng.standard_normal((b, b))
    return A @ A.T + b * np.eye(b)


def _rand_btd(rng, T, b):
    """Random SPD block-tridiagonal matrix as (dense, D, O)."""
    n = T * b
    K = np.zeros((n, n))
    for i in range(T):
        K[i * b:(i + 1) * b, i * b:(i + 1) * b] = _rand_spd(rng, b) + \
            2 * b * np.eye(b)  # diagonally dominant => SPD overall
    for i in range(T - 1):
        O = 0.3 * rng.standard_normal((b, b))
        K[(i + 1) * b:(i + 2) * b, i * b:(i + 1) * b] = O
        K[i * b:(i + 1) * b, (i + 1) * b:(i + 2) * b] = O.T
    return K


def test_small_kernels(rng):
    for b in (1, 3, 7):
        A = jnp.asarray(_rand_spd(rng, b))
        L = chol_small(A)
        np.testing.assert_allclose(np.asarray(L @ L.T), np.asarray(A),
                                   rtol=1e-10, atol=1e-10)
        r = jnp.asarray(rng.standard_normal(b))
        x = solve_lower_small(L, r)
        np.testing.assert_allclose(np.asarray(L @ x), np.asarray(r),
                                   rtol=1e-9, atol=1e-9)
        x = solve_upper_small(L, r)
        np.testing.assert_allclose(np.asarray(L.T @ x), np.asarray(r),
                                   rtol=1e-9, atol=1e-9)
        # matrix RHS
        R = jnp.asarray(rng.standard_normal((b, 2)))
        X = solve_lower_small(L, R)
        np.testing.assert_allclose(np.asarray(L @ X), np.asarray(R),
                                   rtol=1e-9, atol=1e-9)


def test_btd_solve_matches_dense(rng):
    for T, b in ((2, 3), (5, 7), (30, 7), (10, 8)):
        K = _rand_btd(rng, T, b)
        D, O = blocks_from_dense(jnp.asarray(K), T, b)
        LD, LM = btd_factor(D, O)
        r = rng.standard_normal(T * b)
        x = btd_solve(LD, LM, jnp.asarray(r.reshape(T, b))).reshape(-1)
        x_ref = np.linalg.solve(K, r)
        np.testing.assert_allclose(np.asarray(x), x_ref, rtol=1e-8, atol=1e-8)


def test_btd_vmap(rng):
    T, b, batch = 6, 4, 5
    Ks = np.stack([_rand_btd(rng, T, b) for _ in range(batch)])
    rs = rng.standard_normal((batch, T * b))

    def solve_one(K, r):
        D, O = blocks_from_dense(K, T, b)
        LD, LM = btd_factor(D, O)
        return btd_solve(LD, LM, r.reshape(T, b)).reshape(-1)

    xs = jax.jit(jax.vmap(solve_one))(jnp.asarray(Ks), jnp.asarray(rs))
    for i in range(batch):
        np.testing.assert_allclose(np.asarray(xs[i]),
                                   np.linalg.solve(Ks[i], rs[i]),
                                   rtol=1e-8, atol=1e-8)


def test_ipm_btd_matches_dense(rng):
    """The IPM with the block-tridiagonal KKT path returns the same solution
    as the dense path on a banded trajectory-shaped QP."""
    import dataclasses

    from trajopt_tpu.ops.ipm_qp import solve_ipm_qp
    from trajopt_tpu.ops.prox_qp import ProxQPData
    from trajopt_tpu.ops.qp import QPSettings

    T, b = 8, 3
    n = T * b
    P = jnp.asarray(_rand_btd(rng, T, b))
    q = jnp.asarray(rng.standard_normal(n))
    # banded hinge rows: each couples steps (i, i+1)
    mh = 2 * (T - 1)
    A_h = np.zeros((mh, n))
    for i in range(T - 1):
        A_h[2 * i:2 * i + 2, i * b:(i + 2) * b] = \
            rng.standard_normal((2, 2 * b))
    A_h = jnp.asarray(A_h)
    e_h = jnp.asarray(rng.standard_normal(mh))
    w_h = jnp.asarray(np.full(mh, 5.0))
    # per-step equality rows
    ma = T
    A_a = np.zeros((ma, n))
    for i in range(T):
        A_a[i, i * b:(i + 1) * b] = rng.standard_normal(b)
    A_a = jnp.asarray(A_a)
    e_a = jnp.asarray(0.1 * rng.standard_normal(ma))
    w_a = jnp.asarray(np.full(ma, 10.0))
    lb = jnp.asarray(np.full(n, -1.0))
    ub = jnp.asarray(np.full(n, 1.0))
    data = ProxQPData(P=P, q=q, A_h=A_h, e_h=e_h, w_h=w_h,
                      A_a=A_a, e_a=e_a, w_a=w_a, lb=lb, ub=ub)

    s_dense = QPSettings(solver="ipm", eps_abs=1e-7, eps_rel=1e-9,
                         max_ipm_iter=50)
    s_btd = dataclasses.replace(s_dense, kkt_block=b)
    sol_d = solve_ipm_qp(data, s_dense)
    sol_b = solve_ipm_qp(data, s_btd)
    assert int(sol_d.status) in (1, 2)
    assert int(sol_b.status) in (1, 2)
    np.testing.assert_allclose(np.asarray(sol_b.x), np.asarray(sol_d.x),
                               rtol=1e-5, atol=1e-6)


def test_acc_jerk_problem_takes_superblock_banded_path():
    """joint_acc/jerk terms (step coupling 2/3) must stay off the dense
    Cholesky: the solver auto-picks kkt_block = max_coupling * n_cols
    (super-blocks of coupling-many steps make the KKT block-tridiagonal
    again — the pentadiagonal-class structure of trajectory_costs.cpp:775)
    and the solution matches the forced-dense one."""
    from trajopt_tpu.ops.qp import QPSettings
    from trajopt_tpu.problem.trajectory import TrajProblemBuilder, interpolated_init
    from trajopt_tpu.solver.sqp import _band_coupling, solve
    from trajopt_tpu.solver.types import CONVERGED, SQPParams
    from trajopt_tpu.terms.joint import (
        joint_acc_term, joint_jerk_term, joint_pos_term, joint_vel_term)

    T, D = 12, 3

    class _FakeChain:
        n_dof = D
        lb = np.full(D, -4.0)
        ub = np.full(D, 4.0)

    b = TrajProblemBuilder(_FakeChain(), T)
    b.add_cost(joint_vel_term("v", T, D),
               {"targets": np.zeros(D), "coeffs": np.ones(D)})
    b.add_cost(joint_acc_term("a", T, D),
               {"targets": np.zeros(D), "coeffs": np.full(D, 2.0)})
    b.add_cost(joint_jerk_term("j", T, D),
               {"targets": np.zeros(D), "coeffs": np.full(D, 1.5)})
    b.add_constraint(joint_pos_term("goal", T, D, first_step=T - 1,
                                    last_step=T - 1, is_constraint=True),
                     {"targets": np.full(D, 1.0), "coeffs": np.ones(D)})
    b.fix_timestep(0)
    init = interpolated_init(np.zeros(D), np.full(D, 1.0), T)
    spec, data = b.build(init)

    assert _band_coupling(spec) == 3  # jerk dominates
    p_auto = SQPParams(qp=QPSettings(solver="ipm", eps_abs=1e-8,
                                     eps_rel=1e-10))
    # forced dense: kkt_block must divide into >= 2 blocks; n_x = 36,
    # block 36 fails the n >= 2*bsz test -> dense fallback inside the IPM
    p_dense = SQPParams(qp=QPSettings(solver="ipm", eps_abs=1e-8,
                                      eps_rel=1e-10, kkt_block=T * D))
    r_auto = solve(spec, data, p_auto)
    r_dense = solve(spec, data, p_dense)
    assert int(r_auto.status) == CONVERGED
    assert int(r_dense.status) == CONVERGED
    np.testing.assert_allclose(np.asarray(r_auto.x), np.asarray(r_dense.x),
                               rtol=1e-5, atol=1e-6)
