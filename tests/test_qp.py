"""QP solver unit tests — the numerical-contract suite for the ADMM inner loop.

Mirrors the role of the reference's solver-interface tests
(trajopt_sco/test/solver-interface-unit.cpp): small QPs with known optima,
plus randomized QPs cross-checked against scipy SLSQP.
"""

import numpy as np
import jax.numpy as jnp
import pytest
import scipy.optimize

from trajopt_tpu.ops.qp import (
    OSQP_INFTY,
    QPData,
    QPSettings,
    QP_SOLVED,
    QP_SOLVED_INACCURATE,
    solve_qp,
    solve_qp_batch,
)

SET = QPSettings(eps_abs=1e-6, eps_rel=1e-8, max_iter=8000)


def _mk(P, q, A, l, u):
    f = jnp.asarray
    return QPData(f(P, dtype=jnp.float64), f(q, dtype=jnp.float64),
                  f(A, dtype=jnp.float64), f(l, dtype=jnp.float64),
                  f(u, dtype=jnp.float64))


def test_unconstrained_quadratic():
    # min (x0-1)^2 + (x1-2)^2  with loose bounds
    P = 2 * np.eye(2)
    q = np.array([-2.0, -4.0])
    A = np.eye(2)
    l = -OSQP_INFTY * np.ones(2)
    u = OSQP_INFTY * np.ones(2)
    sol = solve_qp(_mk(P, q, A, l, u), SET)
    assert int(sol.status) in (QP_SOLVED, QP_SOLVED_INACCURATE)
    np.testing.assert_allclose(np.asarray(sol.x), [1.0, 2.0], atol=1e-5)


def test_box_active():
    # min x'x - 2*[3,3]'x  s.t. 0<=x<=1  -> x*=[1,1]
    P = 2 * np.eye(2)
    q = np.array([-6.0, -6.0])
    A = np.eye(2)
    sol = solve_qp(_mk(P, q, A, np.zeros(2), np.ones(2)), SET)
    np.testing.assert_allclose(np.asarray(sol.x), [1.0, 1.0], atol=1e-5)
    # stationarity Px* + q + A'y = 0 -> y = [4, 4] (>0 at active upper bound)
    np.testing.assert_allclose(np.asarray(sol.y), [4.0, 4.0], atol=1e-4)


def test_equality_constrained():
    # min 0.5 x'Px + q'x s.t. Ex = b with analytic KKT solution
    rng = np.random.default_rng(1)
    n, p = 6, 2
    L = rng.normal(size=(n, n))
    P = L @ L.T + n * np.eye(n)
    q = rng.normal(size=n)
    E = rng.normal(size=(p, n))
    b = rng.normal(size=p)
    KKT = np.block([[P, E.T], [E, np.zeros((p, p))]])
    rhs = np.concatenate([-q, b])
    xstar = np.linalg.solve(KKT, rhs)[:n]

    A = np.vstack([E, np.eye(n)])
    l = np.concatenate([b, -OSQP_INFTY * np.ones(n)])
    u = np.concatenate([b, OSQP_INFTY * np.ones(n)])
    sol = solve_qp(_mk(P, q, A, l, u), SET)
    assert int(sol.status) in (QP_SOLVED, QP_SOLVED_INACCURATE)
    np.testing.assert_allclose(np.asarray(sol.x), xstar, atol=1e-4)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_random_inequality_qp_vs_slsqp(seed):
    rng = np.random.default_rng(seed)
    n, m = 8, 12
    L = rng.normal(size=(n, n))
    P = L @ L.T + 0.5 * np.eye(n)
    q = rng.normal(size=n)
    A = rng.normal(size=(m, n))
    x_feas = rng.normal(size=n) * 0.1
    u = A @ x_feas + np.abs(rng.normal(size=m)) + 0.1
    l = -OSQP_INFTY * np.ones(m)

    Af = np.vstack([A, np.eye(n)])
    lf = np.concatenate([l, -5 * np.ones(n)])
    uf = np.concatenate([u, 5 * np.ones(n)])
    sol = solve_qp(_mk(P, q, Af, lf, uf), SET)

    res = scipy.optimize.minimize(
        lambda x: 0.5 * x @ P @ x + q @ x,
        np.zeros(n),
        jac=lambda x: P @ x + q,
        method="SLSQP",
        bounds=[(-5, 5)] * n,
        constraints=[{"type": "ineq", "fun": lambda x: u - A @ x,
                      "jac": lambda x: -A}],
        options={"maxiter": 400, "ftol": 1e-12},
    )
    assert res.success
    obj_ref = res.fun
    obj_ours = float(sol.obj)
    assert obj_ours <= obj_ref + 1e-4 * (1 + abs(obj_ref))
    np.testing.assert_allclose(np.asarray(sol.x), res.x, atol=2e-3)


def test_warm_start_reduces_iters():
    P = 2 * np.eye(4)
    q = -np.arange(1.0, 5.0)
    A = np.eye(4)
    l = np.zeros(4)
    u = 10 * np.ones(4)
    data = _mk(P, q, A, l, u)
    cold = solve_qp(data, SET)
    warm = solve_qp(data, SET, x0=cold.x, y0=cold.y)
    assert int(warm.iters) <= int(cold.iters)
    np.testing.assert_allclose(np.asarray(warm.x), np.asarray(cold.x), atol=1e-5)


def test_batch_solve_matches_single():
    rng = np.random.default_rng(7)
    B, n = 5, 4
    Ps, qs, As, ls, us = [], [], [], [], []
    for _ in range(B):
        L = rng.normal(size=(n, n))
        Ps.append(L @ L.T + np.eye(n))
        qs.append(rng.normal(size=n))
        As.append(np.eye(n))
        ls.append(-np.ones(n))
        us.append(np.ones(n))
    batch = _mk(np.stack(Ps), np.stack(qs), np.stack(As), np.stack(ls), np.stack(us))
    bsol = solve_qp_batch(batch, SET)
    for i in range(B):
        single = solve_qp(_mk(Ps[i], qs[i], As[i], ls[i], us[i]), SET)
        np.testing.assert_allclose(
            np.asarray(bsol.x[i]), np.asarray(single.x), atol=1e-5
        )


def test_float32_accuracy():
    # the TPU dtype path must still hit ~1e-3 accuracy via iterative refinement
    rng = np.random.default_rng(3)
    n = 10
    L = rng.normal(size=(n, n))
    P = (L @ L.T + np.eye(n)).astype(np.float32)
    q = rng.normal(size=n).astype(np.float32)
    xstar = np.linalg.solve(P.astype(np.float64), -q.astype(np.float64))
    A = np.eye(n, dtype=np.float32)
    big = OSQP_INFTY * np.ones(n, dtype=np.float32)
    data = QPData(jnp.asarray(P), jnp.asarray(q), jnp.asarray(A),
                  jnp.asarray(-big), jnp.asarray(big))
    sol = solve_qp(data, QPSettings(eps_abs=1e-5, eps_rel=1e-6, max_iter=8000))
    np.testing.assert_allclose(np.asarray(sol.x), xstar, atol=5e-3)
