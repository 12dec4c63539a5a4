"""Native C++ ADMM oracle vs the on-device solvers (multi-backend contract).

Mirrors the reference's practice of running the solver-contract suite over
every available native QP backend (small-problems-unit.cpp:184)."""

import numpy as np
import jax.numpy as jnp
import pytest

from trajopt_tpu.ops.qp import OSQP_INFTY, QPData, QPSettings, solve_qp
from trajopt_tpu.ops.qpref import qpref_available, solve_qp_ref

pytestmark = pytest.mark.skipif(not qpref_available(),
                                reason="g++ toolchain unavailable")

SET = QPSettings(eps_abs=1e-7, eps_rel=1e-9, max_iter=20000)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_oracle_matches_jax_solver(seed):
    rng = np.random.default_rng(seed)
    n, m = 10, 14
    L = rng.normal(size=(n, n))
    P = L @ L.T + 0.5 * np.eye(n)
    q = rng.normal(size=n)
    A = rng.normal(size=(m, n))
    x_feas = 0.1 * rng.normal(size=n)
    # bracket A x_feas so the polytope is certainly nonempty
    u = A @ x_feas + np.abs(rng.normal(size=m)) + 0.1
    l = A @ x_feas - np.abs(rng.normal(size=m)) - 0.1
    Af = np.vstack([A, np.eye(n)])
    lf = np.concatenate([l, -3 * np.ones(n)])
    uf = np.concatenate([u, 3 * np.ones(n)])

    x_ref, y_ref, status, iters = solve_qp_ref(P, q, Af, lf, uf)
    assert status == 1, f"oracle status {status}"

    sol = solve_qp(QPData(*[jnp.asarray(v, dtype=jnp.float64)
                            for v in (P, q, Af, lf, uf)]), SET)
    np.testing.assert_allclose(np.asarray(sol.x), x_ref, atol=5e-4)
    obj_ref = 0.5 * x_ref @ P @ x_ref + q @ x_ref
    obj_jax = float(sol.obj)
    assert abs(obj_jax - obj_ref) < 1e-5 * (1 + abs(obj_ref))


def test_oracle_equality_qp():
    rng = np.random.default_rng(5)
    n, p = 6, 2
    L = rng.normal(size=(n, n))
    P = L @ L.T + n * np.eye(n)
    q = rng.normal(size=n)
    E = rng.normal(size=(p, n))
    b = rng.normal(size=p)
    KKT = np.block([[P, E.T], [E, np.zeros((p, p))]])
    xstar = np.linalg.solve(KKT, np.concatenate([-q, b]))[:n]
    A = np.vstack([E, np.eye(n)])
    l = np.concatenate([b, -OSQP_INFTY * np.ones(n)])
    u = np.concatenate([b, OSQP_INFTY * np.ones(n)])
    x_ref, _, status, _ = solve_qp_ref(P, q, A, l, u)
    assert status == 1
    np.testing.assert_allclose(x_ref, xstar, atol=1e-5)
