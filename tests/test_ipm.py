"""Interior-point QP backend (ops.ipm_qp) — the BPMPD-class solver.

Contract: same solutions as the ADMM/dense backends (AllSolvers parity),
order-of-magnitude fewer iterations on trajectory QPs, and full SQP
convergence when selected via QPSettings(solver="ipm")."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from trajopt_tpu.ops.ipm_qp import solve_ipm_qp
from trajopt_tpu.ops.qp import QPSettings
from trajopt_tpu.ops.struct_qp import solve_struct_qp

import sys
import os
sys.path.insert(0, os.path.dirname(__file__))
from test_solver_parity import _random_prox_problem  # noqa: E402

TIGHT = QPSettings(eps_abs=1e-8, eps_rel=1e-10, max_iter=20000,
                   max_ipm_iter=60)


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_ipm_matches_admm(seed):
    d = _random_prox_problem(np.random.default_rng(seed))
    xs = np.asarray(solve_struct_qp(d, TIGHT).x)
    si = solve_ipm_qp(d, TIGHT)
    assert int(si.status) == 1
    np.testing.assert_allclose(np.asarray(si.x), xs, atol=1e-5)
    assert int(si.iters) <= 30


def test_ipm_respects_pinned_bounds():
    """lb == ub coordinates (fixed timesteps) must come back exact."""
    d = _random_prox_problem(np.random.default_rng(7))
    lb = np.asarray(d.lb).copy()
    ub = np.asarray(d.ub).copy()
    lb[0] = ub[0] = 0.377
    d = d._replace(lb=jnp.asarray(lb), ub=jnp.asarray(ub))
    si = solve_ipm_qp(d, TIGHT)
    assert float(si.x[0]) == pytest.approx(0.377, abs=1e-12)


def test_ipm_batched_vmap():
    datas = [_random_prox_problem(np.random.default_rng(s)) for s in range(3)]
    batch = jax.tree.map(lambda *xs: jnp.stack(xs), *datas)
    sol = jax.vmap(lambda dd: solve_ipm_qp(dd, TIGHT))(batch)
    assert (np.asarray(sol.status) == 1).all()
    for i, d in enumerate(datas):
        np.testing.assert_allclose(np.asarray(sol.x[i]),
                                   np.asarray(solve_ipm_qp(d, TIGHT).x),
                                   atol=1e-7)


def test_sqp_with_ipm_backend():
    """End-to-end SQP solve with solver="ipm" matches the ADMM backend."""
    from trajopt_tpu.models import spherebot
    from trajopt_tpu.problem.trajectory import (TrajProblemBuilder,
                                                interpolated_init)
    from trajopt_tpu.solver.sqp import solve
    from trajopt_tpu.solver.types import SQPParams
    from trajopt_tpu.terms.joint import joint_pos_term, joint_vel_term

    _, chain = spherebot()
    T, D = 6, chain.n_dof
    b = TrajProblemBuilder(chain, T)
    b.add_cost(joint_vel_term("v", T, D),
               {"targets": jnp.zeros(D), "coeffs": jnp.ones(D)})
    b.add_constraint(joint_pos_term("g", T, D, first_step=T - 1,
                                    last_step=T - 1, is_constraint=True),
                     {"targets": jnp.asarray([1.0, -0.5]),
                      "coeffs": jnp.ones(D)})
    b.fix_timestep(0)
    spec, data = b.build(interpolated_init(jnp.zeros(D),
                                           jnp.asarray([1.0, -0.5]), T))
    xs = {}
    for solver in ("admm", "ipm"):
        res = solve(spec, data, SQPParams(
            qp=QPSettings(eps_abs=1e-7, eps_rel=1e-9, max_iter=8000,
                          solver=solver, max_ipm_iter=50)))
        assert int(res.status) == 1, solver
        xs[solver] = np.asarray(res.x)
    np.testing.assert_allclose(xs["ipm"], xs["admm"], atol=1e-5)
