"""Cross-backend QP parity — the analog of the reference's
INSTANTIATE_TEST_CASE_P(AllSolvers, small-problems-unit.cpp:184): the same
problem solved through every solver backend must agree.

Backends: dense OSQP-form (ops.qp), prox composite (ops.prox_qp),
structured slack (ops.struct_qp) — plus the native C++ oracle (covered
separately in test_qpref.py).

Also the interface parity test (interface_unit.cpp analog): programmatic
TrajProblemBuilder construction vs the JSON document route must produce the
same solution.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from trajopt_tpu.ops.prox_qp import ProxQPData, solve_prox_qp
from trajopt_tpu.ops.qp import OSQP_INFTY, QPData, QPSettings, solve_qp
from trajopt_tpu.ops.struct_qp import solve_struct_qp

QP = QPSettings(eps_abs=1e-8, eps_rel=1e-10, max_iter=20000)


def _random_prox_problem(rng, n=6, mh=4, ma=3):
    """A strictly convex composite problem with known-good structure."""
    M = rng.standard_normal((n, n))
    P = M @ M.T + n * np.eye(n)
    q = rng.standard_normal(n)
    A_h = rng.standard_normal((mh, n))
    e_h = rng.standard_normal(mh) * 0.5
    w_h = rng.uniform(0.5, 2.0, mh)
    A_a = rng.standard_normal((ma, n))
    e_a = rng.standard_normal(ma) * 0.5
    w_a = rng.uniform(0.5, 2.0, ma)
    lb = np.full(n, -2.0)
    ub = np.full(n, 2.0)
    return ProxQPData(*map(jnp.asarray, (P, q, A_h, e_h, w_h,
                                         A_a, e_a, w_a, lb, ub)))


def _to_osqp_form(d: ProxQPData):
    """Lower the composite problem to explicit OSQP slack form:
    min 0.5 x'Px + q'x + w_h'h + w_a'(p+n)
    s.t. A_h x - h <= -e_h ; A_a x - p + n = -e_a ; lb<=x<=ub; h,p,n >= 0.
    """
    n = d.q.shape[0]
    mh = d.e_h.shape[0]
    ma = d.e_a.shape[0]
    nv = n + mh + 2 * ma
    P = np.zeros((nv, nv))
    P[:n, :n] = np.asarray(d.P)
    q = np.concatenate([np.asarray(d.q), np.asarray(d.w_h),
                        np.asarray(d.w_a), np.asarray(d.w_a)])
    inf = OSQP_INFTY
    rows = []
    l, u = [], []
    # hinge coupling
    for i in range(mh):
        r = np.zeros(nv)
        r[:n] = np.asarray(d.A_h)[i]
        r[n + i] = -1.0
        rows.append(r)
        l.append(-inf)
        u.append(-float(d.e_h[i]))
    # abs coupling
    for i in range(ma):
        r = np.zeros(nv)
        r[:n] = np.asarray(d.A_a)[i]
        r[n + mh + i] = -1.0
        r[n + mh + ma + i] = 1.0
        rows.append(r)
        l.append(-float(d.e_a[i]))
        u.append(-float(d.e_a[i]))
    A = np.vstack(rows + [np.eye(nv)])
    l = np.concatenate([l, np.asarray(d.lb), np.zeros(mh + 2 * ma)])
    u = np.concatenate([u, np.asarray(d.ub), np.full(mh + 2 * ma, inf)])
    return QPData(*map(jnp.asarray, (P, q, A, l, u)))


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_all_solvers_agree(seed):
    rng = np.random.default_rng(seed)
    d = _random_prox_problem(rng)
    x_struct = np.asarray(solve_struct_qp(d, QP).x)
    x_prox = np.asarray(solve_prox_qp(d, QP).x)
    x_dense = np.asarray(solve_qp(_to_osqp_form(d), QP).x)[:d.q.shape[0]]
    np.testing.assert_allclose(x_struct, x_dense, atol=2e-5)
    np.testing.assert_allclose(x_prox, x_dense, atol=2e-5)


def test_builder_vs_json_parity():
    """interface_unit.cpp analog: C++-style programmatic construction and
    the JSON route must produce identical solutions."""
    from trajopt_tpu.models import spherebot
    from trajopt_tpu.problem.json_io import load_problem
    from trajopt_tpu.problem.trajectory import (TrajProblemBuilder,
                                                interpolated_init)
    from trajopt_tpu.solver.sqp import solve
    from trajopt_tpu.solver.types import SQPParams
    from trajopt_tpu.terms.joint import joint_pos_term, joint_vel_term

    _, chain = spherebot()
    T, D = 5, chain.n_dof
    goal = [1.2, -0.7]

    # programmatic
    b = TrajProblemBuilder(chain, T)
    b.add_cost(joint_vel_term("jvel", T, D),
               {"targets": jnp.zeros(D), "coeffs": jnp.ones(D)})
    b.add_constraint(
        joint_pos_term("goal", T, D, first_step=T - 1, last_step=T - 1,
                       is_constraint=True),
        {"targets": jnp.asarray(goal), "coeffs": jnp.ones(D)})
    b.fix_timestep(0)
    init = interpolated_init(jnp.zeros(D), jnp.asarray(goal), T)
    spec_a, data_a = b.build(init)

    # JSON
    doc = {
        "basic_info": {"n_steps": T, "manip": "m", "fixed_timesteps": [0]},
        "costs": [{"type": "joint_vel", "name": "jvel",
                   "params": {"coeffs": 1, "targets": [0, 0]}}],
        "constraints": [{"type": "joint_pos", "name": "goal",
                         "params": {"coeffs": 1, "targets": goal,
                                    "first_step": T - 1, "last_step": T - 1}}],
        "init_info": {"type": "joint_interpolated", "data": [0, 0],
                      "endpoint": goal},
    }
    spec_b, data_b, params = load_problem(doc, chain)

    p = SQPParams(qp=QPSettings(eps_abs=1e-8, eps_rel=1e-10, max_iter=8000))
    ra = solve(spec_a, data_a, p)
    rb = solve(spec_b, data_b, p)
    assert int(ra.status) == int(rb.status) == 1
    np.testing.assert_allclose(np.asarray(ra.x), np.asarray(rb.x), atol=1e-7)
