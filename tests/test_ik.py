"""IK solver + IK trajectory term (InverseKinematicsConstraint analog,
trajopt_ifopt/src/constraints/inverse_kinematics_constraint.cpp)."""

import numpy as np
import jax
import jax.numpy as jnp

from trajopt_tpu.kinematics.ik import ik_term, solve_ik
from trajopt_tpu.models import arm7
from trajopt_tpu.ops.qp import QPSettings
from trajopt_tpu.problem.trajectory import TrajProblemBuilder, stationary_init
from trajopt_tpu.solver.sqp import solve
from trajopt_tpu.solver.types import CONVERGED, SQPParams
from trajopt_tpu.terms.joint import joint_vel_term


def test_solve_ik_reaches_fk_pose():
    _, chain = arm7()
    tool = chain.link_index("tool")
    q_goal = jnp.asarray([0.5, 0.7, -0.3, 1.0, 0.4, -0.6, 0.3])
    R, p = chain.fk(q_goal)
    res = solve_ik(chain, tool, R[tool], p[tool],
                   q0=q_goal + 0.3 * jnp.asarray([1, -1, 1, -1, 1, -1, 1.0]))
    assert bool(res.converged), float(res.err_norm)
    Rf, pf = chain.fk(res.q)
    np.testing.assert_allclose(np.asarray(pf[tool]), np.asarray(p[tool]),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(Rf[tool]), np.asarray(R[tool]),
                               atol=1e-5)


def test_solve_ik_batched_vmap():
    _, chain = arm7()
    tool = chain.link_index("tool")
    qs = jnp.asarray([[0.4, 0.6, -0.2, 0.9, 0.3, -0.5, 0.2],
                      [-0.3, 0.8, 0.1, 0.7, -0.2, 0.4, -0.1]])
    R, p = jax.vmap(chain.fk)(qs)
    seeds = qs + 0.2
    res = jax.vmap(lambda tR, tp, s: solve_ik(chain, tool, tR, tp, q0=s))(
        R[:, tool], p[:, tool], seeds)
    assert bool(res.converged.all())


def test_ik_term_in_sqp():
    _, chain = arm7()
    tool = chain.link_index("tool")
    q_goal = jnp.asarray([0.3, 0.5, -0.1, 0.8, 0.2, -0.4, 0.1])
    R, p = chain.fk(q_goal)
    T = 4
    b = TrajProblemBuilder(chain, T)
    b.add_cost(joint_vel_term("vel", T, chain.n_dof),
               {"targets": jnp.zeros(chain.n_dof), "coeffs": jnp.ones(chain.n_dof)})
    b.add_constraint(
        ik_term("ik_goal", chain, T, T - 1, "tool"),
        {"target_R": R[tool], "target_p": p[tool], "coeffs": jnp.ones(chain.n_dof)})
    spec, data = b.build(stationary_init(q_goal + 0.2, T))
    res = solve(spec, data, SQPParams(
        qp=QPSettings(eps_abs=1e-6, eps_rel=1e-8, max_iter=4000)))
    assert int(res.status) == CONVERGED
    qf = np.asarray(res.x).reshape(T, chain.n_dof)[-1]
    Rf, pf = chain.fk(jnp.asarray(qf))
    np.testing.assert_allclose(np.asarray(pf[tool]), np.asarray(p[tool]),
                               atol=1e-3)
