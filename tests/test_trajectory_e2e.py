"""End-to-end planning tests (no collision yet): numerical IK + free-space.

Mirrors the reference's numerical_ik_unit and the joint-order optimization
suites (trajopt_sqp/test/joint_{position,velocity,...}_optimization_unit.cpp,
SURVEY.md §4.3) — construct problem, optimize, assert convergence and
solution quality.
"""

import numpy as np
import jax.numpy as jnp

from trajopt_tpu.models import arm7
from trajopt_tpu.ops.qp import QPSettings
from trajopt_tpu.problem.trajectory import (
    TrajProblemBuilder,
    interpolated_init,
    stack_data,
    stationary_init,
)
from trajopt_tpu.solver.sqp import solve, solve_batch
from trajopt_tpu.solver.types import CONVERGED, SQPParams
from trajopt_tpu.terms.cartesian import cart_pose_term, default_cart_pose_params
from trajopt_tpu.terms.joint import (
    joint_acc_term,
    joint_jerk_term,
    joint_pos_term,
    joint_vel_term,
)

PARAMS = SQPParams(qp=QPSettings(eps_abs=1e-6, eps_rel=1e-8, max_iter=4000))


def test_numerical_ik():
    # 1-step cart_pose EQ constraint (numerical_ik1.json analog)
    _, chain = arm7()
    q_goal = jnp.asarray([0.3, 0.5, -0.4, 0.8, 0.2, -0.6, 0.1])
    Rg, pg = chain.fk(q_goal)
    tool = chain.link_index("tool")

    b = TrajProblemBuilder(chain, n_steps=1)
    b.add_constraint(
        cart_pose_term("ik", chain, 1, 0, "tool"),
        default_cart_pose_params(target_R=Rg[tool], target_p=pg[tool]),
    )
    # small regularization keeps the QP strictly convex
    b.add_cost(
        joint_pos_term("reg", 1, 7),
        {"targets": jnp.zeros(7), "coeffs": jnp.full(7, 1e-4)},
    )
    spec, data = b.build(stationary_init(jnp.zeros(7) + 0.1, 1))
    res = solve(spec, data, PARAMS)
    assert int(res.status) == CONVERGED
    R, p = chain.fk(res.x)
    np.testing.assert_allclose(np.asarray(p[tool]), np.asarray(pg[tool]),
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(R[tool]), np.asarray(Rg[tool]),
                               atol=1e-3)


def test_free_space_plan_30_steps():
    # joint_vel cost + endpoint constraints -> straight-line interpolation
    _, chain = arm7()
    T, D = 30, 7
    q_start = jnp.zeros(D)
    q_goal = jnp.asarray([0.5, 0.8, -0.3, 1.0, -0.4, 0.6, 0.9])

    b = TrajProblemBuilder(chain, T)
    b.add_cost(joint_vel_term("jvel", T, D),
               {"targets": jnp.zeros(D), "coeffs": jnp.ones(D)})
    b.add_constraint(
        joint_pos_term("goal", T, D, first_step=T - 1, last_step=T - 1,
                       is_constraint=True),
        {"targets": q_goal, "coeffs": jnp.ones(D)})
    b.fix_timestep(0)
    spec, data = b.build(stationary_init(q_start, T))
    res = solve(spec, data, PARAMS)
    assert int(res.status) == CONVERGED
    X = np.asarray(res.x).reshape(T, D)
    expect = np.asarray(interpolated_init(q_start, q_goal, T))
    np.testing.assert_allclose(X, expect, atol=5e-3)
    assert float(res.cnt_viols.max()) < 1e-4


def test_toleranced_velocity_limit():
    # joint_vel INEQ constraint caps step displacement
    _, chain = arm7()
    T, D = 8, 7
    q_goal = jnp.full((D,), 1.4)
    b = TrajProblemBuilder(chain, T)
    b.add_cost(joint_pos_term("track", T, D, first_step=T - 1, last_step=T - 1),
               {"targets": q_goal, "coeffs": jnp.ones(D)})
    lim = 0.1
    b.add_constraint(
        joint_vel_term("vlim", T, D, toleranced=True, is_constraint=True),
        {"targets": jnp.zeros(D), "coeffs": jnp.ones(D),
         "upper_tols": jnp.full(D, lim), "lower_tols": jnp.full(D, lim)})
    b.fix_timestep(0)
    spec, data = b.build(stationary_init(jnp.zeros(D), T))
    res = solve(spec, data, PARAMS)
    assert int(res.status) == CONVERGED
    X = np.asarray(res.x).reshape(T, D)
    vel = np.abs(np.diff(X, axis=0))
    assert vel.max() <= lim + 1e-3
    # goal as far as reachable: 7 steps * 0.1
    np.testing.assert_allclose(X[-1], 0.7, atol=1e-2)


def test_acc_jerk_smoothing_run():
    _, chain = arm7()
    T, D = 12, 7
    q_goal = jnp.asarray([0.4, -0.2, 0.3, 0.5, -0.1, 0.2, -0.3])
    b = TrajProblemBuilder(chain, T)
    b.add_cost(joint_vel_term("v", T, D),
               {"targets": jnp.zeros(D), "coeffs": jnp.ones(D)})
    b.add_cost(joint_acc_term("a", T, D),
               {"targets": jnp.zeros(D), "coeffs": jnp.full(D, 2.0)})
    b.add_cost(joint_jerk_term("j", T, D),
               {"targets": jnp.zeros(D), "coeffs": jnp.full(D, 5.0)})
    b.add_constraint(
        joint_pos_term("goal", T, D, first_step=T - 1, last_step=T - 1,
                       is_constraint=True),
        {"targets": q_goal, "coeffs": jnp.ones(D)})
    b.fix_timestep(0)
    spec, data = b.build(stationary_init(jnp.zeros(D), T))
    res = solve(spec, data, PARAMS)
    assert int(res.status) == CONVERGED
    X = np.asarray(res.x).reshape(T, D)
    np.testing.assert_allclose(X[-1], np.asarray(q_goal), atol=1e-3)
    np.testing.assert_allclose(X[0], 0.0, atol=1e-6)  # fixed step (QP tol)


def test_batched_goals_one_program():
    # many goal poses, one compiled solve (the batch-parallel axis)
    _, chain = arm7()
    T, D, B = 10, 7, 6
    b = TrajProblemBuilder(chain, T)
    b.add_cost(joint_vel_term("v", T, D),
               {"targets": jnp.zeros(D), "coeffs": jnp.ones(D)})
    b.add_constraint(
        joint_pos_term("goal", T, D, first_step=T - 1, last_step=T - 1,
                       is_constraint=True),
        {"targets": jnp.zeros(D), "coeffs": jnp.ones(D)})
    b.fix_timestep(0)
    spec, proto = b.build(stationary_init(jnp.zeros(D), T))

    rng = np.random.default_rng(5)
    datas = []
    for _ in range(B):
        goal = jnp.asarray(rng.uniform(-1.0, 1.0, D))
        d = proto._replace(cnt_params=(
            {"targets": goal, "coeffs": jnp.ones(D)},))
        datas.append(d)
    batch = stack_data(datas)
    res = solve_batch(spec, batch, PARAMS)
    assert all(int(s) == CONVERGED for s in np.asarray(res.status))
    X = np.asarray(res.x).reshape(B, T, D)
    for i, d in enumerate(datas):
        np.testing.assert_allclose(
            X[i, -1], np.asarray(d.cnt_params[0]["targets"]), atol=1e-3)
