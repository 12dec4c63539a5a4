"""Time-parameterized problems: 1/dt variables, velocity scaling, total time.

Analog of the reference's arm_around_table_time config family and
TotalTimeTermInfo behavior (problem_description.cpp:1851-1892).
"""

import numpy as np
import jax.numpy as jnp

from trajopt_tpu.models import arm7
from trajopt_tpu.ops.qp import QPSettings
from trajopt_tpu.problem.trajectory import TrajProblemBuilder, interpolated_init
from trajopt_tpu.solver.sqp import solve
from trajopt_tpu.solver.types import CONVERGED, SQPParams
from trajopt_tpu.terms.joint import joint_pos_term
from trajopt_tpu.terms.time import timed_joint_vel_term, total_time_term

# min-time problems are LP-like (pure L1 objective, degenerate optima) and
# take more SQP steps; the reference's small-problem suite also raises
# max_iter to 1000 for such cases
PARAMS = SQPParams(max_iter=400,
                   qp=QPSettings(eps_abs=1e-7, eps_rel=1e-9, max_iter=6000))


def test_min_time_under_velocity_limit():
    # minimize total time subject to |vel| <= vmax: dt rails at the limit
    _, chain = arm7()
    T, D = 6, 7
    q_goal = jnp.full((D,), 0.5)
    vmax = 2.0

    b = TrajProblemBuilder(chain, T, use_time=True, dt_lower=1e-3, dt_upper=1.0)
    # goal + fixed start pin the displacement per gap to 0.1 rad
    b.add_constraint(
        joint_pos_term("goal", T, D + 1, first_step=T - 1, last_step=T - 1,
                       is_constraint=True),
        {"targets": jnp.concatenate([q_goal, jnp.zeros(1)]),
         "coeffs": jnp.concatenate([jnp.ones(D), jnp.zeros(1)])})
    b.add_constraint(
        timed_joint_vel_term("vlim", T, D, is_constraint=True, toleranced=True),
        {"targets": jnp.zeros(D), "coeffs": jnp.ones(D),
         "upper_tols": jnp.full(D, vmax), "lower_tols": jnp.full(D, vmax)})
    b.add_cost(total_time_term("time", T, D),
               {"limit": jnp.asarray(0.0), "coeff": jnp.asarray(1.0)})
    b.fix_timestep(0)
    init = interpolated_init(jnp.zeros(D), q_goal, T)
    spec, data = b.build(init, init_dt=0.5)
    res = solve(spec, data, PARAMS)
    assert int(res.status) == CONVERGED
    X = np.asarray(res.x).reshape(T, D + 1)
    inv_dt = X[1:, D]
    dq = np.abs(np.diff(X[:, :D], axis=0)).max(axis=1)
    vel = dq * inv_dt
    # velocity pinned at the limit (time-optimal) within tolerance
    assert vel.max() <= vmax + 1e-2
    total_time = float(np.sum(1.0 / inv_dt))
    # per gap: 0.1 rad at 2 rad/s -> 0.05 s; 5 gaps -> 0.25 s
    np.testing.assert_allclose(total_time, 0.25, rtol=0.05)


def test_total_time_constraint_inequality():
    _, chain = arm7()
    T, D = 4, 7
    b = TrajProblemBuilder(chain, T, use_time=True, dt_lower=1e-2, dt_upper=2.0)
    # want slow motion (maximize dt) but cap total time at 1.5 s:
    # cost rewards large dt via squared cost on inv_dt towards its minimum
    b.add_cost(
        joint_pos_term("slow", T, D + 1),
        {"targets": jnp.concatenate([jnp.zeros(D), jnp.full(1, 0.5)]),
         "coeffs": jnp.concatenate([jnp.zeros(D), jnp.ones(1)])})
    b.add_constraint(
        total_time_term("tt", T, D, is_constraint=True),
        {"limit": jnp.asarray(1.5), "coeff": jnp.asarray(1.0)})
    b.fix_timestep(0)
    spec, data = b.build(jnp.zeros((T, D)), init_dt=0.2)
    res = solve(spec, data, PARAMS)
    assert int(res.status) == CONVERGED
    X = np.asarray(res.x).reshape(T, D + 1)
    total = float(np.sum(1.0 / X[1:, D]))
    assert total <= 1.5 + 1e-2
