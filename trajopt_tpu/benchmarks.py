"""Flagship benchmark problems (BASELINE.json configs).

``make_glass_upright`` builds the "glass-upright-class 7-DoF" problem the
driver's north star targets: 7-DoF capsule arm over a table, joint_vel
smoothing, swept collision cost, end-effector-upright equality constraint at
every step, joint goal constraint, fixed start — 30-step horizon.

Batch instances perturb the goal configuration (waypoint seeds / scenario
perturbations), all served by one compiled program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .collision.world import build_collision_world
from .models import arm7
from .ops.qp import QPSettings
from .problem.trajectory import TrajProblemBuilder, interpolated_init, stack_data
from .solver.types import ProblemData, ProblemSpec, SQPParams
from .terms.cartesian import upright_term
from .terms.collision import cast_collision_term
from .terms.joint import joint_pos_term, joint_vel_term

Q_START = np.array([-1.1, 1.6, 0.0, -0.8, 0.0, -0.8, 0.0])
Q_GOAL = np.array([1.1, 1.6, 0.0, -0.8, 0.0, -0.8, 0.0])


def bench_params(dtype=jnp.float32) -> SQPParams:
    """Throughput-tuned parameters (reference tolerance contract)."""
    return SQPParams(
        max_total_qp_solves=120,
        qp=QPSettings(eps_abs=1e-4, eps_rel=1e-6, max_iter=1000,
                      check_interval=25, adaptive_rho_interval=100),
    )


def make_glass_upright(batch: int, n_steps: int = 30, dtype=jnp.float32,
                       n_sub: int = 4, seed: int = 0):
    """Returns (spec, batched ProblemData, chain, world)."""
    model, chain = arm7()
    world = build_collision_world(model, chain)
    T, D = n_steps, chain.n_dof

    b = TrajProblemBuilder(chain, T)
    b.add_cost(joint_vel_term("jvel", T, D),
               {"targets": jnp.zeros(D, dtype), "coeffs": jnp.full(D, 5.0, dtype)})
    b.add_cost(cast_collision_term("coll", world, T, n_sub=n_sub),
               {"margins": jnp.asarray(0.025, dtype),
                "coeffs": jnp.asarray(20.0, dtype)})
    b.add_constraint(
        joint_pos_term("goal", T, D, first_step=T - 1, last_step=T - 1,
                       is_constraint=True),
        {"targets": jnp.asarray(Q_GOAL, dtype), "coeffs": jnp.ones(D, dtype)})
    b.add_constraint(
        upright_term("upright", chain, T, "tool"),
        {"coeffs": jnp.ones(2, dtype)})
    b.fix_timestep(0)

    rng = np.random.default_rng(seed)
    datas = []
    for i in range(batch):
        # perturb only the yaw joints (about world/tool z) so the goal stays
        # consistent with the upright constraint
        goal = Q_GOAL + rng.uniform(-0.15, 0.15, D) * np.array(
            [1.0, 0, 0, 0, 0, 0, 1.0])
        init = interpolated_init(jnp.asarray(Q_START, dtype),
                                 jnp.asarray(goal, dtype), T)
        spec, data = b.build(init)
        data = data._replace(
            cnt_params=(
                {"targets": jnp.asarray(goal, dtype),
                 "coeffs": jnp.ones(D, dtype)},
                {"coeffs": jnp.ones(2, dtype)},
            ))
        datas.append(data)
    batch_data = stack_data(datas)
    batch_data = jax.tree.map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x,
        batch_data)
    return spec, batch_data, chain, world
