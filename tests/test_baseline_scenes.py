"""End-to-end representatives of the remaining BASELINE.json configs:

- pick-and-place: attached-object collision geometry, TWO CHAINED problems
  (approach -> transfer-with-payload; second seeded by the first's solution,
  the reference GIVEN_TRAJ chaining).  Reference analogs:
  trajopt/test/cast_cost_attached_unit.cpp (attached geometry),
  problem_description.hpp:162-185 (given-traj init).
- continuous (swept-volume) collision with redundant external axes, 9-DoF
  (2 prismatic gantry + 7-DoF arm).

Both follow the reference planning-test pattern: solve, assert CONVERGED,
then INDEPENDENTLY re-verify the final trajectory with a separate
continuous collision query (planning_unit.cpp:98-148).
"""

import jax.numpy as jnp
import numpy as np

from trajopt_tpu.benchmarks import (
    Q9_GOAL,
    Q9_START,
    bench_params,
    make_redundant_rail,
    solve_pick_and_place,
)
from trajopt_tpu.solver.sqp import solve_batch_compact
from trajopt_tpu.solver.types import CONVERGED
from trajopt_tpu.terms.collision import trajectory_in_collision

B, T = 2, 10


def test_pick_and_place_chained():
    resA, resB, scene = solve_pick_and_place(
        B, n_steps=T, dtype=jnp.float64, params=bench_params())
    assert all(int(s) == CONVERGED for s in resA.status), resA.status
    assert all(int(s) == CONVERGED for s in resB.status), resB.status
    D = scene["D"]
    XA = np.asarray(resA.x).reshape(B, T, D)
    XB = np.asarray(resB.x).reshape(B, T, D)
    # chaining: the transfer's FIRST step is the approach's LAST (pinned)
    np.testing.assert_allclose(XB[:, 0], XA[:, -1], atol=1e-12)
    # goals reached
    np.testing.assert_allclose(XA[:, -1], scene["grasps"], atol=1e-3)
    np.testing.assert_allclose(XB[:, -1], scene["places"], atol=1e-3)
    for i in range(B):
        # independent swept verification: approach in the bare world,
        # transfer in the payload-attached world (the payload must clear
        # the divider wall)
        dA = float(trajectory_in_collision(scene["world_free"],
                                           jnp.asarray(XA[i])))
        dB = float(trajectory_in_collision(scene["world_att"],
                                           jnp.asarray(XB[i])))
        assert dA >= 0.0, f"lane {i}: approach sweep {dA}"
        assert dB >= 0.0, f"lane {i}: transfer sweep {dB}"
        # the straight-line transfer init penetrates the wall — the solver
        # had to actually plan over it
        a = np.linspace(0, 1, T)[:, None]
        straight = (1 - a) * XA[i, -1][None] + a * scene["places"][i][None]
        assert float(trajectory_in_collision(
            scene["world_att"], jnp.asarray(straight))) < 0.0


def test_redundant_rail_9dof():
    import dataclasses

    T9 = 12
    spec, data, chain, world = make_redundant_rail(B, n_steps=T9,
                                                   dtype=jnp.float64)
    assert chain.n_dof == 9
    assert spec.n_x == T9 * 9
    params = dataclasses.replace(bench_params(), max_total_qp_solves=60)
    res = solve_batch_compact(spec, data, params)
    assert all(int(s) == CONVERGED for s in res.status), res.status
    X = np.asarray(res.x).reshape(B, T9, 9)
    for i in range(B):
        d = float(trajectory_in_collision(world, jnp.asarray(X[i])))
        assert d >= 0.0, f"lane {i}: swept {d}"
    # the rail dofs are genuinely used: the carriage travels the span
    assert np.all(X[:, 0, 0] < -0.7) and np.all(X[:, -1, 0] > 0.7)
    # straight-line init sweeps through the shelf (the scene is nontrivial)
    q0 = jnp.asarray(Q9_START, jnp.float64)
    q1 = jnp.asarray(Q9_GOAL, jnp.float64)
    a = jnp.linspace(0, 1, T9)[:, None]
    assert float(trajectory_in_collision(
        world, (1 - a) * q0[None] + a * q1[None])) < 0.0
