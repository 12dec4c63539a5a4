"""Contact reduction: static broad-phase culling + top-k contact rows
(VERDICT r2 item #3) and backend selection (item #5).

Reference anchors: tesseract broad-phase culling + safety_margin_buffer
contact window (problem_description.cpp:1630), max_num_cnt worst-contact
cap (trajopt_common/collision_types.h:162), TRAJOPT_CONVEX_SOLVER /
convex_solver backend selection (solver_interface.cpp:305-325).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from trajopt_tpu.collision.broadphase import pair_distance_bounds, prune_pairs
from trajopt_tpu.collision.world import build_collision_world
from trajopt_tpu.models import arm7, spherebot
from trajopt_tpu.ops.qp import resolve_solver
from trajopt_tpu.problem.json_io import load_problem
from trajopt_tpu.solver.sqp import solve
from trajopt_tpu.solver.types import CONVERGED
from trajopt_tpu.terms.collision import cast_collision_term, discrete_collision_term


@pytest.fixture(scope="module")
def arm_world():
    m, chain = arm7()
    return chain, build_collision_world(m, chain)


def test_pair_distance_bounds_sound(arm_world):
    """The static bound must never exceed the true distance anywhere in the
    joint box (soundness is what makes culling safe)."""
    chain, world = arm_world
    lbs = pair_distance_bounds(world)
    rng = np.random.default_rng(3)
    Q = rng.uniform(chain.lb, chain.ub, size=(40, chain.n_dof))
    D = np.asarray(jax.jit(jax.vmap(world.pair_distances))(jnp.asarray(Q)))
    assert (D >= lbs[None, :] - 1e-9).all()


def test_prune_pairs_keeps_active_geometry(arm_world):
    chain, world = arm_world
    w2 = prune_pairs(world, 0.6)
    assert 0 < w2.n_pairs <= world.n_pairs
    # every surviving pair must evaluate identically to the full world
    q = jnp.zeros((chain.n_dof,), jnp.float64)
    d_full = dict(zip(world.pair_names(), np.asarray(world.pair_distances(q))))
    d_sub = dict(zip(w2.pair_names(), np.asarray(w2.pair_distances(q))))
    for k, v in d_sub.items():
        assert abs(d_full[k] - v) < 1e-12


def test_topk_rows_match_exact_rows(arm_world):
    """With K large enough to hold every in-window contact, the top-k term's
    positive rows must be exactly the exact term's positive rows (same
    values; coeff folded in), and the selected Jacobian rows must equal the
    corresponding full-Jacobian rows."""
    chain, world = arm_world
    T, D = 4, chain.n_dof
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-0.3, 0.3, (T * D,)))
    P = world.n_pairs
    coeff = 20.0
    p = {"margins": jnp.full((P,), 0.4), "coeffs": jnp.full((P,), coeff)}

    K = P - 1

    # --- discrete: rows are pairs; top-k keeps the K worst pairs ---
    t_ex = discrete_collision_term("d", world, T)
    t_k = discrete_collision_term("d", world, T, max_contacts=K, buffer=10.0)
    assert t_k.n_rows == T * K
    e_ex = (np.asarray(t_ex.err(x, p)) * coeff).reshape(T, P)
    e_k = np.asarray(t_k.err(x, p)).reshape(T, K)
    J_ex = (np.asarray(t_ex.jac(x, p)) * coeff).reshape(T, P, T * D)
    J_k = np.asarray(t_k.jac(x, p)).reshape(T, K, T * D)
    for g in range(T):
        order = np.argsort(-e_ex[g], kind="stable")[:K]
        np.testing.assert_allclose(e_k[g], e_ex[g][order], rtol=1e-10)
        np.testing.assert_allclose(J_k[g], J_ex[g][order], atol=1e-12)

    # --- cast: selection is PAIR-level (K worst pairs per gap, ranked by
    # worst sub-segment error), keeping every selected pair's segment rows ---
    n_seg, G = 2, T - 1
    t_ex = cast_collision_term("c", world, T, n_sub=n_seg + 1)
    t_k = cast_collision_term("c", world, T, n_sub=n_seg + 1,
                              max_contacts=K, buffer=10.0)
    assert t_k.n_rows == G * n_seg * K
    e_ex = (np.asarray(t_ex.err(x, p)) * coeff).reshape(G, n_seg, P)
    e_k = np.asarray(t_k.err(x, p)).reshape(G, n_seg, K)
    J_ex = (np.asarray(t_ex.jac(x, p)) * coeff).reshape(G, n_seg, P, T * D)
    J_k = np.asarray(t_k.jac(x, p)).reshape(G, n_seg, K, T * D)
    for g in range(G):
        key = e_ex[g].max(axis=0)  # worst err per pair
        order = np.argsort(-key, kind="stable")[:K]
        np.testing.assert_allclose(e_k[g], e_ex[g][:, order], rtol=1e-10)
        np.testing.assert_allclose(J_k[g], J_ex[g][:, order], atol=1e-12)


def test_topk_window_deactivates_far_rows(arm_world):
    chain, world = arm_world
    T = 3
    x = jnp.zeros((T * chain.n_dof,), jnp.float64)
    P = world.n_pairs
    # margin tiny, buffer tiny: everything is far outside the window
    p = {"margins": jnp.full((P,), -10.0), "coeffs": jnp.full((P,), 20.0)}
    t = discrete_collision_term("d", world, T, max_contacts=4, buffer=0.01)
    e = np.asarray(t.err(x, p))
    assert (e < 0).all()  # all rows inert
    J = np.asarray(t.jac(x, p))
    assert np.abs(J).max() == 0.0  # deactivated rows carry no gradient


def test_solve_with_reduction_matches_exact():
    """End-to-end: spherebot solve with top-k + culling equals the exact
    lowering (single pair; reduction must be a no-op there) and a culled
    arm7 cast problem still converges collision-free."""
    m, chain = spherebot()
    world = build_collision_world(m, chain)
    doc = {
        "basic_info": {"n_steps": 5, "manip": "manipulator",
                       "fixed_timesteps": [0]},
        "costs": [
            {"type": "joint_vel", "params": {"coeffs": [1, 1],
                                             "targets": [0, 0]}},
            {"type": "collision", "params": {"coeffs": 20, "dist_pen": 0.25,
                                             "evaluator_type": 4}},
        ],
        "constraints": [
            {"type": "joint_pos", "params": {"targets": [0.6, 0.7],
                                             "first_step": 4,
                                             "last_step": 4}},
        ],
        "init_info": {"type": "given_traj", "data": [[-0.75, 0.75]] * 5},
    }
    s1, d1, p1 = load_problem(doc, chain, world, max_contacts=None, cull=False)
    s2, d2, p2 = load_problem(doc, chain, world, max_contacts=8, cull=True)
    r1 = solve(s1, d1, p1)
    r2 = solve(s2, d2, p2)
    assert int(r1.status) == CONVERGED and int(r2.status) == CONVERGED
    np.testing.assert_allclose(np.asarray(r1.x), np.asarray(r2.x), atol=1e-6)


def test_resolve_solver_env(monkeypatch):
    assert resolve_solver("auto") == "ipm"
    assert resolve_solver("OSQP") == "admm"
    assert resolve_solver("BPMPD") == "ipm"
    assert resolve_solver("admm") == "admm"
    monkeypatch.setenv("TRAJOPT_CONVEX_SOLVER", "OSQP")
    assert resolve_solver("auto") == "admm"
    # explicit names win over the env override (reference: env only applies
    # to AUTO_SOLVER)
    assert resolve_solver("ipm") == "ipm"
    monkeypatch.setenv("TRAJOPT_CONVEX_SOLVER", "SPARKLY")
    with pytest.raises(ValueError):
        resolve_solver("auto")
    monkeypatch.delenv("TRAJOPT_CONVEX_SOLVER")
    with pytest.raises(ValueError):
        resolve_solver("GUROBI")  # not built, like the reference unbuilt


def test_convex_solver_config_selects_backend():
    m, chain = spherebot()
    world = build_collision_world(m, chain)
    doc = {
        "basic_info": {"n_steps": 1, "manip": "manipulator",
                       "convex_solver": "BPMPD"},
        "costs": [{"type": "joint_pos",
                   "params": {"coeffs": [1, 1], "targets": [0.0, 0.0]}}],
        "constraints": [],
        "init_info": {"type": "given_traj", "data": [[-0.75, 0.75]]},
    }
    _, _, params = load_problem(doc, chain, world)
    assert params.qp.solver == "ipm"
    doc["basic_info"]["convex_solver"] = "OSQP"
    _, _, params = load_problem(doc, chain, world)
    assert params.qp.solver == "admm"
    doc["basic_info"]["convex_solver"] = "GUROBI"
    with pytest.raises(ValueError):
        load_problem(doc, chain, world)
    doc["basic_info"]["convex_solver"] = "AUTO_SOLVER"
    _, _, params = load_problem(doc, chain, world)
    assert params.qp.solver == "auto"


ROTOR_URDF = """
<robot name="rotor">
  <link name="base"/>
  <link name="rod">
    <collision>
      <origin xyz="0.5 0 0" rpy="0 1.5707963267948966 0"/>
      <geometry><cylinder radius="0.05" length="1.0"/></geometry>
    </collision>
  </link>
  <link name="obstacle">
    <collision>
      <origin xyz="0.45 0.45 0" rpy="0 0 0"/>
      <geometry><box size="0.1 0.1 0.1"/></geometry>
    </collision>
  </link>
  <joint name="spin" type="revolute">
    <parent link="base"/><child link="rod"/>
    <origin xyz="0 0 0" rpy="0 0 0"/><axis xyz="0 0 1"/>
    <limit lower="-3.14" upper="3.14" effort="1" velocity="1"/>
  </joint>
  <joint name="obs_j" type="fixed">
    <parent link="base"/><child link="obstacle"/>
    <origin xyz="0 0 0" rpy="0 0 0"/>
  </joint>
</robot>
"""


def test_rotating_link_hull_cast_detects_sweep():
    """A rod spinning 90 deg past an obstacle on the diagonal INSIDE the
    two-pose hull: both endpoint poses are clear, but the reference cast's
    swept-volume convex hull (collision_terms.cpp:1362-1365) contains the
    obstacle — the hull cast must report contact even at n_sub=2, where a
    substate-min over the two endpoints would miss it entirely."""
    from trajopt_tpu.kinematics.chain import build_chain
    from trajopt_tpu.kinematics.urdf import parse_urdf

    m = parse_urdf(ROTOR_URDF)
    chain = build_chain(m, ["spin"])
    world = build_collision_world(m, chain)
    assert world.n_pairs == 1
    qa = jnp.asarray([0.0])
    qb = jnp.asarray([np.pi / 2])
    # endpoints are clear of the obstacle
    assert float(world.pair_distances(qa)[0]) > 0.2
    assert float(world.pair_distances(qb)[0]) > 0.2
    # the two-pose hull contains the diagonal obstacle
    d_cast = float(world.cast_pair_distances(qa, qb, 2)[0])
    assert d_cast < 0.0, d_cast
    # fine subdivision agrees that the motion is in collision
    d_seg = np.asarray(world.cast_pair_distances_seg(qa, qb, 16))
    assert d_seg.min() < 0.0
