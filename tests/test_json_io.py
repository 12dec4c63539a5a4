"""JSON front-end tests: reference-format documents drive full solves.

Documents mirror the reference configs (trajopt_common/data/config/
simple_collision_test.json, box_cast_test.json, numerical_ik1.json) adapted
to the freshly authored model zoo scenes.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from trajopt_tpu.collision.world import build_collision_world
from trajopt_tpu.models import arm7, boxbot, spherebot
from trajopt_tpu.ops.qp import QPSettings
from trajopt_tpu.problem.json_io import load_problem
from trajopt_tpu.solver.sqp import solve
from trajopt_tpu.solver.types import CONVERGED
from trajopt_tpu.terms.collision import trajectory_in_collision

QP = QPSettings(eps_abs=1e-6, eps_rel=1e-8, max_iter=4000)


def test_simple_collision_json():
    # simple_collision_test.json semantics
    doc = {
        "basic_info": {"n_steps": 1, "manip": "manipulator"},
        "costs": [
            {"type": "collision",
             "params": {"coeffs": 1, "dist_pen": 0.3, "evaluator_type": 1}},
            {"type": "joint_pos", "name": "joint0",
             "params": {"coeffs": [1, 1], "targets": [0.0, 0.0]}},
        ],
        "constraints": [
            {"type": "collision",
             "params": {"coeffs": 1, "dist_pen": 0.2, "evaluator_type": 1}},
        ],
        "init_info": {"type": "given_traj", "data": [[-0.75, 0.75]]},
    }
    m, chain = spherebot()
    world = build_collision_world(m, chain)
    spec, data, params = load_problem(doc, chain, world, qp=QP)
    res = solve(spec, data, params)
    assert int(res.status) == CONVERGED
    assert np.linalg.norm(np.asarray(res.x)) >= 1.2 - 1e-3


def test_box_cast_json():
    # box_cast_test.json semantics
    doc = {
        "basic_info": {"n_steps": 3, "manip": "manipulator",
                       "fixed_timesteps": [0, 2]},
        "costs": [
            {"type": "joint_vel", "name": "jvel0",
             "params": {"coeffs": [1], "targets": [0, 0]}},
            {"type": "collision",
             "params": {"coeffs": 10, "dist_pen": 0.02, "evaluator_type": 4,
                        "longest_valid_segment_length": 0.05}},
        ],
        "constraints": [
            {"type": "joint_pos", "name": "joint",
             "params": {"coeffs": [1, 1], "targets": [1.9, 3.8],
                        "first_step": 2, "last_step": 2}},
        ],
        "init_info": {"type": "given_traj",
                      "data": [[-1.9, 0], [0, 1.9], [1.9, 3.8]]},
    }
    m, chain = boxbot()
    world = build_collision_world(m, chain)
    spec, data, params = load_problem(doc, chain, world, qp=QP, n_sub=48)
    res = solve(spec, data, params)
    assert int(res.status) == CONVERGED
    X = np.asarray(res.x).reshape(3, 2)
    np.testing.assert_allclose(X[0], [-1.9, 0], atol=1e-6)
    np.testing.assert_allclose(X[2], [1.9, 3.8], atol=1e-6)
    min_d = float(trajectory_in_collision(world, jnp.asarray(X), n_sub=64))
    assert min_d > -1e-2, f"swept min distance {min_d}"


def test_numerical_ik_json():
    # numerical_ik1.json semantics: 1-step cart_pose constraint
    _, chain = arm7()
    q_goal = jnp.asarray([0.4, 0.6, -0.2, 0.9, 0.3, -0.5, 0.2])
    Rg, pg = chain.fk(q_goal)
    tool = chain.link_index("tool")
    # express target via xyz + wxyz quaternion (reference format)
    R = np.asarray(Rg[tool])
    w = np.sqrt(max(1 + R[0, 0] + R[1, 1] + R[2, 2], 0)) / 2
    q = np.array([w, (R[2, 1] - R[1, 2]) / (4 * w),
                  (R[0, 2] - R[2, 0]) / (4 * w),
                  (R[1, 0] - R[0, 1]) / (4 * w)])
    doc = {
        "basic_info": {"n_steps": 1, "manip": "arm"},
        "constraints": [
            {"type": "cart_pose",
             "params": {"pos_coeffs": [1, 1, 1], "rot_coeffs": [1, 1, 1],
                        "source_frame": "tool", "target_frame": "base",
                        "target_frame_offset_xyz": np.asarray(pg[tool]).tolist(),
                        "target_frame_offset_wxyz": q.tolist()}},
        ],
        "costs": [
            {"type": "joint_pos",
             "params": {"coeffs": 1e-4, "targets": 0.0}},
        ],
        "init_info": {"type": "given_traj",
                      "data": [[0.1, 0.1, 0.1, 0.1, 0.1, 0.1, 0.1]]},
    }
    spec, data, params = load_problem(doc, chain, qp=QP)
    res = solve(spec, data, params)
    assert int(res.status) == CONVERGED
    Rf, pf = chain.fk(res.x)
    np.testing.assert_allclose(np.asarray(pf[tool]), np.asarray(pg[tool]),
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(Rf[tool]), R, atol=1e-3)


def test_opt_info_roundtrip():
    doc = {
        "basic_info": {"n_steps": 2, "manip": "m"},
        "opt_info": {"max_iter": 7, "trust_box_size": 0.5,
                     "initial_merit_error_coeff": 33.0,
                     "cnt_tolerance": 1e-5},
        "costs": [{"type": "joint_vel", "params": {"coeffs": 1}}],
        "init_info": {"type": "stationary"},
    }
    _, chain = spherebot()
    spec, data, params = load_problem(doc, chain)
    assert params.max_iter == 7
    assert params.trust_box_size == 0.5
    assert params.initial_merit_error_coeff == 33.0
    assert params.cnt_tolerance == 1e-5


def test_unknown_field_rejected():
    doc = {
        "basic_info": {"n_steps": 2, "manip": "m"},
        "costs": [{"type": "joint_vel", "params": {"coeffs": 1, "bogus": 2}}],
    }
    _, chain = spherebot()
    with pytest.raises(ValueError, match="bogus"):
        load_problem(doc, chain)


def test_time_parameterized_json():
    """arm_around_table_time.json semantics: a term-level use_time flag
    (string-typed, mixed case, as in the reference config) switches the
    problem to the (T, D+1) 1/dt grid; joint_vel stays untimed while the
    goal joint_pos constraint rides the timed grid."""
    doc = {
        "basic_info": {"n_steps": 5, "manip": "m",
                       "fixed_timesteps": [0],
                       "dt_lower_lim": 0.05, "dt_upper_lim": 0.5},
        "costs": [
            {"type": "joint_vel", "use_time": "false",
             "params": {"coeffs": [1], "targets": [0, 0]}},
        ],
        "constraints": [
            {"type": "joint_pos", "name": "goal", "use_time": "tRuE",
             "params": {"coeffs": [1, 1], "targets": [1.0, -0.5],
                        "first_step": 4, "last_step": 4}},
        ],
        "init_info": {"type": "joint_interpolated", "dt": 0.1,
                      "data": [0.0, 0.0], "endpoint": [1.0, -0.5]},
    }
    _, chain = spherebot()
    spec, data, params = load_problem(doc, chain, qp=QP)
    D = chain.n_dof
    assert spec.n_x == 5 * (D + 1)  # 1/dt column present
    res = solve(spec, data, params)
    assert int(res.status) == CONVERGED
    X = np.asarray(res.x).reshape(5, D + 1)
    np.testing.assert_allclose(X[4, :D], [1.0, -0.5], atol=1e-4)
    # inv_dt column stayed within its bounds
    assert (X[:, D] >= 1.0 / 0.5 - 1e-9).all()
    assert (X[:, D] <= 1.0 / 0.05 + 1e-9).all()


def test_timed_vel_and_total_time_json():
    """joint_vel with use_time (dt-scaled velocity) + total_time constraint:
    the solver must stretch time to respect the velocity bound while the
    total-time constraint caps the stretch."""
    doc = {
        "basic_info": {"n_steps": 4, "manip": "m", "use_time": True,
                       "dt_lower_lim": 0.01, "dt_upper_lim": 10.0},
        "costs": [
            {"type": "total_time", "params": {"coeff": 1.0, "limit": 3.5}},
        ],
        "constraints": [
            {"type": "joint_vel", "use_time": True,
             "params": {"coeffs": [1, 1], "targets": [0.0, 0.0],
                        "upper_tols": [1.0, 1.0], "lower_tols": [-1.0, -1.0]}},
            {"type": "joint_pos", "name": "goal",
             "params": {"coeffs": [1, 1], "targets": [3.0, 0.0],
                        "first_step": 3, "last_step": 3}},
        ],
        "init_info": {"type": "joint_interpolated", "dt": 1.0,
                      "data": [0.0, 0.0], "endpoint": [3.0, 0.0]},
    }
    _, chain = spherebot()
    spec, data, params = load_problem(doc, chain, qp=QP)
    res = solve(spec, data, params)
    assert int(res.status) == CONVERGED
    D = chain.n_dof
    X = np.asarray(res.x).reshape(4, D + 1)
    np.testing.assert_allclose(X[3, :D], [3.0, 0.0], atol=1e-4)
    # velocity bound respected: |dq| * inv_dt <= 1 per step
    vel = (X[1:, :D] - X[:-1, :D]) * X[1:, D:]
    assert np.abs(vel).max() <= 1.0 + 1e-3
    # total time >= 3s needed to travel 3 rad at <=1 rad/s; the hinge cost
    # pulls it down to (or below) its 3.5s limit
    total = float(np.sum(1.0 / X[1:, D]))
    assert total >= 3.0 - 1e-2
    assert total <= 3.5 + 1e-2


def test_dynamic_cart_pose_json():
    """dynamic_cart_pose: target frame is a moving chain link."""
    _, chain = arm7()
    doc = {
        "basic_info": {"n_steps": 1, "manip": "arm"},
        "constraints": [
            {"type": "dynamic_cart_pose",
             "params": {"source_frame": "tool", "target_frame": "l4",
                        "target_frame_offset_xyz": [0.1478, 0.0, 0.5335],
                        "rot_coeffs": [0, 0, 0]}},
        ],
        "costs": [
            {"type": "joint_pos", "params": {"coeffs": 1e-4, "targets": 0.0}},
        ],
        "init_info": {"type": "given_traj",
                      "data": [[0.1, 0.4, 0.1, -0.6, 0.1, 0.3, 0.1]]},
    }
    spec, data, params = load_problem(doc, chain, qp=QP)
    res = solve(spec, data, params)
    assert int(res.status) == CONVERGED
    R, p = chain.fk(res.x)
    tool, l4 = chain.link_index("tool"), chain.link_index("l4")
    target_world = np.asarray(R[l4] @ jnp.asarray([0.1478, 0.0, 0.5335]) + p[l4])
    np.testing.assert_allclose(np.asarray(p[tool]), target_world, atol=1e-3)


def test_user_registered_term_type():
    """Runtime-registered JSON term types (TermInfo::RegisterMaker,
    problem_description.cpp:53-66): a custom Python term is reachable from
    a JSON document, drives the solve, and kind-mismatch is rejected."""
    from trajopt_tpu.problem.json_io import (register_term_type,
                                             unregister_term_type)
    from trajopt_tpu.terms.base import TermKind
    from trajopt_tpu.terms.user import user_defined_term

    def maker(entry, ctx):
        p = entry.get("params", {})
        target = np.asarray(p["target"], dtype=np.float64)
        kind = TermKind.EQ if ctx["is_constraint"] else TermKind.SQUARED
        term = user_defined_term(
            ctx["name"], kind, ctx["n_steps"], ctx["n_dof"],
            lambda q, pp: q - pp["target"], rows_per_step=ctx["n_dof"],
            first_step=ctx["n_steps"] - 1)
        return term, {"target": jnp.asarray(target)}

    register_term_type("my_goal", maker)
    try:
        m, chain = spherebot()
        doc = {
            "basic_info": {"n_steps": 4, "manip": "manipulator"},
            "costs": [
                {"type": "joint_vel", "name": "jv",
                 "params": {"coeffs": [1], "targets": [0, 0]}},
            ],
            "constraints": [
                {"type": "my_goal", "name": "g",
                 "params": {"target": [0.4, -0.3]}},
            ],
            "init_info": {"type": "stationary", "data": [1.0, 1.0]},
        }
        spec, data, params = load_problem(doc, chain, None, qp=QP)
        res = solve(spec, data, params)
        assert int(res.status) == CONVERGED
        X = np.asarray(res.x).reshape(4, 2)
        np.testing.assert_allclose(X[-1], [0.4, -0.3], atol=1e-5)

        # kind mismatch: a cost-kind term under "constraints" must raise
        def bad_maker(entry, ctx):
            term = user_defined_term(
                "bad", TermKind.SQUARED, ctx["n_steps"], ctx["n_dof"],
                lambda q, pp: q, rows_per_step=ctx["n_dof"])
            return term, {}

        register_term_type("bad_goal", bad_maker)
        doc_bad = dict(doc)
        doc_bad["constraints"] = [{"type": "bad_goal"}]
        with pytest.raises(ValueError, match="term-type check"):
            load_problem(doc_bad, chain, None, qp=QP)
    finally:
        unregister_term_type("my_goal")
        unregister_term_type("bad_goal")
