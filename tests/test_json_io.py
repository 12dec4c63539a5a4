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
