"""Kinematics tests: FK correctness, analytic Jacobians vs autodiff/FD.

Mirrors the role of the reference's derivative unit tests
(trajopt/test/kinematic_costs_unit.cpp — error/Jacobian checks vs numeric
differentiation, SURVEY.md §4.2).
"""

import numpy as np
import jax
import jax.numpy as jnp

from trajopt_tpu.models import arm7, spherebot
from trajopt_tpu.ops.lie import (
    axis_angle_matrix,
    rot_log,
    rpy_to_matrix,
    transform_error,
)


def test_rpy_matrix_basics():
    R = rpy_to_matrix(jnp.array([0.0, 0.0, np.pi / 2]))
    np.testing.assert_allclose(
        np.asarray(R @ jnp.array([1.0, 0, 0])), [0, 1, 0], atol=1e-12)


def test_rot_log_roundtrip(rng):
    for _ in range(20):
        w = rng.normal(size=3)
        angle = np.linalg.norm(w)
        if angle > np.pi:
            continue
        R = axis_angle_matrix(jnp.asarray(w / max(angle, 1e-12)), jnp.asarray(angle))
        np.testing.assert_allclose(np.asarray(rot_log(R)), w, atol=1e-8)
    # near-pi robustness
    R = axis_angle_matrix(jnp.array([0.0, 0, 1]), jnp.asarray(np.pi - 1e-7))
    lg = np.asarray(rot_log(R))
    np.testing.assert_allclose(lg, [0, 0, np.pi - 1e-7], atol=1e-5)
    # identity
    np.testing.assert_allclose(np.asarray(rot_log(jnp.eye(3))), 0.0, atol=1e-10)


def test_spherebot_fk():
    _, chain = spherebot()
    R, p = chain.fk(jnp.array([1.5, -2.0]))
    ball = chain.link_index("ball")
    np.testing.assert_allclose(np.asarray(p[ball]), [1.5, -2.0, 0.0], atol=1e-12)
    obstacle = chain.link_index("obstacle")
    np.testing.assert_allclose(np.asarray(p[obstacle]), [0, 0, 0], atol=1e-12)


def test_arm7_fk_zero_config():
    _, chain = arm7()
    R, p = chain.fk(jnp.zeros(7))
    tool = chain.link_index("tool")
    # straight-up arm: z = sum of joint offsets + tool offset
    z = 0.15 + 0.20 + 0.21 + 0.20 + 0.19 + 0.20 + 0.126 + 0.08
    np.testing.assert_allclose(np.asarray(p[tool]), [0, 0, z], atol=1e-12)
    np.testing.assert_allclose(np.asarray(R[tool]), np.eye(3), atol=1e-12)


def test_jacobian_matches_autodiff(rng):
    _, chain = arm7()
    tool = chain.link_index("tool")
    for _ in range(5):
        q = jnp.asarray(rng.uniform(-1.5, 1.5, size=7))
        # linear part vs autodiff of link origin
        J_auto = jax.jacfwd(lambda qq: chain.fk(qq)[1][tool])(q)
        J = chain.jacobian(q, tool)
        np.testing.assert_allclose(np.asarray(J[:3]), np.asarray(J_auto),
                                   atol=1e-9)
        # angular part vs autodiff of rotation: omega_hat = dR R^T
        for d in range(7):
            dR = jax.jacfwd(lambda qq: chain.fk(qq)[0][tool])(q)[..., d]
            W = np.asarray(dR @ chain.fk(q)[0][tool].T)
            omega = np.array([W[2, 1], W[0, 2], W[1, 0]])
            np.testing.assert_allclose(np.asarray(J[3:, d]), omega, atol=1e-9)


def test_jacobian_point_offset(rng):
    _, chain = arm7()
    l4 = chain.link_index("l4")
    q = jnp.asarray(rng.uniform(-1.0, 1.0, size=7))
    R, p = chain.fk(q)
    local = jnp.array([0.05, -0.02, 0.1])
    pt_world = R[l4] @ local + p[l4]
    J = chain.jacobian_point(q, l4, pt_world)
    J_auto = jax.jacfwd(
        lambda qq: chain.fk(qq)[0][l4] @ local + chain.fk(qq)[1][l4])(q)
    np.testing.assert_allclose(np.asarray(J), np.asarray(J_auto), atol=1e-9)


def test_fk_batch_shape():
    _, chain = arm7()
    Q = jnp.zeros((4, 30, 7))
    R, p = chain.fk_batch(Q)
    assert R.shape == (4, 30, chain.n_links, 3, 3)
    assert p.shape == (4, 30, chain.n_links, 3)


def test_transform_error_zero():
    R = rpy_to_matrix(jnp.array([0.3, -0.2, 0.9]))
    p = jnp.array([1.0, 2.0, 3.0])
    err = transform_error(R, p, R, p)
    np.testing.assert_allclose(np.asarray(err), np.zeros(6), atol=1e-10)


def test_transform_error_translation_in_target_frame():
    Rz = rpy_to_matrix(jnp.array([0.0, 0.0, np.pi / 2]))
    p_t = jnp.zeros(3)
    p_s = jnp.array([1.0, 0.0, 0.0])
    err = transform_error(Rz, p_t, Rz, p_s)
    # world x-offset expressed in target frame (rotated z90) = (0,-1,0)
    np.testing.assert_allclose(np.asarray(err[:3]), [0, -1, 0], atol=1e-10)
    np.testing.assert_allclose(np.asarray(err[3:]), 0.0, atol=1e-10)
