"""Collision geometry unit tests: signed distances vs known values and
brute-force sampling; gradient sanity (the analog of the reference's
discrete/continuous collision gradient unit tests, SURVEY.md §4.2)."""

import numpy as np
import jax
import jax.numpy as jnp

from trajopt_tpu.collision import geometry as G
from trajopt_tpu.collision.world import build_collision_world
from trajopt_tpu.models import arm7, boxbot, spherebot


def test_sphere_sphere():
    d = G.d_sphere_sphere(jnp.array([0., 0, 0]), 0.5, jnp.array([2., 0, 0]), 0.5)
    np.testing.assert_allclose(float(d), 1.0, atol=1e-12)
    d = G.d_sphere_sphere(jnp.array([0., 0, 0]), 0.5, jnp.array([0.6, 0, 0]), 0.5)
    np.testing.assert_allclose(float(d), -0.4, atol=1e-12)


def test_sphere_capsule():
    a, b = jnp.array([-1., 0, 0]), jnp.array([1., 0, 0])
    d = G.d_sphere_capsule(jnp.array([0., 2., 0]), 0.3, a, b, 0.2)
    np.testing.assert_allclose(float(d), 1.5, atol=1e-12)
    # beyond endpoint
    d = G.d_sphere_capsule(jnp.array([3., 0., 0]), 0.3, a, b, 0.2)
    np.testing.assert_allclose(float(d), 1.5, atol=1e-12)


def test_capsule_capsule_crossing():
    d = G.d_capsule_capsule(jnp.array([-1., 0, 0]), jnp.array([1., 0, 0]), 0.1,
                            jnp.array([0., -1, 1.]), jnp.array([0., 1, 1.]), 0.2)
    np.testing.assert_allclose(float(d), 0.7, atol=1e-12)
    # parallel segments
    d = G.d_capsule_capsule(jnp.array([-1., 0, 0]), jnp.array([1., 0, 0]), 0.1,
                            jnp.array([-1., 0, 2.]), jnp.array([1., 0, 2.]), 0.1)
    np.testing.assert_allclose(float(d), 1.8, atol=1e-9)


def test_box_sdf_point():
    bc, bR, bh = jnp.zeros(3), jnp.eye(3), jnp.array([0.5, 0.5, 0.5])
    assert abs(float(G.sdf_box_point(jnp.array([2., 0, 0]), bc, bR, bh)) - 1.5) < 1e-12
    assert abs(float(G.sdf_box_point(jnp.array([1., 1., 0]), bc, bR, bh)) -
               np.sqrt(0.5)) < 1e-12
    # inside: nearest face
    assert abs(float(G.sdf_box_point(jnp.array([0.2, 0, 0]), bc, bR, bh)) + 0.3) < 1e-12


def test_capsule_box():
    bc, bR, bh = jnp.zeros(3), jnp.eye(3), jnp.array([0.5, 0.5, 0.5])
    a, b = jnp.array([-1., 0, 2.]), jnp.array([1., 0, 2.])
    d = G.d_capsule_box(a, b, 0.25, bc, bR, bh)
    np.testing.assert_allclose(float(d), 1.25, atol=1e-9)
    # diagonal segment approaching a corner
    a, b = jnp.array([2., 2., 0.]), jnp.array([2., -2., 0.])
    d = G.d_capsule_box(a, b, 0.1, bc, bR, bh)
    np.testing.assert_allclose(float(d), 1.4, atol=1e-6)


def test_box_box_sat():
    h = jnp.array([0.5, 0.5, 0.5])
    d = G.d_box_box(jnp.zeros(3), jnp.eye(3), h,
                    jnp.array([3., 0, 0]), jnp.eye(3), h)
    np.testing.assert_allclose(float(d), 2.0, atol=1e-12)
    # penetrating
    d = G.d_box_box(jnp.zeros(3), jnp.eye(3), h,
                    jnp.array([0.8, 0, 0]), jnp.eye(3), h)
    np.testing.assert_allclose(float(d), -0.2, atol=1e-12)
    # rotated 45deg about z, corner-on: distance along x between corner and face
    c, s = np.cos(np.pi / 4), np.sin(np.pi / 4)
    R2 = jnp.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])
    d = G.d_box_box(jnp.zeros(3), jnp.eye(3), h,
                    jnp.array([2., 0, 0]), R2, h)
    np.testing.assert_allclose(float(d), 2.0 - 0.5 - np.sqrt(0.5), atol=1e-9)


def test_distance_gradient_is_normal_direction():
    # grad of sphere-sphere distance wrt center = unit separation vector
    f = lambda c: G.d_sphere_sphere(c, 0.5, jnp.array([2., 1., 0.]), 0.5)
    g = jax.grad(f)(jnp.array([0., 0., 0.]))
    n = np.asarray([2., 1., 0.]) / np.linalg.norm([2., 1., 0.])
    np.testing.assert_allclose(np.asarray(g), -n, atol=1e-12)


def test_spherebot_world_pairs():
    m, chain = spherebot()
    w = build_collision_world(m, chain)
    assert w.n_pairs == 1  # ball vs obstacle
    d = w.pair_distances(jnp.array([3.0, 0.0]))
    np.testing.assert_allclose(np.asarray(d), [2.0], atol=1e-12)
    d = w.pair_distances(jnp.array([0.6, 0.0]))
    np.testing.assert_allclose(np.asarray(d), [-0.4], atol=1e-12)


def test_spherebot_cast_exact_swept():
    m, chain = spherebot()
    w = build_collision_world(m, chain)
    # motion passes directly over the obstacle: swept distance = y gap
    qa, qb = jnp.array([-3.0, 1.8]), jnp.array([3.0, 1.8])
    d = w.cast_pair_distances(qa, qb)
    np.testing.assert_allclose(np.asarray(d), [0.8], atol=1e-9)
    # discrete endpoints alone would miss the obstacle
    d0 = w.pair_distances(qa)
    assert float(d0[0]) > 2.0


def test_boxbot_world_cast_substates():
    m, chain = boxbot()
    w = build_collision_world(m, chain)
    assert w.n_pairs == 1
    qa, qb = jnp.array([-3.0, 0.0]), jnp.array([3.0, 0.0])
    d = w.cast_pair_distances(qa, qb, n_sub=17)  # odd count hits x=0 exactly
    # boxes overlap mid-swipe: penetration depth 1 at the closest substate
    assert float(d[0]) < -0.98


def test_arm7_world_builds():
    m, chain = arm7()
    w = build_collision_world(m, chain)
    assert w.n_pairs > 5  # arm links vs table + self pairs
    d = w.pair_distances(jnp.zeros(7))
    assert np.isfinite(np.asarray(d)).all()
