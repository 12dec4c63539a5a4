"""Convex-hull (support-mapping) geometry: distances vs analytic values,
penetration sign, envelope-theorem gradients, attached-object worlds — the
TPU analog of the reference's convex-mesh collision path (tesseract GJK
consumed at trajopt/src/collision_terms.cpp:203-323) and attached-object
scenes (trajopt/test/cast_cost_attached_unit.cpp)."""

import numpy as np
import jax
import jax.numpy as jnp

from trajopt_tpu.collision import geometry as G
from trajopt_tpu.collision.decompose import (
    convex_hull_vertices,
    fit_hull,
    load_mesh_vertices,
)
from trajopt_tpu.collision.world import CONVEX, build_collision_world
from trajopt_tpu.models import arm7


def _cube(center, half):
    import itertools
    s = np.asarray(list(itertools.product((-1.0, 1.0), repeat=3)))
    return jnp.asarray(np.asarray(center)[None, :] + s * half)


def test_convex_convex_separated():
    # two unit cubes 3 apart on x: face-face distance = 3 - 1 = 2
    d = G.d_convex_convex(_cube([0, 0, 0], 0.5), 0.0,
                          _cube([3, 0, 0], 0.5), 0.0)
    np.testing.assert_allclose(float(d), 2.0, atol=1e-6)


def test_convex_convex_vertex_face():
    # point vs cube: corner region
    pt = jnp.asarray([[1.0, 1.0, 1.0]])
    d = G.d_convex_convex(pt, 0.0, _cube([0, 0, 0], 0.5), 0.0)
    np.testing.assert_allclose(float(d), np.sqrt(3) * 0.5, rtol=1e-5)


def test_convex_sphere_radius():
    # sweep radii subtract from the gap
    pt = jnp.asarray([[2.0, 0.0, 0.0]])
    d = G.d_convex_convex(pt, 0.25, _cube([0, 0, 0], 0.5), 0.25)
    np.testing.assert_allclose(float(d), 1.0, atol=1e-6)


def test_convex_penetration_sign():
    # overlapping cubes: depth 0.6 along x is the minimal translation
    d = G.d_convex_convex(_cube([0, 0, 0], 0.5), 0.0,
                          _cube([0.4, 0, 0], 0.5), 0.0)
    assert float(d) < 0.0
    np.testing.assert_allclose(float(d), -0.6, atol=1e-6)


def test_convex_matches_analytic_box_distance():
    """Axis-aligned boxes have a closed-form distance; the support-mapping
    path must match it exactly when separated (it is exact even in
    edge/corner regions where SAT only lower-bounds)."""
    rng = np.random.default_rng(3)
    for _ in range(10):
        c2 = rng.uniform(-3, 3, 3)
        true = np.linalg.norm(np.maximum(np.abs(c2) - 0.8, 0.0))
        d_cv = G.d_convex_convex(_cube([0, 0, 0], 0.5), 0.0,
                                 _cube(c2, 0.3), 0.0)
        d_sat = G.d_box_box(jnp.zeros(3), jnp.eye(3), jnp.asarray([0.5] * 3),
                            jnp.asarray(c2), jnp.eye(3), jnp.asarray([0.3] * 3))
        if true > 1e-3:
            np.testing.assert_allclose(float(d_cv), true, atol=1e-4)
            assert float(d_sat) <= true + 1e-9  # SAT is a lower bound
        else:
            assert float(d_cv) <= 1e-4  # penetrating/touching: non-positive


def test_convex_gradient_envelope():
    # d(dist)/d(translation) is the unit contact normal (Danskin)
    cube = _cube([0, 0, 0], 0.5)

    def f(t):
        return G.d_convex_convex(_cube([0, 0, 0], 0.5) + t[None, :], 0.0,
                                 _cube([3, 0, 0], 0.5), 0.0)

    g = jax.grad(f)(jnp.zeros(3))
    np.testing.assert_allclose(np.asarray(g), [-1.0, 0.0, 0.0], atol=1e-5)


def test_hull_reduction_support_error():
    rng = np.random.default_rng(0)
    v = rng.normal(size=(400, 3))
    hv = convex_hull_vertices(v, max_verts=32)
    assert hv.shape[0] <= 32
    # support under-approximation is bounded
    dirs = rng.normal(size=(50, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    full = (v @ dirs.T).max(axis=0)
    red = (hv @ dirs.T).max(axis=0)
    assert np.all(red <= full + 1e-12)
    assert np.max(full - red) < 0.35  # bounded cover gap


def test_mesh_loaders(tmp_path):
    # ascii OBJ
    p = tmp_path / "tri.obj"
    p.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n")
    v = load_mesh_vertices(str(p))
    assert v.shape == (3, 3)
    # binary STL: 1 triangle
    import struct
    b = b"\0" * 80 + struct.pack("<I", 1)
    b += struct.pack("<12f", 0, 0, 1, 0, 0, 0, 1, 0, 0, 0, 1, 0) + b"\0\0"
    p2 = tmp_path / "tri.stl"
    p2.write_bytes(b)
    v2 = load_mesh_vertices(str(p2))
    assert v2.shape == (3, 3)
    g = fit_hull(v2)
    assert g.kind == "convex" and g.verts.shape[0] <= 32


def test_attached_convex_world():
    """Attach a convex payload to the tool link; the world gains pairs and
    the swept query sees the payload move with the arm."""
    model, chain = arm7()
    base = build_collision_world(model, chain)
    payload = fit_hull(np.asarray([[0.0, 0, 0], [0.12, 0, 0], [0, 0.12, 0],
                                   [0, 0, 0.18], [0.1, 0.1, 0.15]]))
    world = build_collision_world(model, chain,
                                  attachments=[("tool", payload)])
    assert world.n_pairs > base.n_pairs
    kinds = {s.kind for s in world.geoms}
    assert CONVEX in kinds

    q0 = jnp.zeros(chain.n_dof)
    d0 = world.pair_distances(q0)
    assert d0.shape == (world.n_pairs,)
    assert np.all(np.isfinite(np.asarray(d0)))
    # swept query runs and lower-bounds the endpoint distances
    q1 = q0 + 0.3
    dc = world.cast_pair_distances(q0, q1, n_sub=4)
    d1 = world.pair_distances(q1)
    assert np.all(np.asarray(dc) <= np.maximum(np.asarray(d0),
                                               np.asarray(d1)) + 1e-9)
    # gradients flow through the attached geometry's pairs
    J = jax.jacfwd(world.pair_distances)(q0 + 0.1)
    assert np.isfinite(np.asarray(J)).all()
