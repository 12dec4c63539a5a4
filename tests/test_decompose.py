"""Mesh decomposition (V-HACD stand-in) tests."""

import numpy as np

from trajopt_tpu.collision.decompose import (
    decompose,
    fit_auto,
    fit_capsule,
    fit_obb,
    fit_sphere,
)


def _cylinder_cloud(r=0.2, length=1.0, n=500, seed=0):
    rng = np.random.default_rng(seed)
    theta = rng.uniform(0, 2 * np.pi, n)
    z = rng.uniform(-length / 2, length / 2, n)
    return np.stack([r * np.cos(theta), r * np.sin(theta), z], axis=1)


def test_fit_sphere_contains_cloud():
    pts = np.random.default_rng(1).normal(size=(200, 3))
    g = fit_sphere(pts)
    d = np.linalg.norm(pts - g.xyz, axis=1)
    assert (d <= g.size[0] + 1e-9).all()


def test_fit_capsule_elongated():
    pts = _cylinder_cloud()
    g = fit_capsule(pts)
    assert g.kind == "capsule"
    # radius close to the cylinder's, axis along z
    assert abs(g.size[0] - 0.2) < 0.05


def test_fit_obb_axis_aligned_box():
    rng = np.random.default_rng(2)
    pts = rng.uniform(-1, 1, size=(400, 3)) * np.array([0.5, 0.2, 0.1])
    g = fit_obb(pts)
    assert g.kind == "box"
    assert np.all(np.sort(g.size) <= np.array([0.25, 0.45, 1.05]))


def test_fit_auto_picks_capsule_for_rod():
    pts = _cylinder_cloud(r=0.05, length=2.0)
    g = fit_auto(pts)
    assert g.kind == "capsule"


def test_decompose_splits():
    a = _cylinder_cloud(seed=3) + np.array([0, 0, 2.0])
    b = _cylinder_cloud(seed=4) - np.array([0, 0, 2.0])
    pieces = decompose(np.concatenate([a, b]), max_pieces=2)
    assert len(pieces) == 2
