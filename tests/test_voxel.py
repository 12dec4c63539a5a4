"""Octomap-analog voxel obstacle tests (cast_cost_octomap_unit semantics,
trajopt/test/cast_cost_octomap_unit.cpp): voxelize a point cloud into
covering spheres, attach them as static world geometry, and plan a swept
trajectory around them."""

import numpy as np
import jax.numpy as jnp

from trajopt_tpu.collision.voxel import (
    point_cloud_geoms,
    voxel_grid_geoms,
    voxelize_points,
)
from trajopt_tpu.collision.world import build_collision_world
from trajopt_tpu.models import spherebot
from trajopt_tpu.ops.qp import QPSettings
from trajopt_tpu.problem.trajectory import TrajProblemBuilder, interpolated_init
from trajopt_tpu.solver.sqp import solve
from trajopt_tpu.solver.types import CONVERGED, SQPParams
from trajopt_tpu.terms.collision import (
    cast_collision_term,
    trajectory_in_collision,
)
from trajopt_tpu.terms.joint import joint_pos_term, joint_vel_term


def test_voxelize_points_dedup_and_cap():
    pts = np.array([[0.01, 0.01, 0.01], [0.02, 0.02, 0.02],  # same cell
                    [1.0, 0.0, 0.0]])
    c = voxelize_points(pts, 0.1)
    assert c.shape == (2, 3)
    # cap keeps densest cells
    many = np.concatenate([np.zeros((10, 3)),  # dense cell at origin
                           np.arange(30)[:, None] * [1.0, 0, 0] + 5.0])
    c2 = voxelize_points(many, 0.1, max_voxels=4)
    assert c2.shape == (4, 3)
    assert np.any(np.all(np.abs(c2 - 0.05) < 1e-9, axis=1))  # dense cell kept


def test_voxel_grid_cover():
    occ = np.zeros((2, 2, 1), bool)
    occ[0, 0, 0] = occ[1, 1, 0] = True
    gs = voxel_grid_geoms(np.zeros(3), 0.2, occ)
    assert len(gs) == 2
    # covering radius: half voxel diagonal
    np.testing.assert_allclose(gs[0].size[0], 0.1 * np.sqrt(3), rtol=1e-12)


def test_plan_around_point_cloud():
    """Spherebot must route around a voxelized wall of points blocking the
    straight-line path, verified with an independent swept check."""
    m, chain = spherebot()
    # wall of points across x=0 from y=-0.6..0.6 (blocks the straight path
    # from (-2,0) to (2,0) for the 0.5-radius ball)
    ys = np.linspace(-0.45, 0.75, 25)  # asymmetric: breaks the y=0 saddle
    zs = np.zeros_like(ys)
    pts = np.stack([np.zeros_like(ys), ys, zs], axis=1)
    geoms = point_cloud_geoms(pts, resolution=0.2)
    assert 5 <= len(geoms) <= 10
    world = build_collision_world(
        m, chain, attachments=[("obstacle", g) for g in geoms])

    T = 7
    b = TrajProblemBuilder(chain, T)
    b.add_cost(joint_vel_term("jvel", T, 2),
               {"targets": jnp.zeros(2), "coeffs": jnp.full(2, 5.0)})
    b.add_constraint(
        cast_collision_term("coll", world, T, n_sub=6, is_constraint=True),
        {"margins": 0.05, "coeffs": 1.0})
    b.add_constraint(
        joint_pos_term("goal", T, 2, first_step=T - 1, last_step=T - 1,
                       is_constraint=True),
        {"targets": jnp.asarray([2.0, 0.0]), "coeffs": jnp.ones(2)})
    b.fix_timestep(0)
    init = interpolated_init(np.array([-2.0, 0.0]), np.array([2.0, 0.0]), T)
    spec, data = b.build(init)
    res = solve(spec, data, SQPParams(
        qp=QPSettings(eps_abs=1e-6, eps_rel=1e-8, max_iter=4000)))
    assert int(res.status) == CONVERGED
    X = np.asarray(res.x).reshape(T, 2)
    # endpoints held
    np.testing.assert_allclose(X[0], [-2.0, 0.0], atol=1e-8)
    np.testing.assert_allclose(X[-1], [2.0, 0.0], atol=1e-3)
    # the path must detour off the blocked straight line
    assert np.max(np.abs(X[:, 1])) > 0.4
    # independent swept check at fine interpolation
    assert float(trajectory_in_collision(world, X, n_sub=24)) >= -1e-3
