"""Voxel / point-cloud obstacle ingestion — the octomap analog.

The reference builds octomap worlds from point clouds for its
cast_cost_octomap_unit scenes (trajopt/test/cast_cost_octomap_unit.cpp);
tesseract collides against the octree's occupied cells.  The TPU-native
equivalent: voxelize the cloud on host (numpy, offline) and emit one sphere
geometry per occupied voxel (radius = half the voxel diagonal, so the union
of spheres covers the cells — conservative).  Spheres are the cheapest
pair kernel and make swept checks exact (sphere sweep = capsule).

Occupied-cell counts stay modest for planning scenes; all-pairs vectorized
distance over a few hundred voxel spheres is well within one chip's budget
(and ``max_voxels`` guards the static pair count).
"""

from __future__ import annotations

import numpy as np

from ..kinematics.urdf import UrdfGeom


def voxelize_points(points: np.ndarray, resolution: float,
                    max_voxels: int = 512) -> np.ndarray:
    """Occupied-voxel centers (V,3) of a point cloud at ``resolution``.

    Deterministic: cells are keyed on the lattice floor(p/res); if more than
    ``max_voxels`` cells are occupied the densest cells are kept (density =
    point count), which preserves the solid parts of the scene.
    """
    pts = np.asarray(points, np.float64).reshape(-1, 3)
    keys = np.floor(pts / resolution).astype(np.int64)
    uniq, counts = np.unique(keys, axis=0, return_counts=True)
    if len(uniq) > max_voxels:
        keep = np.argsort(counts)[::-1][:max_voxels]
        uniq = uniq[keep]
    return (uniq + 0.5) * resolution


def voxel_grid_geoms(origin: np.ndarray, resolution: float,
                     occupancy: np.ndarray) -> list[UrdfGeom]:
    """Sphere geoms covering the True cells of a dense (nx,ny,nz) grid."""
    occ = np.asarray(occupancy, bool)
    idx = np.argwhere(occ)
    centers = np.asarray(origin, np.float64)[None, :] + (idx + 0.5) * resolution
    r = 0.5 * np.sqrt(3.0) * resolution
    return [UrdfGeom("sphere", np.array([r]), c, np.zeros(3))
            for c in centers]


def point_cloud_geoms(points: np.ndarray, resolution: float,
                      max_voxels: int = 512) -> list[UrdfGeom]:
    """Octomap-style obstacle geoms from a raw point cloud."""
    centers = voxelize_points(points, resolution, max_voxels)
    r = 0.5 * np.sqrt(3.0) * resolution
    return [UrdfGeom("sphere", np.array([r]), c, np.zeros(3))
            for c in centers]
