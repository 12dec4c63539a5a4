"""Offline mesh preprocessing: fit convex primitives to vertex clouds.

The reference vendors V-HACD (trajopt_ext/vhacd) to decompose concave
meshes into convex pieces *offline* before planning (SURVEY.md §2.7 item 6).
The TPU build keeps the same split: meshes never reach the device — this
host-side module reduces a mesh's vertex cloud to primitive(s) the
differentiable SDF layer understands.

Provided fits (all numpy, run once at scene-build time):
- ``fit_sphere``: minimal centroid sphere;
- ``fit_capsule``: PCA axis + radius (good for elongated link meshes);
- ``fit_obb``: PCA-oriented bounding box;
- ``fit_auto``: picks the tightest of the three by volume.

For higher fidelity, split the mesh into k clusters first (``kmeans_split``)
and fit one primitive per cluster — a crude but serviceable V-HACD stand-in.
"""

from __future__ import annotations

import numpy as np

from ..kinematics.urdf import UrdfGeom


def _pca(verts: np.ndarray):
    c = verts.mean(axis=0)
    X = verts - c
    cov = X.T @ X / max(len(verts), 1)
    w, V = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1]
    return c, V[:, order]


def fit_sphere(verts: np.ndarray) -> UrdfGeom:
    c = verts.mean(axis=0)
    r = float(np.linalg.norm(verts - c, axis=1).max())
    return UrdfGeom("sphere", np.array([r]), c, np.zeros(3))


def _rot_to_rpy(R: np.ndarray) -> np.ndarray:
    sy = np.hypot(R[0, 0], R[1, 0])
    if sy > 1e-9:
        return np.array([np.arctan2(R[2, 1], R[2, 2]),
                         np.arctan2(-R[2, 0], sy),
                         np.arctan2(R[1, 0], R[0, 0])])
    return np.array([np.arctan2(-R[1, 2], R[1, 1]),
                     np.arctan2(-R[2, 0], sy), 0.0])


def fit_capsule(verts: np.ndarray) -> UrdfGeom:
    c, V = _pca(verts)
    axis = V[:, 0]
    t = (verts - c) @ axis
    radial = np.linalg.norm((verts - c) - np.outer(t, axis), axis=1)
    r = float(radial.max())
    lo, hi = float(t.min()), float(t.max())
    length = max(hi - lo - 2 * r, 1e-6)
    mid = c + axis * (hi + lo) / 2
    # capsule local frame: z along axis
    z = axis
    x = np.array([1.0, 0, 0]) if abs(z[0]) < 0.9 else np.array([0, 1.0, 0])
    x = x - z * (x @ z)
    x /= np.linalg.norm(x)
    y = np.cross(z, x)
    R = np.stack([x, y, z], axis=1)
    return UrdfGeom("capsule", np.array([r, length]), mid, _rot_to_rpy(R))


def fit_obb(verts: np.ndarray) -> UrdfGeom:
    c, V = _pca(verts)
    local = (verts - c) @ V
    lo, hi = local.min(axis=0), local.max(axis=0)
    size = hi - lo
    mid = c + V @ ((hi + lo) / 2)
    return UrdfGeom("box", size, mid, _rot_to_rpy(V))


def _volume(g: UrdfGeom) -> float:
    if g.kind == "sphere":
        return 4 / 3 * np.pi * g.size[0] ** 3
    if g.kind == "capsule":
        r, ln = g.size
        return np.pi * r * r * ln + 4 / 3 * np.pi * r ** 3
    return float(np.prod(g.size))


def fit_auto(verts: np.ndarray) -> UrdfGeom:
    cands = [fit_sphere(verts), fit_capsule(verts), fit_obb(verts)]
    return min(cands, key=_volume)


def kmeans_split(verts: np.ndarray, k: int, iters: int = 20,
                 seed: int = 0) -> list[np.ndarray]:
    """Split a vertex cloud into k clusters (Lloyd's) for per-piece fits."""
    rng = np.random.default_rng(seed)
    centers = verts[rng.choice(len(verts), size=k, replace=False)]
    for _ in range(iters):
        d = np.linalg.norm(verts[:, None] - centers[None], axis=2)
        assign = d.argmin(axis=1)
        for i in range(k):
            sel = verts[assign == i]
            if len(sel):
                centers[i] = sel.mean(axis=0)
    return [verts[assign == i] for i in range(k) if (assign == i).any()]


def decompose(verts: np.ndarray, max_pieces: int = 1) -> list[UrdfGeom]:
    """V-HACD stand-in: primitive fits over (optionally clustered) vertices."""
    if max_pieces <= 1 or len(verts) < 2 * max_pieces:
        return [fit_auto(verts)]
    return [fit_auto(v) for v in kmeans_split(verts, max_pieces)]


# ---------------------------------------------------------------------------
# Convex hulls (support-mapping geometry) + mesh ingestion
# ---------------------------------------------------------------------------


def convex_hull_vertices(verts: np.ndarray, max_verts: int = 32) -> np.ndarray:
    """Reduce a vertex cloud to <= max_verts extreme points.

    Support-function geometry only needs hull *vertices*; exact hulls are
    overkill.  Strategy: keep the support point of the cloud along each of a
    spread of directions (Fibonacci sphere), dedup — every kept point is an
    extreme point, and the induced support function underestimates the hull
    by at most the direction-cover gap (conservative for avoidance when
    paired with a collision margin).
    """
    n_dirs = max(max_verts * 4, 64)
    i = np.arange(n_dirs)
    phi = np.pi * (3.0 - np.sqrt(5.0))
    y = 1.0 - 2.0 * (i + 0.5) / n_dirs
    rr = np.sqrt(np.maximum(1.0 - y * y, 0.0))
    dirs = np.stack([np.cos(phi * i) * rr, y, np.sin(phi * i) * rr], axis=1)
    idx = np.unique(np.argmax(verts @ dirs.T, axis=0))
    if len(idx) > max_verts:
        # keep the max_verts points farthest from the centroid (extremes)
        c = verts[idx].mean(axis=0)
        d = np.linalg.norm(verts[idx] - c, axis=1)
        idx = idx[np.argsort(d)[::-1][:max_verts]]
    return verts[idx]


def fit_hull(verts: np.ndarray, max_verts: int = 32,
             sweep_radius: float = 0.0) -> UrdfGeom:
    """Convex-hull geometry (the faithful V-HACD piece representation)."""
    hv = convex_hull_vertices(np.asarray(verts, np.float64), max_verts)
    return UrdfGeom("convex", np.array([sweep_radius]), np.zeros(3),
                    np.zeros(3), verts=hv)


def load_mesh_vertices(path: str) -> np.ndarray:
    """Minimal STL (binary/ascii) + OBJ vertex loader (host-side, offline).

    The reference loads meshes through tesseract/assimp; planning only needs
    the vertex cloud (fed to fit_* / fit_hull), not faces.
    """
    if path.lower().endswith(".obj"):
        vs = []
        with open(path, "r", errors="ignore") as f:
            for line in f:
                if line.startswith("v "):
                    vs.append([float(t) for t in line.split()[1:4]])
        return np.asarray(vs, np.float64)
    with open(path, "rb") as f:
        head = f.read(80)
        if head[:5] == b"solid":
            f.seek(0)
            txt = f.read().decode(errors="ignore")
            vs = []
            for line in txt.splitlines():
                t = line.split()
                if len(t) >= 4 and t[0] == "vertex":
                    vs.append([float(x) for x in t[1:4]])
            if vs:
                return np.asarray(vs, np.float64)
            f.seek(80)
        n = int.from_bytes(f.read(4), "little")
        data = np.frombuffer(f.read(n * 50), dtype=np.uint8)
        tri = data.reshape(n, 50)[:, :48].copy().view(np.float32).reshape(n, 12)
        return tri[:, 3:12].reshape(-1, 3).astype(np.float64)


def resolve_package_uri(uri: str, package_map: dict) -> str:
    """Resolve a ROS ``package://pkg/rel/path`` URI via a pkg -> dir map."""
    if uri.startswith("package://"):
        rest = uri[len("package://"):]
        pkg, _, rel = rest.partition("/")
        if pkg not in package_map:
            raise ValueError(f"unknown package {pkg!r} in mesh uri {uri!r};"
                             f" known: {sorted(package_map)}")
        return f"{package_map[pkg]}/{rel}"
    return uri


def ingest_model_meshes(model, package_map: dict, max_verts: int = 32):
    """Convert every raw mesh collision geometry of a RobotModel into a
    convex hull (in place; returns the model).

    The reference decomposes concave meshes with V-HACD offline and loads
    them through tesseract (SURVEY §2.6); here the vertex cloud is hull-ed
    and reduced to ``max_verts`` support points for the differentiable
    support-mapping kernel.  Scene URDFs with package:// mesh URIs resolve
    through ``package_map`` (pkg name -> directory).
    """
    import dataclasses as _dc

    for lname, geoms in model.geoms.items():
        for i, g in enumerate(geoms):
            if g.kind == "mesh" and g.verts is None and g.mesh_file:
                path = resolve_package_uri(g.mesh_file, package_map)
                verts = load_mesh_vertices(path)
                if verts.size == 0:
                    raise ValueError(f"no vertices in mesh {path}")
                hv = convex_hull_vertices(verts, max_verts)
                geoms[i] = _dc.replace(g, kind="convex",
                                       size=np.array([0.0]), verts=hv)
    return model
