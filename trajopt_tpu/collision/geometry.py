"""Differentiable convex signed-distance functions (sphere/capsule/box).

TPU-native replacement for the narrow slice of tesseract's contact managers
(Bullet/FCL) that the reference consumes (SURVEY.md §1: "signed-distance
collision checking with contact points/normals", used at
trajopt/src/collision_terms.cpp:203-323).

Design decisions (TPU-first):
- *No witness-point plumbing*: every distance function is a smooth-enough
  pure jnp function of the geometry poses, so ``jacfwd`` through
  FK -> pose -> distance yields exactly the reference's contact-normal
  gradient  n . (J_pa - J_pb)  on smooth regions and a valid subgradient at
  clamps/argmax picks — no hand-built jacobianChangeRefPoint chain.
- Signed inside/outside: penetration returns negative distance (box SDF is
  exact inside; box-box uses SAT depth), which the hinge terms need.
- Static shapes only; `where`-guards instead of branches.

Conventions: boxes are (center, rotation, half-extents); capsules are
(endpoint a, endpoint b, radius); spheres (center, radius).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_EPS = 1e-12


def _safe_norm(v):
    """norm with a well-defined (zero) gradient at v = 0.

    Exact coincidence happens in practice (straight-line inits through an
    obstacle center); plain ``jnp.linalg.norm`` back-propagates NaN there,
    which poisons the whole QP.  The double-``where`` keeps the value exact
    and the gradient zero (a valid subgradient) at v = 0.
    """
    d2 = jnp.sum(v * v)
    pos = d2 > 0
    return jnp.where(pos, jnp.sqrt(jnp.where(pos, d2, 1.0)), 0.0)


def d_sphere_sphere(c1, r1, c2, r2):
    return _safe_norm(c1 - c2) - (r1 + r2)


def _closest_on_segment(a, b, p):
    """Closest point to p on segment [a, b] (differentiable via clamp)."""
    d = b - a
    t = jnp.dot(p - a, d) / jnp.maximum(jnp.dot(d, d), _EPS)
    return a + jnp.clip(t, 0.0, 1.0) * d


def d_sphere_capsule(c, r, a, b, rc):
    p = _closest_on_segment(a, b, c)
    return _safe_norm(c - p) - (r + rc)


def _seg_seg_closest(a1, b1, a2, b2):
    """Closest points on two segments (Ericson, clamped; parallel-safe)."""
    d1 = b1 - a1
    d2 = b2 - a2
    r = a1 - a2
    a = jnp.dot(d1, d1)
    e = jnp.dot(d2, d2)
    f = jnp.dot(d2, r)
    c = jnp.dot(d1, r)
    b = jnp.dot(d1, d2)
    denom = a * e - b * b
    s = jnp.where(denom > _EPS, jnp.clip((b * f - c * e) / jnp.maximum(denom, _EPS), 0.0, 1.0), 0.0)
    t = (b * s + f) / jnp.maximum(e, _EPS)
    t_cl = jnp.clip(t, 0.0, 1.0)
    s = jnp.clip((b * t_cl - c) / jnp.maximum(a, _EPS), 0.0, 1.0)
    p1 = a1 + s * d1
    p2 = a2 + t_cl * d2
    return p1, p2


def d_capsule_capsule(a1, b1, r1, a2, b2, r2):
    p1, p2 = _seg_seg_closest(a1, b1, a2, b2)
    return _safe_norm(p1 - p2) - (r1 + r2)


def sdf_box_point(p, bc, bR, bh):
    """Exact signed distance of a point to an oriented box."""
    local = bR.T @ (p - bc)
    q = jnp.abs(local) - bh
    outside = _safe_norm(jnp.maximum(q, 0.0))
    inside = jnp.minimum(jnp.max(q), 0.0)
    return outside + inside


def d_sphere_box(c, r, bc, bR, bh):
    return sdf_box_point(c, bc, bR, bh) - r


def d_capsule_box(a, b, r, bc, bR, bh, iters: int = 12):
    """Capsule vs box by alternating projection segment<->box.

    Converges for separated convex sets; for penetration the final point's
    interior SDF gives a usable depth.  ``iters`` is static.
    """
    local_a = bR.T @ (a - bc)
    local_b = bR.T @ (b - bc)

    def clamp_box(p):
        return jnp.clip(p, -bh, bh)

    s = 0.5
    for _ in range(iters):
        p_seg = local_a + s * (local_b - local_a)
        p_box = clamp_box(p_seg)
        d = local_b - local_a
        s = jnp.clip(jnp.dot(p_box - local_a, d) /
                     jnp.maximum(jnp.dot(d, d), _EPS), 0.0, 1.0)
    p_seg = local_a + s * (local_b - local_a)
    q = jnp.abs(p_seg) - bh
    outside = _safe_norm(jnp.maximum(q, 0.0))
    inside = jnp.minimum(jnp.max(q), 0.0)
    return outside + inside - r


def box_vertices(c, R, h):
    """(8,3) world-space corners of an oriented box."""
    import itertools
    signs = jnp.asarray(list(itertools.product((-1.0, 1.0), repeat=3)))
    return c[None, :] + (signs * h[None, :]) @ R.T


# fixed direction set for penetration depth: the 26 box-lattice directions
# (faces + edges + corners), normalized — a bounded-error cover of S^2
def _make_dirs():
    import itertools
    ds = [d for d in itertools.product((-1.0, 0.0, 1.0), repeat=3)
          if any(d)]
    import numpy as _np
    ds = _np.asarray(ds)
    return ds / _np.linalg.norm(ds, axis=1, keepdims=True)


_PEN_DIRS = _make_dirs()


@partial(jax.custom_jvp, nondiff_argnums=(2,))
def _fw_weights(V1, V2, iters):
    """Frank–Wolfe witness weights for the closest-point pair of two hulls.

    Wrapped in custom_jvp with a ZERO tangent (envelope theorem: the
    optimal convex weights are treated as constants when differentiating
    the distance) so jacfwd never traces the 24-step scan — without this,
    every collision-Jacobian tangent replays the whole iteration, which
    dominated the flagship convexify wall.
    """
    n1 = V1.shape[0]
    n2 = V2.shape[0]
    l1 = jnp.zeros((n1,), V1.dtype).at[0].set(1.0)
    l2 = jnp.zeros((n2,), V2.dtype).at[0].set(1.0)

    def body(carry, _):
        l1, l2 = carry
        p = l1 @ V1 - l2 @ V2
        i1 = jnp.argmax(V1 @ (-p))
        i2 = jnp.argmax(V2 @ p)
        s = V1[i1] - V2[i2]
        dvec = s - p
        gamma = jnp.clip(-(p @ dvec) / jnp.maximum(dvec @ dvec, _EPS),
                         0.0, 1.0)
        e1 = jnp.zeros_like(l1).at[i1].set(1.0)
        e2 = jnp.zeros_like(l2).at[i2].set(1.0)
        return ((1 - gamma) * l1 + gamma * e1,
                (1 - gamma) * l2 + gamma * e2), None

    (l1, l2), _ = jax.lax.scan(body, (l1, l2), None, length=iters)
    return l1, l2


@_fw_weights.defjvp
def _fw_weights_jvp(iters, primals, tangents):
    out = _fw_weights(*primals, iters)
    return out, jax.tree.map(jnp.zeros_like, out)


def d_convex_convex(V1, r1, V2, r2, iters: int = 24):
    """Signed distance between convex hulls conv(V1)⊕r1 and conv(V2)⊕r2.

    The TPU-native support-mapping path for convex meshes (SURVEY.md §1:
    "support mapping GJK-style for convex meshes"; tesseract's
    Bullet/FCL GJK consumed at trajopt/src/collision_terms.cpp:203-323).
    Design: instead of GJK's divergent simplex cases, run fixed-iteration
    Frank–Wolfe on ½‖a−b‖² over the two hulls (every step = two support
    queries = two argmax matmuls — MXU-friendly, vmappable, static shapes).
    Witness convex weights are ``stop_gradient``-ed so autodiff applies the
    envelope theorem: d(dist)/d(verts) is exact at the optimum, matching the
    reference's contact-normal gradients.

    Penetration: FW drives the gap to 0; the signed depth is recovered as
    −min_u h_{A⊖B}(u) over the fixed 26-direction cover (a conservative,
    differentiable overestimate of depth — the hinge terms push outward).

    ``V*`` may be padded with repeated vertices (padding never wins an
    argmax tie in a harmful way: support values are identical).
    """
    l1, l2 = _fw_weights(V1, V2, iters)
    p1 = l1 @ V1
    p2 = l2 @ V2
    gap = _safe_norm(p1 - p2)

    U = jnp.asarray(_PEN_DIRS, V1.dtype)  # (26,3)
    # support of the Minkowski difference A − B per direction
    h = jnp.max(V1 @ U.T, axis=0) + jnp.max(-(V2 @ U.T), axis=0)
    depth = jnp.min(h)  # > 0 iff (approximately) penetrating

    sep = gap > 1e-6
    return jnp.where(sep, gap, -depth) - (r1 + r2)


def d_swept_box_box(c1a, c1b, R1, h1, c2, R2, h2):
    """Exact SAT distance between a *translating* box (pose R1 fixed, center
    sweeping c1a -> c1b) and a static box.

    The swept volume of a translating box is a zonotope with generators
    {R1 columns * h1, motion/2}; SAT over its face normals (pairwise
    generator crosses), the static box's face normals, and edge-cross axes
    is exact for convex polytopes.  This is the cast-collision analog of the
    reference's convex-hull-of-two-poses check (CastCollisionEvaluator) for
    prismatic-only motion.
    """
    mid = 0.5 * (c1a + c1b)
    m = 0.5 * (c1b - c1a)
    gens = [R1[:, 0] * h1[0], R1[:, 1] * h1[1], R1[:, 2] * h1[2], m]
    d = c2 - mid

    axes = [R2[:, 0], R2[:, 1], R2[:, 2]]
    for i in range(4):
        for j in range(i + 1, 4):
            axes.append(jnp.cross(gens[i], gens[j]))
    for i in range(4):
        for j in range(3):
            axes.append(jnp.cross(gens[i], R2[:, j]))

    seps = []
    for u in axes:
        n = jnp.linalg.norm(u)
        un = u / jnp.maximum(n, _EPS)
        valid = n > 1e-8
        rz = sum(jnp.abs(jnp.dot(un, g)) for g in gens)
        rb = (jnp.abs(h2[0] * jnp.dot(un, R2[:, 0])) +
              jnp.abs(h2[1] * jnp.dot(un, R2[:, 1])) +
              jnp.abs(h2[2] * jnp.dot(un, R2[:, 2])))
        sep = jnp.abs(jnp.dot(un, d)) - (rz + rb)
        seps.append(jnp.where(valid, sep, -jnp.inf))
    return jnp.max(jnp.stack(seps))


def d_box_box(c1, R1, h1, c2, R2, h2):
    """Separating-axis signed distance between oriented boxes.

    max over the 15 SAT axes of the per-axis separation; exact for
    face-contact separation and for penetration depth, a tight lower bound
    in edge-corner cases — the standard physics-engine treatment.
    """
    d = c2 - c1
    axes = [R1[:, 0], R1[:, 1], R1[:, 2], R2[:, 0], R2[:, 1], R2[:, 2]]
    for i in range(3):
        for j in range(3):
            cr = jnp.cross(R1[:, i], R2[:, j])
            n = jnp.linalg.norm(cr)
            # guard parallel edges: fall back to a face axis (zero weight via
            # sep -> -inf exclusion is wrong; instead keep axis but normalize
            # safely and mask degenerate axes out below)
            axes.append(jnp.where(n > 1e-8, cr / jnp.maximum(n, _EPS),
                                  jnp.zeros(3)))
    seps = []
    for u in axes:
        valid = jnp.dot(u, u) > 0.5
        ra = (jnp.abs(h1[0] * jnp.dot(u, R1[:, 0])) +
              jnp.abs(h1[1] * jnp.dot(u, R1[:, 1])) +
              jnp.abs(h1[2] * jnp.dot(u, R1[:, 2])))
        rb = (jnp.abs(h2[0] * jnp.dot(u, R2[:, 0])) +
              jnp.abs(h2[1] * jnp.dot(u, R2[:, 1])) +
              jnp.abs(h2[2] * jnp.dot(u, R2[:, 2])))
        sep = jnp.abs(jnp.dot(u, d)) - (ra + rb)
        seps.append(jnp.where(valid, sep, -jnp.inf))
    return jnp.max(jnp.stack(seps))
