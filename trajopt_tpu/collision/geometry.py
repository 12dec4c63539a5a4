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


def _seg_param(a, b, p):
    """Clamped parameter t of the closest point to p on segment [a, b]."""
    d = b - a
    t = jnp.dot(p - a, d) / jnp.maximum(jnp.dot(d, d), _EPS)
    return jnp.clip(t, 0.0, 1.0)


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


def _seg_seg_params(a1, b1, a2, b2):
    """Clamped (s, t) parameters of the closest points on two segments
    (same recurrence as ``_seg_seg_closest``)."""
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
    return s, t_cl


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
    Design: instead of GJK's divergent simplex cases, the distance is the
    MAX SEPARATION over a fixed direction set — the 26 box-lattice
    directions plus the (stop-gradient) Frank–Wolfe closest-point
    direction.  For each direction u, sep(u) = min_b u·b − max_a u·a is a
    valid signed lower bound (positive gap when separated, −depth when
    penetrating), so the max over directions is

      * ONE branch-free formula, continuous through contact (the old
        gap/depth branch jumped at the switch and failed FD checks);
      * CONSERVATIVE: it never over-reports clearance.  The previous
        formulation returned the FW primal gap ‖p₁−p₂‖, an UPPER bound
        that over-estimates by O(1/iters) exactly in the flat face-face
        cases where FW zigzags — FD checks at parallel-face
        configurations measured ~30% value error at 24 iterations;
      * EXACT whenever the true contact normal is in the set — the FW
        *direction* converges much faster than the FW witness points, and
        flat contacts (where the 26-cover may miss) are precisely where
        FW's direction is best;
      * two (n_verts, 28) support matmuls — MXU-friendly, vmappable.

    Gradients: autodiff of max/min over support values picks the active
    vertices with weight ±u — the reference's contact-normal gradient
    (envelope theorem; the FW weights carry a zero tangent,
    ``_fw_weights_jvp``).

    ``V*`` may be padded with repeated vertices (padding never wins an
    argmax tie in a harmful way: support values are identical).
    """
    l1, l2 = _fw_weights(V1, V2, iters)
    p = l1 @ V1 - l2 @ V2
    # deep penetration drives p -> 0: the direction is then meaningless
    # (and a zero vector would fake sep = 0), so fall back to a cover
    # direction — a harmless duplicate in the max
    pn = _safe_norm(p)
    n = jax.lax.stop_gradient(jnp.where(
        pn > 1e-9, p / jnp.maximum(pn, _EPS),
        jnp.asarray(_PEN_DIRS[0], V1.dtype)))
    U0 = jnp.concatenate(
        [jnp.asarray(_PEN_DIRS, V1.dtype), n[None, :], -n[None, :]], axis=0)
    V1c = jax.lax.stop_gradient(V1)
    V2c = jax.lax.stop_gradient(V2)

    # direction polish: sep(u) = min u.b - max u.a is CONCAVE in u with
    # supergradient (b* - a*); a few projected-ascent steps from the best
    # cover/FW direction tighten the lower bound to near-exact on general
    # hulls (the cover is exact only for lattice-aligned contacts, and the
    # FW direction carries O(1/iters) residual).  All on stop-gradient
    # vertices — the polished direction is data, not a differentiation path.
    def _sep_c(u):
        return jnp.min(V2c @ u) - jnp.max(V1c @ u)

    sep0 = jnp.min(V2c @ U0.T, axis=0) - jnp.max(V1c @ U0.T, axis=0)
    u = U0[jnp.argmax(sep0)]
    best_u = u
    best_sep = jnp.max(sep0)
    for t in (0.5, 0.25, 0.12, 0.06, 0.03, 0.015):
        a_star = V1c[jnp.argmax(V1c @ u)]
        b_star = V2c[jnp.argmin(V2c @ u)]
        g = b_star - a_star
        u = u + t * g / jnp.maximum(_safe_norm(g), _EPS)
        u = u / jnp.maximum(_safe_norm(u), _EPS)
        s = _sep_c(u)
        better = s > best_sep
        best_u = jnp.where(better, u, best_u)
        best_sep = jnp.where(better, s, best_sep)

    U = jnp.concatenate([U0, best_u[None, :]], axis=0)
    # separation along u: (closest face of B above) - (farthest of A below).
    # The winning direction and its argmax/argmin vertex picks are frozen
    # and the value returned as the witness-linear form u*.V2[j*] -
    # u*.V1[i*]: identical value and the same (single-pick) gradient as
    # autodiff through max/min, but the jacfwd tangents touch two dot
    # products instead of the whole (n_verts, 28) support grids
    S1 = V1c @ U.T  # (n1, n_dirs)
    S2 = V2c @ U.T
    sep = jnp.min(S2, axis=0) - jnp.max(S1, axis=0)
    ks = jnp.argmax(sep)
    us = jax.lax.stop_gradient(U[ks])
    # near-tied support vertices share the witness weight equally: a face
    # contact's gradient acts at the face CENTROID, matching autodiff's
    # tie-splitting reduce-max gradient (a corner pick degrades the SQP
    # model on axis-aligned scenes — measured as a lost rail lane)
    s1 = S1[:, ks]
    s2 = S2[:, ks]
    tol1 = 1e-6 * (1.0 + jnp.abs(jnp.max(s1)))
    tol2 = 1e-6 * (1.0 + jnp.abs(jnp.min(s2)))
    a1 = (s1 >= jnp.max(s1) - tol1).astype(V1.dtype)
    a2 = (s2 <= jnp.min(s2) + tol2).astype(V1.dtype)
    W1 = jax.lax.stop_gradient(a1 / jnp.sum(a1))
    W2 = jax.lax.stop_gradient(a2 / jnp.sum(a2))
    return (W2 @ V2) @ us - (W1 @ V1) @ us - (r1 + r2)


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


# ---------------------------------------------------------------------------
# Feature-enumeration exact distance for SMALL polytopes (the cast hot path)
# ---------------------------------------------------------------------------
#
# The hull-of-two-poses cast (d_convex_convex) runs a 24-step Frank-Wolfe
# scan per pair x segment x gap x lane — a sequential loop that dominated
# the flagship convexify/evaluate wall (~80%).  For the vertex sets the
# cast actually sees (two-pose capsules = 4 verts, static capsules = 2,
# static boxes = 8), the closest pair of two DISJOINT convex polytopes is
# attained at (vertex, face), (edge, edge), (vertex, edge) or
# (vertex, vertex) features, ALL of which are enumerable with *static*
# index arrays: the minimum over every edge-edge segment distance and every
# vertex-triangle distance IS the exact polytope distance — zero
# iterations, one fused kernel, trivially vmappable.  Separation is decided
# exactly by the supporting-plane test on the witness direction (two convex
# sets are disjoint iff the plane normal to the closest-pair direction
# separates their vertex sets); penetration depth reuses the 26-direction
# support cover of d_convex_convex.  This replaces FW wherever the
# topology is known statically; CONVEX meshes and rotating two-pose boxes
# keep the FW path.


def _point_tri_closest(p, a, b, c):
    """Closest point on triangle abc to p (Ericson RTCD 5.1.5, branchless
    where-cascade).  Degenerate (collinear) triangles resolve to vertex /
    edge regions, whose distances the edge-edge candidates cover anyway."""
    ab = b - a
    ac = c - a
    ap = p - a
    d1 = jnp.dot(ab, ap)
    d2 = jnp.dot(ac, ap)
    bp = p - b
    d3 = jnp.dot(ab, bp)
    d4 = jnp.dot(ac, bp)
    cp = p - c
    d5 = jnp.dot(ab, cp)
    d6 = jnp.dot(ac, cp)
    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2

    denom_face = va + vb + vc
    face_ok = jnp.abs(denom_face) > _EPS
    v = jnp.where(face_ok, vb / jnp.where(face_ok, denom_face, 1.0), 0.0)
    w = jnp.where(face_ok, vc / jnp.where(face_ok, denom_face, 1.0), 0.0)
    q = a + v * ab + w * ac  # interior-face projection (default)

    # edge regions (overwrite in increasing priority)
    w_bc = jnp.clip((d4 - d3) / jnp.maximum((d4 - d3) + (d5 - d6), _EPS),
                    0.0, 1.0)
    q = jnp.where((va <= 0) & (d4 - d3 >= 0) & (d5 - d6 >= 0),
                  b + w_bc * (c - b), q)
    w_ac = jnp.clip(d2 / jnp.maximum(d2 - d6, _EPS), 0.0, 1.0)
    q = jnp.where((vb <= 0) & (d2 >= 0) & (d6 <= 0), a + w_ac * ac, q)
    v_ab = jnp.clip(d1 / jnp.maximum(d1 - d3, _EPS), 0.0, 1.0)
    q = jnp.where((vc <= 0) & (d1 >= 0) & (d3 <= 0), a + v_ab * ab, q)
    # vertex regions
    q = jnp.where((d6 >= 0) & (d5 <= d6), c, q)
    q = jnp.where((d3 >= 0) & (d4 <= d3), b, q)
    q = jnp.where((d1 <= 0) & (d2 <= 0), a, q)
    return q


def _point_tri_bary(p, a, b, c):
    """Barycentric (v, w) of the closest point on triangle abc to p —
    the same region cascade as ``_point_tri_closest`` carried as weights
    (closest point = a + v*(b-a) + w*(c-a))."""
    ab = b - a
    ac = c - a
    ap = p - a
    d1 = jnp.dot(ab, ap)
    d2 = jnp.dot(ac, ap)
    bp = p - b
    d3 = jnp.dot(ab, bp)
    d4 = jnp.dot(ac, bp)
    cp = p - c
    d5 = jnp.dot(ab, cp)
    d6 = jnp.dot(ac, cp)
    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2
    denom_face = va + vb + vc
    face_ok = jnp.abs(denom_face) > _EPS
    v = jnp.where(face_ok, vb / jnp.where(face_ok, denom_face, 1.0), 0.0)
    w = jnp.where(face_ok, vc / jnp.where(face_ok, denom_face, 1.0), 0.0)
    w_bc = jnp.clip((d4 - d3) / jnp.maximum((d4 - d3) + (d5 - d6), _EPS),
                    0.0, 1.0)
    m = (va <= 0) & (d4 - d3 >= 0) & (d5 - d6 >= 0)
    v = jnp.where(m, 1.0 - w_bc, v)
    w = jnp.where(m, w_bc, w)
    w_ac = jnp.clip(d2 / jnp.maximum(d2 - d6, _EPS), 0.0, 1.0)
    m = (vb <= 0) & (d2 >= 0) & (d6 <= 0)
    v = jnp.where(m, 0.0, v)
    w = jnp.where(m, w_ac, w)
    v_ab = jnp.clip(d1 / jnp.maximum(d1 - d3, _EPS), 0.0, 1.0)
    m = (vc <= 0) & (d1 >= 0) & (d3 <= 0)
    v = jnp.where(m, v_ab, v)
    w = jnp.where(m, 0.0, w)
    m = (d6 >= 0) & (d5 <= d6)
    v = jnp.where(m, 0.0, v)
    w = jnp.where(m, 1.0, w)
    m = (d3 >= 0) & (d4 <= d3)
    v = jnp.where(m, 1.0, v)
    w = jnp.where(m, 0.0, w)
    m = (d1 <= 0) & (d2 <= 0)
    v = jnp.where(m, 0.0, v)
    w = jnp.where(m, 0.0, w)
    return v, w


def generic_topology(n_verts: int):
    """(edges, tris) for an arbitrary small point cloud with UNKNOWN hull
    topology: all vertex pairs and all triples.  A sound superset of the
    true hull features (every candidate lies inside the hull so its
    distance only overestimates; the true closest features are included),
    which makes the feature-enumeration distance EXACT for general convex
    point clouds — the fix for the FW-path gradient inconsistency on
    non-lattice hulls (ADVICE r4: frozen-direction argmax places the whole
    gradient on ONE vertex where the true distance gradient distributes
    over the witness barycentrics)."""
    import itertools
    import numpy as _np
    if n_verts <= 2:
        return small_hull_topology(n_verts)
    E = _np.array(list(itertools.combinations(range(n_verts), 2)), _np.int32)
    T = _np.array(list(itertools.combinations(range(n_verts), 3)), _np.int32)
    return E, T


def small_hull_topology(n_verts: int):
    """(edges, tris) static index arrays for the cast's small vertex sets.

    n_verts 1/2: point / segment (no 2-faces); 4: two-pose capsule hull
    (all vertex pairs / triples — supersets of the true hull features are
    sound: every candidate lies inside the hull, so its distance can only
    overestimate, and the true closest features are included); 8: oriented
    box in ``box_vertices`` bit ordering (12 edges, 12 face triangles)."""
    import itertools
    import numpy as _np
    if n_verts == 1:
        return _np.zeros((1, 2), _np.int32), _np.zeros((0, 3), _np.int32)
    if n_verts == 2:
        return _np.array([[0, 1]], _np.int32), _np.zeros((0, 3), _np.int32)
    if n_verts == 4:
        E = _np.array(list(itertools.combinations(range(4), 2)), _np.int32)
        T = _np.array(list(itertools.combinations(range(4), 3)), _np.int32)
        return E, T
    if n_verts == 8:
        # box_vertices ordering: index bits (b0,b1,b2) = sign of (x,y,z)
        E = _np.array([(i, i ^ m) for i in range(8) for m in (1, 2, 4)
                       if i < (i ^ m)], _np.int32)
        T = []
        for bit in (1, 2, 4):
            lo = [m for m in (1, 2, 4) if m != bit]
            for val in (0, bit):
                q00, q01 = val, val | lo[1]
                q11, q10 = val | lo[0] | lo[1], val | lo[0]
                T.append((q00, q01, q11))
                T.append((q00, q11, q10))
        return E, _np.array(T, _np.int32)
    raise ValueError(f"no static topology for {n_verts} vertices")


def _seg_seg_d2_grid(A1, B1, A2, B2):
    """(e1, e2) squared distances between all edge pairs, in batched
    matmul + elementwise form (no per-pair closest-point materialization —
    the gather/concat form cost ~2.9 GB of HBM traffic per flagship
    collision primal; dot-product grids are three small matmuls that XLA
    fuses the clamp cascade into).  Same clamped Ericson recurrence as
    ``_seg_seg_closest``."""
    d1 = B1 - A1  # (e1, 3)
    d2 = B2 - A2  # (e2, 3)
    a = jnp.sum(d1 * d1, -1)  # (e1,)
    e = jnp.sum(d2 * d2, -1)  # (e2,)
    b = d1 @ d2.T  # (e1, e2)
    c = jnp.sum(d1 * A1, -1)[:, None] - d1 @ A2.T  # d1 . (a1 - a2)
    f = A1 @ d2.T - jnp.sum(d2 * A2, -1)[None, :]  # d2 . (a1 - a2)
    aa = a[:, None]
    ee = e[None, :]
    denom = aa * ee - b * b
    s = jnp.where(denom > _EPS,
                  jnp.clip((b * f - c * ee) / jnp.maximum(denom, _EPS),
                           0.0, 1.0), 0.0)
    t = (b * s + f) / jnp.maximum(ee, _EPS)
    t_cl = jnp.clip(t, 0.0, 1.0)
    s = jnp.clip((b * t_cl - c) / jnp.maximum(aa, _EPS), 0.0, 1.0)
    rr = (jnp.sum(A1 * A1, -1)[:, None] + jnp.sum(A2 * A2, -1)[None, :]
          - 2.0 * (A1 @ A2.T))
    # |r + s d1 - t d2|^2 expanded in the precomputed dot products
    return (rr + s * s * aa + t_cl * t_cl * ee
            + 2.0 * s * c - 2.0 * t_cl * f - 2.0 * s * t_cl * b)


def _point_tri_d2_grid(P, TA, TB, TC):
    """(n_p, n_t) squared point-triangle distances in matmul form.

    Identical region cascade to ``_point_tri_closest`` but carried as
    barycentric (v, w) pairs; the final distance is the quadratic
    |p - a - v ab - w ac|^2 in dot products."""
    ab = TB - TA  # (t, 3)
    ac = TC - TA
    d1 = P @ ab.T - jnp.sum(ab * TA, -1)[None, :]  # ab . (p - a)
    d2 = P @ ac.T - jnp.sum(ac * TA, -1)[None, :]
    d3 = P @ ab.T - jnp.sum(ab * TB, -1)[None, :]  # ab . (p - b)
    d4 = P @ ac.T - jnp.sum(ac * TB, -1)[None, :]
    d5 = P @ ab.T - jnp.sum(ab * TC, -1)[None, :]
    d6 = P @ ac.T - jnp.sum(ac * TC, -1)[None, :]
    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2

    denom_face = va + vb + vc
    face_ok = jnp.abs(denom_face) > _EPS
    v = jnp.where(face_ok, vb / jnp.where(face_ok, denom_face, 1.0), 0.0)
    w = jnp.where(face_ok, vc / jnp.where(face_ok, denom_face, 1.0), 0.0)
    # edge regions overwrite in the same priority order as the point form
    w_bc = jnp.clip((d4 - d3) / jnp.maximum((d4 - d3) + (d5 - d6), _EPS),
                    0.0, 1.0)
    m = (va <= 0) & (d4 - d3 >= 0) & (d5 - d6 >= 0)
    v = jnp.where(m, 1.0 - w_bc, v)
    w = jnp.where(m, w_bc, w)
    w_ac = jnp.clip(d2 / jnp.maximum(d2 - d6, _EPS), 0.0, 1.0)
    m = (vb <= 0) & (d2 >= 0) & (d6 <= 0)
    v = jnp.where(m, 0.0, v)
    w = jnp.where(m, w_ac, w)
    v_ab = jnp.clip(d1 / jnp.maximum(d1 - d3, _EPS), 0.0, 1.0)
    m = (vc <= 0) & (d1 >= 0) & (d3 <= 0)
    v = jnp.where(m, v_ab, v)
    w = jnp.where(m, 0.0, w)
    m = (d6 >= 0) & (d5 <= d6)  # vertex c
    v = jnp.where(m, 0.0, v)
    w = jnp.where(m, 1.0, w)
    m = (d3 >= 0) & (d4 <= d3)  # vertex b
    v = jnp.where(m, 1.0, v)
    w = jnp.where(m, 0.0, w)
    m = (d1 <= 0) & (d2 <= 0)  # vertex a
    v = jnp.where(m, 0.0, v)
    w = jnp.where(m, 0.0, w)

    pa2 = (jnp.sum(P * P, -1)[:, None] + jnp.sum(TA * TA, -1)[None, :]
           - 2.0 * (P @ TA.T))  # |p - a|^2
    abab = jnp.sum(ab * ab, -1)[None, :]
    acac = jnp.sum(ac * ac, -1)[None, :]
    abac = jnp.sum(ab * ac, -1)[None, :]
    return (pa2 + v * v * abab + w * w * acac
            - 2.0 * v * d1 - 2.0 * w * d2 + 2.0 * v * w * abac)


def make_feature_distance(n1: int, n2: int, topology=None):
    """Build the exact feature-enumeration signed distance for vertex-set
    sizes (n1, n2): ``fn(V1, r1, V2, r2) -> signed distance`` between
    conv(V1)⊕r1 and conv(V2)⊕r2.  Replaces d_convex_convex on the cast hot
    path for statically-known small topologies (see module note above).
    ``topology`` (default ``small_hull_topology``) maps a vertex count to
    (edges, tris) index arrays — pass ``generic_topology`` for arbitrary
    point clouds with unknown hull structure.

    Autodiff cost: the full candidate sweep + argmin runs on
    ``stop_gradient``-ed vertices (zero tangents — XLA dead-code-eliminates
    it from every Jacobian column); only the WINNING candidate's closed form
    is recomputed differentiably, so each tangent pays one segseg or one
    point-tri, not the whole enumeration (the same envelope treatment as
    the FW path's ``_fw_weights`` custom_jvp).

    HBM cost: the sweep computes squared distances ONLY, via dot-product
    grids (``_seg_seg_d2_grid`` / ``_point_tri_d2_grid``) — matmuls plus a
    fusable clamp cascade, never per-candidate closest points."""
    import numpy as _np
    topo = topology or small_hull_topology
    E1, T1 = topo(n1)
    E2, T2 = topo(n2)
    U = _PEN_DIRS  # (26,3) numpy; lifted per call

    # static candidate -> feature-index tables (flat candidate order below:
    # [ee block | v1-t2 block | v2-t1 block])
    ct, ia, ib = [], [], []
    for i in range(len(E1)):
        for j in range(len(E2)):
            ct.append(0), ia.append(i), ib.append(j)
    for i in range(n1):
        for j in range(len(T2)):
            ct.append(1), ia.append(i), ib.append(j)
    for i in range(n2):
        for j in range(len(T1)):
            ct.append(2), ia.append(i), ib.append(j)
    # index tables stay NUMPY in the closure (a cached fn may be invoked
    # inside a different trace than the one that built it; jnp constants
    # created mid-trace would leak as tracers) — lifted per call below
    CTn = _np.array(ct, _np.int32)
    IAn = _np.array(ia, _np.int32)
    IBn = _np.array(ib, _np.int32)
    E1n, T1n = _np.asarray(E1), _np.asarray(T1.reshape(-1, 3))
    E2n, T2n = _np.asarray(E2), _np.asarray(T2.reshape(-1, 3))

    def _candidate_d2(V1, V2):
        A1, B1 = V1[E1[:, 0]], V1[E1[:, 1]]  # (e1,3)
        A2, B2 = V2[E2[:, 0]], V2[E2[:, 1]]  # (e2,3)
        ds = [_seg_seg_d2_grid(A1, B1, A2, B2).reshape(-1)]
        if len(T2):
            ds.append(_point_tri_d2_grid(
                V1, V2[T2[:, 0]], V2[T2[:, 1]], V2[T2[:, 2]]).reshape(-1))
        if len(T1):
            ds.append(_point_tri_d2_grid(
                V2, V1[T1[:, 0]], V1[T1[:, 1]], V1[T1[:, 2]]).reshape(-1))
        return jnp.concatenate(ds, 0)

    def fn(V1, r1, V2, r2):
        """Witness-linear form: EVERY discrete decision (candidate argmin,
        closest-feature parameters, separation predicate, penetration-cover
        winner) runs on stop-gradient data, and the returned value is the
        frozen-witness linear functional

            d = W2.(V2 @ n) - W1.(V1 @ n) - (r1 + r2)

        with (W1, W2, n) the witness barycentric weights and contact
        direction.  By the envelope theorem this has EXACTLY the value and
        gradient of the feature-enumeration distance (the witnesses are
        minimizers; FD-consistency is tested on random hulls), while the
        differentiable graph collapses to two tiny contractions — the
        round-5 profile showed the previous differentiable winner-recompute
        + differentiable depth cover recomputed per jacfwd tangent at
        ~26x the necessary work (the dominant convexify fusions)."""
        dt = V1.dtype
        CT, IA, IB = jnp.asarray(CTn), jnp.asarray(IAn), jnp.asarray(IBn)
        E1j, T1j = jnp.asarray(E1n), jnp.asarray(T1n)
        E2j, T2j = jnp.asarray(E2n), jnp.asarray(T2n)
        V1c = jax.lax.stop_gradient(V1)
        V2c = jax.lax.stop_gradient(V2)
        d2 = _candidate_d2(V1c, V2c)
        k = jnp.argmin(d2)
        ck, ak, bk = CT[k], IA[k], IB[k]

        # winner witness weights over the full vertex sets (frozen data).
        # One-hot placement is mask arithmetic, NOT scatter: (iota == idx)
        # masks fuse into the surrounding elementwise chain, while .at[]
        # scatters each lower to a standalone kernel (+17 ms/call on the
        # flagship primal when this ran as scatters)
        i1 = jnp.arange(n1)
        i2 = jnp.arange(n2)

        def oh(iota, idx, val):
            return (iota == idx).astype(dt) * val

        e1 = E1j[jnp.where(ck == 0, ak, jnp.where(ck == 2, bk, 0))]
        e2 = E2j[jnp.where(ck == 0, bk, 0)]
        s, t = _seg_seg_params(V1c[e1[0]], V1c[e1[1]],
                               V2c[e2[0]], V2c[e2[1]])
        W1 = oh(i1, e1[0], 1.0 - s) + oh(i1, e1[1], s)
        W2 = oh(i2, e2[0], 1.0 - t) + oh(i2, e2[1], t)
        if len(T2):
            t2 = T2j[jnp.where(ck == 1, bk, 0)]
            v1i = jnp.where(ck == 1, ak, 0)
            v, w = _point_tri_bary(V1c[v1i], V2c[t2[0]], V2c[t2[1]],
                                   V2c[t2[2]])
            is_vt = ck == 1
            W1 = jnp.where(is_vt, oh(i1, v1i, 1.0), W1)
            W2 = jnp.where(
                is_vt,
                oh(i2, t2[0], 1.0 - v - w) + oh(i2, t2[1], v)
                + oh(i2, t2[2], w), W2)
        if len(T1):
            t1 = T1j[jnp.where(ck == 2, bk, 0)]
            v2i = jnp.where(ck == 2, ak, 0)
            v, w = _point_tri_bary(V2c[v2i], V1c[t1[0]], V1c[t1[1]],
                                   V1c[t1[2]])
            is_tv = ck == 2
            W2 = jnp.where(is_tv, oh(i2, v2i, 1.0), W2)
            W1 = jnp.where(
                is_tv,
                oh(i1, t1[0], 1.0 - v - w) + oh(i1, t1[1], v)
                + oh(i1, t1[2], w), W1)
        p_c = W1 @ V1c
        q_c = W2 @ V2c
        gap_c = _safe_norm(q_c - p_c)
        n = (q_c - p_c) / jnp.maximum(gap_c, _EPS)

        # exact separation predicate: the plane normal to the closest-pair
        # direction must separate the vertex sets (supporting-plane
        # property of the true closest pair)
        margin = jnp.min(V2c @ n) - jnp.max(V1c @ n)
        sep = (gap_c > jnp.asarray(1e-6, dt)) & \
            (margin > jnp.asarray(-1e-6, dt) * jnp.maximum(gap_c, 1.0))

        # penetration depth: 26-direction support cover winner (frozen) —
        # -depth = u*.V2[j*] - u*.V1[i*], a single-vertex witness pair
        Ud = jnp.asarray(U, dt)
        S1 = V1c @ Ud.T  # (n1, 26)
        S2 = V2c @ Ud.T
        h = jnp.max(S1, axis=0) - jnp.min(S2, axis=0)
        kd = jnp.argmin(h)
        # near-tied support vertices share the witness weight equally (face
        # contacts act at the face centroid — the tie-splitting gradient
        # autodiff's reduce-max used to give on axis-aligned geometry)
        s1 = S1[:, kd]
        s2 = S2[:, kd]
        tol1 = 1e-6 * (1.0 + jnp.abs(jnp.max(s1)))
        tol2 = 1e-6 * (1.0 + jnp.abs(jnp.min(s2)))
        a1 = (s1 >= jnp.max(s1) - tol1).astype(dt)
        a2 = (s2 <= jnp.min(s2) + tol2).astype(dt)

        nf = jax.lax.stop_gradient(jnp.where(sep, n, Ud[kd]))
        W1f = jax.lax.stop_gradient(jnp.where(sep, W1, a1 / jnp.sum(a1)))
        W2f = jax.lax.stop_gradient(jnp.where(sep, W2, a2 / jnp.sum(a2)))
        return W2f @ (V2 @ nf) - W1f @ (V1 @ nf) - (r1 + r2)

    return fn


# feature-distance cache for the generic-topology (point cloud) path
_GENERIC_FEATURE_CACHE: dict = {}

# above this vertex count the all-pairs/all-triples candidate grid
# (~n^4/4 entries) stops being worth it and the FW path takes over
GENERIC_FEATURE_MAX_VERTS = 12


def d_convex_auto(V1, r1, V2, r2):
    """Exact feature-enumeration distance for small convex point clouds,
    FW max-separation fallback for larger ones.

    Vertex counts are static at trace time, so the dispatch is plain
    Python.  The generic topology (all pairs + all triples) makes the
    enumeration exact for ARBITRARY point clouds — no hull-topology
    assumption — with FD-consistent witness-linear gradients (the ADVICE
    r4 fix; d_convex_convex's polished-direction gradients carry O(1)
    error at feature contacts on general hulls)."""
    na, nb = V1.shape[0], V2.shape[0]
    if max(na, nb) <= GENERIC_FEATURE_MAX_VERTS:
        key = (na, nb)
        fn = _GENERIC_FEATURE_CACHE.get(key)
        if fn is None:
            fn = make_feature_distance(na, nb, topology=generic_topology)
            _GENERIC_FEATURE_CACHE[key] = fn
        return fn(V1, r1, V2, r2)
    return d_convex_convex(V1, r1, V2, r2)
