"""Collision world: robot link geometries + candidate pairs + batched
distance evaluation.

The TPU analog of the reference's contact-manager setup
(``tesseract::collision::{Discrete,Continuous}ContactManager`` configured by
``TrajOptCollisionConfig``, trajopt_common/collision_types.h:124-163):
candidate geometry pairs are fixed at build time (static shapes), distances
are evaluated for *all* pairs every query — the vectorized replacement for
broad-phase culling, which at these pair counts is cheaper than divergence.

Pairs are grouped by (kind, kind) at build time; each group evaluates as ONE
vmapped kernel over stacked geometry arrays (compile-time and runtime win
over per-pair unrolling — the op count is per *type*, not per pair).

Swept ("cast") queries: sphere geometries get an *exact* swept-capsule
(the swept volume of a sphere between two poses is a capsule); translating
boxes (all-prismatic chains) get the exact zonotope SAT; everything else
uses a min over statically many interpolated substates — the analog of the
reference's LVS interpolation
(continuous_collision_evaluators.cpp:205-240) with the cc_time gradient
split emerging naturally from autodiff through the interpolation.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..kinematics.chain import Chain
from ..kinematics.urdf import RobotModel
from ..ops.lie import rpy_to_matrix
from . import geometry as G

SPHERE, CAPSULE, BOX, CONVEX = 0, 1, 2, 3


@dataclasses.dataclass(frozen=True, eq=False)
class GeomSpec:
    link: int
    kind: int
    off_R: np.ndarray  # (3,3)
    off_p: np.ndarray  # (3,)
    radius: float
    half: np.ndarray  # (3,) box half extents; capsule: half[2] = half-length
    name: str = ""
    # CONVEX: local-frame vertices (V,3); padded to the per-world max V by
    # repeating vertex 0 (padding is support-function-neutral)
    verts: Optional[np.ndarray] = None


# vmapped pair kernels over canonical world-space forms:
#   sphere: (c, r); capsule: (a, b, r); box: (c, R, h); convex: (Vw, r)
_KERNELS = {
    (SPHERE, SPHERE): jax.vmap(lambda A, B: G.d_sphere_sphere(A[0], A[1], B[0], B[1])),
    (SPHERE, CAPSULE): jax.vmap(lambda A, B: G.d_sphere_capsule(A[0], A[1], B[0], B[1], B[2])),
    (SPHERE, BOX): jax.vmap(lambda A, B: G.d_sphere_box(A[0], A[1], B[0], B[1], B[2])),
    (CAPSULE, CAPSULE): jax.vmap(lambda A, B: G.d_capsule_capsule(A[0], A[1], A[2], B[0], B[1], B[2])),
    (CAPSULE, BOX): jax.vmap(lambda A, B: G.d_capsule_box(A[0], A[1], A[2], B[0], B[1], B[2])),
    (BOX, BOX): jax.vmap(lambda A, B: G.d_box_box(A[0], A[1], A[2], B[0], B[1], B[2])),
    # support-mapping path: the sphere/capsule/box operand becomes a
    # (possibly radius-inflated) vertex set; small point clouds get the
    # exact generic feature enumeration (geometry.d_convex_auto)
    (SPHERE, CONVEX): jax.vmap(lambda A, B: G.d_convex_auto(
        A[0][None, :], A[1], B[0], B[1])),
    (CAPSULE, CONVEX): jax.vmap(lambda A, B: G.d_convex_auto(
        jnp.stack([A[0], A[1]]), A[2], B[0], B[1])),
    (BOX, CONVEX): jax.vmap(lambda A, B: G.d_convex_auto(
        G.box_vertices(A[0], A[1], A[2]), 0.0, B[0], B[1])),
    (CONVEX, CONVEX): jax.vmap(lambda A, B: G.d_convex_auto(
        A[0], A[1], B[0], B[1])),
}


@dataclasses.dataclass(frozen=True, eq=False)
class CollisionWorld:
    chain: Chain
    geoms: tuple  # tuple[GeomSpec]
    pairs: tuple  # tuple[(gi, gj)] — ordering groups by type pair
    # static per-kind geometry arrays (indices into geoms by kind)
    _kind_idx: dict  # kind -> np indices of geoms
    _groups: tuple  # ((ka, kb), np idx_a (into kind arrays), np idx_b, np pair_pos)

    @property
    def n_pairs(self) -> int:
        return len(self.pairs)

    def pair_names(self):
        return tuple(
            (self.geoms[i].name, self.geoms[j].name) for i, j in self.pairs)

    def pair_link_names(self):
        """Per-pair (link_name_i, link_name_j) — geometry names are
        "link/idx"; this strips the geometry index."""
        return tuple((a.split("/")[0], b.split("/")[0])
                     for a, b in self.pair_names())

    def pair_value_array(self, default, per_pair: Optional[dict] = None,
                         dtype=np.float64) -> np.ndarray:
        """(n_pairs,) array from a default + link-pair-name overrides.

        ``per_pair`` maps ("linkA", "linkB") (order-insensitive) or the
        string "linkA,linkB" to a value — the reference's
        ``CollisionCoeffData`` default + per-link-pair override
        (trajopt_common/collision_types.h:124-163).  Unknown link pairs
        raise (typos must not silently no-op).
        """
        out = np.full(self.n_pairs, float(default), dtype)
        if not per_pair:
            return out
        names = self.pair_link_names()
        keyed = {tuple(sorted(k.split(",") if isinstance(k, str) else k)): v
                 for k, v in per_pair.items()}
        known = {tuple(sorted(nm)) for nm in names}
        unknown = set(keyed) - known
        if unknown:
            raise ValueError(
                f"per-pair collision override names unknown pairs {sorted(unknown)};"
                f" known link pairs: {sorted(known)}")
        for k, (a, b) in enumerate(names):
            v = keyed.get(tuple(sorted((a, b))))
            if v is not None:
                out[k] = float(v)
        return out

    # ---------------- world-space canonical geometry, batched ----------------

    def _world_kind_arrays(self, R, p, dt):
        """Canonical world-space arrays per kind, from link poses (L,3,3),(L,3)."""
        out = {}
        for kind, idx in self._kind_idx.items():
            if len(idx) == 0:
                continue
            links = np.array([self.geoms[i].link for i in idx])
            offR = jnp.asarray(np.stack([self.geoms[i].off_R for i in idx]), dt)
            offp = jnp.asarray(np.stack([self.geoms[i].off_p for i in idx]), dt)
            Rl = R[links]  # (k,3,3)
            pl = p[links]
            c = jnp.einsum("kij,kj->ki", Rl, offp) + pl
            if kind == SPHERE:
                r = jnp.asarray([self.geoms[i].radius for i in idx], dt)
                out[kind] = (c, r)
            elif kind == CAPSULE:
                Rw = jnp.einsum("kij,kjl->kil", Rl, offR)
                hl = jnp.asarray([self.geoms[i].half[2] for i in idx], dt)
                axis = Rw[:, :, 2] * hl[:, None]
                r = jnp.asarray([self.geoms[i].radius for i in idx], dt)
                out[kind] = (c - axis, c + axis, r)
            elif kind == BOX:
                Rw = jnp.einsum("kij,kjl->kil", Rl, offR)
                h = jnp.asarray(np.stack([self.geoms[i].half for i in idx]), dt)
                out[kind] = (c, Rw, h)
            else:  # CONVEX: world vertices (k, V, 3) + sweep radius
                Rw = jnp.einsum("kij,kjl->kil", Rl, offR)
                Vl = jnp.asarray(
                    np.stack([self.geoms[i].verts for i in idx]), dt)
                Vw = jnp.einsum("kij,kvj->kvi", Rw, Vl) + c[:, None, :]
                r = jnp.asarray([self.geoms[i].radius for i in idx], dt)
                out[kind] = (Vw, r)
        return out

    @staticmethod
    def _take(world_kind, kind, sel):
        return tuple(w[sel] for w in world_kind[kind])

    # ---------------- queries ----------------

    def pair_distances(self, q: jax.Array) -> jax.Array:
        """(n_pairs,) signed distances at configuration q."""
        R, p = self.chain.fk(q)
        return self._pair_distances_from_poses(R, p, q.dtype)

    def _pair_distances_from_poses(self, R, p, dt) -> jax.Array:
        wk = self._world_kind_arrays(R, p, dt)
        out = jnp.zeros((self.n_pairs,), dt)
        for (ka, kb), ia, ib, pos in self._groups:
            A = self._take(wk, ka, ia)
            B = self._take(wk, kb, ib)
            d = _KERNELS[(ka, kb)](A, B)
            out = out.at[pos].set(d)
        return out

    def cast_pair_distances_sub(self, qa: jax.Array, qb: jax.Array,
                                n_sub: int = 8) -> jax.Array:
        """(n_sub, n_pairs) discrete distances at interpolated substates —
        the reference's LVS evaluation (one contact set per substate,
        continuous_collision_evaluators.cpp:205-240).  Gradients through
        the interpolation give the cc_time endpoint split automatically."""
        ss = jnp.linspace(0.0, 1.0, n_sub)
        return jax.vmap(
            lambda s: self.pair_distances(qa + s * (qb - qa)))(ss)

    def cast_pair_distances_seg(self, qa: jax.Array, qb: jax.Array,
                                n_sub: int = 8) -> jax.Array:
        """(n_sub - 1, n_pairs) swept distances over consecutive substate
        SEGMENTS of the motion qa -> qb — the reference's LVS_CONTINUOUS
        lowering (cast contact check per interpolated segment,
        continuous_collision_evaluators.cpp:171-240).  Each segment uses
        the exact sweep kernels where available (spheres -> capsules,
        translating boxes -> zonotope SAT), so between-substate tunneling
        is bounded by the exact cases and the segment length.

        FK and the discrete pair kernels run ONCE per substate (each
        interior substate is shared by two segments); only the exact-sweep
        overrides are per segment.
        """
        dt = qa.dtype
        ss = jnp.linspace(0.0, 1.0, n_sub).astype(dt)
        qs = qa[None, :] + ss[:, None] * (qb - qa)[None, :]
        Rs, ps = jax.vmap(self.chain.fk)(qs)  # (n_sub, L, 3, 3/3)
        wks = jax.vmap(
            lambda R, p: self._world_kind_arrays(R, p, dt))(Rs, ps)
        sub_d = jax.vmap(
            lambda R, p: self._pair_distances_from_poses(R, p, dt))(Rs, ps)
        d_min = jnp.minimum(sub_d[:-1], sub_d[1:])  # (n_seg, P)
        wa = jax.tree.map(lambda x: x[:-1], wks)
        wb = jax.tree.map(lambda x: x[1:], wks)
        return jax.vmap(self._exact_sweep_overrides)(wa, wb, d_min)

    def cast_pair_distances(self, qa: jax.Array, qb: jax.Array,
                            n_sub: int = 8) -> jax.Array:
        """(n_pairs,) swept distances over the motion qa -> qb.

        Exact for moving spheres (swept capsule) and translating boxes
        (zonotope SAT); LVS substate-min otherwise.
        """
        dt = qa.dtype
        Ra, pa = self.chain.fk(qa)
        Rb, pb = self.chain.fk(qb)

        sub_d = self.cast_pair_distances_sub(qa, qb, n_sub)
        d_min = jnp.min(sub_d, axis=0)  # (n_pairs,)

        wa = self._world_kind_arrays(Ra, pa, dt)
        wb = self._world_kind_arrays(Rb, pb, dt)
        return self._exact_sweep_overrides(wa, wb, d_min)

    def _vert_sets(self, wk, kind, sel, wk_b=None):
        """Support vertex set + radius for geometries ``sel`` of ``kind``
        from world-kind arrays: (verts (k, V, 3), radius (k,)).  With
        ``wk_b`` given, returns the TWO-POSE stacked set — the support set
        of conv(A(qa) ∪ A(qb)), the reference cast's swept-volume convex
        hull (collision_terms.cpp:1362-1365): support(conv(A∪B), u) =
        max(support(A,u), support(B,u)), i.e. just the stacked vertices."""
        def one(w):
            A = self._take(w, kind, sel)
            if kind == SPHERE:
                return A[0][:, None, :], A[1]
            if kind == CAPSULE:
                return jnp.stack([A[0], A[1]], axis=1), A[2]
            if kind == BOX:
                return jax.vmap(G.box_vertices)(A[0], A[1], A[2]), \
                    jnp.zeros(A[0].shape[0], A[0].dtype)
            return A[0], A[1]

        Va, r = one(wk)
        if wk_b is None:
            return Va, r
        Vb, _ = one(wk_b)
        return jnp.concatenate([Va, Vb], axis=1), r

    def _exact_sweep_overrides(self, wa, wb, d_min) -> jax.Array:
        """Replace the substate-min distance with the swept distance over
        the motion for every pair with a moving side:

        * moving sphere vs static geometry: EXACT (the swept volume of a
          sphere is a capsule) — dedicated capsule kernels;
        * translating box vs static box: EXACT zonotope SAT;
        * everything else: the reference's cast semantics — signed distance
          to the CONVEX HULL OF THE TWO POSES (CastCollisionEvaluator,
          collision_terms.cpp:1362-1365; Schulman et al. RSS 2013 §4's
          swept-volume approximation), via stacked support vertex sets.
          Hull-of-poses equals the true sweep for translations; rotation
          error is bounded by the per-segment subdivision exactly as in
          the reference's LVS pipeline.

        ``wa``/``wb`` are the canonical world-kind arrays at the motion
        endpoints."""
        moving = self.chain.ancestor.any(axis=1)
        translation_only = not bool(
            (np.asarray(self.chain.jtype)[np.asarray(self.chain.link_of_dof)]
             == 1).any()) if self.chain.n_dof else True
        kind_pos = {k: {g: i for i, g in enumerate(idx)}
                    for k, idx in self._kind_idx.items()}

        out = d_min
        # static case grouping
        sphere_cases = {}  # other_kind -> [(pair_pos, s_idx, o_idx)]
        boxbox_cases = []
        # hull-of-two-poses cast: (kind_a, kind_b, mov_a, mov_b) ->
        #   [(pair_pos, a_idx_in_kind, b_idx_in_kind)]
        hull_cases = {}
        for k, (i, j) in enumerate(self.pairs):
            gi, gj = self.geoms[i], self.geoms[j]
            if not (moving[gi.link] or moving[gj.link]):
                continue
            matched = False
            for a_idx, b_idx in ((i, j), (j, i)):
                a, b = self.geoms[a_idx], self.geoms[b_idx]
                if moving[b.link] or not moving[a.link]:
                    continue
                if a.kind == SPHERE:
                    sphere_cases.setdefault(b.kind, []).append(
                        (k, kind_pos[SPHERE][a_idx], kind_pos[b.kind][b_idx]))
                    matched = True
                    break
                if a.kind == BOX and b.kind == BOX and translation_only:
                    boxbox_cases.append(
                        (k, kind_pos[BOX][a_idx], kind_pos[BOX][b_idx]))
                    matched = True
                    break
            if matched:
                continue
            key = (gi.kind, gj.kind, bool(moving[gi.link]),
                   bool(moving[gj.link]))
            hull_cases.setdefault(key, []).append(
                (k, kind_pos[gi.kind][i], kind_pos[gj.kind][j]))

        for okind, cases in sphere_cases.items():
            pos = np.array([c[0] for c in cases])
            si = np.array([c[1] for c in cases])
            oi = np.array([c[2] for c in cases])
            ca = wa[SPHERE][0][si]
            cb = wb[SPHERE][0][si]
            r = wa[SPHERE][1][si]
            cap = (ca, cb, r)
            other = self._take(wa, okind, oi)
            if okind == SPHERE:
                d = jax.vmap(lambda A, B: G.d_sphere_capsule(
                    B[0], B[1], A[0], A[1], A[2]))(cap, other)
            elif okind == CAPSULE:
                d = jax.vmap(lambda A, B: G.d_capsule_capsule(
                    A[0], A[1], A[2], B[0], B[1], B[2]))(cap, other)
            elif okind == CONVEX:
                d = jax.vmap(lambda A, B: G.d_convex_convex(
                    jnp.stack([A[0], A[1]]), A[2], B[0], B[1]))(cap, other)
            else:
                d = jax.vmap(lambda A, B: G.d_capsule_box(
                    A[0], A[1], A[2], B[0], B[1], B[2]))(cap, other)
            out = out.at[pos].set(d)

        if boxbox_cases:
            pos = np.array([c[0] for c in boxbox_cases])
            ai = np.array([c[1] for c in boxbox_cases])
            bi = np.array([c[2] for c in boxbox_cases])
            d = jax.vmap(G.d_swept_box_box)(
                wa[BOX][0][ai], wb[BOX][0][ai], wa[BOX][1][ai], wa[BOX][2][ai],
                wa[BOX][0][bi], wa[BOX][1][bi], wa[BOX][2][bi])
            out = out.at[pos].set(d)

        def _small_n(kind, mov):
            """Static vertex count of the (possibly two-pose) hull, or None
            when no static feature topology exists (CONVEX meshes, rotating
            two-pose boxes) and the Frank-Wolfe path must be used."""
            base = {SPHERE: 1, CAPSULE: 2, BOX: 8}.get(kind)
            if base is None or (kind == BOX and mov):
                return None
            return base * (2 if mov else 1)

        for (ka, kb, mov_a, mov_b), cases in hull_cases.items():
            pos = np.array([c[0] for c in cases])
            ai = np.array([c[1] for c in cases])
            bi = np.array([c[2] for c in cases])
            VA, rA = self._vert_sets(wa, ka, ai, wb if mov_a else None)
            VB, rB = self._vert_sets(wa, kb, bi, wb if mov_b else None)
            na, nb = _small_n(ka, mov_a), _small_n(kb, mov_b)
            if na is not None and nb is not None:
                # iteration-free exact feature enumeration (the cast hot
                # path: two-pose capsules / spheres vs capsules / boxes)
                d = jax.vmap(G.make_feature_distance(na, nb))(VA, rA, VB, rB)
            else:
                # unknown static topology (CONVEX meshes, rotating two-pose
                # boxes): exact generic enumeration when small, FW fallback
                d = jax.vmap(G.d_convex_auto)(VA, rA, VB, rB)
            # the hull distance can only be <= every substate distance;
            # keep the min in case an (FW-unconverged or fp-noise) estimate
            # comes out slightly larger than an interpolated substate
            out = out.at[pos].min(d)
        return out


def _spec_from_urdf_geom(li: int, g, name: str) -> Optional[GeomSpec]:
    offR = np.asarray(rpy_to_matrix(jnp.asarray(g.rpy)))
    if g.kind == "sphere":
        return GeomSpec(li, SPHERE, offR, g.xyz, float(g.size[0]),
                        np.zeros(3), name)
    if g.kind in ("capsule", "cylinder"):
        r, ln = float(g.size[0]), float(g.size[1])
        return GeomSpec(li, CAPSULE, offR, g.xyz, r,
                        np.array([0.0, 0.0, ln / 2]), name)
    if g.kind == "box":
        return GeomSpec(li, BOX, offR, g.xyz, 0.0,
                        np.asarray(g.size) / 2.0, name)
    if g.kind in ("convex", "mesh") and getattr(g, "verts", None) is not None:
        # convex hull vertex set (support-mapping path); ``size[0]`` acts as
        # an optional sweep radius for sphere-swept hulls
        r = float(g.size[0]) if np.ndim(g.size) and len(np.atleast_1d(g.size)) else 0.0
        return GeomSpec(li, CONVEX, offR, g.xyz, r, np.zeros(3), name,
                        verts=np.asarray(g.verts, np.float64))
    # raw meshes without vertices require offline convex decomposition
    # (collision/decompose.py, CLI `decompose`) — skipped here
    return None


def _geom_specs(model: RobotModel, chain: Chain) -> list[GeomSpec]:
    specs = []
    for lname, geoms in model.geoms.items():
        if lname not in chain.link_names:
            continue
        li = chain.link_index(lname)
        for gi, g in enumerate(geoms):
            s = _spec_from_urdf_geom(li, g, f"{lname}/{gi}")
            if s is not None:
                specs.append(s)
    return specs


def build_collision_world(model: RobotModel, chain: Chain,
                          extra_disabled: Optional[set] = None,
                          attachments: Optional[list] = None
                          ) -> CollisionWorld:
    """Candidate pairs: different links, not parent-child adjacent, not
    SRDF-disabled, at least one side movable.  Pairs are ordered grouped by
    type combination for vectorized evaluation.

    ``attachments``: list of (link_name, UrdfGeom) — runtime-attached
    objects (the reference's attached-object scenes,
    trajopt/test/cast_cost_attached_unit.cpp): grasped payloads, tool
    geometry.  Attached geoms collide like any link geometry of that link.
    """
    specs = _geom_specs(model, chain)
    for ai, (lname, g) in enumerate(attachments or []):
        s = _spec_from_urdf_geom(chain.link_index(lname), g,
                                 f"{lname}/attached{ai}")
        if s is not None:
            specs.append(s)
    # pad convex vertex sets to one static V (repeat vertex 0)
    vmax = max((s.verts.shape[0] for s in specs if s.verts is not None),
               default=0)
    if vmax:
        specs = [
            dataclasses.replace(
                s, verts=np.concatenate(
                    [s.verts,
                     np.repeat(s.verts[:1], vmax - s.verts.shape[0], axis=0)])
            ) if s.verts is not None and s.verts.shape[0] < vmax else s
            for s in specs
        ]
    disabled = set(model.disabled_pairs) | (extra_disabled or set())
    moving = chain.ancestor.any(axis=1)
    parent = chain.parent

    def adjacent(li, lj):
        return parent[li] == lj or parent[lj] == li

    raw_pairs = []
    for i in range(len(specs)):
        for j in range(i + 1, len(specs)):
            li, lj = specs[i].link, specs[j].link
            if li == lj or adjacent(li, lj):
                continue
            names = tuple(sorted((chain.link_names[li], chain.link_names[lj])))
            if names in disabled:
                continue
            if not (moving[li] or moving[lj]):
                continue
            # canonical kind order (kind_i <= kind_j)
            if specs[i].kind <= specs[j].kind:
                raw_pairs.append((i, j))
            else:
                raw_pairs.append((j, i))

    return _make_world(chain, specs, raw_pairs)


def _make_world(chain: Chain, specs: list, raw_pairs: list) -> CollisionWorld:
    """Group candidate pairs by (kind, kind) and build the world."""
    kind_idx = {k: [] for k in (SPHERE, CAPSULE, BOX, CONVEX)}
    for gi, g in enumerate(specs):
        kind_idx[g.kind].append(gi)
    kind_idx = {k: np.asarray(v, dtype=np.int64) for k, v in kind_idx.items()}
    kind_pos = {k: {g: i for i, g in enumerate(idx)}
                for k, idx in kind_idx.items()}

    by_type: dict = {}
    for (i, j) in raw_pairs:
        by_type.setdefault((specs[i].kind, specs[j].kind), []).append((i, j))

    pairs = []
    groups = []
    pos = 0
    for key in sorted(by_type):
        plist = by_type[key]
        ia = np.array([kind_pos[key[0]][i] for i, _ in plist])
        ib = np.array([kind_pos[key[1]][j] for _, j in plist])
        ppos = np.arange(pos, pos + len(plist))
        groups.append((key, ia, ib, ppos))
        pairs.extend(plist)
        pos += len(plist)

    return CollisionWorld(chain, tuple(specs), tuple(pairs), kind_idx,
                          tuple(groups))
