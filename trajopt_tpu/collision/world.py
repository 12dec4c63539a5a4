"""Collision world: robot link geometries + candidate pairs + batched
distance evaluation.

The TPU analog of the reference's contact-manager setup
(``tesseract::collision::{Discrete,Continuous}ContactManager`` configured by
``TrajOptCollisionConfig``, trajopt_common/collision_types.h:124-163):
candidate geometry pairs are fixed at build time (static shapes), distances
are evaluated for *all* pairs every query — the vectorized replacement for
broad-phase culling, which at these pair counts is cheaper than divergence.

Swept ("cast") queries: sphere geometries get an *exact* swept-capsule
(the swept volume of a sphere between two poses is a capsule); everything
else uses a min over statically many interpolated substates — the analog of
the reference's LVS interpolation
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

SPHERE, CAPSULE, BOX = 0, 1, 2


@dataclasses.dataclass(frozen=True, eq=False)
class GeomSpec:
    link: int
    kind: int
    off_R: np.ndarray  # (3,3)
    off_p: np.ndarray  # (3,)
    radius: float
    half: np.ndarray  # (3,) box half extents; capsule: half[2] = half-length
    name: str = ""


@dataclasses.dataclass(frozen=True, eq=False)
class CollisionWorld:
    chain: Chain
    geoms: tuple  # tuple[GeomSpec]
    pairs: tuple  # tuple[(gi, gj)]

    @property
    def n_pairs(self) -> int:
        return len(self.pairs)

    def pair_names(self):
        return tuple(
            (self.geoms[i].name, self.geoms[j].name) for i, j in self.pairs)

    # ---------------- world-space canonical geometry ----------------

    def _world_geom(self, g: GeomSpec, R, p, dt):
        Rl, pl = R[g.link], p[g.link]
        offR = jnp.asarray(g.off_R, dt)
        offp = jnp.asarray(g.off_p, dt)
        Rw = Rl @ offR
        c = Rl @ offp + pl
        if g.kind == SPHERE:
            return ("s", c, g.radius)
        if g.kind == CAPSULE:
            axis = Rw[:, 2] * g.half[2]
            return ("c", c - axis, c + axis, g.radius)
        return ("b", c, Rw, jnp.asarray(g.half, dt))

    @staticmethod
    def _dist(ga, gb):
        ka, kb = ga[0], gb[0]
        if (ka, kb) in (("c", "s"), ("b", "s"), ("b", "c")):
            ga, gb = gb, ga
            ka, kb = kb, ka
        if (ka, kb) == ("s", "s"):
            return G.d_sphere_sphere(ga[1], ga[2], gb[1], gb[2])
        if (ka, kb) == ("s", "c"):
            return G.d_sphere_capsule(ga[1], ga[2], gb[1], gb[2], gb[3])
        if (ka, kb) == ("s", "b"):
            return G.d_sphere_box(ga[1], ga[2], gb[1], gb[2], gb[3])
        if (ka, kb) == ("c", "c"):
            return G.d_capsule_capsule(ga[1], ga[2], ga[3], gb[1], gb[2], gb[3])
        if (ka, kb) == ("c", "b"):
            return G.d_capsule_box(ga[1], ga[2], ga[3], gb[1], gb[2], gb[3])
        return G.d_box_box(ga[1], ga[2], ga[3], gb[1], gb[2], gb[3])

    # ---------------- queries ----------------

    def pair_distances(self, q: jax.Array) -> jax.Array:
        """(n_pairs,) signed distances at configuration q."""
        R, p = self.chain.fk(q)
        dt = q.dtype
        ws = [self._world_geom(g, R, p, dt) for g in self.geoms]
        return jnp.stack([self._dist(ws[i], ws[j]) for i, j in self.pairs])

    def cast_pair_distances(self, qa: jax.Array, qb: jax.Array,
                            n_sub: int = 8) -> jax.Array:
        """(n_pairs,) swept distances over the motion qa -> qb.

        Sphere geoms moving against a static geom use the exact swept
        capsule; all other pairs take the min over ``n_sub`` interpolated
        configurations (LVS-style).
        """
        dt = qa.dtype
        Ra, pa = self.chain.fk(qa)
        Rb, pb = self.chain.fk(qb)
        moving = self.chain.ancestor.any(axis=1)  # (L,) link moves with q?

        # substate distances for the general case
        ss = jnp.linspace(0.0, 1.0, n_sub)
        sub_d = jax.vmap(
            lambda s: self.pair_distances(qa + s * (qb - qa)))(ss)
        d_min = jnp.min(sub_d, axis=0)  # (n_pairs,)

        # translation-only chains (all-prismatic) keep link rotations fixed,
        # enabling the exact swept-box zonotope SAT
        translation_only = not bool(
            (np.asarray(self.chain.jtype)[np.asarray(self.chain.link_of_dof)]
             == 1).any()) if self.chain.n_dof else True

        out = []
        for k, (i, j) in enumerate(self.pairs):
            gi, gj = self.geoms[i], self.geoms[j]
            exact = None
            for a, b in ((gi, gj), (gj, gi)):
                if exact is not None or moving[b.link] or not moving[a.link]:
                    continue
                if a.kind == SPHERE:
                    # exact swept capsule: moving sphere vs static geom
                    ca = Ra[a.link] @ jnp.asarray(a.off_p, dt) + pa[a.link]
                    cb = Rb[a.link] @ jnp.asarray(a.off_p, dt) + pb[a.link]
                    wb = self._world_geom(b, Ra, pa, dt)
                    exact = self._dist(("c", ca, cb, a.radius), wb)
                elif a.kind == BOX and b.kind == BOX and translation_only:
                    wa_a = self._world_geom(a, Ra, pa, dt)
                    wa_b = self._world_geom(a, Rb, pb, dt)
                    wb = self._world_geom(b, Ra, pa, dt)
                    exact = G.d_swept_box_box(wa_a[1], wa_b[1], wa_a[2],
                                              wa_a[3], wb[1], wb[2], wb[3])
            out.append(exact if exact is not None else d_min[k])
        return jnp.stack(out)


def _geom_specs(model: RobotModel, chain: Chain) -> list[GeomSpec]:
    specs = []
    for lname, geoms in model.geoms.items():
        if lname not in chain.link_names:
            continue
        li = chain.link_index(lname)
        for gi, g in enumerate(geoms):
            offR = np.asarray(rpy_to_matrix(jnp.asarray(g.rpy)))
            name = f"{lname}/{gi}"
            if g.kind == "sphere":
                specs.append(GeomSpec(li, SPHERE, offR, g.xyz, float(g.size[0]),
                                      np.zeros(3), name))
            elif g.kind in ("capsule", "cylinder"):
                r, ln = float(g.size[0]), float(g.size[1])
                specs.append(GeomSpec(li, CAPSULE, offR, g.xyz, r,
                                      np.array([0.0, 0.0, ln / 2]), name))
            elif g.kind == "box":
                specs.append(GeomSpec(li, BOX, offR, g.xyz, 0.0,
                                      np.asarray(g.size) / 2.0, name))
            # meshes require offline convex decomposition — skipped here
    return specs


def build_collision_world(model: RobotModel, chain: Chain,
                          extra_disabled: Optional[set] = None
                          ) -> CollisionWorld:
    """Candidate pairs: different links, not parent-child adjacent, not
    SRDF-disabled, at least one side movable."""
    specs = _geom_specs(model, chain)
    disabled = set(model.disabled_pairs) | (extra_disabled or set())
    moving = chain.ancestor.any(axis=1)
    parent = chain.parent

    def adjacent(li, lj):
        return parent[li] == lj or parent[lj] == li

    pairs = []
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
            pairs.append((i, j))
    return CollisionWorld(chain, tuple(specs), tuple(pairs))
