"""Singularity-avoidance term.

Reference: AvoidSingularityErrCalculator (trajopt/src/kinematic_terms.cpp:
586-642) — err = 1/(sigma_min(J(q)) + lambda), where J is the geometric
Jacobian of the chosen link; lowered as a SQUARED cost with per-step rows
(AvoidSingularityTermInfo::hatch, problem_description.cpp:1900-1940).

TPU-native: sigma_min via jnp.linalg.svd (differentiable), one row per
trajectory step; autodiff replaces the reference's finite-difference
u'(dJ/dq)v chain.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..kinematics.chain import Chain
from .base import Term, squared_cost


def avoid_singularity_term(
    name: str,
    chain: Chain,
    n_steps: int,
    link: str,
    lambda_: float = 1e-3,
    first_step: int = 0,
    last_step: Optional[int] = None,
    subset_joints: Optional[Sequence[str]] = None,
) -> Term:
    """params: {"coeffs": () or (span,)} weight per row.

    ``subset_joints`` restricts the manipulability measure to a kinematic
    sub-chain (AvoidSingularitySubsetErrCalculator,
    trajopt/src/kinematic_terms.cpp:644-678): sigma_min is taken over the
    Jacobian COLUMNS of those joints only — identical to the Jacobian of
    the sub-chain with the same tip link, since a geometric Jacobian
    column depends only on that joint's own frame and the tip point — but
    the error still differentiates through the FULL group's configuration
    (non-subset joints move the tip and the subset joint frames, exactly
    the superset-gradient plumbing of the reference).
    """
    n_dof = chain.n_dof
    li = chain.link_index(link)
    last = (n_steps - 1) if last_step is None else last_step
    span = last - first_step + 1
    if subset_joints is not None:
        unknown = set(subset_joints) - set(chain.joint_names)
        if unknown:
            raise ValueError(
                f"subset_joints {sorted(unknown)} not in group "
                f"{chain.joint_names}")
        cols = np.asarray([chain.joint_names.index(j)
                           for j in subset_joints], np.int64)
    else:
        cols = None

    def fn(x, p):
        X = x.reshape(n_steps, n_dof)[first_step:last + 1]

        def sig_inv(q):
            J = chain.jacobian(q, li)
            if cols is not None:
                J = J[:, cols]
            sv = jnp.linalg.svd(J, compute_uv=False)
            return 1.0 / (sv[-1] + lambda_)

        return jax.vmap(sig_inv)(X)

    def wf(p):
        return jnp.broadcast_to(jnp.asarray(p["coeffs"]), (span,))

    return squared_cost(name, span, fn, weight_fn=wf, step_coupling=0)
