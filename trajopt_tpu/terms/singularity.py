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

from typing import Optional

import jax
import jax.numpy as jnp

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
) -> Term:
    """params: {"coeffs": () or (span,)} weight per row."""
    n_dof = chain.n_dof
    li = chain.link_index(link)
    last = (n_steps - 1) if last_step is None else last_step
    span = last - first_step + 1

    def fn(x, p):
        X = x.reshape(n_steps, n_dof)[first_step:last + 1]

        def sig_inv(q):
            J = chain.jacobian(q, li)
            sv = jnp.linalg.svd(J, compute_uv=False)
            return 1.0 / (sv[-1] + lambda_)

        return jax.vmap(sig_inv)(X)

    def wf(p):
        return jnp.broadcast_to(jnp.asarray(p["coeffs"]), (span,))

    return squared_cost(name, span, fn, weight_fn=wf, step_coupling=0)
