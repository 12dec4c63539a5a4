"""Checkpoint / resume for batched solver state.

The reference has no checkpointing (SURVEY.md §5.4); its closest analogs are
GIVEN_TRAJ re-initialization and OSQP warm starts.  Here the whole batched
problem/result state is a pytree, so persistence is trivial:

- ``save_pytree`` / ``load_pytree``: npz round-trip of any pytree of arrays
  (leaf paths become archive keys; a structural template reconstructs).
- ``resume_data``: fold a previous SQPResult back into ProblemData so a new
  solve continues from the converged-or-interrupted iterate (the reference's
  InitInfo::GIVEN_TRAJ pattern, problem_description.hpp:162-185).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..solver.types import ProblemData, SQPResult


def _leaf_key(path) -> str:
    return "/".join(str(getattr(p, "name", getattr(p, "key", getattr(p, "idx", p))))
                    for p in path)


def save_pytree(path: str, tree) -> None:
    leaves_with_paths = jax.tree_util.tree_flatten_with_path(tree)[0]
    arrays = {}
    for i, (kp, leaf) in enumerate(leaves_with_paths):
        arrays[f"leaf_{i:04d}"] = np.asarray(leaf)
    np.savez(path, **arrays)


def load_pytree(path: str, template):
    """Load arrays saved by save_pytree into the structure of ``template``."""
    data = np.load(path)
    leaves, treedef = jax.tree_util.tree_flatten(template)
    keys = sorted(data.files)
    if len(keys) != len(leaves):
        raise ValueError(
            f"checkpoint has {len(keys)} leaves, template has {len(leaves)}")
    new_leaves = [jnp.asarray(data[k]) for k in keys]
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def resume_data(data: ProblemData, result: SQPResult) -> ProblemData:
    """Continue a solve from a previous result's iterate."""
    return data._replace(x0=result.x)
