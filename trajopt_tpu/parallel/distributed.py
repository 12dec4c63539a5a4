"""Multi-host SPMD orchestration (SURVEY.md §2.8 / §5.8 deliverables).

The reference has no distributed execution; these are the TPU-native
requirements stated by BASELINE.json: multi-host batching with
deterministic per-host problem assignment and scaling-efficiency
measurement at 1 chip / 1 host / N hosts.

Usage (one process per host, e.g. under a pod launcher):

    from trajopt_tpu.parallel import distributed as dist
    dist.initialize()                       # env-driven (JAX coordinator)
    mesh = dist.global_mesh()
    lo, hi = dist.host_slice(n_problems)    # deterministic assignment
    local = build_my_problems(lo, hi)       # host builds only its shard
    data = dist.global_batch_from_local(local, mesh)
    res, tel = solve_batch_sharded(spec, data, params, mesh)

Telemetry reductions (convergence counts, violation maxima) are produced by
XLA as psums over ICI/DCN from ordinary jnp reductions over the sharded
batch axis — no hand-written communication layer.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..solver.types import ProblemData


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Initialize the JAX distributed runtime (no-op single-process).

    Falls back to the standard env vars (JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID) or auto-detection on supported
    platforms (TPU pods detect topology automatically).
    """
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if num_processes <= 1 and coordinator_address is None \
            and "JAX_COORDINATOR_ADDRESS" not in os.environ:
        return  # single-process: nothing to initialize
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes if num_processes > 1 else None,
        process_id=process_id)


def global_mesh(axis_name: str = "batch") -> Mesh:
    """1-D mesh over every device in the job (all hosts)."""
    return Mesh(np.asarray(jax.devices()), (axis_name,))


def host_slice(n_total: int) -> tuple[int, int]:
    """Deterministic [lo, hi) problem range owned by this host.

    Problems are block-assigned by process index; remainders go to the
    first hosts, so every host can compute every other host's range.
    """
    p = jax.process_index()
    np_ = jax.process_count()
    base, rem = divmod(n_total, np_)
    lo = p * base + min(p, rem)
    return lo, lo + base + (1 if p < rem else 0)


def global_batch_from_local(local: ProblemData, mesh: Mesh,
                            axis_name: str = "batch") -> ProblemData:
    """Assemble the global sharded batch from this host's local instances.

    Every leaf's leading axis is this host's problem count; the result is a
    global jax.Array whose addressable shards hold exactly the local data
    (``jax.make_array_from_process_local_data``).
    """
    sh = NamedSharding(mesh, P(axis_name))
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
        local)


def scaling_report(solves_per_sec: float, n_devices: int,
                   per_device_baseline: float) -> dict:
    """Scaling-efficiency record (the 1 chip / 1 host / N hosts metric)."""
    ideal = per_device_baseline * n_devices
    return {
        "n_devices": n_devices,
        "solves_per_sec": solves_per_sec,
        "ideal_solves_per_sec": ideal,
        "efficiency": solves_per_sec / ideal if ideal > 0 else 0.0,
    }
