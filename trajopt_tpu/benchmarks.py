"""Flagship benchmark problems (BASELINE.json configs) + benchmark suite.

``make_glass_upright`` builds the "glass-upright-class 7-DoF" problem the
driver's north star targets: 7-DoF capsule arm over a table, joint_vel
smoothing, swept collision cost, end-effector-upright equality constraint at
every step, joint goal constraint, fixed start — 30-step horizon.

Batch instances perturb the goal configuration (waypoint seeds / scenario
perturbations), all served by one compiled program.

``run_benchmarks`` mirrors the reference's google-benchmark families
(trajopt/test/benchmarks/solve_benchmarks.cpp:35-177 and
trajopt_sqp/test/benchmarks/solve_benchmarks.cpp):

  simple_collision  — 2-DoF spherebot vs obstacle, full SQP solve
                      (BM_TRAJOPT_SIMPLE_COLLISION_SOLVE)
  planning          — 7-DoF arm around a table, 6 steps, joint_vel cost +
                      cast collision (BM_TRAJOPT_PLANNING_SOLVE)
  glass_upright     — the 30-step flagship (driver north star)

The multi-threaded / IFOPT variants of the reference collapse onto the same
entries here: term evaluation is fused by XLA (the OpenMP axis) and there is
a single engine (the two reference stacks share one TPU implementation).
Results are emitted as JSON (the analog of TRAJOPT_ENABLE_RUN_BENCHMARKING's
build-dir JSON output).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .collision.world import build_collision_world
from .models import arm7
from .ops.qp import QPSettings
from .problem.trajectory import TrajProblemBuilder, interpolated_init, stack_data
from .solver.types import SQPParams
from .terms.cartesian import upright_term
from .terms.collision import CastDistancePre, cast_collision_term
from .terms.joint import joint_pos_term, joint_vel_term

Q_START = np.array([-1.1, 1.6, 0.0, -0.8, 0.0, -0.8, 0.0])
Q_GOAL = np.array([1.1, 1.6, 0.0, -0.8, 0.0, -0.8, 0.0])


def bench_params(dtype=jnp.float32) -> SQPParams:
    """Throughput-tuned parameters (reference tolerance contract).

    Inner solver: the interior-point backend — it reaches the reference
    accuracy contract in ~10 Newton steps where ADMM needs >1000 sweeps on
    these trajectory QPs (see ops.ipm_qp).
    """
    return SQPParams(
        max_total_qp_solves=30,
        qp=QPSettings(eps_abs=1e-4, eps_rel=1e-6, max_iter=1000,
                      check_interval=25, adaptive_rho_interval=100,
                      solver="ipm", max_ipm_iter=16),
    )


def make_glass_upright(batch: int, n_steps: int = 30, dtype=jnp.float32,
                       n_sub: int = 2, seed: int = 0):
    # n_sub=2 = ONE exact hull-of-two-poses cast per step gap: with the
    # feature-enumeration cast kernel the swept volume of the whole gap
    # motion is checked exactly (up to rotation sag, small at 30 steps);
    # the bench gate re-verifies every lane independently at n_sub=16.
    """Returns (spec, batched ProblemData, chain, world)."""
    model, chain = arm7()
    world = build_collision_world(model, chain)
    T, D = n_steps, chain.n_dof

    b = TrajProblemBuilder(chain, T)
    b.add_cost(joint_vel_term("jvel", T, D),
               {"targets": np.zeros(D, dtype), "coeffs": np.full(D, 5.0, dtype)})
    # ONE shared swept-distance pipeline feeds both collision terms (the
    # reference's contact-result cache sharing, collision_terms.cpp:440-466)
    cpre = CastDistancePre(world, T, n_sub=n_sub)
    b.add_cost(cast_collision_term("coll", world, T, n_sub=n_sub, pre=cpre),
               {"margins": np.asarray(0.025, dtype),
                "coeffs": np.asarray(20.0, dtype)})
    # collision also enters as a CONSTRAINT at a tighter margin: a lane that
    # settles into a penetrating local minimum of the hinge cost must report
    # PENALTY_ITERATION_LIMIT, not CONVERGED (the reference's planning tests
    # re-verify with an independent continuous check,
    # trajopt/test/planning_unit.cpp:98-148 — here the solver itself must
    # agree with that check before claiming success)
    b.add_constraint(
        cast_collision_term("coll_cnt", world, T, n_sub=n_sub,
                            is_constraint=True, pre=cpre),
        {"margins": np.asarray(0.005, dtype),
         "coeffs": np.asarray(1.0, dtype)})
    b.add_constraint(
        joint_pos_term("goal", T, D, first_step=T - 1, last_step=T - 1,
                       is_constraint=True),
        {"targets": np.asarray(Q_GOAL, dtype), "coeffs": np.ones(D, dtype)})
    # one batched upright term whose viol_groups give per-step convergence
    # granularity (the reference hatches one pose term per step) while the
    # FK evaluation stays a single fused vmap
    b.add_constraint(
        upright_term("upright", chain, T, "tool"),
        {"coeffs": np.ones(2, dtype)})
    b.fix_timestep(0)

    rng = np.random.default_rng(seed)
    yaw_mask = np.array([1.0, 0, 0, 0, 0, 0, 1.0])  # joints 0/6 spin about z
    datas = []
    for i in range(batch):
        # start/goal perturbed on the yaw joints only (keeps the FIXED start
        # and the EQ-pinned last step consistent with the upright
        # constraint); the problem stays feasible while every lane differs
        start = Q_START + rng.uniform(-0.15, 0.15, D) * yaw_mask
        goal = Q_GOAL + rng.uniform(-0.15, 0.15, D) * yaw_mask
        init = np.asarray(interpolated_init(np.asarray(start, dtype),
                                            np.asarray(goal, dtype), T))
        # make every constraint ACTIVE at the initial trajectory (reference
        # planning problems start infeasible; a solvable-by-zero-step batch
        # would game the bench): a mid-trajectory bump on the wrist/elbow
        # joints breaks uprightness and pushes the sweep against the table
        # margin, and the free last step starts offset from the goal target.
        # Amplitude keeps the init within ~margin-depth of the table
        # (reference-class inits are collision-free or grazing,
        # e.g. arm_around_table's given_traj): deeply buried inits mostly
        # probe the pass-through local minimum, not planning throughput.
        bump = rng.uniform(-0.12, 0.12, D) * np.array([0, 1, 1, 1, 1, 1, 0])
        phase = np.sin(np.pi * np.arange(T) / (T - 1))[:, None]
        init = init + (phase * bump[None, :]).astype(init.dtype)
        init[0] = start  # step 0 is pinned by fix_timestep(0)
        init[T - 1] = goal + rng.uniform(-0.05, 0.05, D)
        spec, data = b.build(jnp.asarray(init))
        data = data._replace(
            cnt_params=(
                {"margins": np.asarray(0.005, dtype),
                 "coeffs": np.asarray(1.0, dtype)},
                {"targets": np.asarray(goal, dtype),
                 "coeffs": np.ones(D, dtype)},
                {"coeffs": np.ones(2, dtype)},
            ))
        datas.append(data)
    batch_data = stack_data(datas)
    batch_data = jax.tree.map(
        lambda x: x.astype(dtype) if np.issubdtype(x.dtype, np.floating) else x,
        batch_data)
    return spec, batch_data, chain, world


def make_simple_collision(batch: int, dtype=jnp.float64, seed: int = 0):
    """2-DoF spherebot vs obstacle (simple_collision_test.json semantics;
    BM_TRAJOPT_SIMPLE_COLLISION_SOLVE, solve_benchmarks.cpp:35-46)."""
    from .models import spherebot
    from .terms.collision import discrete_collision_term

    model, chain = spherebot()
    world = build_collision_world(model, chain)
    b = TrajProblemBuilder(chain, 1)
    b.add_cost(discrete_collision_term("coll_cost", world, 1),
               {"margins": np.asarray(0.3, dtype),
                "coeffs": np.asarray(1.0, dtype)})
    b.add_cost(joint_pos_term("jpos", 1, 2),
               {"targets": np.zeros(2, dtype), "coeffs": np.ones(2, dtype)})
    b.add_constraint(discrete_collision_term("coll_cnt", world, 1,
                                             is_constraint=True),
                     {"margins": np.asarray(0.2, dtype),
                      "coeffs": np.asarray(1.0, dtype)})
    rng = np.random.default_rng(seed)
    datas = []
    for _ in range(batch):
        q0 = np.array([-0.75, 0.75]) + rng.uniform(-0.05, 0.05, 2)
        spec, data = b.build(np.asarray(q0, dtype)[None, :])
        datas.append(data)
    return spec, stack_data(datas), chain, world


def make_planning(batch: int, n_steps: int = 6, dtype=jnp.float32,
                  n_sub: int = 8, seed: int = 0):
    """7-DoF arm moving around the table obstacle, joint_vel cost + swept
    collision + joint goal (arm_around_table.json semantics;
    BM_TRAJOPT_PLANNING_SOLVE, solve_benchmarks.cpp:49-61)."""
    model, chain = arm7()
    world = build_collision_world(model, chain)
    T, D = n_steps, chain.n_dof
    b = TrajProblemBuilder(chain, T)
    b.add_cost(joint_vel_term("jvel", T, D),
               {"targets": np.zeros(D, dtype), "coeffs": np.ones(D, dtype)})
    b.add_cost(cast_collision_term("coll", world, T, n_sub=n_sub),
               {"margins": np.asarray(0.025, dtype),
                "coeffs": np.asarray(20.0, dtype)})
    b.add_constraint(
        joint_pos_term("goal", T, D, first_step=T - 1, last_step=T - 1,
                       is_constraint=True),
        {"targets": np.asarray(Q_GOAL, dtype), "coeffs": np.ones(D, dtype)})
    b.fix_timestep(0)
    rng = np.random.default_rng(seed)
    datas = []
    for _ in range(batch):
        goal = Q_GOAL + rng.uniform(-0.1, 0.1, D)
        init = interpolated_init(np.asarray(Q_START, dtype),
                                 np.asarray(goal, dtype), T)
        spec, data = b.build(init)
        data = data._replace(cnt_params=(
            {"targets": np.asarray(goal, dtype), "coeffs": np.ones(D, dtype)},))
        datas.append(data)
    batch_data = stack_data(datas)
    batch_data = jax.tree.map(
        lambda x: x.astype(dtype) if np.issubdtype(x.dtype, np.floating) else x,
        batch_data)
    return spec, batch_data, chain, world


# ---------------------------------------------------------------------------
# BASELINE config 4: pick-and-place — attached-object collision geometry,
# TWO CHAINED problems (approach without payload, transfer with a grasped
# payload carried over a divider wall; the second problem is seeded by the
# first's solution — the reference's GIVEN_TRAJ chaining,
# problem_description.hpp:162-185; attached geometry:
# trajopt/test/cast_cost_attached_unit.cpp).
# ---------------------------------------------------------------------------

# home on the pick side; grasp/place found by IK at tool (0.55, -/+0.40, 0.55)
# beside the wall (models.ARM7_WALL_URDF), both collision-verified
Q_PNP_HOME = np.array([-1.1, 1.6, 0.0, -0.8, 0.0, -0.8, 0.0])
Q_PNP_GRASP = np.array([-0.736, 2.03, -0.133, -0.948, -0.045, -1.244, 0.0])
Q_PNP_PLACE = np.array([0.736, 2.03, 0.133, -0.948, 0.045, -1.244, 0.0])

# grasped payload: a 0.1 x 0.1 x 0.18 box hull above the tool flange
PNP_PAYLOAD_VERTS = np.array(
    [[sx * 0.05, sy * 0.05, z]
     for sx in (-1, 1) for sy in (-1, 1) for z in (0.02, 0.20)])


def _pnp_scene():
    from .collision.decompose import fit_hull
    from .models import arm7_wall

    model, chain = arm7_wall()
    world_free = build_collision_world(model, chain)
    payload = fit_hull(PNP_PAYLOAD_VERTS)
    # l6/base wrist pairs sit at a constant near-margin distance from the
    # attached payload / upper arm — the SRDF "never colliding" analog
    world_att = build_collision_world(
        model, chain, attachments=[("tool", payload)],
        extra_disabled={tuple(sorted(("l6", "tool"))),
                        tuple(sorted(("base", "l2")))})
    return model, chain, world_free, world_att


def _pnp_builder(world, chain, T, dtype, n_sub, goal):
    D = chain.n_dof
    b = TrajProblemBuilder(chain, T)
    b.add_cost(joint_vel_term("jvel", T, D),
               {"targets": np.zeros(D, dtype), "coeffs": np.full(D, 5.0, dtype)})
    cpre = CastDistancePre(world, T, n_sub=n_sub)
    b.add_cost(cast_collision_term("coll", world, T, n_sub=n_sub, pre=cpre),
               {"margins": np.asarray(0.025, dtype),
                "coeffs": np.asarray(20.0, dtype)})
    b.add_constraint(
        cast_collision_term("coll_cnt", world, T, n_sub=n_sub,
                            is_constraint=True, pre=cpre),
        {"margins": np.asarray(0.005, dtype),
         "coeffs": np.asarray(1.0, dtype)})
    b.add_constraint(
        joint_pos_term("goal", T, D, first_step=T - 1, last_step=T - 1,
                       is_constraint=True),
        {"targets": np.asarray(goal, dtype), "coeffs": np.ones(D, dtype)})
    b.fix_timestep(0)
    return b


def make_pick_and_place(batch: int, n_steps: int = 12, dtype=jnp.float32,
                        n_sub: int = 2, seed: int = 0):
    """Build the approach-phase batch and return everything needed to chain
    the transfer phase (``chain_transfer`` below).  Per-lane grasp/place
    goals are yaw-perturbed like the flagship."""
    model, chain, world_free, world_att = _pnp_scene()
    T, D = n_steps, chain.n_dof
    rng = np.random.default_rng(seed)
    grasps, places = [], []
    datas = []
    bA = _pnp_builder(world_free, chain, T, dtype, n_sub, Q_PNP_GRASP)
    for _ in range(batch):
        dg = rng.uniform(-0.05, 0.05, D) * np.array([1, 0, 0, 0, 0, 0, 1])
        grasp = Q_PNP_GRASP + dg
        place = Q_PNP_PLACE + rng.uniform(-0.05, 0.05, D) * np.array(
            [1, 0, 0, 0, 0, 0, 1])
        init = interpolated_init(np.asarray(Q_PNP_HOME, dtype),
                                 np.asarray(grasp, dtype), T)
        specA, dA = bA.build(init)
        dA = dA._replace(cnt_params=(
            dA.cnt_params[0],
            {"targets": np.asarray(grasp, dtype), "coeffs": np.ones(D, dtype)},
        ))
        grasps.append(grasp)
        places.append(place)
        datas.append(dA)
    dataA = stack_data(datas)
    dataA = jax.tree.map(
        lambda x: x.astype(dtype) if np.issubdtype(x.dtype, np.floating) else x,
        dataA)
    scene = {"chain": chain, "world_free": world_free, "world_att": world_att,
             "T": T, "D": D, "dtype": dtype, "n_sub": n_sub,
             "grasps": np.asarray(grasps), "places": np.asarray(places)}
    return specA, dataA, scene


def chain_transfer(scene, qa_end: np.ndarray):
    """Build the transfer-phase batch seeded by the approach solutions
    (``qa_end`` (batch, D) = each lane's solved grasp configuration; the
    fixed step 0 pins it, GIVEN_TRAJ-style)."""
    T, D, dtype = scene["T"], scene["D"], scene["dtype"]
    chain, world = scene["chain"], scene["world_att"]
    datas = []
    bB = _pnp_builder(world, chain, T, dtype, scene["n_sub"], Q_PNP_PLACE)
    for i in range(qa_end.shape[0]):
        place = scene["places"][i]
        init = interpolated_init(np.asarray(qa_end[i], dtype),
                                 np.asarray(place, dtype), T)
        specB, dB = bB.build(init)
        dB = dB._replace(cnt_params=(
            dB.cnt_params[0],
            {"targets": np.asarray(place, dtype), "coeffs": np.ones(D, dtype)},
        ))
        datas.append(dB)
    dataB = stack_data(datas)
    dataB = jax.tree.map(
        lambda x: x.astype(dtype) if np.issubdtype(x.dtype, np.floating) else x,
        dataB)
    return specB, dataB


def solve_pick_and_place(batch: int, n_steps: int = 12, dtype=jnp.float32,
                         n_sub: int = 2, seed: int = 0, params=None,
                         phase_qp_solves: int = 8):
    """The full chained pick-and-place solve (both problems, batched)."""
    from .solver.sqp import solve_batch_compact

    params = params or bench_params()
    specA, dataA, scene = make_pick_and_place(batch, n_steps, dtype, n_sub,
                                              seed)
    resA = solve_batch_compact(specA, dataA, params,
                               phase_qp_solves=phase_qp_solves)
    qa_end = np.asarray(resA.x).reshape(batch, n_steps, -1)[:, -1]
    specB, dataB = chain_transfer(scene, qa_end)
    resB = solve_batch_compact(specB, dataB, params,
                               phase_qp_solves=phase_qp_solves)
    return resA, resB, scene


# ---------------------------------------------------------------------------
# BASELINE config 5: continuous (swept-volume) collision with redundant
# external axes — 9 DoF (2 prismatic gantry + 7-DoF arm), the arm carried
# past a table the straight-line motion sweeps through.
# ---------------------------------------------------------------------------

Q9_START = np.array([-0.85, 0.0, -1.1, 1.6, 0.0, -0.8, 0.0, -0.8, 0.0])
Q9_GOAL = np.array([0.85, 0.0, 1.1, 1.6, 0.0, -0.8, 0.0, -0.8, 0.0])


def make_redundant_rail(batch: int, n_steps: int = 15, dtype=jnp.float32,
                        n_sub: int = 2, seed: int = 0):
    """9-DoF redundant-axes continuous-collision problem batch."""
    from .models import arm9_rail

    model, chain = arm9_rail()
    world = build_collision_world(model, chain)
    T, D = n_steps, chain.n_dof
    b = TrajProblemBuilder(chain, T)
    b.add_cost(joint_vel_term("jvel", T, D),
               {"targets": np.zeros(D, dtype), "coeffs": np.full(D, 5.0, dtype)})
    cpre = CastDistancePre(world, T, n_sub=n_sub)
    b.add_cost(cast_collision_term("coll", world, T, n_sub=n_sub, pre=cpre),
               {"margins": np.asarray(0.025, dtype),
                "coeffs": np.asarray(20.0, dtype)})
    b.add_constraint(
        cast_collision_term("coll_cnt", world, T, n_sub=n_sub,
                            is_constraint=True, pre=cpre),
        {"margins": np.asarray(0.005, dtype),
         "coeffs": np.asarray(1.0, dtype)})
    b.add_constraint(
        joint_pos_term("goal", T, D, first_step=T - 1, last_step=T - 1,
                       is_constraint=True),
        {"targets": np.asarray(Q9_GOAL, dtype), "coeffs": np.ones(D, dtype)})
    b.fix_timestep(0)
    rng = np.random.default_rng(seed)
    mask = np.array([0, 1, 1, 0, 0, 0, 0, 0, 1.0])  # rail-y + yaw joints
    datas = []
    for _ in range(batch):
        start = Q9_START + rng.uniform(-0.1, 0.1, D) * mask
        goal = Q9_GOAL + rng.uniform(-0.1, 0.1, D) * mask
        init = interpolated_init(np.asarray(start, dtype),
                                 np.asarray(goal, dtype), T)
        spec, data = b.build(init)
        data = data._replace(cnt_params=(
            data.cnt_params[0],
            {"targets": np.asarray(goal, dtype), "coeffs": np.ones(D, dtype)},
        ))
        datas.append(data)
    batch_data = stack_data(datas)
    batch_data = jax.tree.map(
        lambda x: x.astype(dtype) if np.issubdtype(x.dtype, np.floating) else x,
        batch_data)
    return spec, batch_data, chain, world


_BENCHES = {
    "simple_collision": lambda batch: make_simple_collision(
        batch, dtype=jnp.float32),
    "planning": lambda batch: make_planning(batch),
    "glass_upright": lambda batch: make_glass_upright(batch),
    "redundant_rail": lambda batch: make_redundant_rail(batch),
}


def run_benchmarks(names=None, batch: int = 32, repeats: int = 3):
    """Run the named benchmark families; returns a list of JSON-able dicts
    {name, batch, wall_s, solves_per_sec, us_per_solve, converged}."""
    import time

    from .solver.sqp import _solve
    from .solver.types import CONVERGED

    out = []
    for name in (names or list(_BENCHES)):
        spec, data, _, _ = _BENCHES[name](batch)
        params = bench_params()
        run = jax.jit(lambda d, s=spec, p=params: jax.vmap(
            lambda dd: _solve(s, p, dd))(d))
        res = run(data)
        jax.block_until_ready(res)  # compile + warm
        t0 = time.perf_counter()
        for _ in range(repeats):
            res = run(data)
            jax.block_until_ready(res)
        dt = (time.perf_counter() - t0) / repeats
        ok = int((np.asarray(res.status) == CONVERGED).sum())
        out.append({
            "name": name, "batch": batch, "wall_s": round(dt, 4),
            "solves_per_sec": round(ok / dt, 2),
            "us_per_solve": round(1e6 * dt / max(ok, 1), 1),
            "converged": ok,
            "mean_qp_solves": round(float(np.asarray(res.n_qp_solves).mean()), 2),
        })
    return out
