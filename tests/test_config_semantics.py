"""Config fields with real semantics: max_time, longest_valid_segment_length,
use_weighted_sum, per-link-pair collision overrides (VERDICT round-1 items —
accepted-but-ignored fields are worse than rejected ones)."""

import numpy as np
import jax.numpy as jnp
import pytest

from trajopt_tpu.collision.world import build_collision_world
from trajopt_tpu.models import spherebot
from trajopt_tpu.ops.qp import QPSettings
from trajopt_tpu.problem.json_io import load_problem
from trajopt_tpu.solver.sqp import solve
from trajopt_tpu.solver.types import CONVERGED, TIME_LIMIT

QP = QPSettings(eps_abs=1e-6, eps_rel=1e-8, max_iter=4000)


def _spherebot_doc(**collision_params):
    p = {"coeffs": 1, "dist_pen": 0.2, "evaluator_type": 1}
    p.update(collision_params)
    return {
        "basic_info": {"n_steps": 1, "manip": "manipulator"},
        "costs": [
            {"type": "joint_pos", "name": "j0",
             "params": {"coeffs": [1, 1], "targets": [0.0, 0.0]}},
        ],
        "constraints": [{"type": "collision", "params": p}],
        "init_info": {"type": "given_traj", "data": [[-0.75, 0.75]]},
    }


def test_max_time_zero_budget_reports_time_limit():
    """max_time ~ 0 must stop the solve with OPT_TIME_LIMIT (reference
    enforcement optimizers.cpp:735).  The problem must need more than one
    SQP iteration — the clock is checked per iteration, so a solve that
    converges within its first iteration legitimately beats the deadline
    (same as the reference's per-iteration elapsed check)."""
    m, chain = spherebot()
    world = build_collision_world(m, chain)
    doc = {
        "basic_info": {"n_steps": 5, "manip": "manipulator",
                       "fixed_timesteps": [0]},
        "costs": [
            {"type": "joint_vel", "params": {"coeffs": [1, 1],
                                             "targets": [0, 0]}},
            {"type": "collision",
             "params": {"coeffs": 20, "dist_pen": 0.25,
                        "evaluator_type": 4}},
        ],
        "constraints": [
            {"type": "joint_pos",
             "params": {"targets": [0.6, 0.7], "first_step": 4,
                        "last_step": 4}},
        ],
        "init_info": {"type": "given_traj", "data": [[-0.75, 0.75]] * 5},
    }
    doc["opt_info"] = {"max_time": 1e-9}
    spec, data, params = load_problem(doc, chain, world, qp=QP)
    assert params.max_time == 1e-9
    res = solve(spec, data, params)
    assert int(res.status) == TIME_LIMIT
    assert int(res.n_qp_solves) <= 2  # stopped at the first clock check
    # generous budget solves normally
    doc["opt_info"] = {"max_time": 300.0}
    spec, data, params = load_problem(doc, chain, world, qp=QP)
    res = solve(spec, data, params)
    assert int(res.status) == CONVERGED


def test_lvs_sets_substate_count():
    """longest_valid_segment_length must set the swept substate count from
    the init motion (ceil(dist/lvs)+1, continuous_collision_evaluators.cpp:
    205-240) instead of parsing-and-ignoring."""
    m, chain = spherebot()
    world = build_collision_world(m, chain)
    base = {
        "basic_info": {"n_steps": 2, "manip": "manipulator",
                       "fixed_timesteps": [0, 1]},
        "costs": [{"type": "collision",
                   "params": {"coeffs": 10, "dist_pen": 0.02,
                              "evaluator_type": 4,
                              "longest_valid_segment_length": 0.05}}],
        "init_info": {"type": "given_traj", "data": [[-1.9, 0.0], [1.9, 0.0]]},
    }
    # init motion length 3.8, lvs 0.05 -> ceil(76)+1 = 77, capped at 64
    spec, data, params = load_problem(base, chain, world, qp=QP, n_sub=2)
    term = spec.cost_terms[0]
    # substate count is baked into n_sub; check indirectly: the swept check
    # of the straight-through motion must detect the obstacle (a 2-substate
    # evaluation would miss nothing here, so compare against a coarse doc)
    coarse = {**base, "costs": [{"type": "collision",
                                 "params": {"coeffs": 10, "dist_pen": 0.02,
                                            "evaluator_type": 4}}]}
    spec_c, data_c, _ = load_problem(coarse, chain, world, qp=QP, n_sub=2)
    v_fine = float(term.value(data.x0, data.cost_params[0]))
    v_coarse = float(spec_c.cost_terms[0].value(data_c.x0,
                                                data_c.cost_params[0]))
    # the fine LVS sampling must see at least as much penetration as the
    # 2-substate one, and strictly more here (obstacle at the midpoint is
    # caught by odd sampling counts)
    assert v_fine >= v_coarse - 1e-9
    assert v_fine > 0.0


def test_use_weighted_sum_one_row_per_step():
    m, chain = spherebot()
    world = build_collision_world(m, chain)
    doc = _spherebot_doc(use_weighted_sum="tRuE")
    spec, data, params = load_problem(doc, chain, world, qp=QP)
    term = spec.cnt_terms[0]
    assert term.n_rows == 1  # one aggregated row per step (span = 1)
    res = solve(spec, data, params)
    assert int(res.status) == CONVERGED
    assert np.linalg.norm(np.asarray(res.x)) >= 1.2 - 1e-3


def test_weighted_jacobian_is_weighted_average():
    """The aggregated row's gradient equals the error-weighted average of
    per-pair gradients (weighted_average_methods.cpp:31-68)."""
    from trajopt_tpu.terms.collision import discrete_collision_term

    m, chain = spherebot()
    world = build_collision_world(m, chain)
    t_all = discrete_collision_term("c", world, 1)
    t_w = discrete_collision_term("cw", world, 1, weighted=True)
    p = {"margins": jnp.asarray(0.5), "coeffs": jnp.asarray(1.0)}
    x = jnp.asarray([-0.4, 0.45])
    errs = t_all.err(x, p)
    J = t_all.jac(x, p)
    w = np.maximum(np.asarray(errs), 0.0)
    w = w / max(np.asarray(errs).max(), 1e-12)
    Jexp = (w[:, None] * np.asarray(J)).sum(0) / max(w.sum(), 1e-12)
    np.testing.assert_allclose(np.asarray(t_w.jac(x, p))[0], Jexp,
                               rtol=1e-6, atol=1e-9)
    assert float(t_w.err(x, p)[0]) == pytest.approx(float(np.asarray(errs).max()))


def test_per_pair_collision_overrides():
    m, chain = spherebot()
    world = build_collision_world(m, chain)
    names = world.pair_link_names()
    assert len(names) >= 1
    key = ",".join(names[0])
    doc = _spherebot_doc(pair_margins={key: 0.35})
    spec, data, params = load_problem(doc, chain, world, qp=QP)
    margins = np.asarray(data.cnt_params[0]["margins"])
    assert margins[0] == pytest.approx(0.35)
    assert all(m == pytest.approx(0.2) for m in margins[1:])
    # unknown pair name must raise, not silently no-op
    with pytest.raises(ValueError):
        load_problem(_spherebot_doc(pair_margins={"nope,zilch": 0.1}),
                     chain, world, qp=QP)


def test_use_weighted_sum_multi_pair_world():
    """Weighted aggregation must work for worlds with >1 collision pair
    (ADVICE r2: the coeff reduction used to broadcast an (n_pairs,) array
    to shape (1,) and crash at trace time)."""
    from trajopt_tpu.models import arm7
    from trajopt_tpu.terms.collision import (
        cast_collision_term, discrete_collision_term)

    m, chain = arm7()
    world = build_collision_world(m, chain)
    assert world.n_pairs > 1
    T, D = 3, chain.n_dof
    x = jnp.zeros((T * D,), jnp.float64)
    p = {"margins": jnp.full((world.n_pairs,), 0.05),
         "coeffs": jnp.full((world.n_pairs,), 20.0)}
    for is_cnt in (False, True):
        td = discrete_collision_term("wd", world, T, weighted=True,
                                     is_constraint=is_cnt)
        tc = cast_collision_term("wc", world, T, n_sub=2, weighted=True,
                                 is_constraint=is_cnt)
        for t, rows in ((td, T), (tc, T - 1)):
            err = t.err(x, p)
            assert err.shape == (rows,)
            J = t.jac(x, p)
            assert J.shape == (rows, T * D)
            assert np.all(np.isfinite(np.asarray(J)))
            if not is_cnt:
                w = t.weights(p)
                np.testing.assert_allclose(np.asarray(w), 20.0)
