"""SQP engine tests: known-optimum problems from the reference contract suite.

Problems and expected optima mirror trajopt_sco/test/small-problems-unit.cpp
(QuadraticSeparable/Nonseparable + Hock-Schittkowski TP1/TP3/TP6/TP7) — the
numerical contract that pins SQP/QP behavior.
"""

import numpy as np
import jax.numpy as jnp

from trajopt_tpu.solver.types import (
    CONVERGED,
    ProblemData,
    ProblemSpec,
    SQPParams,
)
from trajopt_tpu.solver.sqp import solve, solve_batch
from trajopt_tpu.terms.base import (
    eq_constraint,
    generic_cost,
    ineq_constraint,
    squared_cost,
)
from trajopt_tpu.ops.qp import QPSettings

QP_ACCURATE = QPSettings(eps_abs=1e-7, eps_rel=1e-9, max_iter=8000)


def _data(n, x0, cost_params=((),), cnt_params=()):
    big = 1e19
    return ProblemData(
        x0=jnp.asarray(x0, dtype=jnp.float64),
        lb=jnp.full((n,), -big, dtype=jnp.float64),
        ub=jnp.full((n,), big, dtype=jnp.float64),
        cost_params=tuple(cost_params),
        cnt_params=tuple(cnt_params),
    )


def test_quadratic_separable():
    # exactly a QP -> solved in ~1 iteration (small-problems-unit.cpp:49-66)
    f = lambda x, p: x[0] ** 2 + (x[1] - 1) ** 2 + (x[2] - 2) ** 2
    spec = ProblemSpec(n_x=3, cost_terms=(generic_cost("f", f),))
    params = SQPParams(trust_box_size=100.0, qp=QP_ACCURATE)
    res = solve(spec, _data(3, [3.0, 4.0, 5.0]), params)
    assert int(res.status) == CONVERGED
    np.testing.assert_allclose(np.asarray(res.x), [0, 1, 2], atol=1e-3)


def test_quadratic_nonseparable():
    f = lambda x, p: (x[0] - x[1] + 3 * x[2]) ** 2 + (x[0] - 1) ** 2 + (x[2] - 2) ** 2
    spec = ProblemSpec(n_x=3, cost_terms=(generic_cost("f", f),))
    params = SQPParams(trust_box_size=100.0, min_trust_box_size=1e-5,
                       min_approx_improve=1e-6, qp=QP_ACCURATE)
    res = solve(spec, _data(3, [3.0, 4.0, 5.0]), params)
    assert int(res.status) == CONVERGED
    np.testing.assert_allclose(np.asarray(res.x), [1, 7, 2], atol=0.01)


TP_PARAMS = SQPParams(
    max_iter=1000,
    min_trust_box_size=1e-5,
    min_approx_improve=1e-10,
    initial_merit_error_coeff=1.0,
    qp=QP_ACCURATE,
)


def _tp_case(f, g, kind, x0, xstar, n=2):
    cnt = (ineq_constraint if kind == "ineq" else eq_constraint)("g", 1, g)
    spec = ProblemSpec(n_x=n, cost_terms=(generic_cost("f", f),),
                       cnt_terms=(cnt,))
    res = solve(spec, _data(n, x0, cnt_params=((),)), TP_PARAMS)
    assert int(res.status) == CONVERGED, f"status={int(res.status)}"
    np.testing.assert_allclose(np.asarray(res.x), xstar, atol=0.01)


def test_tp1():
    f = lambda x, p: (x[1] - x[0] ** 2) ** 2 + (1 - x[0]) ** 2
    g = lambda x, p: jnp.array([-1.5 - x[1]])
    _tp_case(f, g, "ineq", [-2.0, 1.0], [1.0, 1.0])


def test_tp3():
    f = lambda x, p: x[1] + 1e-5 * (x[1] - x[0]) ** 2
    g = lambda x, p: jnp.array([0.0 - x[1]])
    _tp_case(f, g, "ineq", [10.0, 1.0], [0.0, 0.0])


def test_tp6():
    f = lambda x, p: (1 - x[0]) ** 2
    g = lambda x, p: jnp.array([10.0 * (x[1] - x[0] ** 2)])
    _tp_case(f, g, "eq", [10.0, 1.0], [1.0, 1.0])


def test_tp7():
    f = lambda x, p: jnp.log(1 + x[0] ** 2) - x[1]
    g = lambda x, p: jnp.array([(1 + x[0] ** 2) ** 2 + x[1] ** 2 - 4])
    _tp_case(f, g, "eq", [2.0, 2.0], [0.0, np.sqrt(3.0)])


def test_squared_cost_term_path():
    # same QP solved through the SQUARED err-term path (CostFromErrFunc
    # SQUARED, modeling_utils.cpp:168-211) instead of GENERIC
    tgt = jnp.array([0.0, 1.0, 2.0])
    t = squared_cost("sq", 3, lambda x, p: x - p["target"],
                     weight_fn=lambda p: p["w"])
    spec = ProblemSpec(n_x=3, cost_terms=(t,))
    data = _data(3, [3.0, 4.0, 5.0],
                 cost_params=({"target": tgt, "w": jnp.array([1.0, 2.0, 3.0])},))
    res = solve(spec, data, SQPParams(trust_box_size=100.0, qp=QP_ACCURATE))
    assert int(res.status) == CONVERGED
    np.testing.assert_allclose(np.asarray(res.x), [0, 1, 2], atol=1e-3)
    assert float(res.total_cost) < 1e-5


def test_variable_bounds_respected():
    # minimize (x-5)^2 with ub=2 -> x*=2
    t = squared_cost("sq", 1, lambda x, p: x - 5.0)
    spec = ProblemSpec(n_x=1, cost_terms=(t,))
    data = ProblemData(
        x0=jnp.array([0.0]), lb=jnp.array([-1.0]), ub=jnp.array([2.0]),
        cost_params=((),), cnt_params=())
    res = solve(spec, data, SQPParams(trust_box_size=100.0, qp=QP_ACCURATE))
    assert int(res.status) == CONVERGED
    np.testing.assert_allclose(np.asarray(res.x), [2.0], atol=1e-4)


def test_batch_divergent_instances():
    # batch of shifted quadratics with one constrained lane; all converge
    t = squared_cost("sq", 2, lambda x, p: x - p)
    g = ineq_constraint("g", 1, lambda x, p: jnp.array([p - x[0]]))  # x0 >= p
    spec = ProblemSpec(n_x=2, cost_terms=(t,), cnt_terms=(g,))
    B = 4
    targets = jnp.stack([jnp.array([1.0, 2.0]) * (i + 1) for i in range(B)])
    floors = jnp.array([0.0, 5.0, 0.0, 10.0])
    big = 1e19
    data = ProblemData(
        x0=jnp.zeros((B, 2)),
        lb=jnp.full((B, 2), -big), ub=jnp.full((B, 2), big),
        cost_params=(targets,), cnt_params=(floors,))
    res = solve_batch(spec, data, SQPParams(trust_box_size=100.0, qp=QP_ACCURATE))
    assert all(int(s) == CONVERGED for s in res.status)
    expect0 = np.maximum(np.asarray(targets[:, 0]), np.asarray(floors))
    np.testing.assert_allclose(np.asarray(res.x[:, 0]), expect0, atol=1e-3)
    np.testing.assert_allclose(np.asarray(res.x[:, 1]),
                               np.asarray(targets[:, 1]), atol=1e-3)
