"""Tests: singularity avoidance, user-defined terms, cart_line, checkpoint,
telemetry, sharding."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from trajopt_tpu.models import arm7, spherebot
from trajopt_tpu.ops.qp import QPSettings
from trajopt_tpu.problem.trajectory import TrajProblemBuilder, stationary_init
from trajopt_tpu.solver.sqp import solve
from trajopt_tpu.solver.types import CONVERGED, SQPParams
from trajopt_tpu.terms.base import TermKind
from trajopt_tpu.terms.cartesian import cart_line_term
from trajopt_tpu.terms.joint import joint_pos_term, joint_vel_term
from trajopt_tpu.terms.singularity import avoid_singularity_term
from trajopt_tpu.terms.user import user_defined_term

PARAMS = SQPParams(qp=QPSettings(eps_abs=1e-6, eps_rel=1e-8, max_iter=4000))


def test_avoid_singularity_moves_away():
    _, chain = arm7()
    T, D = 1, 7
    # near-straight arm is near-singular; the term should bend it
    q0 = jnp.asarray([0.0, 0.05, 0.0, 0.05, 0.0, 0.05, 0.0])
    b = TrajProblemBuilder(chain, T)
    b.add_cost(avoid_singularity_term("sing", chain, T, "tool"),
               {"coeffs": jnp.asarray(1.0)})
    b.add_cost(joint_pos_term("stay", T, D),
               {"targets": q0, "coeffs": jnp.full(D, 0.1)})
    spec, data = b.build(stationary_init(q0, T))
    res = solve(spec, data, PARAMS)

    def sig_min(q):
        J = chain.jacobian(q, chain.link_index("tool"))
        return float(jnp.linalg.svd(J, compute_uv=False)[-1])

    assert sig_min(res.x) > sig_min(q0) + 1e-3


def test_avoid_singularity_subset_chain():
    """Subset-chain variant (AvoidSingularitySubsetErrCalculator,
    kinematic_terms.cpp:644-678): the error equals sigma_min over the
    subset Jacobian columns, and optimizing it improves the WRIST
    sub-chain manipulability even where the full-chain term would not
    target it."""
    _, chain = arm7()
    T, D = 1, 7
    wrist = list(chain.joint_names[4:])  # 3-joint wrist sub-chain
    q0 = jnp.asarray([0.3, 0.8, 0.2, -0.9, 0.0, 0.02, 0.0])  # wrist aligned

    term = avoid_singularity_term("sing_sub", chain, T, "tool",
                                  subset_joints=wrist)

    def sub_sig_min(q):
        J = chain.jacobian(q, chain.link_index("tool"))[:, 4:]
        return float(jnp.linalg.svd(J, compute_uv=False)[-1])

    # error definition check: 1/(sigma_min(J_subset) + lambda)
    e = float(term.err(stationary_init(q0, T).reshape(-1), {"coeffs": 1.0})[0])
    np.testing.assert_allclose(e, 1.0 / (sub_sig_min(q0) + 1e-3), rtol=1e-6)

    b = TrajProblemBuilder(chain, T)
    b.add_cost(term, {"coeffs": jnp.asarray(1.0)})
    b.add_cost(joint_pos_term("stay", T, D),
               {"targets": q0, "coeffs": jnp.full(D, 0.1)})
    spec, data = b.build(stationary_init(q0, T))
    res = solve(spec, data, PARAMS)
    assert sub_sig_min(res.x) > sub_sig_min(q0) + 1e-3

    # unknown subset joints are rejected
    import pytest
    with pytest.raises(ValueError, match="subset_joints"):
        avoid_singularity_term("bad", chain, T, "tool",
                               subset_joints=["nope"])


def test_user_defined_constraint():
    # keep x0 + x1 == 1 at every step via a user term (spherebot, 2 dof)
    _, chain = spherebot()
    T, D = 3, 2
    b = TrajProblemBuilder(chain, T)
    b.add_cost(joint_pos_term("goal", T, D),
               {"targets": jnp.asarray([2.0, 2.0]), "coeffs": jnp.ones(D)})
    b.add_constraint(
        user_defined_term("sum1", TermKind.EQ, T, D,
                          lambda q, p: jnp.array([q[0] + q[1] - 1.0]), 1),
        ())
    spec, data = b.build(stationary_init(jnp.zeros(D), T))
    res = solve(spec, data, PARAMS)
    assert int(res.status) == CONVERGED
    X = np.asarray(res.x).reshape(T, D)
    np.testing.assert_allclose(X.sum(axis=1), 1.0, atol=1e-4)
    # symmetric goal -> x == y == 0.5
    np.testing.assert_allclose(X, 0.5, atol=1e-3)


def test_user_defined_analytic_jacobian():
    _, chain = spherebot()
    T, D = 2, 2
    term = user_defined_term(
        "lin", TermKind.EQ, T, D,
        lambda q, p: jnp.array([2.0 * q[0] - q[1]]), 1,
        jac_fn=lambda q, p: jnp.array([[2.0, -1.0]]))
    x = jnp.asarray([0.3, 0.1, -0.2, 0.5])
    J = term.jac(x, ())
    J_auto = jax.jacfwd(lambda xx: term.err(xx, ()))(x)
    np.testing.assert_allclose(np.asarray(J), np.asarray(J_auto), atol=1e-12)


def test_cart_line():
    _, chain = arm7()
    T = 1
    q0 = jnp.asarray([0.2, 0.9, 0.0, -1.0, 0.0, 0.4, 0.0])
    R0, p0 = chain.fk(q0)
    tool = chain.link_index("tool")
    # a segment passing near the current tool position
    a = jnp.asarray(p0[tool]) + jnp.asarray([0.05, -0.3, 0.02])
    bpt = jnp.asarray(p0[tool]) + jnp.asarray([0.05, 0.3, 0.02])
    b = TrajProblemBuilder(chain, T)
    b.add_constraint(
        cart_line_term("line", chain, T, 0, "tool"),
        {"line_a": a, "line_b": bpt, "target_R": R0[tool],
         "coeffs": jnp.ones(6)})
    b.add_cost(joint_pos_term("reg", T, 7),
               {"targets": q0, "coeffs": jnp.full(7, 1e-3)})
    spec, data = b.build(stationary_init(q0, T))
    res = solve(spec, data, PARAMS)
    assert int(res.status) == CONVERGED
    Rf, pf = chain.fk(res.x)
    pt = np.asarray(pf[tool])
    seg_a, seg_b = np.asarray(a), np.asarray(bpt)
    d = seg_b - seg_a
    t = np.clip(np.dot(pt - seg_a, d) / np.dot(d, d), 0, 1)
    dist = np.linalg.norm(pt - (seg_a + t * d))
    assert dist < 1e-3


def test_checkpoint_roundtrip(tmp_path):
    from trajopt_tpu.utils.checkpoint import (
        load_pytree,
        resume_data,
        save_pytree,
    )
    _, chain = spherebot()
    T, D = 2, 2
    b = TrajProblemBuilder(chain, T)
    b.add_cost(joint_pos_term("goal", T, D),
               {"targets": jnp.asarray([1.0, -1.0]), "coeffs": jnp.ones(D)})
    spec, data = b.build(stationary_init(jnp.zeros(D), T))
    res = solve(spec, data, PARAMS)

    p = os.path.join(tmp_path, "ckpt.npz")
    save_pytree(p, res)
    res2 = load_pytree(p, res)
    np.testing.assert_allclose(np.asarray(res2.x), np.asarray(res.x))

    data2 = resume_data(data, res2)
    res3 = solve(spec, data2, PARAMS)
    assert int(res3.status) == CONVERGED
    assert int(res3.n_qp_solves) <= int(res.n_qp_solves)


def test_telemetry_and_history():
    from trajopt_tpu.utils.telemetry import (
        format_history,
        format_result,
        write_logs,
    )
    _, chain = spherebot()
    T, D = 2, 2
    b = TrajProblemBuilder(chain, T)
    b.add_cost(joint_pos_term("goal", T, D),
               {"targets": jnp.ones(D), "coeffs": jnp.ones(D)})
    b.add_constraint(
        joint_vel_term("still", T, D, is_constraint=True),
        {"targets": jnp.zeros(D), "coeffs": jnp.ones(D)})
    spec, data = b.build(stationary_init(jnp.zeros(D), T))
    res = solve(spec, data, SQPParams(record_history=32, qp=PARAMS.qp))
    txt = format_result(res, spec)
    assert "OPT_CONVERGED" in txt and "goal" in txt
    hist = format_history(res)
    assert len(hist.splitlines()) >= 2
    paths = write_logs(res, spec, log_dir="/tmp/trajopt_tpu_test_logs")
    assert all(os.path.exists(p) for p in paths)

    # per-iteration iterate stream (the reference's trajopt_vars.log rows,
    # optimizers.cpp:528-642): record_history_x adds one row per QP solve
    res = solve(spec, data, SQPParams(record_history=32,
                                      record_history_x=True, qp=PARAMS.qp))
    import numpy as np
    n_qp = int(res.n_qp_solves)
    assert res.history_x.shape == (32, spec.n_x)
    paths = write_logs(res, spec, log_dir="/tmp/trajopt_tpu_test_logs2")
    vars_rows = open(paths[-1]).read().strip().splitlines()
    assert len(vars_rows) == n_qp + 1  # per-iteration rows + final x
    assert np.allclose([float(v) for v in vars_rows[-2].split(",")],
                       np.asarray(res.history_x)[n_qp - 1], atol=1e-12)

    # per-iteration PER-TERM cost/constraint columns (the reference's
    # trajopt_costs.log / trajopt_constraints.log streams record every
    # term's value at EVERY iteration, optimizers.cpp:528-642): passing
    # ``data`` reconstructs them from history_x
    from trajopt_tpu.utils.telemetry import per_term_history
    cv, vv = per_term_history(res, spec, data)
    assert cv.shape == (n_qp, len(spec.cost_terms))
    assert vv.shape[0] == n_qp
    # the last recorded iterate's values must equal the result's
    np.testing.assert_allclose(cv[-1], np.asarray(res.cost_vals), atol=1e-12)
    np.testing.assert_allclose(vv[-1], np.asarray(res.cnt_viols), atol=1e-12)
    # cost decreases overall on this convex problem
    assert cv[-1].sum() <= cv[0].sum() + 1e-9
    paths = write_logs(res, spec, log_dir="/tmp/trajopt_tpu_test_logs3",
                       data=data)
    cost_rows = open(paths[1]).read().strip().splitlines()
    assert len(cost_rows) == 1 + n_qp + 1  # header + per-iter + final
    cnt_rows = open(paths[2]).read().strip().splitlines()
    assert len(cnt_rows) == 1 + n_qp + 1
    # header matches the per-entry naming (viol_groups expansion)
    from trajopt_tpu.utils.telemetry import constraint_entry_names
    assert cnt_rows[0] == ",".join(constraint_entry_names(spec))


def test_sharded_batch_solve():
    from trajopt_tpu.parallel.sharding import make_mesh, solve_batch_sharded
    from trajopt_tpu.problem.trajectory import stack_data
    _, chain = spherebot()
    T, D, B = 2, 2, 8
    b = TrajProblemBuilder(chain, T)
    b.add_cost(joint_pos_term("goal", T, D),
               {"targets": jnp.zeros(D), "coeffs": jnp.ones(D)})
    spec, proto = b.build(stationary_init(jnp.zeros(D), T))
    datas = []
    for i in range(B):
        tgt = jnp.asarray([float(i), -float(i)])
        datas.append(proto._replace(
            cost_params=({"targets": tgt, "coeffs": jnp.ones(D)},)))
    batch = stack_data(datas)
    mesh = make_mesh(8)
    res, tel = solve_batch_sharded(spec, batch, PARAMS, mesh)
    assert int(tel["n_converged"]) == B
    X = np.asarray(res.x).reshape(B, T, D)
    for i in range(B):
        np.testing.assert_allclose(X[i, -1], [i, -i], atol=1e-3)


def test_callback_observes_and_aborts():
    from trajopt_tpu.solver.types import STOPPED_BY_CALLBACK
    _, chain = spherebot()
    T, D = 2, 2
    b = TrajProblemBuilder(chain, T)
    b.add_cost(joint_pos_term("goal", T, D),
               {"targets": jnp.ones(D), "coeffs": jnp.ones(D)})
    spec, data = b.build(stationary_init(jnp.zeros(D), T))

    seen = []

    def cb(info):
        seen.append(int(info["n_qp"]))
        return len(seen) >= 2  # abort on the second iteration

    params = SQPParams(callback=cb, qp=PARAMS.qp)
    res = solve(spec, data, params)
    assert int(res.status) == STOPPED_BY_CALLBACK
    assert len(seen) == 2


def test_distributed_helpers_single_process():
    """host_slice / global_batch_from_local on the virtual 8-device mesh."""
    import jax
    import numpy as np
    from trajopt_tpu.parallel import distributed as dist

    dist.initialize()  # no-op single-process
    lo, hi = dist.host_slice(13)
    assert (lo, hi) == (0, 13)  # single process owns everything
    mesh = dist.global_mesh()
    assert mesh.devices.size == len(jax.devices())

    from trajopt_tpu.solver.types import ProblemData
    n = 16
    local = ProblemData(
        x0=np.zeros((n, 4)), lb=np.full((n, 4), -1.0),
        ub=np.full((n, 4), 1.0), cost_params=(), cnt_params=())
    g = dist.global_batch_from_local(local, mesh)
    assert g.x0.shape == (n, 4)
    assert g.x0.sharding.spec == jax.sharding.PartitionSpec("batch")

    rep = dist.scaling_report(800.0, 8, 125.0)
    assert abs(rep["efficiency"] - 0.8) < 1e-12


def test_cart_pose_tolerance_band_matches_fd():
    """Toleranced pose term (CartPoseTermInfo lower/upper_tolerance,
    problem_description.hpp:330-373): error inside the band is zero; outside
    it is distance-to-bound; the autodiff Jacobian matches finite
    differences through the band (kinematic_terms.cpp:92,234)."""
    from trajopt_tpu.models import arm7
    from trajopt_tpu.terms.cartesian import (
        cart_pose_term, default_cart_pose_params)

    m, chain = arm7()
    T, D = 1, chain.n_dof
    q = jnp.asarray(np.linspace(-0.4, 0.4, D))
    # target = FK of q itself -> raw error is exactly zero
    R, p = chain.fk(q)
    li = chain.link_index(chain.link_names[-1])
    term = cart_pose_term("cp", chain, T, 0, chain.link_names[-1],
                          is_constraint=True)
    params = default_cart_pose_params(
        target_R=R[li], target_p=p[li],
        lower_tols=[-0.05] * 6, upper_tols=[0.05] * 6)
    e0 = np.asarray(term.err(q, params))
    np.testing.assert_allclose(e0, 0.0, atol=1e-12)  # inside the band

    # perturb outside the band: error = raw - bound, never raw
    q2 = q + 0.3
    e2 = np.asarray(term.err(q2, params))
    params_plain = default_cart_pose_params(target_R=R[li], target_p=p[li])
    raw = np.asarray(term.err(q2, params_plain))
    outside = np.abs(raw) > 0.05
    np.testing.assert_allclose(
        e2[outside], raw[outside] - np.sign(raw[outside]) * 0.05, atol=1e-10)
    assert (e2[~outside] == 0).all()

    # FD Jacobian check at the perturbed point
    J = np.asarray(term.jac(q2, params))
    eps = 1e-7
    J_fd = np.zeros_like(J)
    for d in range(D):
        dq = np.zeros(D)
        dq[d] = eps
        J_fd[:, d] = (np.asarray(term.err(q2 + dq, params))
                      - np.asarray(term.err(q2 - dq, params))) / (2 * eps)
    np.testing.assert_allclose(J, J_fd, atol=1e-5)

    import pytest
    with pytest.raises(ValueError):
        default_cart_pose_params(lower_tols=0.1, upper_tols=-0.1)
