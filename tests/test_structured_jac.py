"""Structure-aware banded Jacobians must equal dense autodiff exactly."""

import jax
import jax.numpy as jnp
import numpy as np

from trajopt_tpu.collision.world import build_collision_world
from trajopt_tpu.models import arm7, spherebot
from trajopt_tpu.terms.cartesian import (cart_pose_term,
                                         default_cart_pose_params,
                                         upright_term)
from trajopt_tpu.terms.collision import (cast_collision_term,
                                         discrete_collision_term)


def _dense_jac(term, x, p):
    return np.asarray(jax.jacfwd(lambda xx: term.fn(xx, p))(x)).reshape(
        term.n_rows, x.shape[0])


def test_discrete_collision_jac_matches_autodiff():
    m, chain = spherebot()
    world = build_collision_world(m, chain)
    T = 4
    term = discrete_collision_term("c", world, T)
    cterm = discrete_collision_term("cc", world, T, is_constraint=True)
    x = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, T * 2))
    p = {"margins": jnp.asarray(0.3), "coeffs": jnp.asarray(2.0)}
    for t in (term, cterm):
        np.testing.assert_allclose(np.asarray(t.jac(x, p)),
                                   _dense_jac(t, x, p), atol=1e-10)


def test_cast_collision_jac_matches_autodiff():
    m, chain = arm7()
    world = build_collision_world(m, chain)
    T = 4
    term = cast_collision_term("c", world, T, n_sub=3)
    cterm = cast_collision_term("cc", world, T, n_sub=3, is_constraint=True)
    x = jnp.asarray(np.random.default_rng(1).uniform(-0.5, 0.5, T * 7))
    p = {"margins": jnp.asarray(0.025), "coeffs": jnp.asarray(20.0)}
    for t in (term, cterm):
        np.testing.assert_allclose(np.asarray(t.jac(x, p)),
                                   _dense_jac(t, x, p), atol=1e-10)


def test_upright_jac_matches_autodiff():
    _, chain = arm7()
    T = 3
    term = upright_term("u", chain, T, "tool", first_step=1, last_step=2)
    x = jnp.asarray(np.random.default_rng(2).uniform(-0.5, 0.5, T * 7))
    p = {"coeffs": jnp.asarray([1.0, 2.0])}
    np.testing.assert_allclose(np.asarray(term.jac(x, p)),
                               _dense_jac(term, x, p), atol=1e-12)


def test_cart_pose_jac_matches_autodiff():
    _, chain = arm7()
    T = 3
    for tgt in (None, "l4"):
        term = cart_pose_term("cp", chain, T, 1, "tool", target_link=tgt)
        x = jnp.asarray(np.random.default_rng(3).uniform(-0.5, 0.5, T * 7))
        p = default_cart_pose_params(target_p=jnp.asarray([0.1, 0.0, 0.5]))
        np.testing.assert_allclose(np.asarray(term.jac(x, p)),
                                   _dense_jac(term, x, p), atol=1e-12)


def test_joint_term_jacs_match_autodiff():
    from trajopt_tpu.terms.joint import joint_motion_term
    T, D = 6, 3
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.uniform(-1, 1, T * D))
    for order in range(4):
        for is_cnt in (False, True):
            for tol in (False, True):
                p = {"targets": jnp.asarray(rng.uniform(-0.1, 0.1, D)),
                     "coeffs": jnp.asarray(rng.uniform(0.5, 2.0, D))}
                if tol:
                    p["upper_tols"] = jnp.asarray(rng.uniform(0, 0.2, D))
                    p["lower_tols"] = jnp.asarray(rng.uniform(-0.2, 0, D))
                t = joint_motion_term("j", order, T, D, is_constraint=is_cnt,
                                      toleranced=tol)
                np.testing.assert_allclose(np.asarray(t.jac(x, p)),
                                           _dense_jac(t, x, p), atol=1e-12)


def test_joint_term_jac_with_time_column():
    from trajopt_tpu.terms.joint import joint_motion_term
    T, D = 5, 2
    x = jnp.asarray(np.random.default_rng(5).uniform(-1, 1, T * (D + 1)))
    p = {"targets": jnp.zeros(D), "coeffs": jnp.ones(D)}
    t = joint_motion_term("j", 1, T, D, n_cols=D + 1)
    np.testing.assert_allclose(np.asarray(t.jac(x, p)),
                               _dense_jac(t, x, p), atol=1e-12)


def test_regroup_matches_dense():
    """ops.banded_rows.regroup: fine windows (any width w <= c+1) folded to
    2-superblock windows must represent the same dense matrix."""
    from trajopt_tpu.ops.banded_rows import bb_mv, bb_quad, bb_rmv, \
        bb_to_dense, regroup
    rng = np.random.default_rng(6)
    bs, T = 3, 12
    n = T * bs
    for c, w in [(2, 2), (2, 3), (3, 2), (3, 3), (3, 4)]:
        nsb = T // c
        n_g, r = 5, 2
        B = jnp.asarray(rng.normal(size=(n_g, r, w * bs)))
        G = jnp.asarray(rng.integers(0, T - w + 1, size=n_g), jnp.int32)
        # dense reference built by scatter
        D_ref = np.zeros((n_g * r, n))
        Bn = np.asarray(B)
        for g in range(n_g):
            g0 = int(G[g]) * bs
            D_ref[g * r:(g + 1) * r, g0:g0 + w * bs] = Bn[g]
        Bp, Gp = regroup(B, G, bs, c, nsb)
        b = c * bs
        np.testing.assert_allclose(
            np.asarray(bb_to_dense([Bp], [Gp], n, b)), D_ref, atol=1e-14)
        v = rng.normal(size=n)
        wv = rng.normal(size=n_g * r)
        np.testing.assert_allclose(
            np.asarray(bb_mv([Bp], [Gp], jnp.asarray(v), b)),
            D_ref @ v, atol=1e-12)
        np.testing.assert_allclose(
            np.asarray(bb_rmv([Bp], [Gp], jnp.asarray(wv), n, b)),
            D_ref.T @ wv, atol=1e-12)
        d = rng.uniform(0.5, 2.0, n_g * r)
        Dd, Od = bb_quad([Bp], [Gp], jnp.asarray(d), nsb, b)
        K_ref = D_ref.T @ np.diag(d) @ D_ref
        K = np.zeros((n, n))
        for i in range(nsb):
            K[i * b:(i + 1) * b, i * b:(i + 1) * b] = np.asarray(Dd[i])
            if i + 1 < nsb:
                K[(i + 1) * b:(i + 2) * b, i * b:(i + 1) * b] = np.asarray(Od[i])
                K[i * b:(i + 1) * b, (i + 1) * b:(i + 2) * b] = np.asarray(Od[i]).T
        np.testing.assert_allclose(K, K_ref, atol=1e-12)


def test_acc_jerk_banded_rows_jac_matches_dense():
    """Orders 2-3 now emit (order+1)-block windows; after regroup at the
    superblock size they must equal the dense analytic Jacobian."""
    from trajopt_tpu.ops.banded_rows import bb_to_dense, regroup
    from trajopt_tpu.terms.joint import joint_motion_term
    T, D = 12, 3
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.uniform(-1, 1, T * D))
    for order, c in [(2, 2), (3, 3), (2, 3)]:
        for tol in (False, True):
            p = {"targets": jnp.zeros(D), "coeffs": jnp.ones(D)}
            if tol:
                p["upper_tols"] = jnp.full((D,), 0.1)
                p["lower_tols"] = jnp.full((D,), -0.1)
            t = joint_motion_term("j", order, T, D, is_constraint=True,
                                  toleranced=tol)
            out = t.jac_banded(x, p)
            groups = out if isinstance(out, list) else [out]
            dense = []
            for B, G in groups:
                Bp, Gp = regroup(B, G, D, c, T // c)
                dense.append(np.asarray(
                    bb_to_dense([Bp], [Gp], T * D, c * D)))
            np.testing.assert_allclose(
                np.concatenate(dense), np.asarray(t.jac(x, p)), atol=1e-12)


def test_acc_jerk_constraint_problem_banded_vs_dense_solve():
    """VERDICT r3 item 6 'done' check: a problem whose ROW terms include
    acc/jerk (coupling 2-3) runs the no-dense-Jacobian banded-rows path
    (auto kkt_block = 3 * n_cols) and matches the forced-dense solve."""
    import dataclasses

    from trajopt_tpu.ops.qp import QPSettings
    from trajopt_tpu.problem.trajectory import (TrajProblemBuilder,
                                                interpolated_init)
    from trajopt_tpu.solver.sqp import _band_coupling, _plan, solve
    from trajopt_tpu.solver.types import CONVERGED, SQPParams
    from trajopt_tpu.terms.joint import (joint_acc_term, joint_jerk_term,
                                         joint_pos_term, joint_vel_term)

    T, D = 12, 3

    class _FakeChain:
        n_dof = D
        lb = np.full(D, -4.0)
        ub = np.full(D, 4.0)

    b = TrajProblemBuilder(_FakeChain(), T)
    b.add_cost(joint_vel_term("v", T, D),
               {"targets": np.zeros(D), "coeffs": np.ones(D)})
    b.add_cost(joint_acc_term("a", T, D, toleranced=True),
               {"targets": np.zeros(D), "coeffs": np.full(D, 2.0),
                "upper_tols": np.full(D, 0.05),
                "lower_tols": np.full(D, -0.05)})
    b.add_constraint(joint_jerk_term("j", T, D, is_constraint=True,
                                     toleranced=True),
                     {"targets": np.zeros(D), "coeffs": np.ones(D),
                      "upper_tols": np.full(D, 0.1),
                      "lower_tols": np.full(D, -0.1)})
    b.add_constraint(joint_pos_term("goal", T, D, first_step=T - 1,
                                    last_step=T - 1, is_constraint=True),
                     {"targets": np.full(D, 1.0), "coeffs": np.ones(D)})
    b.fix_timestep(0)
    init = interpolated_init(np.zeros(D), np.full(D, 1.0), T)
    spec, data = b.build(init)

    assert _band_coupling(spec) == 3
    assert _plan(spec).all_rows_banded  # every row term has window blocks
    p_auto = SQPParams(qp=QPSettings(solver="ipm", eps_abs=1e-8,
                                     eps_rel=1e-10))
    p_dense = SQPParams(qp=QPSettings(solver="ipm", eps_abs=1e-8,
                                      eps_rel=1e-10, kkt_block=T * D))
    r_auto = solve(spec, data, p_auto)
    r_dense = solve(spec, data, p_dense)
    assert int(r_auto.status) == CONVERGED
    assert int(r_dense.status) == CONVERGED
    np.testing.assert_allclose(np.asarray(r_auto.x), np.asarray(r_dense.x),
                               rtol=1e-5, atol=1e-6)
