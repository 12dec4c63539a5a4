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
