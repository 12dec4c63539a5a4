"""Batched block-tridiagonal Cholesky for trajectory KKT systems.

The SQP subproblem's condensed KKT matrix K = P + J' D J + D_box is
block-tridiagonal whenever every term couples at most ADJACENT trajectory
steps (joint_vel stencils, swept-collision gaps, per-step pose terms — the
banded structure the reference's trajectory Hessian always has, SURVEY §5.7a;
stencil precedent: trajopt_ifopt/src/constraints/joint_velocity_constraint.cpp:95-150).

XLA's dense Cholesky + triangular solve lower onto the TPU as long blocked
sequential loops — at trajectory sizes (n = 210 for 30x7) they dominate the
whole solve.  This module factors the SAME matrix as T tiny (b x b) block
steps via ``lax.scan``:

    L_0 = chol(D_0)
    M_i = O_i L_{i-1}^{-T}                       (i = 1..T-1)
    L_i = chol(D_i - M_i M_i')

so K = L L' with L block-bidiagonal; solves are one forward and one backward
scan.  The b x b Cholesky/triangular kernels are fully UNROLLED (static b),
so each scan step is a handful of fused vector ops on (batch, b, b) tiles —
sequential depth T instead of O(n) blocked-loop iterations.

All kernels take arbitrary leading batch dimensions and are vmap-safe (the
IPM/ADMM callers vmap the whole solver over problem instances).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def chol_small(A: jax.Array) -> jax.Array:
    """Unrolled Cholesky of (..., b, b) SPD blocks (lower factor).

    b is static and small (a trajectory state dimension, <= ~16).  The
    diagonal is floored at a tiny positive value so a marginally indefinite
    block yields finite garbage caught by the caller's NaN/descent guards
    rather than NaNs that poison the scan carry.
    """
    b = A.shape[-1]
    dt = A.dtype
    tiny = jnp.asarray(1e-30 if dt == jnp.float64 else 1e-18, dt)
    L = jnp.zeros_like(A)
    for j in range(b):
        s = A[..., j, j] - jnp.sum(L[..., j, :j] * L[..., j, :j], axis=-1)
        d = jnp.sqrt(jnp.maximum(s, tiny))
        L = L.at[..., j, j].set(d)
        if j + 1 < b:
            r = A[..., j + 1:, j] - jnp.einsum(
                "...ik,...k->...i", L[..., j + 1:, :j], L[..., j, :j])
            L = L.at[..., j + 1:, j].set(r / d[..., None])
    return L


def solve_lower_small(L: jax.Array, R: jax.Array) -> jax.Array:
    """Unrolled forward substitution: X with L X = R.

    L is (..., b, b) lower-triangular; R is (..., b) or (..., b, k).
    """
    vec = R.ndim == L.ndim - 1
    if vec:
        R = R[..., None]
    b = L.shape[-1]
    X = jnp.zeros_like(R)
    for j in range(b):
        s = R[..., j, :] - jnp.einsum(
            "...k,...kc->...c", L[..., j, :j], X[..., :j, :])
        X = X.at[..., j, :].set(s / L[..., j, j][..., None])
    return X[..., 0] if vec else X


def solve_upper_small(L: jax.Array, R: jax.Array) -> jax.Array:
    """Unrolled back substitution: X with L' X = R (L lower-triangular)."""
    vec = R.ndim == L.ndim - 1
    if vec:
        R = R[..., None]
    b = L.shape[-1]
    X = jnp.zeros_like(R)
    for j in range(b - 1, -1, -1):
        # (L')[j, i] = L[i, j] for i > j
        s = R[..., j, :] - jnp.einsum(
            "...k,...kc->...c", L[..., j + 1:, j], X[..., j + 1:, :])
        X = X.at[..., j, :].set(s / L[..., j, j][..., None])
    return X[..., 0] if vec else X


def btd_factor(D: jax.Array, O: jax.Array):
    """Block Cholesky of a block-tridiagonal SPD matrix.

    D: (T, b, b) diagonal blocks; O: (T-1, b, b) SUB-diagonal blocks
    (O[i] = K[block i+1, block i]).  Returns (LD, LM): LD (T, b, b) lower
    Cholesky factors, LM (T-1, b, b) off-diagonal factor blocks, so that
    the full factor L has diag blocks LD[i] and sub-diag blocks LM[i].
    """
    L0 = chol_small(D[..., 0, :, :] if D.ndim > 3 else D[0])

    def step(Lprev, inp):
        Di, Oi = inp
        # M = O L_prev^{-T}:  solve L_prev Y = O', M = Y'
        Y = solve_lower_small(Lprev, jnp.swapaxes(Oi, -1, -2))
        M = jnp.swapaxes(Y, -1, -2)
        S = Di - M @ jnp.swapaxes(M, -1, -2)
        Li = chol_small(S)
        return Li, (Li, M)

    if D.ndim > 3:  # explicit batch axis ahead of T: scan over axis -3
        raise ValueError("batch via vmap, not explicit leading axes")
    _, (Ls, Ms) = jax.lax.scan(step, L0, (D[1:], O))
    LD = jnp.concatenate([L0[None], Ls], axis=0)
    return LD, Ms


def btd_solve(LD: jax.Array, LM: jax.Array, r: jax.Array) -> jax.Array:
    """Solve K x = r given btd_factor output. r: (T, b) -> x: (T, b)."""
    # forward: L y = r
    y0 = solve_lower_small(LD[0], r[0])

    def fstep(yprev, inp):
        Li, Mi, ri = inp
        yi = solve_lower_small(
            Li, ri - jnp.einsum("...ij,...j->...i", Mi, yprev))
        return yi, yi

    _, ys = jax.lax.scan(fstep, y0, (LD[1:], LM, r[1:]))
    y = jnp.concatenate([y0[None], ys], axis=0)

    # backward: L' x = y
    xT = solve_upper_small(LD[-1], y[-1])

    def bstep(xnext, inp):
        Li, Mnext, yi = inp
        xi = solve_upper_small(
            Li, yi - jnp.einsum("...ji,...j->...i", Mnext, xnext))
        return xi, xi

    _, xs = jax.lax.scan(bstep, xT, (LD[:-1], LM, y[:-1]), reverse=True)
    return jnp.concatenate([xs, xT[None]], axis=0)


def blocks_from_dense(K: jax.Array, n_blocks: int, b: int):
    """Extract (D, O) block-tridiagonal views of a dense (n, n) matrix.

    Entries of K outside the block-tridiagonal band are IGNORED — callers
    must guarantee the true matrix is banded (the SQP layer checks every
    term's ``step_coupling`` before enabling this path).
    """
    K4 = K.reshape(n_blocks, b, n_blocks, b)
    idx = jnp.arange(n_blocks)
    D = K4[idx, :, idx, :]
    O = K4[idx[1:], :, idx[:-1], :]
    return D, O
