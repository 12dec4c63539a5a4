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
    _, (Ls, Ms) = jax.lax.scan(step, L0, (D[1:], O), unroll=True)
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

    _, ys = jax.lax.scan(fstep, y0, (LD[1:], LM, r[1:]), unroll=True)
    y = jnp.concatenate([y0[None], ys], axis=0)

    # backward: L' x = y
    xT = solve_upper_small(LD[-1], y[-1])

    def bstep(xnext, inp):
        Li, Mnext, yi = inp
        xi = solve_upper_small(
            Li, yi - jnp.einsum("...ji,...j->...i", Mnext, xnext))
        return xi, xi

    _, xs = jax.lax.scan(bstep, xT, (LD[:-1], LM, y[:-1]), reverse=True,
                         unroll=True)
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


# --------------------------------------------------------------------------
# Scalarized (fully unrolled, fusion-friendly) variants
# --------------------------------------------------------------------------
#
# The scan/array kernels above lower each b x b block step into ~15 separate
# TPU kernels (dynamic-update-slices from ``.at`` and one reduce kernel per
# tiny einsum); at T=30 that is ~2,400 kernel launches per Newton iteration
# and launch overhead dominates (measured ~1.4 us/kernel).  The *_scalar
# variants below unroll everything into plain scalar arithmetic on
# batch-shaped values — no reductions, no dynamic-update-slice — so XLA
# fuses the whole factor/solve chain into a handful of kernels (~7x faster
# inside the IPM loop).  The factor is an opaque nested-list structure
# consumed only by btd_solve_scalar.


def _chol_s(A, b, tiny):
    L = [[None] * b for _ in range(b)]
    for j in range(b):
        s = A[j][j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        d = jnp.sqrt(jnp.maximum(s, tiny))
        L[j][j] = d
        inv = 1.0 / d
        for i in range(j + 1, b):
            r = A[i][j]
            for k in range(j):
                r = r - L[i][k] * L[j][k]
            L[i][j] = r * inv
    return L


def _solve_lower_vec_s(L, r, b):
    x = [None] * b
    for j in range(b):
        s = r[j]
        for k in range(j):
            s = s - L[j][k] * x[k]
        x[j] = s / L[j][j]
    return x


def _solve_upper_vec_s(L, r, b):
    x = [None] * b
    for j in range(b - 1, -1, -1):
        s = r[j]
        for k in range(j + 1, b):
            s = s - L[k][j] * x[k]
        x[j] = s / L[j][j]
    return x


def btd_factor_scalar(D: jax.Array, O: jax.Array):
    """Scalarized block Cholesky; same math as btd_factor.

    D (T, b, b), O (T-1, b, b) -> opaque factor for btd_solve_scalar.
    """
    T, b = D.shape[0], D.shape[1]
    dt = D.dtype
    tiny = jnp.asarray(1e-30 if dt == jnp.float64 else 1e-18, dt)
    Ds = [[[D[t, i, j] for j in range(b)] for i in range(b)] for t in range(T)]
    Os = [[[O[t, i, j] for j in range(b)] for i in range(b)]
          for t in range(T - 1)]
    LD = [None] * T
    LM = [None] * (T - 1)
    LD[0] = _chol_s(Ds[0], b, tiny)
    for t in range(1, T):
        M = [None] * b
        for i in range(b):  # M = O L^{-T}: row i solves L y = O_row_i
            M[i] = _solve_lower_vec_s(
                LD[t - 1], [Os[t - 1][i][k] for k in range(b)], b)
        S = [[Ds[t][i][j] - sum(M[i][k] * M[j][k] for k in range(b))
              for j in range(b)] for i in range(b)]
        LM[t - 1] = M
        LD[t] = _chol_s(S, b, tiny)
    return (LD, LM, T, b)


def btd_solve_scalar(factor, r: jax.Array) -> jax.Array:
    """Solve K x = r given btd_factor_scalar output. r: (T, b) -> (T, b)."""
    LD, LM, T, b = factor
    rs = [[r[t, i] for i in range(b)] for t in range(T)]
    ys = [None] * T
    ys[0] = _solve_lower_vec_s(LD[0], rs[0], b)
    for t in range(1, T):
        rhs = [rs[t][i] - sum(LM[t - 1][i][k] * ys[t - 1][k]
                              for k in range(b)) for i in range(b)]
        ys[t] = _solve_lower_vec_s(LD[t], rhs, b)
    xs = [None] * T
    xs[T - 1] = _solve_upper_vec_s(LD[T - 1], ys[T - 1], b)
    for t in range(T - 2, -1, -1):
        rhs = [ys[t][i] - sum(LM[t][k][i] * xs[t + 1][k] for k in range(b))
               for i in range(b)]
        xs[t] = _solve_upper_vec_s(LD[t], rhs, b)
    return jnp.stack([jnp.stack(x) for x in xs])
