"""Banded constraint-row blocks: the sparse Jacobian format of the SQP QP.

Every hinge/abs row of a trajectory subproblem touches at most two adjacent
trajectory steps (step_coupling <= 1: swept-collision gaps, per-step pose
rows, joint stencils — the band structure of SURVEY §5.7(a)).  Storing those
rows densely makes the interior-point solver stream an (m, n) matrix from
HBM several times per Newton step — at flagship shapes that dense matrix is
~15x larger than its nonzeros and dominates the whole solve.

Format: a row block group is ``(B, G)`` where ``B`` is ``(n_g, r, 2b)`` —
``n_g`` window groups (one per step/gap), ``r`` rows per group, each row a
``2b``-wide window over two adjacent size-``b`` column blocks — and ``G`` is
``(n_g,)`` int32 window start block indices (window = columns
``[G*b, (G+2)*b)``).  A full row set is a *tuple* of such groups (one per
term), concatenated in row order.

All operations below work per-group with einsums plus tiny scatter-adds on
``(n_blocks, b)`` grids — no (m, n) dense materialization anywhere.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def bb_sizes(Bs: Sequence[jax.Array]) -> list[int]:
    """Row count per group block."""
    return [int(B.shape[0] * B.shape[1]) for B in Bs]


def bb_split(Bs: Sequence[jax.Array], v: jax.Array) -> list[jax.Array]:
    """Split a flat (m,) row vector into per-group (n_g, r) pieces."""
    out, o = [], 0
    for B in Bs:
        ng, r = B.shape[0], B.shape[1]
        out.append(v[o:o + ng * r].reshape(ng, r))
        o += ng * r
    return out

def _windows(v: jax.Array, G: jax.Array, b: int) -> jax.Array:
    """Gather (n_g, 2b) windows of a flat (n,) vector at block starts G."""
    vb = v.reshape(-1, b)
    return jnp.concatenate([vb[G], vb[G + 1]], axis=-1)


def bb_mv(Bs, Gs, v: jax.Array, b: int) -> jax.Array:
    """A @ v for banded rows; returns (m,) in row order."""
    outs = []
    for B, G in zip(Bs, Gs):
        W = _windows(v, G, b)  # (n_g, 2b)
        outs.append(jnp.einsum("grw,gw->gr", B, W).reshape(-1))
    return (jnp.concatenate(outs) if outs
            else jnp.zeros((0,), v.dtype))


def bb_rmv(Bs, Gs, w: jax.Array, n: int, b: int) -> jax.Array:
    """A.T @ w for banded rows; returns (n,)."""
    nb = n // b
    acc = jnp.zeros((nb, b), w.dtype)
    for B, G, wg in zip(Bs, Gs, bb_split(Bs, w)):
        U = jnp.einsum("grw,gr->gw", B, wg)  # (n_g, 2b)
        acc = acc.at[G].add(U[:, :b])
        acc = acc.at[G + 1].add(U[:, b:])
    return acc.reshape(n)


def bb_rowmax(Bs) -> jax.Array:
    """max |row| per row (for row equilibration); (m,)."""
    outs = [jnp.max(jnp.abs(B), axis=-1).reshape(-1) for B in Bs]
    return (jnp.concatenate(outs) if outs
            else jnp.zeros((0,), jnp.float32))


def bb_scale_rows(Bs, s: jax.Array):
    """Multiply each row by a scalar; s is flat (m,)."""
    return tuple(B * sg[..., None]
                 for B, sg in zip(Bs, bb_split(Bs, s)))


def bb_scale_cols(Bs, Gs, c: jax.Array, b: int):
    """Multiply columns by a flat (n,) vector (e.g. a free-coordinate mask)."""
    return tuple(B * _windows(c, G, b)[:, None, :]
                 for B, G in zip(Bs, Gs))


def bb_quad(Bs, Gs, d: jax.Array, nb: int, b: int):
    """Block-tridiagonal blocks of A.T diag(d) A.

    Returns (D, O): D (nb, b, b) diagonal blocks, O (nb-1, b, b)
    sub-diagonal blocks (O[i] = K[block i+1, block i]).
    """
    dt = d.dtype
    D = jnp.zeros((nb, b, b), dt)
    O = jnp.zeros((nb - 1, b, b), dt)
    for B, G, dg in zip(Bs, Gs, bb_split(Bs, d)):
        W = jnp.einsum("grw,gr,grv->gwv", B, dg, B)  # (n_g, 2b, 2b)
        D = D.at[G].add(W[:, :b, :b])
        D = D.at[G + 1].add(W[:, b:, b:])
        O = O.at[G].add(W[:, b:, :b])
    return D, O


def bb_to_dense(Bs, Gs, n: int, b: int) -> jax.Array:
    """Materialize the dense (m, n) matrix (tests / dense fallbacks)."""
    rows = []
    for B, G in zip(Bs, Gs):
        ng, r, w = B.shape
        Jg = jnp.zeros((ng, r, n // b, b), B.dtype)
        g = jnp.arange(ng)
        Jg = Jg.at[g, :, G, :].set(B[:, :, :b])
        Jg = Jg.at[g, :, G + 1, :].set(
            Jg[g, :, G + 1, :] + B[:, :, b:])
        rows.append(Jg.reshape(ng * r, n))
    return (jnp.concatenate(rows) if rows
            else jnp.zeros((0, n), jnp.float32))


def regroup(B: jax.Array, G: jax.Array, bs: int, c: int, nsb: int):
    """Regroup fine windows to 2-superblock windows at block size c*bs.

    ``B`` is ``(n_g, r, w*bs)`` — windows of ``w`` consecutive fine blocks
    starting at fine block ``G``.  With superblocks of ``c`` fine blocks, a
    window of ``w <= c + 1`` fine blocks always fits in two ADJACENT
    superblocks (G = a*c + s, 0 <= s < c implies floor((G+c)/c) = a + 1),
    so rows coupling up to ``c`` trajectory steps — joint_acc/jerk stencils,
    trajectory_costs.cpp:775 — keep the 2-window format at the coarser
    block size and every bb_* op below works unchanged with b = c*bs.
    Returns ``(B' (n_g, r, 2*c*bs), G' (n_g,))`` with G' in superblocks.
    """
    n_g, r, wbs = B.shape
    w = wbs // bs
    if c == 1:
        if w == 2:
            return B, G
        raise ValueError(f"window of {w} fine blocks needs superblock c >= {w - 1}")
    if w > c + 1:
        raise ValueError(f"window of {w} fine blocks needs superblock c >= {w - 1}")
    G = jnp.asarray(G, jnp.int32)
    Gs = jnp.minimum(G // c, nsb - 2)
    off = (G - Gs * c) * bs  # placement offset in [0, (2c-w)*bs]
    out0 = jnp.zeros((r, 2 * c * bs), B.dtype)
    Bp = jax.vmap(
        lambda rows, o: jax.lax.dynamic_update_slice(
            out0, rows, (jnp.int32(0), o))
    )(B, off)
    return Bp, Gs.astype(jnp.int32)


def step_window(Js: jax.Array, steps, nb: int):
    """Place per-step row blocks into 2-block windows.

    Js: (n_g, r, b) rows that each depend on ONE step's columns; steps:
    (n_g,) the step index of each group.  Returns (B (n_g, r, 2b), G):
    interior steps sit in the window's first block; the last step (which
    has no successor block) sits in the second block of window nb-2.
    """
    steps = jnp.asarray(steps, jnp.int32)
    G = jnp.minimum(steps, nb - 2)
    off = steps - G  # 0 or 1
    z = jnp.zeros_like(Js)
    left = jnp.concatenate([Js, z], axis=-1)
    right = jnp.concatenate([z, Js], axis=-1)
    B = jnp.where((off == 0)[:, None, None], left, right)
    return B, G
