"""LU decomposition with partial pivoting, blocked for the MXU.

Parity with /root/reference/src/la/lu.js (`lu_decomp` :24-81 packed LU +
permutation vector, `lu_solve` :84-177 permuted fwd/back substitution).

TPU-first redesign: the reference's scalar right-looking loop becomes a
*blocked* right-looking factorisation — an unblocked panel factorisation
(``lax.fori_loop`` of vectorised rank-1 updates on an (M, B) panel; the
pivot search is a masked argmax) followed by a unit-triangular solve for
the U panel and one trailing-matrix GEMM per panel. The panel loop runs
over static offsets (Python loop), so all shapes stay static and the
whole thing jits/vmaps.

Conventions:
  * ``lu_decomp(A) -> (LU, P)`` with ``A[..., P, :] = L @ U`` — P is an
    int32 row-permutation vector of length M (the reference packs the
    same way).
  * Singular pivots do not raise (matching lu.js): a zero pivot yields a
    zero L column and zero U diagonal; ``lu_solve`` then produces
    inf/nan exactly like the reference's division does.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.batch import batched
from ..core.mm import mm, mt
from ..config import default_float_for
from .tri import _tril_inv_core, triu_solve

__all__ = ["lu_decomp", "lu_solve"]

_PANEL = 128


def _lu_panel(panel, k, rows):
    """Unblocked partially-pivoted LU of ``panel`` (M, B), whose columns
    are global columns [k, k+B). Rows above k are frozen (already
    factored). Returns (panel, perm) where perm is the row permutation
    (length M) this panel applied."""
    M, B = panel.shape
    perm0 = jnp.arange(M, dtype=jnp.int32)
    cols = jnp.arange(B)

    def body(j, carry):
        panel, perm = carry
        rj = k + j
        col = panel[:, j]
        cand = jnp.where(rows >= rj, jnp.abs(col), -jnp.inf)
        p = jnp.argmax(cand).astype(jnp.int32)
        # swap rows rj <-> p (panel eagerly, perm by entry swap)
        row_a, row_b = panel[rj], panel[p]
        panel = panel.at[rj].set(row_b).at[p].set(row_a)
        pa, pb = perm[rj], perm[p]
        perm = perm.at[rj].set(pb).at[p].set(pa)
        piv = panel[rj, j]
        safe = jnp.where(piv == 0, jnp.ones_like(piv), piv)
        col = panel[:, j]
        l = jnp.where(rows > rj, col / safe, jnp.zeros_like(col))
        urow = jnp.where(cols > j, panel[rj], jnp.zeros_like(panel[rj]))
        panel = panel - jnp.outer(l, urow)
        new_col = jnp.where(rows > rj, l, panel[:, j])
        panel = panel.at[:, j].set(new_col)
        return panel, perm

    return jax.lax.fori_loop(0, min(B, M - k), body, (panel, perm0))


def _lu_core(a):
    """Core 2-D blocked LU. a: (M, N) float. Returns (LU, P)."""
    M, N = a.shape
    K = min(M, N)
    rows = jnp.arange(M)
    perm = jnp.arange(M, dtype=jnp.int32)
    for k in range(0, K, _PANEL):
        b = min(_PANEL, K - k)
        panel, p = _lu_panel(a[:, k:k + b], k, rows)
        # apply this panel's row swaps to the rest of the matrix
        left = a[:, :k][p] if k > 0 else a[:, :0]
        rest = a[:, k + b:][p] if k + b < N else a[:, k + b:]
        perm = perm[p]
        if k + b < N:
            # U panel: solve unit-L_kk @ U = rest_top
            l_kk = panel[k:k + b, :]                       # (b, b) unit lower
            l_unit = jnp.tril(l_kk, -1) + jnp.eye(b, dtype=a.dtype)
            u_top = mm(_tril_inv_core(l_unit), rest[k:k + b])
            # trailing GEMM
            l_below = panel[k + b:, :]                     # (M-k-b, b)
            trail = rest[k + b:] - mm(l_below, u_top)
            rest = jnp.concatenate([rest[:k], u_top, trail], axis=0)
        a = jnp.concatenate([left, panel, rest], axis=1)
    return a, perm


@batched((2,))
def lu_decomp(a):
    """Packed LU with partial pivoting (ref: lu.js:24-81).

    Returns (LU, P): LU (..., M, N) packs unit-L below the diagonal and U
    on/above it; P (..., M) int32 with A[..., P, :] = L @ U.
    """
    a = jnp.asarray(a)
    a = a.astype(default_float_for(a.dtype))
    return _lu_core(a)


def lu_solve(lu, p, y):
    """Solve A @ x = y given (LU, P) from :func:`lu_decomp`
    (ref: lu.js:84-177). Leading dims broadcast."""
    lu = jnp.asarray(lu)
    y = jnp.asarray(y).astype(lu.dtype)
    p = jnp.asarray(p)

    @batched((2, 1, 2))
    def _solve(lu, p, y):
        n = lu.shape[0]
        yp = y[p]
        l_unit = jnp.tril(lu, -1) + jnp.eye(n, dtype=lu.dtype)
        z = mm(_tril_inv_core(l_unit), yp)
        return triu_solve.core(jnp.triu(lu), z, method="block")

    return _solve(lu, p, y)
