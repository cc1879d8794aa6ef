"""Cholesky decomposition & solve, blocked recursion for the MXU.

Parity with /root/reference/src/la/cholesky.js (`_cholesky_decomp`
row-oriented with Kahan-compensated inner products :27-47, public
`cholesky_decomp` :50, `cholesky_solve` :75).

TPU-first redesign: recursive 2×2 blocking
    A = [[A11, ·], [A21, A22]]:
    L11 = chol(A11); L21 = A21·L11⁻ᵀ; L22 = chol(A22 − L21·L21ᵀ)
over static shapes — a log-depth tree whose work is all GEMMs (the
reference's Kahan inner products are replaced by f32-full MXU
accumulation; see core/mm.py). The unrolled base case keeps the exact
classical recurrence.

Non-SPD inputs produce NaNs (sqrt of a negative) rather than the
reference's thrown Error; the eager wrapper can check when not traced.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.batch import batched
from ..core.mm import mm, mt
from ..config import default_float_for
from .tri import _tril_inv_core, tril_solve, tril_t_solve

__all__ = ["cholesky_decomp", "cholesky_solve"]

_BASE = 32


def _chol_base(a):
    """Unrolled outer-product Cholesky for n <= _BASE (static python
    loop, ~7 ops per step — kept graph-lean because every recursion
    leaf instantiates one of these)."""
    n = a.shape[-1]
    ii = jnp.arange(n)
    cols = []
    for j in range(n):
        d = jnp.sqrt(a[..., j, j])[..., None]                 # (..., 1)
        # no zero-guard: a non-SPD pivot must yield NaN (module contract)
        col = jnp.where(ii >= j, a[..., :, j], 0.0) / d       # (..., n)
        cols.append(col)
        # rank-1 trailing update; rows/cols <= j become stale-but-unread
        a = a - col[..., :, None] * col[..., None, :]
    return jnp.stack(cols, axis=-1)


def _chol_core(a):
    n = a.shape[-1]
    if n <= _BASE:
        return _chol_base(a)
    m = n // 2
    a11 = a[..., :m, :m]
    a21 = a[..., m:, :m]
    a22 = a[..., m:, m:]
    l11 = _chol_core(a11)
    l21 = mm(a21, mt(_tril_inv_core(l11)))
    l22 = _chol_core(a22 - mm(l21, mt(l21)))
    top = jnp.concatenate(
        [l11, jnp.zeros(l11.shape[:-2] + (m, n - m), a.dtype)], axis=-1)
    bot = jnp.concatenate([l21, l22], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def cholesky_decomp(a):
    """Lower Cholesky factor L with A = L·Lᵀ (ref: cholesky.js:50).
    Batched over leading dims."""
    a = jnp.asarray(a)
    a = a.astype(default_float_for(a.dtype))
    return _chol_core(a)


def cholesky_solve(l, y):
    """Solve A @ x = y given L from :func:`cholesky_decomp`
    (ref: cholesky.js:75)."""
    z = tril_solve(l, y)
    return tril_t_solve(l, z)
