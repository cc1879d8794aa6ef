"""Unpivoted LDLᵀ decomposition & solve.

Parity with /root/reference/src/la/ldl.js (`_ldl_decomp`/`ldl_decomp`/
`ldl_solve` :47,68,96,134). Same blocked-recursion design as cholesky.py
but with a diagonal D and no square roots — works for symmetric
indefinite matrices whose leading minors are nonsingular (for the
general pivoted case see pldlp.py, Bunch-Kaufman).

Returns (LD, d): LD packs unit-L below the diagonal, d is the diagonal
of D (the reference packs D on LD's diagonal; we return it separately —
``ldl_solve`` accepts our packing).
"""
from __future__ import annotations

import jax.numpy as jnp

from .. import config as _config
from ..core.mm import mm, mt
from ..config import default_float_for
from .tri import _tril_inv_core, tril_solve, tril_t_solve

__all__ = ["ldl_decomp", "ldl_solve"]

_BASE = 16


def _ldl_base(a):
    n = a.shape[-1]
    cols = []
    ds = []
    for j in range(n):
        if j == 0:
            d = a[..., 0, 0]
            ds.append(d)
            cols.append(a[..., :, 0] / d[..., None])
        else:
            prev = jnp.stack(cols, axis=-1)                  # (..., n, j)
            lj = prev[..., j, :]                             # (..., j)
            dvec = jnp.stack(ds, axis=-1)                    # (..., j)
            acc = jnp.einsum("...nk,...k->...n", prev, lj * dvec,
                             precision=_config.matmul_precision)
            col = a[..., :, j] - acc
            d = col[..., j]
            ds.append(d)
            cols.append(col / d[..., None])
    l = jnp.tril(jnp.stack(cols, axis=-1))
    return l, jnp.stack(ds, axis=-1)


def _ldl_core(a):
    n = a.shape[-1]
    if n <= _BASE:
        return _ldl_base(a)
    m = n // 2
    l11, d1 = _ldl_core(a[..., :m, :m])
    # L21 = A21 · L11⁻ᵀ · D1⁻¹
    l21 = mm(a[..., m:, :m], mt(_tril_inv_core(l11))) / d1[..., None, :]
    a22 = a[..., m:, m:] - mm(l21 * d1[..., None, :], mt(l21))
    l22, d2 = _ldl_core(a22)
    top = jnp.concatenate(
        [l11, jnp.zeros(l11.shape[:-2] + (m, n - m), a.dtype)], axis=-1)
    bot = jnp.concatenate([l21, l22], axis=-1)
    return (jnp.concatenate([top, bot], axis=-2),
            jnp.concatenate([d1, d2], axis=-1))


def ldl_decomp(a):
    """A = L·D·Lᵀ with unit-lower L (ref: ldl.js:68). Batched.

    Returns (L, d) with d the diagonal of D.
    """
    a = jnp.asarray(a)
    a = a.astype(default_float_for(a.dtype))
    return _ldl_core(a)


def ldl_solve(l, d, y):
    """Solve A @ x = y given (L, d) from :func:`ldl_decomp`
    (ref: ldl.js:134)."""
    z = tril_solve(l, y)
    z = z / jnp.asarray(d)[..., :, None]
    return tril_t_solve(l, z)
