"""Triangular extractors, solves, and inversion.

Parity with /root/reference/src/la/tri.js (tril/triu :23,34; in-place
substitution kernels `_tril_solve` :45, `_triu_solve` :73, transposed
variants :100,128; public broadcasting solves :156,226).

TPU-first redesign: the reference's scalar substitution loops become

  * ``method='scan'``  — row substitution as a ``lax.scan`` (N sequential
    steps, each a fused VPU row op). Bit-for-bit the classical algorithm;
    used as the accuracy reference.
  * ``method='inv'``   — recursive *blocked inversion*: a lower-triangular
    matrix [[A,0],[B,C]] has inverse [[A⁻¹,0],[-C⁻¹BA⁻¹,C⁻¹]]. Python
    recursion over static shapes yields a log₂(N)-depth tree of GEMMs —
    the MXU-friendly path. The solve is then one GEMM.

``tril_solve``/``triu_solve`` broadcast over leading dims like every
reference la/ routine (see core/batch.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.batch import batched
from ..core.mm import mm

__all__ = [
    "tril", "triu", "tri_inv",
    "tril_solve", "triu_solve", "tril_t_solve", "triu_t_solve",
]


def tril(a, k: int = 0):
    """Lower-triangular part (ref: tri.js:23)."""
    return jnp.tril(jnp.asarray(a), k=k)


def triu(a, k: int = 0):
    """Upper-triangular part (ref: tri.js:34)."""
    return jnp.triu(jnp.asarray(a), k=k)


# ---------------------------------------------------------------- inversion

_INV_BASE = 16


def _tril_inv_core(L):
    """Explicit inverse of a lower-triangular matrix, log-depth recursion."""
    n = L.shape[-1]
    if n <= _INV_BASE:
        # unrolled forward substitution against I (static python loop)
        eye = jnp.eye(n, dtype=L.dtype)
        cols = []
        rows = []
        for i in range(n):
            if i == 0:
                xi = eye[0] / L[..., 0, 0, None]
            else:
                prev = jnp.stack(rows, axis=-2)          # (..., i, n)
                acc = jnp.einsum("...j,...jk->...k", L[..., i, :i], prev,
                           precision="highest")
                xi = (eye[i] - acc) / L[..., i, i, None]
            rows.append(xi)
        return jnp.stack(rows, axis=-2)
    m = n // 2
    A = L[..., :m, :m]
    B = L[..., m:, :m]
    C = L[..., m:, m:]
    iA = _tril_inv_core(A)
    iC = _tril_inv_core(C)
    BA = mm(B, iA)
    lower = -mm(iC, BA)
    top = jnp.concatenate(
        [iA, jnp.zeros(iA.shape[:-2] + (m, n - m), L.dtype)], axis=-1)
    bot = jnp.concatenate([lower, iC], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def tri_inv(a, lower: bool = True):
    """Inverse of a triangular matrix (batched over leading dims)."""
    a = jnp.asarray(a)
    if lower:
        return _tril_inv_core(a)
    # reverse both axes: rev(U) is lower triangular
    rev = a[..., ::-1, ::-1]
    return _tril_inv_core(rev)[..., ::-1, ::-1]


# ------------------------------------------------------------------- solves

def _tril_solve_scan(L, y):
    """Forward substitution via lax.scan (core 2-D kernel)."""
    n = L.shape[0]

    def body(x, i):
        li = jax.lax.dynamic_slice_in_dim(L, i, 1, axis=0)[0]      # (n,)
        acc = jnp.matmul(li, x, precision="highest")               # (k,)
        yi = jax.lax.dynamic_slice_in_dim(y, i, 1, axis=0)[0]
        xi = (yi - acc) / li[i]
        x = jax.lax.dynamic_update_slice_in_dim(x, xi[None, :], i, axis=0)
        return x, None

    x0 = jnp.zeros_like(y)
    x, _ = jax.lax.scan(body, x0, jnp.arange(n))
    return x


def _tril_solve_blocked(L, y, block: int = 128):
    """Blocked substitution: diagonal blocks inverted (log-depth GEMM
    tree), off-diagonal updates are GEMMs. Python loop over static block
    offsets keeps all shapes static."""
    n = L.shape[-2]
    if n <= block:
        return mm(_tril_inv_core(L), y)
    xs = []
    for i0 in range(0, n, block):
        i1 = min(i0 + block, n)
        rhs = y[..., i0:i1, :]
        if i0 > 0:
            xdone = jnp.concatenate(xs, axis=-2)
            rhs = rhs - mm(L[..., i0:i1, :i0], xdone)
        xs.append(mm(_tril_inv_core(L[..., i0:i1, i0:i1]), rhs))
    return jnp.concatenate(xs, axis=-2)


def _solve_core(L, y, method: str):
    if method == "scan":
        return _tril_solve_scan(L, y)
    if method == "inv":
        return mm(_tril_inv_core(L), y)
    if method == "block":
        return _tril_solve_blocked(L, y)
    raise ValueError(f"unknown method {method!r}")


@batched((2, 2))
def tril_solve(L, y, method: str = "block"):
    """Solve L @ x = y with L lower-triangular (ref: tri.js:156).

    ``L``: (..., N, N); ``y``: (..., N, K). Leading dims broadcast.
    """
    return _solve_core(L, y, method)


@batched((2, 2))
def triu_solve(U, y, method: str = "block"):
    """Solve U @ x = y with U upper-triangular (ref: tri.js:226)."""
    # rev(U) is lower triangular; solve in reversed coordinates.
    x = _solve_core(U[::-1, ::-1], y[::-1, :], method)
    return x[::-1, :]


def tril_t_solve(L, y, method: str = "block"):
    """Solve Lᵀ @ x = y (ref: tri.js:100)."""
    return triu_solve(jnp.swapaxes(jnp.asarray(L), -1, -2), y, method=method)


def triu_t_solve(U, y, method: str = "block"):
    """Solve Uᵀ @ x = y (ref: tri.js:128)."""
    return tril_solve(jnp.swapaxes(jnp.asarray(U), -1, -2), y, method=method)
