"""Square-system solve facade.

Parity with /root/reference/src/la/solve.js:23 — `solve` is RRQR-backed
(rank-revealing, raises SingularMatrixSolveError on numerically singular
input at the eager boundary; inside jit it returns the masked
best-effort solution like rrqr_lstsq).
"""
from __future__ import annotations

import jax.numpy as jnp

from .rrqr import rrqr_decomp, rrqr_solve

__all__ = ["solve"]


def solve(a, y):
    """Solve A @ x = y for square A (ref: solve.js:23). Batched."""
    a = jnp.asarray(a)
    if a.shape[-1] != a.shape[-2]:
        raise ValueError("solve() requires square matrices; use lstsq()")
    q, r, p = rrqr_decomp(a)
    return rrqr_solve(q, r, p, y)
