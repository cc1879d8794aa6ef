"""Newton's method for root finding of vector functions.

Parity with /root/reference/src/opt/newton.js:23 (`root_newton_gen`,
solved via la.solve each step).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..la.lu import lu_decomp, lu_solve

__all__ = ["root_newton_gen", "root_newton"]


def _step(fJ, x):
    F, J = fJ(x)
    lu, p = lu_decomp(J)
    dx = lu_solve(lu, p, -F[:, None])[:, 0]
    return x + dx


def root_newton_gen(fJ, x0):
    """Generator yielding x per Newton iteration (ref: newton.js:23).
    ``fJ(x) -> (F, J)``."""
    x = jnp.asarray(x0)
    step = jax.jit(functools.partial(_step, fJ))
    while True:
        yield x
        x = step(x)


def root_newton(fJ, x0, tol: float = 1e-12, max_iter: int = 64):
    """In-graph Newton root finder. Returns (x, n_iter)."""
    x0 = jnp.asarray(x0)

    def cond(st):
        x, it = st
        F, _ = fJ(x)
        return (it < max_iter) & (jnp.max(jnp.abs(F)) > tol)

    def body(st):
        x, it = st
        return _step(fJ, x), it + 1

    x, it = jax.lax.while_loop(cond, body,
                               (x0, jnp.zeros((), jnp.int32)))
    return x, it
