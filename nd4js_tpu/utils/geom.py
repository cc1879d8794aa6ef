"""Geometry helpers.

Parity with /root/reference/src/geom/simplex.js:23 (`regular_simplex`,
used by Nelder-Mead initialisation).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..config import default_float

__all__ = ["regular_simplex"]


def regular_simplex(n: int, dtype=None):
    """(n+1, n) vertices of a regular simplex centred at the origin with
    unit edge midpoint distances... vertices are pairwise equidistant
    (ref: geom/simplex.js:23)."""
    dtype = dtype or default_float
    # classic construction: start from scaled identity + constant vector
    eye = jnp.eye(n, dtype=dtype)
    a = (1.0 - 1.0 / (n + 1) ** 0.5) / n
    base = eye - a
    last = -jnp.ones((1, n), dtype) / (n + 1) ** 0.5
    v = jnp.concatenate([base, last], axis=0)
    # centre at origin
    return v - v.mean(axis=0, keepdims=True)
