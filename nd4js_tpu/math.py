"""Polymorphic scalar/array math — API parity with the reference's
``math`` dispatch object (/root/reference/src/math.js:22-101).

In JS this module dispatches between numbers and Complex instances; in
JAX the dispatch is jnp's dtype promotion, so these are thin wrappers
kept for a familiar surface (they accept scalars, arrays, and — on CPU
backends — complex values).
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["add", "sub", "mul", "div", "neg", "abs", "sqrt", "exp",
           "conj", "is_close", "cbrt", "atan2", "hypot", "sign",
           "min", "max"]

add = jnp.add
sub = jnp.subtract
mul = jnp.multiply
div = jnp.divide
neg = jnp.negative
abs = jnp.abs                     # noqa: A001 — reference name
sqrt = jnp.sqrt
exp = jnp.exp
conj = jnp.conjugate
cbrt = jnp.cbrt
atan2 = jnp.arctan2
hypot = jnp.hypot
sign = jnp.sign
min = jnp.minimum                 # noqa: A001
max = jnp.maximum                 # noqa: A001


def is_close(x, y, rtol: float = 1e-5, atol: float = 1e-8):
    """ref: math.js `is_close` — same defaults as the test matchers
    (jasmine_utils.js:142)."""
    return jnp.isclose(x, y, rtol=rtol, atol=atol)
