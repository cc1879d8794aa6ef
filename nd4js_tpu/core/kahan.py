"""Compensated accumulation — functional KahanSum equivalent.

The reference uses a stateful ``KahanSum`` accumulator
(/root/reference/src/kahan_sum.js:19) inside Cholesky's inner products
(/root/reference/src/la/cholesky.js:27-47). On TPU the equivalent is a
vectorised compensated reduction: float32 matmuls already accumulate in
float32 on the MXU, and where that is not enough we sum with an error-free
two-sum transformation. These helpers run on device, vmap/jit cleanly.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["kahan_sum", "two_sum", "kahan_dot"]


def two_sum(a, b):
    """Error-free transformation: a + b = s + err exactly (Knuth)."""
    s = a + b
    bb = s - a
    err = (a - bb) + (b - (s - bb))
    return s, err


def kahan_sum(x, axis=None):
    """Compensated (Kahan-Babuška) sum along ``axis``.

    Sequential over the reduced axis via ``lax.scan`` — use for accuracy-
    critical small/medium reductions, not throughput paths.
    """
    x = jnp.asarray(x)
    if axis is None:
        x = x.reshape(-1)
        axis = 0
    x = jnp.moveaxis(x, axis, 0)

    def body(carry, xi):
        s, c = carry
        t = s + xi
        # Neumaier: pick the compensation branch by magnitude
        comp = jnp.where(jnp.abs(s) >= jnp.abs(xi),
                         (s - t) + xi, (xi - t) + s)
        return (t, c + comp), None

    zero = jnp.zeros(x.shape[1:], x.dtype)
    (s, c), _ = jax.lax.scan(body, (zero, zero), x)
    return s + c


def kahan_dot(a, b, axis=-1):
    """Compensated inner product sum(a*b) along ``axis``."""
    return kahan_sum(a * b, axis=axis)
