"""Real roots of quadratic polynomials, numerically careful.

Parity with /root/reference/src/opt/polyquad.js:31 (`roots1d_polyquad`):
stable quadratic formula (no cancellation: the larger-magnitude root via
the classic formula, the other via Vieta).
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["roots1d_polyquad"]


def roots1d_polyquad(c0, c1, c2):
    """Roots of c2·x² + c1·x + c0 = 0, returned sorted (r0 <= r1).

    For c2 == 0 degrades to the linear root (repeated). Complex roots
    return NaN (the reference throws; jit-safe here).
    """
    c0 = jnp.asarray(c0, jnp.result_type(float, c0))
    c1 = jnp.asarray(c1, c0.dtype)
    c2 = jnp.asarray(c2, c0.dtype)
    lin = c2 == 0
    safe_c1 = jnp.where(c1 == 0, jnp.ones_like(c1), c1)
    xlin = jnp.where(c1 == 0, jnp.nan, -c0 / safe_c1)
    disc = c1 * c1 - 4 * c2 * c0
    sq = jnp.sqrt(jnp.where(disc < 0, jnp.nan, disc))
    qq = -(c1 + jnp.sign(c1) * sq) / 2
    qq = jnp.where(c1 == 0, -sq / 2, qq)  # sign(0) = 0 would zero q
    safe_c2 = jnp.where(lin, jnp.ones_like(c2), c2)
    r1 = qq / safe_c2
    safe_q = jnp.where(qq == 0, jnp.ones_like(qq), qq)
    r2 = jnp.where(qq == 0, jnp.zeros_like(qq), c0 / safe_q)
    r1 = jnp.where(lin, xlin, r1)
    r2 = jnp.where(lin, xlin, r2)
    return jnp.minimum(r1, r2), jnp.maximum(r1, r2)
