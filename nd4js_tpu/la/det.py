"""Determinants.

Parity with /root/reference/src/la/det.js: `det_tri`/`slogdet_tri`
(:24,55) and general `det`/`slogdet` (:95,102). The reference computes
the general case via QR; we use partially-pivoted LU instead — on TPU
the LU path reuses the Pallas panel kernel and the permutation sign is
exact, where the QR route would need reflector-count bookkeeping.
Same results, different mechanism.
"""
from __future__ import annotations

import jax.numpy as jnp

from .lu import lu_decomp

__all__ = ["det", "slogdet", "det_tri", "slogdet_tri"]


def det_tri(a):
    """Determinant of a triangular matrix (ref: det.js:24)."""
    return jnp.prod(jnp.diagonal(jnp.asarray(a), axis1=-2, axis2=-1),
                    axis=-1)


def slogdet_tri(a):
    """(sign, log|det|) of a triangular matrix (ref: det.js:55)."""
    d = jnp.diagonal(jnp.asarray(a), axis1=-2, axis2=-1)
    sign = jnp.prod(jnp.sign(d), axis=-1)
    return sign, jnp.sum(jnp.log(jnp.abs(d)), axis=-1)


def _perm_sign(p):
    """Parity of a permutation vector, batched: sign = (-1)^inversions.
    O(n²) pairwise comparison — fine for the matrix sizes dets make
    sense for, and fully vectorised."""
    p = jnp.asarray(p)
    n = p.shape[-1]
    less = (p[..., :, None] > p[..., None, :])
    upper = jnp.triu(jnp.ones((n, n), bool), 1)
    inversions = jnp.sum(less & upper, axis=(-2, -1))
    return jnp.where(inversions % 2 == 0, 1.0, -1.0)


def det(a):
    """Determinant via pivoted LU (ref: det.js:95). Batched."""
    lu, p = lu_decomp(a)
    d = jnp.diagonal(lu, axis1=-2, axis2=-1)
    return jnp.prod(d, axis=-1) * _perm_sign(p).astype(lu.dtype)


def slogdet(a):
    """(sign, log|det|) via pivoted LU (ref: det.js:102). Batched."""
    lu, p = lu_decomp(a)
    d = jnp.diagonal(lu, axis1=-2, axis2=-1)
    sign = jnp.prod(jnp.sign(d), axis=-1) * _perm_sign(p).astype(lu.dtype)
    return sign, jnp.sum(jnp.log(jnp.abs(d)), axis=-1)