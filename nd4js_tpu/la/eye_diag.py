"""Identity / diagonal constructors and extractors.

Parity with /root/reference/src/la/eye.js:23 and diag.js:23,53.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..config import default_float

__all__ = ["eye", "diag", "diag_mat"]


def eye(*shape, dtype=None):
    """eye(N) / eye(M, N) / eye(b0, ..., M, N): batched identity
    (ref: eye.js:23)."""
    if dtype is None:
        dtype = default_float
    if len(shape) == 1:
        shape = (shape[0], shape[0])
    *batch, m, n = shape
    e = jnp.eye(m, n, dtype=dtype)
    return jnp.broadcast_to(e, tuple(batch) + (m, n))


def diag_mat(d):
    """Diagonal matrix from the last axis of ``d`` (ref: diag.js:23)."""
    d = jnp.asarray(d)
    n = d.shape[-1]
    return d[..., :, None] * jnp.eye(n, dtype=d.dtype)


def diag(a, offset: int = 0):
    """Extract the ``offset`` diagonal of (..., M, N) (ref: diag.js:53)."""
    a = jnp.asarray(a)
    return jnp.diagonal(a, offset=offset, axis1=-2, axis2=-1)
