"""Precision-pinned matmul helpers for library internals.

All GEMMs inside decompositions/solves go through these so that TPU's
default bfloat16-pass matmul precision never silently degrades the
accuracy contracts (see config.matmul_precision).
"""
from __future__ import annotations

import jax.numpy as jnp

from .. import config

__all__ = ["mm", "mt", "einsum"]


def mm(a, b):
    """jnp.matmul at the library's pinned precision."""
    return jnp.matmul(a, b, precision=config.matmul_precision)


def mt(a):
    """Matrix (conjugate-free) transpose of the trailing two axes."""
    return jnp.swapaxes(a, -1, -2)


def einsum(subscripts, *operands):
    return jnp.einsum(subscripts, *operands,
                      precision=config.matmul_precision)
