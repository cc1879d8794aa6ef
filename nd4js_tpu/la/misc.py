"""Small la/ odds and ends.

Parity with /root/reference/src/la/transpose_inplace.js:22-41 — on
immutable JAX arrays "in-place" transpose is simply the transpose of
the trailing two axes (XLA fuses/elides the copy).
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["transpose_inplace"]


def transpose_inplace(a):
    """Transpose the trailing two axes (ref: transpose_inplace.js:22)."""
    return jnp.swapaxes(jnp.asarray(a), -1, -2)
