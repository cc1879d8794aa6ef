"""Base64 codec for raw array bytes.

Parity with /root/reference/src/io/b64.js (:32 encode, :79 decode —
streaming generators in JS; Python's batteries cover it).
"""
from __future__ import annotations

import base64

import numpy as np
import jax.numpy as jnp

__all__ = ["b64_encode", "b64_decode"]


def b64_encode(a) -> str:
    """Array data -> base64 string (dtype/shape not included)."""
    return base64.b64encode(np.asarray(a).tobytes()).decode("ascii")


def b64_decode(text: str, dtype, shape=None):
    raw = base64.b64decode(text)
    arr = np.frombuffer(raw, dtype=np.dtype(dtype))
    if shape is not None:
        arr = arr.reshape(shape)
    return jnp.asarray(arr)
