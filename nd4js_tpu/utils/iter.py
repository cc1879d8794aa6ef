"""Iterator / range utilities.

Parity with /root/reference/src/iter/index.js:22-113 (linspace, range,
cartesian_prod, enumerate, zip, repeat) and iter/min_max.js:20-81
(argmin/argmax/min/max over iterables or arrays).
"""
from __future__ import annotations

import itertools

import jax.numpy as jnp
import numpy as np

__all__ = ["linspace", "irange", "cartesian_prod", "repeat",
           "argmin", "argmax", "imin", "imax"]


def linspace(start, stop, num: int = 50, dtype=None):
    """ref: iter/index.js — array-producing linspace."""
    return jnp.linspace(start, stop, num, dtype=dtype)


def irange(*args):
    """Lazy integer range (ref: iter range)."""
    return range(*args)


def cartesian_prod(*iterables):
    """Lazy cartesian product (ref: iter/index.js cartesian_prod)."""
    return itertools.product(*iterables)


def repeat(value_or_iterable, n=None):
    """Repeat a value n times (or an iterable cyclically)
    (ref: iter repeat)."""
    if n is None:
        return itertools.cycle(value_or_iterable)
    return itertools.repeat(value_or_iterable, n)


def _as_seq(x):
    if isinstance(x, (jnp.ndarray, np.ndarray)):
        return np.asarray(x).reshape(-1)
    return list(x)


def argmin(x, key=None):
    """Index of the minimum (ref: iter/min_max.js:20)."""
    s = _as_seq(x)
    if key is not None:
        return min(range(len(s)), key=lambda i: key(s[i]))
    return int(np.argmin(s))


def argmax(x, key=None):
    s = _as_seq(x)
    if key is not None:
        return max(range(len(s)), key=lambda i: key(s[i]))
    return int(np.argmax(s))


def imin(x, key=None):
    s = _as_seq(x)
    return s[argmin(s, key)]


def imax(x, key=None):
    s = _as_seq(x)
    return s[argmax(s, key)]
