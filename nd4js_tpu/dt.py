"""Dtype system: promotion lattice, machine epsilon, float bit-tricks.

Capability parity with the reference dtype layer (/root/reference/src/dt/):
  * ``ARRAY_TYPES``/``super_dtype``/``is_subdtype``/``dtypeof``/``eps``/
    ``cast_scalar``  — /root/reference/src/dt/index.js:25-95
  * ``nextUp``/``nextDown``/``midl`` float64 bit twiddling —
    /root/reference/src/dt/float64_utils.js:29,57,85
  * ``bitCount`` — /root/reference/src/dt/int32_utils.js:21

Design differences (TPU-first):
  * Complex is jnp.complex64/complex128 — no Complex/MutableComplex scalar
    classes are needed; JAX arrays are the scalar type.
  * float32 is a first-class compute dtype (TPU native); float64 requires
    jax_enable_x64 (used by the CPU test harness).
  * ``nextUp``/``nextDown`` are implemented with ``jnp.nextafter`` so they
    work vectorised, on-device, for any float dtype.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

__all__ = [
    "ARRAY_TYPES", "eps", "cast_scalar", "dtypeof", "super_dtype",
    "is_subdtype", "next_up", "next_down", "midl", "bit_count",
]

# dtype name -> jnp dtype. The reference's 'object' dtype (arbitrary JS
# values) has no accelerator equivalent and is intentionally absent.
ARRAY_TYPES = {
    "int32": jnp.dtype(jnp.int32),
    "float32": jnp.dtype(jnp.float32),
    "float64": jnp.dtype(jnp.float64),
    "complex64": jnp.dtype(jnp.complex64),
    "complex128": jnp.dtype(jnp.complex128),
}

# total promotion order, mirroring /root/reference/src/dt/index.js:73-81
_RANK = {"int32": 0, "float32": 1, "float64": 2, "complex64": 3, "complex128": 4}


def _name(dtype) -> str:
    name = jnp.dtype(dtype).name
    if name not in ARRAY_TYPES:
        raise ValueError(
            f"Invalid dtype '{name}'. Must be one of {sorted(ARRAY_TYPES)}.")
    return name


def eps(dtype):
    """Machine epsilon of ``dtype`` (ref: src/dt/index.js:33-43)."""
    dtype = jnp.dtype(dtype)
    if jnp.issubdtype(dtype, jnp.complexfloating):
        dtype = jnp.finfo(dtype).dtype
    return float(jnp.finfo(dtype).eps)


def cast_scalar(x, dtype):
    """Cast a python/np scalar to ``dtype`` semantics (ref: dt/index.js:45-51)."""
    return jnp.asarray(x, dtype=jnp.dtype(dtype))


def dtypeof(value) -> str:
    """Dtype name a scalar value would be stored as (ref: dt/index.js:59-70)."""
    if isinstance(value, (bool, np.bool_)):
        return "int32"
    if isinstance(value, (int, np.integer)):
        if -(2 ** 31) <= int(value) < 2 ** 31:
            return "int32"
        return "float64"
    if isinstance(value, (float, np.floating)):
        return "float64"
    if isinstance(value, (complex, np.complexfloating)):
        return "complex128"
    a = jnp.asarray(value)
    if a.ndim == 0:
        return _name(a.dtype)
    raise ValueError(f"Not a scalar: {value!r}")


def super_dtype(*dtypes):
    """Least upper bound in the promotion order (ref: dt/index.js:73-81)."""
    if not dtypes:
        raise ValueError("super_dtype() requires at least one dtype")
    best = max(( _name(dt) for dt in dtypes), key=_RANK.__getitem__)
    return ARRAY_TYPES[best]


def is_subdtype(sub, sup) -> bool:
    """True iff ``sub`` promotes to ``sup`` (ref: dt/index.js:83-95)."""
    return _RANK[_name(sub)] <= _RANK[_name(sup)]


def next_up(x):
    """Smallest float greater than x (ref: dt/float64_utils.js:29)."""
    x = jnp.asarray(x)
    return jnp.nextafter(x, jnp.asarray(jnp.inf, x.dtype))


def next_down(x):
    """Largest float smaller than x (ref: dt/float64_utils.js:57)."""
    x = jnp.asarray(x)
    return jnp.nextafter(x, jnp.asarray(-jnp.inf, x.dtype))


def midl(x, y):
    """Overflow-safe midpoint, used by bisection-style root finders
    (ref: dt/float64_utils.js:85)."""
    x, y = jnp.asarray(x), jnp.asarray(y)
    # x/2 + y/2 avoids overflow of x+y; exact when both are finite floats.
    return x * 0.5 + y * 0.5


def bit_count(x):
    """Population count of int32 values (ref: dt/int32_utils.js:21)."""
    x = jnp.asarray(x, jnp.uint32)
    x = x - ((x >> 1) & 0x55555555)
    x = (x & 0x33333333) + ((x >> 2) & 0x33333333)
    x = (x + (x >> 4)) & 0x0F0F0F0F
    return ((x * 0x01010101) >> 24).astype(jnp.int32)
