"""Split-complex arithmetic: z represented as a (re, im) pair of real
arrays.

The role of the reference's Complex/MutableComplex scalar classes
(/root/reference/src/dt/complex.js, mutable_complex.js) on hardware that
has no complex ALU: TPU backends do not implement complex dtypes at all
(UNIMPLEMENTED), so every complex-valued path in the library computes on
(re, im) pairs — additions stay VPU ops, complex matmuls become 3-4 real
MXU GEMMs, and the pair is combined into a numpy/jax complex array only
at the API boundary when the backend supports it (CPU).
"""
from __future__ import annotations

import jax.numpy as jnp

from .mm import mm

__all__ = ["cpx", "add", "sub", "mul", "div", "conj", "abs2", "cabs",
           "matmul", "scale", "where", "to_complex", "from_complex",
           "sqrt_of_real"]


def cpx(re, im=None):
    re = jnp.asarray(re)
    if im is None:
        im = jnp.zeros_like(re)
    return re, jnp.asarray(im)


def add(a, b):
    return a[0] + b[0], a[1] + b[1]


def sub(a, b):
    return a[0] - b[0], a[1] - b[1]


def mul(a, b):
    return a[0] * b[0] - a[1] * b[1], a[0] * b[1] + a[1] * b[0]


def conj(a):
    return a[0], -a[1]


def abs2(a):
    return a[0] * a[0] + a[1] * a[1]


def cabs(a):
    # overflow-safe |z|
    return jnp.hypot(a[0], a[1])


def div(a, b):
    """Smith's algorithm: overflow/underflow-safe complex division."""
    br, bi = b
    use_r = jnp.abs(br) >= jnp.abs(bi)
    safe_br = jnp.where(br == 0, 1.0, br)
    safe_bi = jnp.where(bi == 0, 1.0, bi)
    # |br| >= |bi| branch
    r1 = bi / jnp.where(use_r, safe_br, 1.0)
    den1 = br + bi * r1
    den1 = jnp.where(den1 == 0, 1.0, den1)
    re1 = (a[0] + a[1] * r1) / den1
    im1 = (a[1] - a[0] * r1) / den1
    # |bi| > |br| branch
    r2 = br / jnp.where(use_r, 1.0, safe_bi)
    den2 = bi + br * r2
    den2 = jnp.where(den2 == 0, 1.0, den2)
    re2 = (a[0] * r2 + a[1]) / den2
    im2 = (a[1] * r2 - a[0]) / den2
    return jnp.where(use_r, re1, re2), jnp.where(use_r, im1, im2)


def matmul(a, b):
    """Complex GEMM from 4 real GEMMs (precision-pinned on the MXU)."""
    return (mm(a[0], b[0]) - mm(a[1], b[1]),
            mm(a[0], b[1]) + mm(a[1], b[0]))


def scale(a, s):
    """Multiply by a real scalar/array."""
    return a[0] * s, a[1] * s


def where(pred, a, b):
    return jnp.where(pred, a[0], b[0]), jnp.where(pred, a[1], b[1])


def to_complex(a):
    """Combine to a native complex array (CPU backends only)."""
    cdtype = jnp.complex64 if a[0].dtype == jnp.float32 else jnp.complex128
    return a[0].astype(cdtype) + 1j * a[1].astype(cdtype)


def from_complex(z):
    z = jnp.asarray(z)
    return jnp.real(z), jnp.imag(z)


def sqrt_of_real(x):
    """Complex square root of a *real* array: (√x, 0) or (0, √−x)."""
    pos = x >= 0
    return (jnp.sqrt(jnp.where(pos, x, 0.0)),
            jnp.sqrt(jnp.where(pos, 0.0, -x)))
