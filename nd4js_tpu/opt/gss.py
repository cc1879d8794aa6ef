"""Golden-section 1-D minimisation (ref: /root/reference/src/opt/gss.js:29)."""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

__all__ = ["min1d_gss"]

_INVPHI = (math.sqrt(5.0) - 1.0) / 2.0
_INVPHI2 = (3.0 - math.sqrt(5.0)) / 2.0


def min1d_gss(f, a, b, max_iter: int = 200):
    """Minimise unimodal f on [a, b] to fp precision (ref: gss.js:29)."""
    a = jnp.asarray(a, jnp.result_type(float, a))
    b = jnp.asarray(b, a.dtype)
    lo = jnp.minimum(a, b)
    hi = jnp.maximum(a, b)
    eps = jnp.finfo(lo.dtype).eps

    c = hi - _INVPHI * (hi - lo)
    d = lo + _INVPHI * (hi - lo)
    fc, fd = f(c), f(d)

    def cond(st):
        lo, hi, c, d, fc, fd, i = st
        return (i < max_iter) & (hi - lo > eps * (jnp.abs(lo) + jnp.abs(hi)))

    def body(st):
        lo, hi, c, d, fc, fd, i = st
        shrink_right = fc < fd
        hi2 = jnp.where(shrink_right, d, hi)
        lo2 = jnp.where(shrink_right, lo, c)
        c2 = jnp.where(shrink_right, hi2 - _INVPHI * (hi2 - lo2), d)
        d2 = jnp.where(shrink_right, c, lo2 + _INVPHI * (hi2 - lo2))
        fc2 = jnp.where(shrink_right, f(c2), fd)
        fd2 = jnp.where(shrink_right, fc, f(d2))
        # NOTE: both f() calls trace; only one value is used per branch
        return lo2, hi2, c2, d2, fc2, fd2, i + 1

    lo, hi, c, d, fc, fd, _ = jax.lax.while_loop(
        cond, body, (lo, hi, c, d, fc, fd, jnp.zeros((), jnp.int32)))
    return jnp.where(fc < fd, c, d)
