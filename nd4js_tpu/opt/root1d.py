"""1-D root finding: bisection, Brent, Illinois.

Parity with /root/reference/src/opt/root1d_bisect.js:27,
root1d_brent.js:36, root1d_illinois.js:31. All are pure
``lax.while_loop`` state machines (jit/vmap-safe) — the reference's
exceptions become best-effort convergence to machine precision; the
bracket must satisfy f(a)·f(b) ≤ 0 (checked eagerly outside jit).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..dt import midl

__all__ = ["root1d_bisect", "root1d_brent", "root1d_illinois"]


def _check_bracket(fa, fb):
    if not (isinstance(fa, jax.core.Tracer) or isinstance(fb, jax.core.Tracer)):
        if bool(fa * fb > 0):
            raise ValueError("root1d: f(a) and f(b) must bracket a root")


def root1d_bisect(f, a, b, max_iter: int = 200):
    """Bisection to floating-point limit (ref: root1d_bisect.js:27)."""
    a = jnp.asarray(a, jnp.result_type(float, a))
    b = jnp.asarray(b, a.dtype)
    fa, fb = f(a), f(b)
    _check_bracket(fa, fb)

    def cond(st):
        a, b, fa, fb, i = st
        m = midl(a, b)
        return (i < max_iter) & (m != a) & (m != b) & (fa != 0) & (fb != 0)

    def body(st):
        a, b, fa, fb, i = st
        m = midl(a, b)
        fm = f(m)
        left = (fm < 0) == (fa < 0)
        a2 = jnp.where(left, m, a)
        fa2 = jnp.where(left, fm, fa)
        b2 = jnp.where(left, b, m)
        fb2 = jnp.where(left, fb, fm)
        return a2, b2, fa2, fb2, i + 1

    a, b, fa, fb, _ = jax.lax.while_loop(
        cond, body, (a, b, fa, fb, jnp.zeros((), jnp.int32)))
    return jnp.where(jnp.abs(fa) <= jnp.abs(fb), a, b)


def root1d_illinois(f, a, b, max_iter: int = 128):
    """Illinois-type regula falsi (Ford variant)
    (ref: root1d_illinois.js:31)."""
    a = jnp.asarray(a, jnp.result_type(float, a))
    b = jnp.asarray(b, a.dtype)
    fa, fb = f(a), f(b)
    _check_bracket(fa, fb)
    eps = jnp.finfo(a.dtype).eps

    def cond(st):
        a, b, fa, fb, i = st
        return (i < max_iter) & (jnp.abs(b - a)
                                 > eps * jnp.maximum(jnp.abs(a), jnp.abs(b))) \
            & (fa != 0) & (fb != 0)

    def body(st):
        a, b, fa, fb, i = st
        den = fb - fa
        den = jnp.where(den == 0, jnp.ones_like(den), den)
        c = b - fb * (b - a) / den
        c = jnp.clip(c, jnp.minimum(a, b), jnp.maximum(a, b))
        fc = f(c)
        same_side = (fc < 0) == (fb < 0)
        # Illinois: when the new point replaces b on the same side twice,
        # halve fa to force the bracket to move
        a2 = jnp.where(same_side, a, b)
        fa2 = jnp.where(same_side, fa * 0.5, fb)
        return a2, c, fa2, fc, i + 1

    a, b, fa, fb, _ = jax.lax.while_loop(
        cond, body, (a, b, fa, fb, jnp.zeros((), jnp.int32)))
    return jnp.where(jnp.abs(fa) <= jnp.abs(fb), a, b)


def root1d_brent(f, a, b, max_iter: int = 128):
    """Brent's method: bisection + secant + inverse quadratic
    (ref: root1d_brent.js:36)."""
    a = jnp.asarray(a, jnp.result_type(float, a))
    b = jnp.asarray(b, a.dtype)
    fa, fb = f(a), f(b)
    _check_bracket(fa, fb)
    eps = jnp.finfo(a.dtype).eps

    # ensure |f(b)| <= |f(a)|
    swap = jnp.abs(fa) < jnp.abs(fb)
    a, b = jnp.where(swap, b, a), jnp.where(swap, a, b)
    fa, fb = jnp.where(swap, fb, fa), jnp.where(swap, fa, fb)

    def cond(st):
        a, b, c, fa, fb, fc, mflag, d, i = st
        tol = 2 * eps * jnp.maximum(jnp.abs(b), 1.0)
        return (i < max_iter) & (fb != 0) & (jnp.abs(b - a) > tol)

    def body(st):
        a, b, c, fa, fb, fc, mflag, d, i = st
        # inverse quadratic interpolation / secant
        use_iqi = (fa != fc) & (fb != fc)
        d1 = a * fb * fc / jnp.where(use_iqi, (fa - fb) * (fa - fc), 1.0)
        d2 = b * fa * fc / jnp.where(use_iqi, (fb - fa) * (fb - fc), 1.0)
        d3 = c * fa * fb / jnp.where(use_iqi, (fc - fa) * (fc - fb), 1.0)
        s_iqi = d1 + d2 + d3
        den = fb - fa
        s_sec = b - fb * (b - a) / jnp.where(den == 0, 1.0, den)
        s = jnp.where(use_iqi, s_iqi, s_sec)
        # acceptance conditions -> else bisection
        lo = (3 * a + b) / 4
        bad = ((s < jnp.minimum(lo, b)) | (s > jnp.maximum(lo, b))
               | (mflag & (jnp.abs(s - b) >= jnp.abs(b - c) / 2))
               | (~mflag & (jnp.abs(s - b) >= jnp.abs(c - d) / 2)))
        s = jnp.where(bad, midl(a, b), s)
        mflag2 = bad
        fs = f(s)
        d2_ = c
        c2, fc2 = b, fb
        left = (fa * fs) < 0
        a2 = jnp.where(left, a, s)
        fa2 = jnp.where(left, fa, fs)
        b2 = jnp.where(left, s, b)
        fb2 = jnp.where(left, fs, fb)
        # keep |f(b)| <= |f(a)|
        swap = jnp.abs(fa2) < jnp.abs(fb2)
        a3 = jnp.where(swap, b2, a2)
        b3 = jnp.where(swap, a2, b2)
        fa3 = jnp.where(swap, fb2, fa2)
        fb3 = jnp.where(swap, fa2, fb2)
        return a3, b3, c2, fa3, fb3, fc2, mflag2, d2_, i + 1

    st = (a, b, a, fa, fb, fa, jnp.ones((), bool), a,
          jnp.zeros((), jnp.int32))
    a, b, c, fa, fb, fc, _, _, _ = jax.lax.while_loop(cond, body, st)
    return jnp.where(jnp.abs(fa) < jnp.abs(fb), a, b)
