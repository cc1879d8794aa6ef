"""Overflow/underflow-safe norms.

Parity with the reference's ``FrobeniusNorm`` scaled accumulator
(/root/reference/src/la/norm.js:22-68) and ``norm(A, 'fro')``
(norm.js:70). The scaled two-pass formulation (find max magnitude, then
sum of squares of scaled entries) is branch-free and vectorises on the
VPU, unlike the reference's per-element rescaling loop.
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["norm", "norm_fro", "safe_norm_2"]


def norm_fro(a, axis=None, keepdims=False):
    """Frobenius norm, safe against overflow/underflow of squares."""
    a = jnp.asarray(a)
    if jnp.issubdtype(a.dtype, jnp.complexfloating):
        mag = jnp.abs(a)
    else:
        mag = jnp.abs(a)
    amax = jnp.max(mag, axis=axis, keepdims=True)
    scale = jnp.where(amax > 0, amax, jnp.ones_like(amax))
    ss = jnp.sum((mag / scale) ** 2, axis=axis, keepdims=True)
    out = scale * jnp.sqrt(ss)
    if keepdims:
        return out
    if axis is None:
        return out.reshape(())
    return jnp.squeeze(out, axis=axis)


def safe_norm_2(x, axis=-1, keepdims=False):
    """2-norm of vectors along ``axis``, overflow/underflow safe."""
    return norm_fro(x, axis=axis, keepdims=keepdims)


def norm(a, ord="fro", axes=None):
    """Matrix/tensor norm. The reference only implements 'fro'
    (ref: norm.js:70)."""
    if ord in ("fro", None):
        if axes is None:
            return norm_fro(a)
        return norm_fro(a, axis=tuple(axes))
    raise NotImplementedError(f"norm ord={ord!r} (reference supports 'fro' only)")
