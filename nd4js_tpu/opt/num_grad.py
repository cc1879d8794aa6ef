"""Numerical differentiation.

Parity with /root/reference/src/opt/num_grad.js: 4-point central
differences with eps^(1/3)-scaled steps (:30) and cheap forward
differences (:131). In JAX the *primary* gradient path is ``jax.grad``;
these exist for API parity and for verifying user-supplied gradients
the way the reference test-suite does (SURVEY.md §4).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["num_grad", "num_grad_forward"]


def num_grad(f, h=None):
    """4-point central-difference gradient of a scalar function
    (ref: num_grad.js:30). Returns g(x) -> ∇f(x)."""

    def grad(x):
        x = jnp.asarray(x)
        dtype = x.dtype if jnp.issubdtype(x.dtype, jnp.floating) \
            else jnp.float64
        x = x.astype(dtype)
        eps = np.finfo(np.dtype(dtype)).eps
        step = (eps ** (1 / 3)) if h is None else h
        hh = step * jnp.maximum(jnp.abs(x), 1.0)
        n = x.size
        shape = x.shape
        flat = x.reshape(-1)
        eye = jnp.eye(n, dtype=dtype)

        def one(i):
            d = eye[i] * hh.reshape(-1)[i]
            fp1 = f((flat + d).reshape(shape))
            fm1 = f((flat - d).reshape(shape))
            fp2 = f((flat + 2 * d).reshape(shape))
            fm2 = f((flat - 2 * d).reshape(shape))
            return (8 * (fp1 - fm1) - (fp2 - fm2)) / (12 * hh.reshape(-1)[i])

        g = jax.vmap(one)(jnp.arange(n))
        return g.reshape(shape)

    return grad


def num_grad_forward(f, h=None):
    """Forward-difference gradient (ref: num_grad.js:131)."""

    def grad(x):
        x = jnp.asarray(x)
        dtype = x.dtype if jnp.issubdtype(x.dtype, jnp.floating) \
            else jnp.float64
        x = x.astype(dtype)
        eps = np.finfo(np.dtype(dtype)).eps
        step = jnp.sqrt(eps) if h is None else h
        hh = step * jnp.maximum(jnp.abs(x), 1.0)
        n = x.size
        shape = x.shape
        flat = x.reshape(-1)
        eye = jnp.eye(n, dtype=dtype)
        f0 = f(x)

        def one(i):
            d = eye[i] * hh.reshape(-1)[i]
            return (f((flat + d).reshape(shape)) - f0) / hh.reshape(-1)[i]

        g = jax.vmap(one)(jnp.arange(n))
        return g.reshape(shape)

    return grad
