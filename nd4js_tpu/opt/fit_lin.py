"""Parameter-linear least-squares curve fitting.

Parity with /root/reference/src/opt/fit_lin.js:24: fit y ≈ Σ p_j·φ_j(x)
with optional Tikhonov regularisation, solved by la.lstsq
(minimum-norm, rank-aware).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..la.svd import lstsq

__all__ = ["fit_lin"]


def fit_lin(x, y, funcs, regularization: float = 0.0):
    """Least-squares coefficients p for y ≈ Σ p_j·funcs[j](x)
    (ref: fit_lin.js:24).

    ``funcs``: sequence of vectorised basis functions φ_j(x), or a
    single function returning the (M, P) design matrix. Returns p (P,).
    """
    x = jnp.asarray(x)
    y = jnp.asarray(y).reshape(-1)
    if callable(funcs):
        a = jnp.asarray(funcs(x))
    else:
        a = jnp.stack([jnp.broadcast_to(jnp.asarray(f(x)), y.shape)
                       for f in funcs], axis=-1)
    if regularization > 0:
        p = a.shape[-1]
        lam = jnp.sqrt(jnp.asarray(regularization, a.dtype))
        a = jnp.concatenate([a, lam * jnp.eye(p, dtype=a.dtype)], axis=0)
        y = jnp.concatenate([y, jnp.zeros((p,), y.dtype)])
    return lstsq(a, y[:, None])[:, 0]
