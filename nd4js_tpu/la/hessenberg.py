"""Hessenberg reduction: A = Q·H·Qᵀ with H upper Hessenberg.

Parity with /root/reference/src/la/hessenberg.js (`_hessenberg_decomp`
:27, `hessenberg_decomp` :87). Householder reduction like the
reference, expressed as a ``lax.fori_loop`` of vectorised two-sided
rank-1 updates with row masks (static shapes); Q is accumulated by
applying the stored reflectors to the identity in reverse (GEMM-shaped
outer products — a compact-WY variant can land later if Hessenberg
becomes a bottleneck; the Schur iteration that consumes H dominates in
practice).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.batch import batched
from ..core.mm import mm, mt
from ..config import default_float_for

__all__ = ["hessenberg_decomp"]


def _householder_vec(x, k, rows):
    """Reflector zeroing x below index k (x[k+1:] -> 0), vectorised.

    Returns (v, tau, beta): H = I - tau·v·vᵀ, v[k] = 1, v masked to
    rows >= k... here v has support on rows > k plus the unit at k.
    """
    x0 = x[k]
    sigma = jnp.sum(jnp.where(rows > k, x * x, 0))
    nrm = jnp.sqrt(x0 * x0 + sigma)
    beta = jnp.where(x0 >= 0, -nrm, nrm)
    den = x0 - beta
    safe_den = jnp.where(den == 0, jnp.ones_like(den), den)
    v = jnp.where(rows > k, x / safe_den, jnp.zeros_like(x))
    v = jnp.where(rows == k, jnp.ones_like(x), v)
    safe_beta = jnp.where(beta == 0, jnp.ones_like(beta), beta)
    tau = jnp.where(sigma == 0, jnp.zeros_like(beta),
                    (beta - x0) / safe_beta)
    return v, tau, beta


def _hessenberg_core(a):
    n = a.shape[-1]
    if n <= 2:
        return a, jnp.eye(n, dtype=a.dtype)
    rows = jnp.arange(n)

    def body(j, carry):
        a, V, taus = carry
        # reflector on column j, zeroing rows j+2..n-1
        x = a[:, j]
        v, tau, _ = _householder_vec(x, j + 1, rows)
        # left:  A <- A - tau·v·(vᵀA)
        w = tau * jnp.einsum("i,ik->k", v, a, precision="highest")
        a = a - jnp.outer(v, w)
        # right: A <- A - (A·v)·tau·vᵀ
        u = tau * jnp.einsum("ik,k->i", a, v, precision="highest")
        a = a - jnp.outer(u, v)
        V = V.at[:, j].set(v)
        taus = taus.at[j].set(tau)
        return a, V, taus

    V0 = jnp.zeros((n, n - 2), a.dtype)
    taus0 = jnp.zeros((n - 2,), a.dtype)
    a, V, taus = jax.lax.fori_loop(0, n - 2, body, (a, V0, taus0))

    # accumulate Q = H_0·H_1·…·H_{n-3} applied to I (reverse order)
    def qbody(i, q):
        j = n - 3 - i
        v = V[:, j]
        tau = taus[j]
        w = tau * jnp.einsum("i,ik->k", v, q, precision="highest")
        return q - jnp.outer(v, w)

    q = jax.lax.fori_loop(0, n - 2, qbody, jnp.eye(n, dtype=a.dtype))
    # clean exact zeros below the first subdiagonal
    mask = rows[:, None] <= rows[None, :] + 1
    return jnp.where(mask, a, 0), q


@batched((2,))
def hessenberg_decomp(a):
    """[Q, H] with A = Q·H·Qᵀ, H upper Hessenberg, Q orthogonal
    (ref: hessenberg.js:87). Batched over leading dims."""
    a = jnp.asarray(a)
    if a.shape[-1] != a.shape[-2]:
        raise ValueError("hessenberg_decomp requires square matrices")
    a = a.astype(default_float_for(a.dtype))
    h, q = _hessenberg_core(a)
    return q, h
