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

from .. import config as _config
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


_PANEL = 64


def _hess_panel(a, k: int, bk: int):
    """dlahr2-style panel: factor reflectors for columns k..k+bk−1 of
    the Hessenberg reduction without updating the trailing matrix.
    Maintains Ỹ = A·V (one big matvec per column against the static
    trailing column block) and the compact-WY T incrementally; each
    column of the panel is corrected on the fly:

        u = Hᵀ·(A·H)·e_c = (a_c − Ỹ·T·V[c,:]ᵀ) − V·Tᵀ·Vᵀ·(…)

    Returns (V, T, taus) with v_j supported on rows > k+j (unit at
    k+j+1)."""
    n = a.shape[-1]
    dt = a.dtype
    rows = jnp.arange(n)
    atrail = a[:, k + 1:]                       # static per-panel slice

    def body(j, carry):
        V, T, Yt, taus = carry
        c = k + j
        a_c = jax.lax.dynamic_slice(a, (0, c), (n, 1))[:, 0]
        vrow = jax.lax.dynamic_slice(V, (c, 0), (1, bk))[0]
        # right update: a_c − Ỹ·(T·V[c,:]ᵀ)
        u = a_c - mm(Yt, mm(T, vrow[:, None]))[:, 0]
        # left update: u − V·(Tᵀ·(Vᵀ·u))
        u = u - mm(V, mm(mt(T), mm(mt(V), u[:, None])))[:, 0]
        # reflector zeroing rows > c+1
        x0 = jnp.sum(jnp.where(rows == c + 1, u, 0.0))
        sigma = jnp.sum(jnp.where(rows > c + 1, u * u, 0.0))
        nrm = jnp.sqrt(x0 * x0 + sigma)
        beta = jnp.where(x0 >= 0, -nrm, nrm)
        beta = jnp.where(sigma == 0, x0, beta)
        den = x0 - beta
        safe_den = jnp.where(den == 0, 1.0, den)
        v = jnp.where(rows > c + 1, u / safe_den, 0.0)
        v = v + jnp.where(rows == c + 1, 1.0, 0.0)
        safe_beta = jnp.where(beta == 0, 1.0, beta)
        tau = jnp.where(sigma == 0, 0.0, (beta - x0) / safe_beta)
        # grow T:  t_j = −τ·T·(Vᵀ·v),  T[j,j] = τ
        w = mm(mt(V), v[:, None])               # (bk, 1)
        tcol = (-tau) * mm(T, w)[:, 0]
        jmask = (jnp.arange(bk) == j)
        T = T + tcol[:, None] * jmask[None, :] \
            + (tau * jnp.outer(jmask, jmask)).astype(dt)
        # grow Ỹ: new column A·v (trailing columns only — v's support)
        ycol = mm(atrail, v[k + 1:][:, None])[:, 0]
        V = jax.lax.dynamic_update_slice(V, v[:, None], (0, j))
        Yt = jax.lax.dynamic_update_slice(Yt, ycol[:, None], (0, j))
        taus = taus.at[j].set(tau)
        return V, T, Yt, taus

    V0 = jnp.zeros((n, bk), dt)
    T0 = jnp.zeros((bk, bk), dt)
    Y0 = jnp.zeros((n, bk), dt)
    t0 = jnp.zeros((bk,), dt)
    V, T, Yt, taus = jax.lax.fori_loop(0, bk, body, (V0, T0, Y0, t0))
    return V, T, taus


def _hessenberg_blocked(a, panel: int = _PANEL):
    """Blocked Hessenberg reduction (LAPACK gehrd-shaped): panels
    factored with _hess_panel, trailing matrix updated with five GEMMs
    per panel — n³/2 HBM traffic instead of the unblocked path's n³
    (two full rank-1 sweeps per column)."""
    n = a.shape[-1]
    vts = []
    for k in range(0, n - 2, panel):
        bk = min(panel, n - 2 - k)
        V, T, taus = _hess_panel(a, k, bk)
        vts.append((V, T))
        # A ← Hᵀ·(A − (A·V)·T·Vᵀ)·…  with H = I − V·T·Vᵀ
        yt = mm(a, V)
        a = a - mm(mm(yt, T), mt(V))
        a = a - mm(V, mm(mt(T), mm(mt(V), a)))
    q = jnp.eye(n, dtype=a.dtype)
    for V, T in reversed(vts):
        q = q - mm(V, mm(T, mm(mt(V), q)))
    rows = jnp.arange(n)
    mask = rows[:, None] <= rows[None, :] + 1
    return jnp.where(mask, a, 0), q


def _hessenberg_core(a):
    n = a.shape[-1]
    if n <= 2:
        return a, jnp.eye(n, dtype=a.dtype)
    if n >= 96:
        return _hessenberg_blocked(a)
    rows = jnp.arange(n)

    def body(j, carry):
        a, V, taus = carry
        # reflector on column j, zeroing rows j+2..n-1
        x = a[:, j]
        v, tau, _ = _householder_vec(x, j + 1, rows)
        # left:  A <- A - tau·v·(vᵀA)
        w = tau * jnp.einsum("i,ik->k", v, a, precision=_config.matmul_precision)
        a = a - jnp.outer(v, w)
        # right: A <- A - (A·v)·tau·vᵀ
        u = tau * jnp.einsum("ik,k->i", a, v, precision=_config.matmul_precision)
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
        w = tau * jnp.einsum("i,ik->k", v, q, precision=_config.matmul_precision)
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
