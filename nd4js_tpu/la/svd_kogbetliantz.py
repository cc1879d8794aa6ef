"""Two-sided Jacobi (Kogbetliantz) SVD — the real distinct mechanism
behind ``svd_jac_2sided``.

Parity with /root/reference/src/la/svd_jac_2sided.js:30-144: the same
row-cyclic sweep order and the same closed-form rotation-angle pair
(_svd_jac_utils.js:72-114) for the 2×2 annihilation

    ┌ ca  sa ┐ ┌ S_pp S_pq ┐ ┌ cb  sb ┐   ┌ s1  0 ┐
    │        │ │           │ │        │ = │       │ ,  s1 ≥ |s2| ≥ … sign fix
    └-sa  ca ┘ └ S_qp S_qq ┘ └-sb  cb ┘   └ 0  s2 ┘

Unlike the symmetric (eigh_jacobi) and one-sided (svd_jac) engines,
Kogbetliantz does NOT admit the Brent-Luk parallel tournament: with
simultaneous disjoint rotations the off-norm decreases monotonically
but stalls at a non-diagonal fixed point (measured: blocks of
near-equal diagonal entries cycle mass indefinitely; convergence theory
for two-sided Jacobi covers sequential cyclic orderings — and
triangular input — only). The sweep is therefore a sequential
``fori_loop`` over the N(N−1)/2 lexicographic pairs, exactly as the
reference iterates, with each pair's rotation applied as two-row /
two-column dynamic-slice updates. Batched inputs vmap the whole sweep.

This engine is the *mechanism-parity* algorithm: it is O(N²) sequential
steps per sweep by construction. For MXU-size throughput use
``svd_gram`` / ``svd_jac_2sided_blocked`` (svd.py's 'auto' routes
there).
"""
from __future__ import annotations

import math as _math

import jax
import jax.numpy as jnp

from ..core.mm import mm, mt
from ..config import default_float_for

__all__ = ["svd_kogbetliantz"]


def _kog_angles(spp, spq, sqp, sqq):
    """Closed-form rotation angles (ref: _svd_jac_utils.js:72-114) with
    the reference's ordering (|s1| ≥ |s2|) and sign (s1 ≥ 0) branch
    fixes. Scalar (traced) inputs."""
    x = jnp.arctan2(sqp - spq, sqq + spp)
    y = jnp.arctan2(sqp + spq, sqq - spp)
    a = (x - y) / 2
    b = (x + y) / 2
    ca, sa = jnp.cos(a), jnp.sin(a)
    cb, sb = jnp.cos(b), jnp.sin(b)
    d1 = cb * (sa * sqp + ca * spp) - sb * (sa * sqq + ca * spq)
    d2 = sb * (ca * sqp - sa * spp) + cb * (ca * sqq - sa * spq)
    swap = jnp.abs(d1) < jnp.abs(d2)
    sa_n = jnp.where(swap, ca, sa)
    ca_n = jnp.where(swap, -sa, ca)
    cb_n = jnp.where(swap, sb, cb)
    sb_n = jnp.where(swap, -cb, sb)
    d = jnp.where(swap, d2, d1)
    neg = d < 0
    cb_n = jnp.where(neg, -cb_n, cb_n)
    sb_n = jnp.where(neg, -sb_n, sb_n)
    return ca_n, sa_n, cb_n, sb_n


def _i32(k):
    return jnp.asarray(k, jnp.int32)


_Z = lambda: jnp.zeros((), jnp.int32)


def _kog_core(a, max_sweeps: int, tol):
    """Sequential row-cyclic Kogbetliantz on square (N, N) ``a``.
    Returns (s_work, u, v) with a = u·s_work·vᵀ, s_work ≈ diagonal."""
    N = a.shape[-1]
    dt = a.dtype
    tiny = jnp.finfo(dt).tiny
    # lexicographic pair tables (static)
    ps, qs = [], []
    for p in range(N - 1):
        for q in range(p + 1, N):
            ps.append(p)
            qs.append(q)
    p_arr = jnp.asarray(ps, jnp.int32)
    q_arr = jnp.asarray(qs, jnp.int32)
    T = len(ps)

    def pair_body(t, carry):
        a, u, v, off = carry
        p = p_arr[t]
        q = q_arr[t]
        rp = jax.lax.dynamic_slice(a, (p, _Z()), (1, N))[0]
        rq = jax.lax.dynamic_slice(a, (q, _Z()), (1, N))[0]
        spp, spq = rp[p], rp[q]
        sqp, sqq = rq[p], rq[q]
        scale = jnp.sqrt(spp * spp + sqq * sqq) + tiny
        off = jnp.maximum(off, (jnp.abs(spq) + jnp.abs(sqp)) / scale)
        ca, sa, cb, sb = _kog_angles(spp, spq, sqp, sqq)
        inert = (jnp.abs(spq) + jnp.abs(sqp)) <= tiny
        ca = jnp.where(inert, 1.0, ca)
        sa = jnp.where(inert, 0.0, sa)
        cb = jnp.where(inert, 1.0, cb)
        sb = jnp.where(inert, 0.0, sb)
        # rows p, q ← JL·[rows]
        nrp = ca * rp + sa * rq
        nrq = -sa * rp + ca * rq
        a = jax.lax.dynamic_update_slice(a, nrp[None, :], (p, _Z()))
        a = jax.lax.dynamic_update_slice(a, nrq[None, :], (q, _Z()))
        # cols p, q ← [cols]·JR
        cp = jax.lax.dynamic_slice(a, (_Z(), p), (N, 1))[:, 0]
        cq = jax.lax.dynamic_slice(a, (_Z(), q), (N, 1))[:, 0]
        ncp = cb * cp - sb * cq
        ncq = sb * cp + cb * cq
        a = jax.lax.dynamic_update_slice(a, ncp[:, None], (_Z(), p))
        a = jax.lax.dynamic_update_slice(a, ncq[:, None], (_Z(), q))
        # A = JL₀ᵀ·…·Σ·…·JR₀ᵀ ⇒ U ← U·JLᵀ, V ← V·JR (column ops)
        up = jax.lax.dynamic_slice(u, (_Z(), p), (N, 1))[:, 0]
        uq = jax.lax.dynamic_slice(u, (_Z(), q), (N, 1))[:, 0]
        nup = ca * up + sa * uq
        nuq = -sa * up + ca * uq
        u = jax.lax.dynamic_update_slice(u, nup[:, None], (_Z(), p))
        u = jax.lax.dynamic_update_slice(u, nuq[:, None], (_Z(), q))
        vp = jax.lax.dynamic_slice(v, (_Z(), p), (N, 1))[:, 0]
        vq = jax.lax.dynamic_slice(v, (_Z(), q), (N, 1))[:, 0]
        nvp = cb * vp - sb * vq
        nvq = sb * vp + cb * vq
        v = jax.lax.dynamic_update_slice(v, nvp[:, None], (_Z(), p))
        v = jax.lax.dynamic_update_slice(v, nvq[:, None], (_Z(), q))
        return a, u, v, off

    def cond(st):
        i, _, _, _, off = st
        return (i < max_sweeps) & (off > tol)

    def body(st):
        i, a, u, v, _ = st
        a, u, v, off = jax.lax.fori_loop(
            0, T, pair_body, (a, u, v, jnp.zeros((), dt)))
        return i + 1, a, u, v, off

    u0 = jnp.eye(N, dtype=dt)
    v0 = jnp.eye(N, dtype=dt)
    _, a, u, v, _ = jax.lax.while_loop(
        cond, body,
        (jnp.zeros((), jnp.int32), a, u0, v0, jnp.asarray(jnp.inf, dt)))
    return a, u, v


def _kog_square(a2, max_sweeps):
    """2-D square core + sign/sort fixes. Returns (u, sv, vt)."""
    N = a2.shape[-1]
    dt = a2.dtype
    eps = jnp.finfo(dt).eps
    if N == 1:
        sv = jnp.abs(a2[0])
        u = jnp.where(a2 < 0, -1.0, 1.0).astype(dt)
        return u, sv, jnp.ones((1, 1), dt)
    s, u, v = _kog_core(a2, max_sweeps, tol=eps * N)
    d = jnp.diagonal(s)
    sv = jnp.abs(d)
    u = u * jnp.where(d < 0, -1.0, 1.0)[None, :]
    order = jnp.argsort(-sv)
    return u[:, order], sv[order], v[:, order].T


def svd_kogbetliantz(a, max_sweeps: int = 30):
    """Two-sided Jacobi (Kogbetliantz) SVD: A = U·diag(sv)·V
    (ref: svd_jac_2sided.js:30-144; see module docstring). Batched over
    leading dims; rectangular via QR preconditioning / transposition,
    as in the reference (svd_jac_2sided.js:39-53)."""
    from .qr import _qr_house_flat
    a = jnp.asarray(a)
    a = a.astype(default_float_for(a.dtype))
    if a.ndim < 2:
        raise ValueError("svd expects ndim >= 2")
    lead = a.shape[:-2]
    M, N = a.shape[-2:]
    a3 = a.reshape((max(1, _math.prod(lead)), M, N))
    if M < N:
        u, sv, v = svd_kogbetliantz(jnp.swapaxes(a3, -1, -2),
                                    max_sweeps=max_sweeps)
        u, sv, v = mt(v), sv, mt(u)
    elif M > N:
        q, r = _qr_house_flat(a3, True)
        u, sv, v = jax.vmap(lambda x: _kog_square(x, max_sweeps))(r)
        u = mm(q, u)
    else:
        u, sv, v = jax.vmap(lambda x: _kog_square(x, max_sweeps))(a3)
    K = min(M, N)
    return (u.reshape(lead + (M, K)), sv.reshape(lead + (K,)),
            v.reshape(lead + (K, N)))
