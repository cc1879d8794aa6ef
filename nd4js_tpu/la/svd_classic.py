"""Classic two-sided Jacobi SVD with greedy max-off-diagonal pivoting.

Parity with /root/reference/src/la/svd_jac_classic.js: the reference
maintains a tournament tree over row maxima so each rotation's pivot
search is O(log N) pointer updates (:86-180). On TPU the idiomatic
equivalent of "find the largest off-diagonal pair" is one fused masked
argmax reduction over |S| + |S|ᵀ — no pointer tree, same greedy
schedule, same 2×2 annihilation math (_svd_jac_utils.js:72-114 via
svd_kogbetliantz._kog_angles).

Greedy pivoting is sequential by nature (every rotation depends on the
previous pivot choice); this engine exists for mechanism parity and
highest-accuracy small/medium problems. MXU-size throughput belongs to
svd_gram / svd_jac_2sided_blocked.
"""
from __future__ import annotations

import math as _math

import jax
import jax.numpy as jnp

from ..core.mm import mm, mt
from ..config import default_float_for
from .svd_kogbetliantz import _kog_angles, _Z

__all__ = ["svd_jac_classic_greedy"]


def _rotate_pair(a, u, v, p, q, N):
    """Annihilate the (p, q)/(q, p) pair: rows/cols of ``a`` get the
    closed-form (JL, JR), U accumulates JLᵀ, V accumulates JR."""
    tiny = jnp.finfo(a.dtype).tiny
    rp = jax.lax.dynamic_slice(a, (p, _Z()), (1, N))[0]
    rq = jax.lax.dynamic_slice(a, (q, _Z()), (1, N))[0]
    spp, spq = rp[p], rp[q]
    sqp, sqq = rq[p], rq[q]
    ca, sa, cb, sb = _kog_angles(spp, spq, sqp, sqq)
    inert = (jnp.abs(spq) + jnp.abs(sqp)) <= tiny
    ca = jnp.where(inert, 1.0, ca)
    sa = jnp.where(inert, 0.0, sa)
    cb = jnp.where(inert, 1.0, cb)
    sb = jnp.where(inert, 0.0, sb)
    nrp = ca * rp + sa * rq
    nrq = -sa * rp + ca * rq
    a = jax.lax.dynamic_update_slice(a, nrp[None, :], (p, _Z()))
    a = jax.lax.dynamic_update_slice(a, nrq[None, :], (q, _Z()))
    cp = jax.lax.dynamic_slice(a, (_Z(), p), (N, 1))[:, 0]
    cq = jax.lax.dynamic_slice(a, (_Z(), q), (N, 1))[:, 0]
    ncp = cb * cp - sb * cq
    ncq = sb * cp + cb * cq
    a = jax.lax.dynamic_update_slice(a, ncp[:, None], (_Z(), p))
    a = jax.lax.dynamic_update_slice(a, ncq[:, None], (_Z(), q))
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
    return a, u, v


def _classic_core(a, max_rot: int, tol):
    N = a.shape[-1]
    dt = a.dtype
    iu = jnp.triu(jnp.ones((N, N), bool), 1)
    rows = jnp.arange(N, dtype=jnp.int32)

    def off_pivot(a):
        m = jnp.where(iu, jnp.abs(a) + jnp.abs(a.T), -1.0)
        flat = jnp.argmax(m)
        p = (flat // N).astype(jnp.int32)
        q = (flat % N).astype(jnp.int32)
        return m.reshape(-1)[flat], p, q

    def cond(st):
        it, a, u, v = st
        mx, _, _ = off_pivot(a)
        return (it < max_rot) & (mx > tol)

    def body(st):
        it, a, u, v = st
        _, p, q = off_pivot(a)
        a, u, v = _rotate_pair(a, u, v, p, q, N)
        return it + 1, a, u, v

    u0 = jnp.eye(N, dtype=dt)
    v0 = jnp.eye(N, dtype=dt)
    _, a, u, v = jax.lax.while_loop(
        cond, body, (jnp.zeros((), jnp.int32), a, u0, v0))
    return a, u, v


def _classic_square(a2, max_sweeps):
    N = a2.shape[-1]
    dt = a2.dtype
    eps = jnp.finfo(dt).eps
    if N == 1:
        sv = jnp.abs(a2[0])
        u = jnp.where(a2 < 0, -1.0, 1.0).astype(dt)
        return u, sv, jnp.ones((1, 1), dt)
    fro = jnp.sqrt(jnp.sum(a2 * a2))
    max_rot = max_sweeps * (N * (N - 1)) // 2
    s, u, v = _classic_core(a2, max_rot, eps * fro)
    d = jnp.diagonal(s)
    sv = jnp.abs(d)
    u = u * jnp.where(d < 0, -1.0, 1.0)[None, :]
    order = jnp.argsort(-sv)
    return u[:, order], sv[order], v[:, order].T


def svd_jac_classic_greedy(a, max_sweeps: int = 60):
    """Greedy max-pivot classic Jacobi SVD: A = U·diag(sv)·V
    (ref: svd_jac_classic.js; see module docstring). Batched over
    leading dims; rectangular via QR / transposition."""
    from .qr import _qr_house_flat
    a = jnp.asarray(a)
    a = a.astype(default_float_for(a.dtype))
    if a.ndim < 2:
        raise ValueError("svd expects ndim >= 2")
    lead = a.shape[:-2]
    M, N = a.shape[-2:]
    a3 = a.reshape((max(1, _math.prod(lead)), M, N))
    if M < N:
        u, sv, v = svd_jac_classic_greedy(jnp.swapaxes(a3, -1, -2),
                                          max_sweeps=max_sweeps)
        u, sv, v = mt(v), sv, mt(u)
    elif M > N:
        q, r = _qr_house_flat(a3, True)
        u, sv, v = jax.vmap(lambda x: _classic_square(x, max_sweeps))(r)
        u = mm(q, u)
    else:
        u, sv, v = jax.vmap(lambda x: _classic_square(x, max_sweeps))(a3)
    K = min(M, N)
    return (u.reshape(lead + (M, K)), sv.reshape(lead + (K,)),
            v.reshape(lead + (K, N)))
