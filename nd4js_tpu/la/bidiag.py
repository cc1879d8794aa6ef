"""Golub-Kahan bidiagonalization: A = U·B·V, B upper bidiagonal.

Parity with /root/reference/src/la/bidiag.js (shape-specialised kernels
:32,112,165, driver :245): U (..., M, I), B (..., I, J), V (..., J, N)
with I = min(M, N) and J = I (M ≥ N) or I+1 (M < N) — exactly the
reference's shape convention.

TPU-first: one unified ``fori_loop`` of alternating left/right
vectorised Householder reflectors (the reference uses Givens below the
diagonal for cache reasons; reflectors fuse better on the VPU), with U
and V accumulated by replaying stored reflectors — all masked static
shapes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import config as _config
from ..core.batch import batched
from ..config import default_float_for
from .hessenberg import _householder_vec

__all__ = ["bidiag_decomp"]


def _bidiag_core(a):
    M, N = a.shape
    K = min(M, N)
    J = K if M >= N else K + 1
    rows = jnp.arange(M)
    cols = jnp.arange(N)

    nl = max(0, min(K, M - 1))          # number of left reflectors
    nr = max(0, min(K, N - 2))          # number of right reflectors
    Vl0 = jnp.zeros((M, max(nl, 1)), a.dtype)
    taul0 = jnp.zeros((max(nl, 1),), a.dtype)
    Vr0 = jnp.zeros((N, max(nr, 1)), a.dtype)
    taur0 = jnp.zeros((max(nr, 1),), a.dtype)

    def body(j, carry):
        a, Vl, taul, Vr, taur = carry
        # left reflector: zero a[j+1:, j]
        def left(args):
            a, Vl, taul = args
            v, tau, _ = _householder_vec(a[:, j], j, rows)
            w = tau * jnp.einsum("i,ik->k", v, a, precision=_config.matmul_precision)
            a = a - jnp.outer(v, w)
            Vl = Vl.at[:, j].set(v)
            taul = taul.at[j].set(tau)
            return a, Vl, taul

        if nl > 0:
            a, Vl, taul = jax.lax.cond(j < nl, left,
                                       lambda x: x, (a, Vl, taul))

        # right reflector: zero a[j, j+2:]
        def right(args):
            a, Vr, taur = args
            v, tau, _ = _householder_vec(a[j, :], j + 1, cols)
            u = tau * jnp.einsum("ik,k->i", a, v, precision=_config.matmul_precision)
            a = a - jnp.outer(u, v)
            Vr = Vr.at[:, j].set(v)
            taur = taur.at[j].set(tau)
            return a, Vr, taur

        if nr > 0:
            a, Vr, taur = jax.lax.cond(j < nr, right,
                                       lambda x: x, (a, Vr, taur))
        return a, Vl, taul, Vr, taur

    a, Vl, taul, Vr, taur = jax.lax.fori_loop(
        0, K, body, (a, Vl0, taul0, Vr0, taur0))

    # U = Hl_0···Hl_{nl-1} applied to eye(M, K), reverse order
    def ubody(i, u):
        jj = nl - 1 - i
        v = Vl[:, jj]
        tau = taul[jj]
        w = tau * jnp.einsum("i,ik->k", v, u, precision=_config.matmul_precision)
        return u - jnp.outer(v, w)

    u = jnp.eye(M, K, dtype=a.dtype)
    if nl > 0:
        u = jax.lax.fori_loop(0, nl, ubody, u)

    # V = (Hr_{nr-1}···Hr_0)[:J, :] built by right-multiplying eye(J, N)
    def vbody(i, vmat):
        jj = nr - 1 - i
        v = Vr[:, jj]
        tau = taur[jj]
        w = tau * jnp.einsum("ik,k->i", vmat, v, precision=_config.matmul_precision)
        return vmat - jnp.outer(w, v)

    vmat = jnp.eye(J, N, dtype=a.dtype)
    if nr > 0:
        vmat = jax.lax.fori_loop(0, nr, vbody, vmat)

    # clean B to exact bidiagonal
    b = a[:K, :J]
    r = jnp.arange(K)[:, None]
    c = jnp.arange(J)[None, :]
    b = jnp.where((c == r) | (c == r + 1), b, 0.0)
    return u, b, vmat


@batched((2,))
def bidiag_decomp(a):
    """[U, B, V] with A = U·B·V, B upper bidiagonal
    (ref: bidiag.js:245). Batched over leading dims."""
    a = jnp.asarray(a)
    a = a.astype(default_float_for(a.dtype))
    return _bidiag_core(a)
