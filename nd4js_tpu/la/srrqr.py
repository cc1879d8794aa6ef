"""Strong rank-revealing QR (Gu & Eisenstat).

Parity with /root/reference/src/la/srrqr.js (`srrqr_decomp_full` :58,
dtol threshold, strong swaps after Gu & Eisenstat [1]). Returns
[Q (M,M), R (M,N), P (N,), rank] like the reference.

TPU-first redesign: the reference performs individual Givens updates per
swap with a binary search over candidate ranks (:72-76). Here the swap
loop is a ``lax.while_loop``:

  * rank r from the dtol·|R₀₀| diagonal threshold (recomputed each
    round, replacing the reference's binary search — swaps change the
    diagonal, so iterate-to-fixpoint does the same certification),
  * the Gu-Eisenstat interchange criterion
    ρ(i,j) = √( (R₁₁⁻¹R₁₂)ᵢⱼ² + (γⱼ(R₂₂)·ωᵢ(R₁₁⁻¹))² ) > f
    evaluated for ALL (i, j) at once with masked triangular inverses
    (three GEMM-shaped ops) instead of incremental updates,
  * a triggered swap permutes the two columns and *refactorises R by
    the blocked Householder QR* — O(N³) per swap, but strong swaps are
    rare (zero for almost all matrices); the reference's incremental
    retriangularisation saves work only in the pathological cases this
    factorisation exists to catch.

[1] https://math.berkeley.edu/~mgu/MA273/Strong_RRQR.pdf (algorithmic
    reference only — no code consulted).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import dt
from ..core.batch import batched
from ..core.mm import mm, mt
from ..config import default_float_for
from .qr import _qr_core
from .rrqr import _rrqr_core
from .tri import _tril_inv_core

__all__ = ["srrqr_decomp_full", "srrqr_rank"]


def _masked_r11_inv(r, rank):
    """Inverse of R[:rank, :rank] embedded in a K×K identity (masked)."""
    k = r.shape[-1]
    idx = jnp.arange(k)
    live = idx < rank
    eye = jnp.eye(k, dtype=r.dtype)
    r_m = jnp.where(live[:, None] & live[None, :], r, eye)
    # upper-triangular inverse via reversed lower-triangular inverse
    inv = _tril_inv_core(r_m[::-1, ::-1].T).T[::-1, ::-1]
    return jnp.where(live[:, None] & live[None, :], inv, 0.0)


def _srrqr_core(a, dtol, f):
    M, N = a.shape
    K = min(M, N)
    q, r, p = _rrqr_core(a, economic=False)
    idx_k = jnp.arange(K)
    idx_n = jnp.arange(N)
    max_swaps = 2 * N

    def rank_of(r):
        d = jnp.abs(jnp.diagonal(r[:K, :K]))
        thresh = dtol * jnp.maximum(d[0], jnp.finfo(r.dtype).tiny)
        return jnp.sum(d > thresh).astype(jnp.int32)

    def crit(r, rank):
        """Gu-Eisenstat interchange scores rho (K, N)."""
        r11inv = _masked_r11_inv(r[:K, :K], rank)              # (K, K)
        b = mm(r11inv, r[:K, :])                               # (K, N)
        live_r = idx_k < rank
        live_c = idx_n >= rank
        b = jnp.where(live_r[:, None] & live_c[None, :], b, 0.0)
        omega = jnp.sqrt(jnp.sum(r11inv * r11inv, axis=1))     # rows of R11⁻¹
        r22 = jnp.where((idx_k >= rank)[:, None]
                        & (idx_n >= rank)[None, :], r[:K, :], 0.0)
        gamma = jnp.sqrt(jnp.sum(r22 * r22, axis=0))           # (N,)
        rho = jnp.sqrt(b * b + (gamma[None, :] * omega[:, None]) ** 2)
        return jnp.where(live_r[:, None] & live_c[None, :], rho, 0.0)

    def cond(st):
        q, r, p, it, done = st
        return (~done) & (it < max_swaps)

    def body(st):
        q, r, p, it, _ = st
        rank = rank_of(r)
        rho = crit(r, rank)
        flat = jnp.argmax(rho)
        i = (flat // N).astype(jnp.int32)
        j = (flat % N).astype(jnp.int32)
        need = rho.reshape(-1)[flat] > f

        def do_swap(args):
            q, r, p = args
            # swap columns i and j of R (and P), refactorise
            ci = r[:, i]
            cj = r[:, j]
            r2 = r.at[:, i].set(cj).at[:, j].set(ci)
            pi, pj = p[i], p[j]
            p2 = p.at[i].set(pj).at[j].set(pi)
            q2, r3 = _qr_core(r2, economic=False)
            return mm(q, q2), r3, p2

        q, r, p = jax.lax.cond(need, do_swap, lambda x: x, (q, r, p))
        return q, r, p, it + 1, ~need

    q, r, p, _, _ = jax.lax.while_loop(
        cond, body, (q, r, p, jnp.zeros((), jnp.int32),
                     jnp.zeros((), bool)))
    return q, r, p, rank_of(r)


@batched((2,))
def srrqr_decomp_full(a, dtol=None, f: float = 2.0):
    """[Q, R, P, rank] strong rank-revealing QR (ref: srrqr.js:58).
    Batched over leading dims."""
    a = jnp.asarray(a)
    a = a.astype(default_float_for(a.dtype))
    if dtol is None:
        dtol = dt.eps(a.dtype) * max(a.shape[-2:])
    return _srrqr_core(a, dtol, f)


def srrqr_rank(r, dtol=None):
    """Rank from the SRRQR R factor diagonal."""
    r = jnp.asarray(r)
    m, n = r.shape[-2:]
    k = min(m, n)
    if dtol is None:
        dtol = dt.eps(r.dtype) * max(m, n)
    d = jnp.abs(jnp.diagonal(r[..., :k, :k], axis1=-2, axis2=-1))
    thresh = dtol * jnp.maximum(d[..., :1], jnp.finfo(r.dtype).tiny)
    return jnp.sum(d > thresh, axis=-1).astype(jnp.int32)
