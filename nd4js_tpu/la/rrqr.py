"""Rank-revealing (column-pivoted) QR.

Parity with /root/reference/src/la/rrqr.js: `rrqr_decomp_full` (:88),
economic `rrqr_decomp` (:278), `_rrqr_rank`/`rrqr_rank` ε-based rank
(:57,398), `rrqr_solve` (:417), `rrqr_lstsq` with rank-deficiency
handled by zeroing trailing rows (:447).

TPU-first redesign: the reference's Givens QR with incrementally
downdated column norms (rrqr.js:29-55) becomes a Householder
column-pivoted factorisation (xGEQP3-style) in a single ``fori_loop``:
each step recomputes trailing column norms exactly (one fused masked
reduction — cheaper and drift-free on the VPU compared to guarding the
downdate against cancellation), argmax-selects the pivot, swaps columns,
and applies one vectorised rank-1 reflector. Q is rebuilt afterwards by
compact-WY panels (GEMMs), reusing qr.py machinery.

Rank decisions are data-dependent, so all rank-aware solves are *masked*
(no dynamic shapes): rows/columns at index ≥ rank are replaced by
identity before the triangular solve and the solution entries are zeroed
after — numerically identical to the reference's "zero trailing rows"
strategy (rrqr.js:447-580) but jit-safe.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import config as _config
from .. import dt
from ..core.batch import batched
from ..core.mm import mm, mt
from ..config import default_float_for
from .qr import _form_t
from .tri import triu_solve
from .permute import unpermute_rows

__all__ = ["rrqr_decomp", "rrqr_decomp_full", "rrqr_rank",
           "rrqr_solve", "rrqr_lstsq"]

_PANEL = 128


def _rrqr_factor(a):
    """fori_loop column-pivoted Householder factorisation.

    Returns (R_packed, V, taus, perm): A[:, perm] = Q R.
    """
    M, N = a.shape
    K = min(M, N)
    rows = jnp.arange(M)[:, None]
    cols = jnp.arange(N)[None, :]
    colv = jnp.arange(N)

    def body(j, carry):
        a, V, taus, perm = carry
        # exact trailing column norms over rows >= j
        nrm2 = jnp.sum(jnp.where(rows >= j, a * a, 0), axis=0)
        p = jnp.argmax(jnp.where(colv >= j, nrm2, -jnp.inf)).astype(jnp.int32)
        # swap columns j <-> p
        col_a, col_b = a[:, j], a[:, p]
        a = a.at[:, j].set(col_b).at[:, p].set(col_a)
        pa, pb = perm[j], perm[p]
        perm = perm.at[j].set(pb).at[p].set(pa)
        # Householder on column j, rows >= j
        x = a[:, j]
        x0 = x[j]
        sigma = jnp.sum(jnp.where(rows[:, 0] > j, x * x, 0))
        nrm = jnp.sqrt(x0 * x0 + sigma)
        beta = jnp.where(x0 >= 0, -nrm, nrm)
        den = x0 - beta
        safe_den = jnp.where(den == 0, jnp.ones_like(den), den)
        v = jnp.where(rows[:, 0] > j, x / safe_den, jnp.zeros_like(x))
        v = jnp.where(rows[:, 0] == j, jnp.ones_like(x), v)
        safe_beta = jnp.where(beta == 0, jnp.ones_like(beta), beta)
        tau = jnp.where(nrm == 0, jnp.zeros_like(beta), (beta - x0) / safe_beta)
        w = tau * jnp.einsum("ij,i->j", a, v, precision=_config.matmul_precision)
        w = jnp.where(colv > j, w, 0)
        a = a - jnp.outer(v, w)
        newc = jnp.where(rows[:, 0] == j, beta, jnp.zeros_like(x))
        newc = jnp.where(rows[:, 0] < j, a[:, j], newc)
        a = a.at[:, j].set(newc)
        V = V.at[:, j].set(v)
        taus = taus.at[j].set(tau)
        return a, V, taus, perm

    V0 = jnp.zeros((M, K), a.dtype)
    taus0 = jnp.zeros((K,), a.dtype)
    perm0 = jnp.arange(N, dtype=jnp.int32)
    a, V, taus, perm = jax.lax.fori_loop(0, K, body, (a, V0, taus0, perm0))
    return a, V, taus, perm


def _build_q(V, taus, ncols):
    """Q from stored reflectors via compact-WY panels (GEMMs)."""
    M, K = V.shape
    B = jnp.eye(M, ncols, dtype=V.dtype)
    panels = [(k, min(_PANEL, K - k)) for k in range(0, K, _PANEL)]
    for k, b in reversed(panels):
        Vp = V[k:, k:k + b]
        T = _form_t(Vp, taus[k:k + b])
        sub = B[k:, :]
        w = mm(mt(Vp), sub)
        w = mm(T, w)
        B = jnp.concatenate([B[:k], sub - mm(Vp, w)], axis=0)
    return B


def _rrqr_batched(a3, economic: bool):
    """Natively-batched public path: the whole pivoted factorisation
    runs VMEM-resident in one Pallas kernel (ops/rrqr_kernel.py); Q is
    rebuilt by compact-WY panels (GEMMs)."""
    from ..ops.rrqr_kernel import rrqr_kernel
    from .qr import _form_t_batched
    interp = jax.default_backend() == "cpu"
    Bn, M, N = a3.shape
    K = min(M, N)
    r, V, taus, perm = rrqr_kernel(a3, interpret=interp)
    ncols = K if economic else M
    B = jnp.broadcast_to(jnp.eye(M, ncols, dtype=a3.dtype),
                         (Bn, M, ncols))
    panels = [(k, min(_PANEL, K - k)) for k in range(0, K, _PANEL)]
    for k, b in reversed(panels):
        Vp, T = _form_t_batched(V[:, k:, k:k + b], taus[:, k:k + b])
        sub = B[:, k:, :]
        w = mm(mt(Vp), sub)
        w = mm(T, w)
        B = jnp.concatenate([B[:, :k], sub - mm(Vp, w)], axis=1)
    r = jnp.triu(r[:, :K] if economic else r)
    return B, r, perm


def _rrqr_public(a, economic: bool):
    import math as _math
    a = jnp.asarray(a)
    a = a.astype(default_float_for(a.dtype))
    if a.ndim < 2:
        raise ValueError("rrqr_decomp expects ndim >= 2")
    lead = a.shape[:-2]
    M, N = a.shape[-2:]
    K = min(M, N)
    a3 = a.reshape((max(1, _math.prod(lead)), M, N))
    q, r, perm = _rrqr_batched(a3, economic)
    ncols = K if economic else M
    return (q.reshape(lead + (M, ncols)),
            r.reshape(lead + (r.shape[-2], N)),
            perm.reshape(lead + (N,)))


def _rrqr_core(a, economic: bool):
    M, N = a.shape
    K = min(M, N)
    r, V, taus, perm = _rrqr_factor(a)
    q = _build_q(V, taus, K if economic else M)
    r = jnp.triu(r[:K] if economic else r)
    return q, r, perm


def rrqr_decomp(a):
    """Economic column-pivoted QR: A[:, P] = Q·R (ref: rrqr.js:278).

    Returns (Q (...,M,K), R (...,K,N), P (...,N) int32). The pivoted
    factorisation runs VMEM-resident (ops/rrqr_kernel.py)."""
    return _rrqr_public(a, economic=True)


def rrqr_decomp_full(a):
    """Full column-pivoted QR (ref: rrqr.js:88)."""
    return _rrqr_public(a, economic=False)


def rrqr_rank(r, tol=None):
    """Numerical rank from the R factor: #{i : |R_ii| > tol·|R_00|}
    (ref: rrqr.js:57,398). Default tol = eps·max(M,N)."""
    r = jnp.asarray(r)
    m, n = r.shape[-2], r.shape[-1]
    if tol is None:
        tol = dt.eps(r.dtype) * max(m, n)
    d = jnp.abs(jnp.diagonal(r, axis1=-2, axis2=-1))
    thresh = tol * jnp.maximum(d[..., :1], jnp.finfo(r.dtype).tiny)
    return jnp.sum(d > thresh, axis=-1).astype(jnp.int32)


def _masked_r_solve(r, qty, rank):
    """Solve R[:rank,:rank]·z = qty[:rank], zeros elsewhere — masked to
    stay jit-safe with a traced rank."""
    k = r.shape[-2]
    idx = jnp.arange(k)
    live = idx < rank
    eye = jnp.eye(k, dtype=r.dtype)
    r_m = jnp.where(live[:, None] & live[None, :], r[..., :k, :k], eye)
    rhs = jnp.where(live[:, None], qty, 0)
    z = triu_solve.core(r_m, rhs, method="block")
    return jnp.where(live[:, None], z, 0)


@batched((2, 2, 1, 2))
def _rrqr_lstsq_core(q, r, perm, y):
    k = min(r.shape[-2], r.shape[-1])
    n = r.shape[-1]
    rank = rrqr_rank(r)
    qty = mm(mt(q[:, :k]), y)
    z = _masked_r_solve(r[:k], qty, rank)
    if n > k:
        z = jnp.concatenate([z, jnp.zeros((n - k, z.shape[-1]), z.dtype)], 0)
    return unpermute_rows(z, perm)


def rrqr_lstsq(q, r, perm, y):
    """Rank-aware least squares: minimum-residual solution with trailing
    (rank-deficient) directions zeroed (ref: rrqr.js:447-580)."""
    q, r = jnp.asarray(q), jnp.asarray(r)
    y = jnp.asarray(y).astype(q.dtype)
    return _rrqr_lstsq_core(q, r, jnp.asarray(perm), y)


def rrqr_solve(q, r, perm, y):
    """Square-system solve; raises SingularMatrixSolveError outside jit
    when R is numerically singular (ref: rrqr.js:417-447)."""
    from .singular_matrix_solve_error import SingularMatrixSolveError
    q, r = jnp.asarray(q), jnp.asarray(r)
    n = r.shape[-1]
    if r.shape[-2] < n:
        raise ValueError("rrqr_solve requires a square system")
    x = rrqr_lstsq(q, r, perm, y)
    rank = rrqr_rank(r)
    if not isinstance(rank, jax.core.Tracer):
        if bool(jnp.any(rank < n)):
            raise SingularMatrixSolveError(x)
    return x
