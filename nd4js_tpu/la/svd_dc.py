"""Divide-&-conquer SVD — direct bidiagonal (unsquared).

Parity with /root/reference/src/la/svd_dc.js (:827-932 — bidiagonal
reduction, divide-&-conquer with secular solves, GEMM back-transforms;
the "double divide and conquer" of :159 works on the bidiagonal
directly, never forming BᵀB).

TPU-first mechanism: bidiagonalise (bidiag.py), then solve the
Golub-Kahan TGK eigenproblem — the permuted [[0, Bᵀ], [B, 0]] is a
2K×2K symmetric tridiagonal with zero diagonal and interleaved
offdiagonals (a₁, b₁, a₂, b₂, …, a_K); its eigenpairs are ±σᵢ with
eigenvectors interleaving (v, u) components — via the vectorised
divide-&-conquer engine (tridiag_dc.py). Like the reference's direct
bidiagonal D&C this never squares B, so singular values far below
√eps·‖A‖ keep relative accuracy (the old BᵀB route lost them). The
heavy work (merge back-transforms, outer back-transforms) is all GEMMs.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.batch import batched
from ..core.mm import mm, mt
from ..config import default_float_for
from .bidiag import _bidiag_core
from .tridiag_dc import tridiag_eigh_dc
from .svd_jac import _complete_u

__all__ = ["svd_dc"]


def _orth_polish(q):
    """One CholeskyQR pass: restores machine-eps orthogonality of an
    already nearly-orthogonal square factor (Gram ≈ I so the Cholesky
    never breaks; the ~‖R−I‖·‖A‖ ≈ eps·‖A‖ reconstruction cost is far
    inside the contract)."""
    from .cholesky import _chol_core
    from .tri import _tril_inv_core
    g = mm(mt(q), q)
    l = _chol_core(g)
    return mm(q, mt(_tril_inv_core(l)))


def _svd_dc_core(a):
    M, N = a.shape
    if M < N:
        u, sv, v = _svd_dc_core(a.T)
        return mt(v), sv, mt(u)
    ub, b, vb = _bidiag_core(a)          # b: (K, K) upper bidiagonal
    K = b.shape[0]
    eps = jnp.finfo(a.dtype).eps
    if K == 1:
        s = jnp.abs(b[0, 0])
        sgn = jnp.where(b[0, 0] < 0, -1.0, 1.0)
        return ub * sgn, s[None], vb
    diag = jnp.diagonal(b)
    sup = jnp.diagonal(b, offset=1)
    # TGK: offdiagonals interleave (a₁, b₁, a₂, b₂, …, a_K), zero diag
    off = jnp.zeros((2 * K - 1,), a.dtype)
    off = off.at[0::2].set(diag).at[1::2].set(sup)
    w, y = tridiag_eigh_dc(jnp.zeros((2 * K,), a.dtype), off)
    # positive half (ascending w → last K entries), descending order
    sv = jnp.maximum(w[K:][::-1], 0.0)
    y = y[:, K:][:, ::-1]                 # (2K, K)
    # eigenvector of +σ interleaves (v₁, u₁, v₂, u₂, …)/√2
    v_t = y[0::2, :]
    u_b = y[1::2, :]
    # Per-column renormalisation. A trustworthy TGK eigenvector has
    # EXACTLY balanced halves ‖u‖ = ‖v‖ = 1/√2 (simple ±σ pair), or is
    # a pure one-sided null vector (σ = 0: ‖u‖ = 1, ‖v‖ = 0 or vice
    # versa). Anything else is a σ ≈ 0 cluster mixture whose light side
    # is numerical noise — renormalising a ~1e-11-norm half yields a
    # unit-norm junk direction that near-duplicates other columns and
    # NaNs the Cholesky polish (found by the zero-rows adversarial
    # generator, ref _test_data_generators.js:83). Kill those columns
    # per side and let the Householder completion rebuild them — for
    # σ ≈ 0 any orthonormal complement is a valid singular basis.
    vn = jnp.sqrt(jnp.sum(v_t * v_t, axis=0))
    un = jnp.sqrt(jnp.sum(u_b * u_b, axis=0))
    isq2 = 0.7071067811865476
    u_ok = (jnp.abs(un - isq2) <= 0.15) | (un >= 0.95)
    v_ok = (jnp.abs(vn - isq2) <= 0.15) | (vn >= 0.95)
    u_b = jnp.where(u_ok[None, :],
                    u_b / jnp.where(un == 0, 1.0, un)[None, :], 0.0)
    v_t = jnp.where(v_ok[None, :],
                    v_t / jnp.where(vn == 0, 1.0, vn)[None, :], 0.0)
    # sign fix: make U·diag(sv)·Vᵀ reproduce B's diagonal sign pattern
    # (σ columns are sign-ambiguous per (u, v) pair — pin u's sign to
    # B·v's)
    bv = mm(b, v_t)
    flip = jnp.where(jnp.sum(bv * u_b, axis=0) < 0, -1.0, 1.0)
    u_b = u_b * flip[None, :]
    tol_rank = eps * K * jnp.max(sv)
    u_b = _complete_u(u_b, sv, tol_rank=tol_rank,
                      force=jnp.any(~u_ok))
    v_t = _complete_u(v_t, sv, tol_rank=tol_rank,
                      force=jnp.any(~v_ok))
    u_b = _orth_polish(u_b)
    v_t = _orth_polish(v_t)
    return mm(ub, u_b), sv, mm(mt(v_t), vb)


@batched((2,))
def svd_dc(a):
    """Divide-&-conquer SVD: A = U·diag(sv)·V (ref: svd_dc.js:883).
    Batched over leading dims. Returns (U (...,M,K), sv, V (...,K,N))."""
    a = jnp.asarray(a)
    a = a.astype(default_float_for(a.dtype))
    return _svd_dc_core(a)
