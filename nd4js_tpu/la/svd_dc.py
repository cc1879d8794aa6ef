"""Divide-&-conquer SVD.

Parity with /root/reference/src/la/svd_dc.js (:827-932 — bidiagonal
reduction, divide-&-conquer with secular solves, GEMM back-transforms).

TPU-first mechanism: bidiagonalise (bidiag.py), then solve the
symmetric tridiagonal eigenproblem of T = BᵀB with the vectorised
divide-&-conquer engine (tridiag_dc.py), and recover the left factor as
U = B·V·Σ⁻¹ with the singular values recomputed as ‖B·V‖ column norms —
no σ² precision loss in Σ itself, and the heavy work (merge
back-transforms, U recovery, outer back-transforms) is all GEMMs. The
reference's direct bidiagonal D&C ("double divide and conquer",
svd_dc.js:159) avoids the Gram step; for singular values below
√eps·‖A‖ the one-sided Jacobi (svd_jac.py, the library default) is the
more accurate choice — svd_dc is the throughput path.
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
    # T = BᵀB tridiagonal: d_i = b_ii² + b_{i-1,i}², e_i = b_ii·b_i,i+1
    pad = jnp.zeros((1,), a.dtype)
    d_t = diag * diag + jnp.concatenate([pad, sup * sup])
    e_t = diag[:-1] * sup
    w, v_t = tridiag_eigh_dc(d_t, e_t)
    # descending singular values
    v_t = v_t[:, ::-1]
    bv = mm(b, v_t)                       # (K, K)
    sv = jnp.sqrt(jnp.sum(bv * bv, axis=0))
    order = jnp.argsort(-sv)              # guard against D&C misordering
    sv = sv[order]
    v_t = v_t[:, order]
    bv = bv[:, order]
    safe = jnp.where(sv > 0, sv, jnp.ones_like(sv))
    u_b = bv / safe[None, :]
    u_b = _complete_u(u_b, sv, tol_rank=eps * K * jnp.max(sv))
    # one CholeskyQR polish: U is orthogonal to ~eps·κ(Σ) from the Gram
    # route; its Gram is ≈ I, so a single chol pass restores machine-eps
    # orthogonality (the ~‖R−I‖·‖A‖ ≈ eps·‖A‖ reconstruction cost is
    # far inside the contract)
    from .cholesky import _chol_core
    from .tri import _tril_inv_core
    g = mm(mt(u_b), u_b)
    l = _chol_core(g)
    u_b = mm(u_b, mt(_tril_inv_core(l)))
    return mm(ub, u_b), sv, mm(mt(v_t), vb)


@batched((2,))
def svd_dc(a):
    """Divide-&-conquer SVD: A = U·diag(sv)·V (ref: svd_dc.js:883).
    Batched over leading dims. Returns (U (...,M,K), sv, V (...,K,N))."""
    a = jnp.asarray(a)
    a = a.astype(default_float_for(a.dtype))
    return _svd_dc_core(a)
