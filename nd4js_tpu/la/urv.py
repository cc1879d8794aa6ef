"""URV — complete orthogonal decomposition A = U·R·V.

Parity with /root/reference/src/la/urv.js (`urv_decomp_full` :100,
rank-aware minimum-norm `urv_lstsq` :138,196): SRRQR first, then the
right factor is annihilated so only a rank×rank triangular block
remains; `urv_lstsq` gives the minimum-norm least-squares solution for
arbitrary (including rank-deficient) matrices.

TPU-first mechanism: instead of the reference's Givens annihilation of
the right block, the (rank-masked) row space is re-triangularised by one
blocked Householder QR of Rᵀ — all GEMMs, jit-safe with the traced
rank. The triangular block therefore comes out *lower*-triangular
(capability parity; the reference's is upper)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.batch import batched
from ..core.mm import mm, mt
from ..config import default_float_for
from .qr import _qr_core
from .srrqr import _srrqr_core, srrqr_decomp_full
from .permute import unpermute_cols
from .tri import _tril_inv_core
from .. import dt

__all__ = ["urv_decomp_full", "urv_lstsq"]


def _urv_core(a, dtol, f):
    M, N = a.shape
    K = min(M, N)
    q, r, p, rank = _srrqr_core(a, dtol, f)
    idx_m = jnp.arange(M)
    idx_n = jnp.arange(N)
    # zero the numerically-negligible trailing block (ref: urv.js:124-130)
    r = jnp.where((idx_m[:, None] >= rank) & (idx_n[None, :] >= rank),
                  0.0, r)
    # annihilate the right block: QR of Rᵀ gives R = Lᵀ·Wᵀ = R_new·V'
    s = jnp.where(idx_m[:, None] < rank, r, 0.0)
    w, t = _qr_core(mt(s), economic=False)         # sᵀ (N, M) = w·t
    r_new = mt(t)                                   # (M, N) lower-tri block
    v = mt(w)                                       # (N, N)
    # fold the column permutation into V:  A[:, P] = U·R·V'
    #   ⇒ A = U·R·V with V = unpermute_cols(V', P)
    v = unpermute_cols(v, p)
    return q, r_new, v, rank


@batched((2,))
def urv_decomp_full(a, dtol=None, f: float = 2.0):
    """[U, R, V, rank] with A = U·R·V, U (M,M) and V (N,N) orthogonal,
    R (M,N) nonzero only in its leading rank×rank (lower-)triangular
    block (ref: urv.js:100). Batched."""
    a = jnp.asarray(a)
    a = a.astype(default_float_for(a.dtype))
    if dtol is None:
        dtol = dt.eps(a.dtype) * max(a.shape[-2:])
    return _urv_core(a, dtol, f)


def urv_lstsq(u, r, v, ranks, y):
    """Minimum-norm least squares from a URV decomposition
    (ref: urv.js:196): x = Vᵀ·[R₁₁⁻¹·(Uᵀy)₁ ; 0]."""
    u, r, v = jnp.asarray(u), jnp.asarray(r), jnp.asarray(v)
    y = jnp.asarray(y).astype(u.dtype)
    ranks = jnp.asarray(ranks)

    @batched((2, 2, 2, 0, 2))
    def _go(u, r, v, rank, y):
        M, N = r.shape
        K = min(M, N)
        idx = jnp.arange(K)
        live = idx < rank
        eye = jnp.eye(K, dtype=r.dtype)
        r11 = jnp.where(live[:, None] & live[None, :], r[:K, :K], eye)
        uty = mm(mt(u[:, :K]), y)
        z = mm(_tril_inv_core(r11), uty)
        z = jnp.where(live[:, None], z, 0.0)
        if N > K:
            z = jnp.concatenate(
                [z, jnp.zeros((N - K, z.shape[-1]), z.dtype)], axis=0)
        return mm(mt(v), z)

    return _go(u, r, v, ranks, y)
