"""Symmetric eigendecomposition via two-sided (classical) Jacobi.

The reference has NO symmetric eigensolver (TODO at
/root/reference/src/la/eigen.js:28-30); BASELINE config 4 requires one.
This is the capability the reference lacks, built with the same parallel
Jacobi machinery as svd_jac.py:

  * Brent-Luk tournament ordering — each round applies N/2 disjoint
    rotations J·A·Jᵀ as fused row- and column-panel VPU ops; the
    between-round shuffle is static slice/concat on both rows and
    columns (kept consistent, so the matrix stays symmetric).
  * The pair Gram entries are the *diagonals* of the four (h, h) blocks
    of the split matrix — extracted with jnp.diagonal, fully vectorised.
  * Sweeps run under lax.while_loop with an off-diagonal-norm stopping
    criterion.

Returns (w, V) with A = V·diag(w)·Vᵀ, eigenvalues ascending (NumPy
``eigh`` convention, so tests compare directly).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import config as _config
from ..core.batch import batched
from ..core.mm import mt
from ..config import default_float_for

__all__ = ["eigh", "eigh_jacobi", "eigh_tridiag_dc"]


def _shuffle_cols(xt, xb):
    h = xt.shape[-1]
    if h == 1:
        return xt, xb
    nt = jnp.concatenate([xt[..., :1], xb[..., :1], xt[..., 1:h - 1]], -1)
    nb = jnp.concatenate([xb[..., 1:], xt[..., h - 1:]], -1)
    return nt, nb


def _eigh_core(a, max_sweeps: int, tol):
    N = a.shape[-1]
    h = N // 2
    v = jnp.eye(N, dtype=a.dtype)

    def round_body(_, carry):
        a, v, off = carry
        att, atb = a[:h, :h], a[:h, h:]
        abt, abb = a[h:, :h], a[h:, h:]
        app = jnp.diagonal(att)
        aqq = jnp.diagonal(abb)
        apq = jnp.diagonal(atb)
        scale = jnp.sqrt(jnp.abs(app * aqq)) + jnp.abs(apq) \
            + jnp.finfo(a.dtype).tiny
        off = jnp.maximum(off, jnp.max(jnp.abs(apq) / scale))
        small = jnp.abs(apq) <= jnp.finfo(a.dtype).tiny
        safe_apq = jnp.where(small, jnp.ones_like(apq), apq)
        tau = (aqq - app) / (2 * safe_apq)
        t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1 + tau * tau))
        t = jnp.where(tau == 0, jnp.ones_like(t), t)
        t = jnp.where(small, jnp.zeros_like(t), t)
        c = jax.lax.rsqrt(1 + t * t)
        s = t * c
        # rows: [At; Ab] <- [c·At − s·Ab ; s·At + c·Ab]
        at, ab = a[:h, :], a[h:, :]
        nat = c[:, None] * at - s[:, None] * ab
        nab = s[:, None] * at + c[:, None] * ab
        a = jnp.concatenate([nat, nab], axis=0)
        # cols: same rotation from the right
        al, ar = a[:, :h], a[:, h:]
        nal = c[None, :] * al - s[None, :] * ar
        nar = s[None, :] * al + c[None, :] * ar
        # eigvec accumulation (columns only)
        vl, vr = v[:, :h], v[:, h:]
        nvl = c[None, :] * vl - s[None, :] * vr
        nvr = s[None, :] * vl + c[None, :] * vr
        # Brent-Luk shuffle, consistently on rows, cols and V cols
        nal, nar = _shuffle_cols(nal, nar)
        a = jnp.concatenate([nal, nar], axis=1)
        at, ab = _shuffle_cols(a[:h, :].T, a[h:, :].T)
        a = jnp.concatenate([at.T, ab.T], axis=0)
        nvl, nvr = _shuffle_cols(nvl, nvr)
        v = jnp.concatenate([nvl, nvr], axis=1)
        return a, v, off

    def cond(carry):
        i, _, _, off = carry
        return (i < max_sweeps) & (off > tol)

    def body(carry):
        i, a, v, _ = carry
        a, v, off = jax.lax.fori_loop(
            0, N - 1, round_body, (a, v, jnp.zeros((), a.dtype)))
        return i + 1, a, v, off

    _, a, v, _ = jax.lax.while_loop(
        cond, body,
        (jnp.zeros((), jnp.int32), a, v, jnp.asarray(jnp.inf, a.dtype)))
    return jnp.diagonal(a), v


@batched((2,))
def eigh_jacobi(a, max_sweeps: int = 30):
    """Symmetric eigendecomposition, A = V·diag(w)·Vᵀ, w ascending.
    Batched over leading dims. Only the symmetric part of A is used."""
    a = jnp.asarray(a)
    a = a.astype(default_float_for(a.dtype))
    a = (a + mt(a)) * 0.5
    N = a.shape[-1]
    eps = jnp.finfo(a.dtype).eps
    pad = N % 2
    if pad:
        a = jnp.pad(a, ((0, 1), (0, 1)))
        # decouple the pad dimension with a far-away eigenvalue so no
        # rotation mixes it (off-diagonals are exactly zero)
    w, v = _eigh_core(a, max_sweeps, tol=eps * N)
    if pad:
        # the pad eigenpair has eigenvalue 0 and eigenvector e_{N};
        # locate it by the vector's pad-row magnitude, not the value
        pad_row = jnp.abs(v[N, :])
        keep = jnp.argsort(-pad_row)[1:]            # drop the pad column
        w = w[keep]
        v = v[:N, keep]
    order = jnp.argsort(w)
    return w[order], v[:, order]


def eigh_via_svd(a):
    """Symmetric eigendecomposition through the SVD — the
    batched-throughput path for BASELINE config 4.

    A is shifted positive-definite first: B = A + c·I with
    c = ‖A‖_F ≥ ρ(A), so B's singular triplets ARE its eigenpairs
    (no ±λ sign ambiguity — the naive λ = σ·sign(uᵀv) trick breaks when
    |λᵢ| ≈ |λⱼ| collide and the SVD mixes the eigenspaces). Then
    λ = σ − c. Absolute accuracy eps·c on small eigenvalues — within
    the library contracts; use method='jacobi' for tiny-λ fidelity."""
    from .svd import svd_decomp
    a = jnp.asarray(a)
    a = a.astype(default_float_for(a.dtype))
    a = (a + mt(a)) * 0.5
    n = a.shape[-1]
    c = jnp.sqrt(jnp.sum(a * a, axis=(-2, -1), keepdims=True)) \
        + jnp.finfo(a.dtype).tiny
    b = a + c * jnp.eye(n, dtype=a.dtype)
    u, sv, v = svd_decomp(b)
    w = sv - c[..., 0]
    order = jnp.argsort(w, axis=-1)
    w = jnp.take_along_axis(w, order, axis=-1)
    vec = jnp.take_along_axis(u, order[..., None, :], axis=-1)
    return w, vec


def eigh_tridiag_dc(a):
    """Symmetric eigendecomposition via blocked tridiagonalization
    + divide-&-conquer (sytrd.py + tridiag_dc.py) — the
    large-single-matrix throughput path for BASELINE config 4.

    The blocked latrd-style reduction (sytrd.py) provides Q·T·Qᵀ with
    n³/3 HBM traffic (one matvec per column + two rank-2b GEMMs per
    panel); the D&C engine solves T with GEMM-dominated merges, and one
    back-transform GEMM restores the eigenvectors. Unlike eigh_via_svd
    there is no spectrum shift: small eigenvalues keep O(eps·‖A‖)
    absolute accuracy with none of the ‖A‖_F-shift inflation.
    Batch-native: the leading dims ride the sytrd panel kernel's grid
    and the level-batched D&C merges (no per-matrix retraces)."""
    from .sytrd import sytrd
    from .tridiag_dc import tridiag_eigh_dc
    a = jnp.asarray(a)
    a = a.astype(default_float_for(a.dtype))
    n = a.shape[-1]
    if n == 1:
        return a[..., 0], jnp.ones_like(a)
    d, e, q = sytrd(a)
    w, v = tridiag_eigh_dc(d, e)
    return w, jnp.matmul(q, v, precision=_config.matmul_precision)


def eigh(a, max_sweeps: int = 30, method: str = "auto"):
    """Symmetric eigendecomposition, A = V·diag(w)·Vᵀ, w ascending
    (NumPy-style name). method: 'auto' (default — MXU-size inputs,
    n ≥ 128, route to the blocked-tridiagonalization divide-&-conquer
    path; small inputs to the parallel Jacobi whose dispatch pattern
    wins below the MXU tile — the shipped default IS the benched path),
    'jacobi' (highest relative accuracy), 'dc' (tridiagonal
    divide-&-conquer), or 'via_svd'."""
    if method == "auto":
        shape = jnp.shape(a)
        method = "dc" if (len(shape) >= 2 and shape[-1] >= 128) \
            else "jacobi"
    if method == "via_svd":
        return eigh_via_svd(a)
    if method == "dc":
        return eigh_tridiag_dc(a)
    return eigh_jacobi(a, max_sweeps=max_sweeps)
