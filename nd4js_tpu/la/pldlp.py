"""Bunch-Kaufman PLDLᵀPᵀ — symmetric-indefinite factorisation.

Parity with /root/reference/src/la/pldlp.js (modeled on LAPACK DSYTF2,
:24-28; 1×1/2×2 pivot kernels :35,55; symmetric swap :87; driver :191;
factor extractors pldlp_l/d/p :225,307,383; solve :441,519).

TPU-first redesign: the reference's scalar column loop becomes a
``lax.while_loop`` over the (data-dependent) column index with the
Bunch-Kaufman pivot tests evaluated via masked reductions and the
symmetric swap as a masked row+column blend; each elimination applies a
vectorised rank-1 (or rank-2) update to the full matrix.

Conventions:
  * ``pldlp_decomp(A) -> (LD, P, blk)``: P int32 with
    A[P][:, P] = L·D·Lᵀ; LD packs unit-lower L below the diagonal and D
    on the diagonal (2×2 blocks keep their off-diagonal at LD[i+1, i],
    like LAPACK); ``blk`` marks the first column of each 2×2 D block.
  * ``pldlp_l/d/p`` unpack the factors (ref: pldlp.js:225,307,383).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..core.batch import batched
from ..core.mm import mm, mt
from ..config import default_float_for
from .tri import _tril_inv_core, tril_solve, tril_t_solve
from .permute import permute_rows, permute_cols, unpermute_rows

__all__ = ["pldlp_decomp", "pldlp_l", "pldlp_d", "pldlp_p", "pldlp_solve"]

_ALPHA = (1.0 + math.sqrt(17.0)) / 8.0


def _sym_swap(a, i, j, idx):
    """Swap rows i,j and columns i,j of symmetric a (masked blend)."""
    ri = jnp.sum(jnp.where((idx == i)[:, None], a, 0.0), axis=0)
    rj = jnp.sum(jnp.where((idx == j)[:, None], a, 0.0), axis=0)
    a = jnp.where((idx == i)[:, None], rj[None, :],
                  jnp.where((idx == j)[:, None], ri[None, :], a))
    ci = jnp.sum(jnp.where((idx == i)[None, :], a, 0.0), axis=1)
    cj = jnp.sum(jnp.where((idx == j)[None, :], a, 0.0), axis=1)
    a = jnp.where((idx == i)[None, :], cj[:, None],
                  jnp.where((idx == j)[None, :], ci[:, None], a))
    return a


def _swap_vec(v, i, j, idx):
    vi = jnp.sum(jnp.where(idx == i, v, 0), axis=-1, dtype=v.dtype)
    vj = jnp.sum(jnp.where(idx == j, v, 0), axis=-1, dtype=v.dtype)
    return jnp.where(idx == i, vj, jnp.where(idx == j, vi, v))


def _pldlp_core(a):
    n = a.shape[-1]
    idx = jnp.arange(n)
    p0 = jnp.arange(n, dtype=jnp.int32)
    blk0 = jnp.zeros((n,), bool)

    def col(a, k):
        return jnp.sum(jnp.where((idx == k)[None, :], a, 0.0), axis=1)

    def cond(st):
        a, p, blk, k = st
        return k < n

    def body(st):
        a, p, blk, k = st
        ck = col(a, k)
        akk = jnp.sum(jnp.where(idx == k, ck, 0.0))
        below = jnp.where(idx > k, jnp.abs(ck), -1.0)
        lam = jnp.max(below)
        r = jnp.argmax(below).astype(jnp.int32)
        # Bunch-Kaufman pivot decision
        use_11 = jnp.abs(akk) >= _ALPHA * lam
        use_11 = use_11 | (lam <= 0)
        cr = col(a, r)
        sigma = jnp.max(jnp.where((idx != r) & (idx >= k),
                                  jnp.abs(cr), -1.0))
        arr = jnp.sum(jnp.where(idx == r, cr, 0.0))
        case_b = jnp.abs(akk) * sigma >= _ALPHA * lam * lam
        case_c = jnp.abs(arr) >= _ALPHA * sigma
        # decision: 0 = 1x1 no swap, 1 = 1x1 swap k<->r, 2 = 2x2 swap k+1<->r
        dec = jnp.where(use_11 | case_b, 0, jnp.where(case_c, 1, 2))

        def elim11(args):
            a, p, blk, k = args
            ck = col(a, k)
            d = jnp.sum(jnp.where(idx == k, ck, 0.0))
            safe = jnp.where(d == 0, 1.0, d)
            l = jnp.where(idx > k, ck / safe, 0.0)
            a = a - jnp.outer(l, jnp.where(idx > k, ck, 0.0))
            # store l in column k (and row k for symmetry of packing)
            a = jnp.where((idx == k)[None, :] & (idx > k)[:, None],
                          l[:, None], a)
            a = jnp.where((idx == k)[:, None] & (idx > k)[None, :],
                          l[None, :], a)
            return a, p, blk, k + 1

        def elim22(args):
            a, p, blk, k = args
            ck = col(a, k)
            ck1 = col(a, k + 1)
            d11 = jnp.sum(jnp.where(idx == k, ck, 0.0))
            d21 = jnp.sum(jnp.where(idx == k + 1, ck, 0.0))
            d22 = jnp.sum(jnp.where(idx == k + 1, ck1, 0.0))
            det = d11 * d22 - d21 * d21
            safe_det = jnp.where(det == 0, 1.0, det)
            w1 = jnp.where(idx > k + 1, ck, 0.0)
            w2 = jnp.where(idx > k + 1, ck1, 0.0)
            # L block = W·D⁻¹ with D = [[d11,d21],[d21,d22]]
            l1 = (w1 * d22 - w2 * d21) / safe_det
            l2 = (w2 * d11 - w1 * d21) / safe_det
            a = a - jnp.outer(l1, w1) - jnp.outer(l2, w2)
            a = jnp.where((idx == k)[None, :] & (idx > k + 1)[:, None],
                          l1[:, None], a)
            a = jnp.where((idx == k)[:, None] & (idx > k + 1)[None, :],
                          l1[None, :], a)
            a = jnp.where((idx == k + 1)[None, :] & (idx > k + 1)[:, None],
                          l2[:, None], a)
            a = jnp.where((idx == k + 1)[:, None] & (idx > k + 1)[None, :],
                          l2[None, :], a)
            blk = blk | (idx == k)
            return a, p, blk, k + 2

        def branch0(args):
            return elim11(args)

        def branch1(args):
            a, p, blk, k = args
            a = _sym_swap(a, k, r, idx)
            p = _swap_vec(p, k, r, idx)
            return elim11((a, p, blk, k))

        def branch2(args):
            a, p, blk, k = args
            a = _sym_swap(a, k + 1, r, idx)
            p = _swap_vec(p, k + 1, r, idx)
            return elim22((a, p, blk, k))

        # guard: a 2x2 step at the last column cannot happen (lam<=0 ⇒ 1x1)
        a, p, blk, k = jax.lax.switch(dec, [branch0, branch1, branch2],
                                      (a, p, blk, k))
        return a, p, blk, k

    a, p, blk, _ = jax.lax.while_loop(
        cond, body, (a, p0, blk0, jnp.zeros((), jnp.int32)))
    return a, p, blk


def pldlp_decomp(a):
    """Bunch-Kaufman factorisation (ref: pldlp.js:191). Batched.

    Returns (LD, P, blk): A[..., P, :][..., :, P] = L·D·Lᵀ.
    """
    a = jnp.asarray(a)
    a = a.astype(default_float_for(a.dtype))
    a = (a + jnp.swapaxes(a, -1, -2)) * 0.5

    @batched((2,))
    def _go(a):
        return _pldlp_core(a)

    return _go(a)


def pldlp_l(ld, blk):
    """Unit-lower L factor (ref: pldlp.js:225)."""
    ld = jnp.asarray(ld)
    n = ld.shape[-1]
    blk = jnp.asarray(blk)
    l = jnp.tril(ld, -1)
    # zero the D 2x2 sub-diagonal entries that live at (i+1, i)
    r = jnp.arange(n)[:, None]
    c = jnp.arange(n)[None, :]
    is_d21 = (r == c + 1) & blk[..., None, :]
    l = jnp.where(is_d21, 0.0, l)
    return l + jnp.eye(n, dtype=ld.dtype)


def pldlp_d(ld, blk):
    """Block-diagonal D factor (ref: pldlp.js:307)."""
    ld = jnp.asarray(ld)
    n = ld.shape[-1]
    blk = jnp.asarray(blk)
    r = jnp.arange(n)[:, None]
    c = jnp.arange(n)[None, :]
    subv = jnp.diagonal(ld, offset=-1, axis1=-2, axis2=-1)
    subv = jnp.where(blk[..., :n - 1], subv, 0.0)
    d = jnp.where(r == c, ld, 0.0)
    d = d + _offdiag_embed(subv, n, lower=True) \
          + _offdiag_embed(subv, n, lower=False)
    return d


def _offdiag_embed(v, n, lower: bool):
    """Embed (..., n-1) values on the ±1 diagonal of an (..., n, n)."""
    z = jnp.zeros(v.shape[:-1] + (n, n), v.dtype)
    i = jnp.arange(n - 1)
    if lower:
        return z.at[..., i + 1, i].set(v)
    return z.at[..., i, i + 1].set(v)


def pldlp_p(p, dtype=None):
    """Permutation vector → one-hot matrix (ref: pldlp.js:383)."""
    p = jnp.asarray(p)
    n = p.shape[-1]
    return (p[..., :, None] == jnp.arange(n)[None, :]).astype(
        dtype or jnp.float32)


def pldlp_solve(ld, p, blk, y):
    """Solve A·x = y from the Bunch-Kaufman factors
    (ref: pldlp.js:441,519)."""
    ld = jnp.asarray(ld)
    y = jnp.asarray(y).astype(ld.dtype)
    p, blk = jnp.asarray(p), jnp.asarray(blk)

    @batched((2, 1, 1, 2))
    def _go(ld, p, blk, y):
        n = ld.shape[-1]
        l = pldlp_l(ld, blk)
        d = pldlp_d(ld, blk)
        yp = y[p]
        z = mm(_tril_inv_core(l), yp)
        # block-diagonal solve: vectorised 1x1 / 2x2
        dd = jnp.diagonal(d)
        sub = jnp.diagonal(d, offset=-1)
        pad = jnp.zeros((1,), ld.dtype)
        subp = jnp.concatenate([sub, pad], -1)       # e at block start i
        subm = jnp.concatenate([pad, sub], -1)       # e at second row i
        is_start = blk
        is_second = jnp.concatenate([jnp.zeros((1,), bool), blk[:-1]], -1)
        dnext = jnp.concatenate([dd[1:], pad], -1)
        dprev = jnp.concatenate([pad, dd[:-1]], -1)
        znext = jnp.concatenate([z[1:], jnp.zeros((1, z.shape[1]),
                                                  z.dtype)], 0)
        zprev = jnp.concatenate([jnp.zeros((1, z.shape[1]), z.dtype),
                                 z[:-1]], 0)
        det_s = dd * dnext - subp * subp
        det_2 = jnp.where(is_start, det_s, 1.0)
        det_p = dprev * dd - subm * subm
        det_2p = jnp.where(is_second, det_p, 1.0)
        x11 = z / jnp.where(dd == 0, 1.0, dd)[:, None]
        x_start = (dnext[:, None] * z - subp[:, None] * znext) \
            / det_2[:, None]
        x_second = (dprev[:, None] * z - subm[:, None] * zprev) \
            / det_2p[:, None]
        x = jnp.where(is_start[:, None], x_start,
                      jnp.where(is_second[:, None], x_second, x11))
        w = tril_t_solve(l, x)
        return unpermute_rows(w, p)

    return _go(ld, p, blk, y)
