"""Real Schur decomposition via implicit double-shift Francis QR.

Parity with /root/reference/src/la/schur.js: `schur_decomp` (:372-388),
`schur_qrfrancis_inplace` (:388-660), `schur_eigenvals` (:31),
`schur_eigen` (:90-370).

TPU-first redesign (SURVEY.md §7 hard part #1): the reference's
recursive deflation with variable-length loops becomes a single
``lax.while_loop`` state machine with *traced* window bounds:

  * every iteration first zeroes negligible subdiagonals globally (one
    masked vector op — the deflation test of the reference, applied
    everywhere at once),
  * the active window [lo, hi) is recovered from the subdiagonal
    pattern with masked argmax arithmetic — no recursion, no dynamic
    shapes,
  * converged complex-pair 2×2 blocks are "locked" via a boolean mask
    so the window logic treats their subdiagonal as deflated,
  * a window of size 2 is standardised (triangularised if its
    eigenvalues are real, locked if complex) under ``lax.cond``; larger
    windows get one Francis double-shift bulge chase, a
    ``fori_loop`` with traced bounds whose 3-row/3-column reflector
    applications are dynamic slices (XLA handles unaligned dynamic
    slices; only Pallas forbids them),
  * LAPACK-style exceptional shifts fire every 10 stagnant iterations.

Iteration cap: 40·N sweeps (the driver contract: status instead of the
reference's exceptions — a non-converged matrix returns the best state;
convergence is checked by the residual contract in tests).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core.batch import batched
from ..core.mm import mm, mt
from ..config import default_float_for
from .hessenberg import _hessenberg_core
from ..core import cpx

__all__ = ["schur_decomp", "schur_eigenvals", "schur_eigen"]


def _zero_small_subdiags(h, eps):
    n = h.shape[-1]
    r = jnp.arange(n)[:, None]
    c = jnp.arange(n)[None, :]
    d = jnp.abs(jnp.diagonal(h))
    small = jnp.abs(h) <= eps * (d[None, :] + d[:, None])
    return jnp.where((r == c + 1) & small, 0.0, h)


def _subdiag(h):
    return jnp.diagonal(h, offset=-1)


def _house3(p0, p1, p2):
    """Householder annihilating components 1,2 of (p0,p1,p2).
    Returns (v0,v1,v2, tau)."""
    sigma = p1 * p1 + p2 * p2
    nrm = jnp.sqrt(p0 * p0 + sigma)
    beta = jnp.where(p0 >= 0, -nrm, nrm)
    den = p0 - beta
    safe_den = jnp.where(den == 0, jnp.ones_like(den), den)
    v1 = jnp.where(sigma == 0, jnp.zeros_like(p1), p1 / safe_den)
    v2 = jnp.where(sigma == 0, jnp.zeros_like(p2), p2 / safe_den)
    safe_beta = jnp.where(beta == 0, jnp.ones_like(beta), beta)
    tau = jnp.where(nrm == 0, jnp.zeros_like(beta), (beta - p0) / safe_beta)
    tau = jnp.where(sigma == 0, jnp.zeros_like(tau), tau)
    return jnp.ones_like(p0), v1, v2, tau


def _i32(k):
    return jnp.asarray(k, jnp.int32)


_Z = lambda: jnp.zeros((), jnp.int32)


def _apply_house3_rows(h, k, v, tau, zero3=False):
    """rows k..k+2 of h ← (I − tau·v·vᵀ)·rows. v: (3,)."""
    rows = jax.lax.dynamic_slice(h, (_i32(k), _Z()), (3, h.shape[1]))
    w = tau * (v @ rows)
    rows = rows - v[:, None] * w[None, :]
    return jax.lax.dynamic_update_slice(h, rows, (_i32(k), _Z()))


def _apply_house3_cols(h, k, v, tau):
    cols = jax.lax.dynamic_slice(h, (_Z(), _i32(k)), (h.shape[0], 3))
    w = tau * (cols @ v)
    cols = cols - w[:, None] * v[None, :]
    return jax.lax.dynamic_update_slice(h, cols, (_Z(), _i32(k)))


def _apply_rot2_rows(h, k, cs, sn):
    rows = jax.lax.dynamic_slice(h, (_i32(k), _Z()), (2, h.shape[1]))
    r0 = cs * rows[0] + sn * rows[1]
    r1 = -sn * rows[0] + cs * rows[1]
    return jax.lax.dynamic_update_slice(h, jnp.stack([r0, r1]), (_i32(k), _Z()))


def _apply_rot2_cols(h, k, cs, sn):
    cols = jax.lax.dynamic_slice(h, (_Z(), _i32(k)), (h.shape[0], 2))
    c0 = cs * cols[:, 0] + sn * cols[:, 1]
    c1 = -sn * cols[:, 0] + cs * cols[:, 1]
    return jax.lax.dynamic_update_slice(h, jnp.stack([c0, c1], axis=1),
                                        (_Z(), _i32(k)))


def _get(h, i, j):
    return jax.lax.dynamic_slice(h, (_i32(i), _i32(j)), (1, 1))[0, 0]


def _chase_windowed(hp, qp, lo, hi, p0, p1, p2, W: int, n: int):
    """One Francis double-shift bulge chase lo→hi, windowed: the bulge
    is chased through W-position blocks whose reflectors touch only a
    (W, W) diagonal block while accumulating the block-orthogonal V;
    each slide then applies V to the off-block rows/columns and Q as
    three GEMMs (the MXU-aggregated equivalent of the reference's
    per-reflector full-row updates, schur.js:415-660; same math as
    LAPACK's dlaqr5 row/column deferral). hp/qp are (n+W, n+W) padded
    so every W-slice is in-bounds."""
    dtype = hp.dtype
    npad = hp.shape[0]
    eyeW = jnp.eye(W, dtype=dtype)
    n_slides = -(-(max(n - 1, 1)) // (W - 3))

    def slide(s, carry):
        hp, qp, p0, p1, p2 = carry
        w0 = lo + _i32(s) * (W - 3)

        def do(args):
            hp, qp, p0, p1, p2 = args
            b = jax.lax.dynamic_slice(hp, (w0, w0), (W, W))

            def pos(kb, c):
                b, v, p0, p1, p2 = c
                k = w0 + kb
                act = k <= hi - 3
                v0, v1, v2, tau = _house3(p0, p1, p2)
                tau = jnp.where(act, tau, 0.0)
                vv = jnp.stack([v0, v1, v2])
                b = _apply_house3_rows(b, kb, vv, tau)
                b = _apply_house3_cols(b, kb, vv, tau)
                v = _apply_house3_cols(v, kb, vv, tau)
                np0 = _get(b, kb + 1, kb)
                np1 = _get(b, kb + 2, kb)
                np2 = jnp.where(k + 3 < hi, _get(b, kb + 3, kb), 0.0)
                p0 = jnp.where(act, np0, p0)
                p1 = jnp.where(act, np1, p1)
                p2 = jnp.where(act, np2, p2)
                return b, v, p0, p1, p2

            _, v, p0, p1, p2 = jax.lax.fori_loop(
                0, W - 3, pos, (b, eyeW, p0, p1, p2))
            # deferred off-block updates: Hp ← diag(I,V,I)ᵀ·Hp·diag(I,V,I)
            rows = jax.lax.dynamic_slice(hp, (w0, _Z()), (W, npad))
            rows = jnp.einsum("ij,ik->jk", v, rows, precision="highest")
            hp = jax.lax.dynamic_update_slice(hp, rows, (w0, _Z()))
            cols = jax.lax.dynamic_slice(hp, (_Z(), w0), (npad, W))
            cols = jnp.einsum("ij,jk->ik", cols, v, precision="highest")
            hp = jax.lax.dynamic_update_slice(hp, cols, (_Z(), w0))
            qc = jax.lax.dynamic_slice(qp, (_Z(), w0), (npad, W))
            qc = jnp.einsum("ij,jk->ik", qc, v, precision="highest")
            qp = jax.lax.dynamic_update_slice(qp, qc, (_Z(), w0))
            return hp, qp, p0, p1, p2

        return jax.lax.cond(w0 <= hi - 3, do, lambda a_: a_,
                            (hp, qp, p0, p1, p2))

    hp, qp, p0, p1, p2 = jax.lax.fori_loop(
        0, n_slides, slide, (hp, qp, p0, p1, p2))
    return hp, qp, p0, p1


def _schur_core(a, max_iter_factor: int = 40):
    n = a.shape[-1]
    dtype = a.dtype
    eps = jnp.finfo(dtype).eps
    if n == 1:
        return a, jnp.eye(1, dtype=dtype)
    if n == 2:
        # single 2×2 standardisation; no chase branch (its 3-slices
        # would not even compile at this size)
        aa, bb = a[0, 0], a[0, 1]
        cc, dd = a[1, 0], a[1, 1]
        disc = (aa - dd) * (aa - dd) + 4 * bb * cc
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        lam1 = (aa + dd + sq) * 0.5
        lam2 = (aa + dd - sq) * 0.5
        lam = jnp.where(jnp.abs(lam1 - dd) < jnp.abs(lam2 - dd), lam1, lam2)
        g1 = jnp.where(jnp.abs(bb) >= jnp.abs(cc), bb, lam - dd)
        g2 = jnp.where(jnp.abs(bb) >= jnp.abs(cc), lam - aa, cc)
        nrm = jnp.sqrt(g1 * g1 + g2 * g2)
        safe = jnp.where(nrm == 0, 1.0, nrm)
        cs = jnp.where(nrm == 0, jnp.ones_like(g1), g1 / safe)
        sn = jnp.where(nrm == 0, jnp.zeros_like(g2), g2 / safe)
        real = disc >= 0
        cs = jnp.where(real, cs, 1.0)
        sn = jnp.where(real, sn, 0.0)
        g = jnp.stack([jnp.stack([cs, -sn]), jnp.stack([sn, cs])])
        t = mt(g) @ a @ g
        t = jnp.where(real, t.at[1, 0].set(0.0), t)
        return t, g
    h, q = _hessenberg_core(a)
    # windowed (GEMM-aggregated) chase for n ≥ 8: pad by the window
    # size so every (W, W) block slice is in-bounds; the padding block
    # is an inert identity (zero subdiagonals — never activates)
    use_win = n >= 8
    W = min(128, n)
    npad = n + W if use_win else n
    if use_win:
        pad_eye = jnp.eye(npad, dtype=dtype)
        h = pad_eye.at[:n, :n].set(h)
        q = pad_eye.at[:n, :n].set(q)
    max_iter = max_iter_factor * n
    idx = jnp.arange(npad - 1, dtype=jnp.int32)

    def window(h, locked):
        s_eff = jnp.where(locked, 0.0, _subdiag(h))
        nz = s_eff != 0
        hi = jnp.max(jnp.where(nz, idx + 2, jnp.zeros_like(idx)))
        lo = jnp.max(jnp.where((idx < hi - 1) & ~nz, idx + 1,
                               jnp.zeros_like(idx)))
        return lo, hi

    def standardize2(st):
        h, q, locked, lo, hi, stuck = st
        aa = _get(h, lo, lo)
        bb = _get(h, lo, lo + 1)
        cc = _get(h, lo + 1, lo)
        dd = _get(h, lo + 1, lo + 1)
        disc = (aa - dd) * (aa - dd) + 4 * bb * cc

        def real_case(args):
            h, q, locked = args
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            # eigenvalue closer to dd for stability
            lam1 = (aa + dd + sq) * 0.5
            lam2 = (aa + dd - sq) * 0.5
            lam = jnp.where(jnp.abs(lam1 - dd) < jnp.abs(lam2 - dd),
                            lam1, lam2)
            # rotation with first column ∝ eigenvector of the block
            g1 = jnp.where(jnp.abs(bb) >= jnp.abs(cc), bb, lam - dd)
            g2 = jnp.where(jnp.abs(bb) >= jnp.abs(cc), lam - aa, cc)
            nrm = jnp.sqrt(g1 * g1 + g2 * g2)
            safe = jnp.where(nrm == 0, 1.0, nrm)
            cs = jnp.where(nrm == 0, jnp.ones_like(g1), g1 / safe)
            sn = jnp.where(nrm == 0, jnp.zeros_like(g2), g2 / safe)
            # rows/cols: Gᵀ·H·G with G = [[cs,-sn],[sn,cs]]
            h = _apply_rot2_rows(h, lo, cs, sn)
            h = _apply_rot2_cols(h, lo, cs, sn)
            q = _apply_rot2_cols(q, lo, cs, sn)
            # exact zero below
            h = jax.lax.dynamic_update_slice(
                h, jnp.zeros((1, 1), dtype), (_i32(lo + 1), _i32(lo)))
            return h, q, locked

        def complex_case(args):
            h, q, locked = args
            locked = locked.at[lo].set(True)
            return h, q, locked

        h, q, locked = jax.lax.cond(disc >= 0, real_case, complex_case,
                                    (h, q, locked))
        return h, q, locked, jnp.zeros_like(stuck)

    def chase(st):
        h, q, locked, lo, hi, stuck = st
        m = hi - 2
        h_mm = _get(h, m, m)
        h_nn = _get(h, hi - 1, hi - 1)
        h_mn = _get(h, m, hi - 1)
        h_nm = _get(h, hi - 1, m)
        tr = h_mm + h_nn
        det = h_mm * h_nn - h_mn * h_nm
        # exceptional shift every 10 stagnant sweeps (dlahqr-style)
        exc = (stuck % 10) == 9
        s_mag = jnp.abs(h_nm) + jnp.abs(
            jax.lax.cond(m >= 1,
                         lambda _: _get(h, m, jnp.maximum(m - 1, 0)),
                         lambda _: jnp.zeros((), dtype), 0))
        lam_exc = h_nn + 0.75 * s_mag
        tr = jnp.where(exc, 2 * lam_exc, tr)
        det = jnp.where(exc, lam_exc * lam_exc, det)
        # first column of (H−s1)(H−s2)·e1 in the window
        h00 = _get(h, lo, lo)
        h01 = _get(h, lo, lo + 1)
        h10 = _get(h, lo + 1, lo)
        h11 = _get(h, lo + 1, lo + 1)
        h21 = _get(h, lo + 2, lo + 1)
        p0 = h00 * h00 + h01 * h10 - tr * h00 + det
        p1 = h10 * (h00 + h11 - tr)
        p2 = h10 * h21

        if use_win:
            h, q, p0, p1 = _chase_windowed(h, q, lo, hi, p0, p1, p2,
                                           W, n)
        else:
            def step(k, carry):
                h, q, p0, p1, p2 = carry
                v0, v1, v2, tau = _house3(p0, p1, p2)
                v = jnp.stack([v0, v1, v2])
                h = _apply_house3_rows(h, k, v, tau)
                h = _apply_house3_cols(h, k, v, tau)
                q = _apply_house3_cols(q, k, v, tau)
                # next bulge column
                np0 = _get(h, k + 1, k)
                np1 = _get(h, k + 2, k)
                np2 = jax.lax.cond(
                    k + 3 < hi,
                    lambda _: _get(h, jnp.minimum(k + 3, n - 1), k),
                    lambda _: jnp.zeros((), dtype), 0)
                return h, q, np0, np1, np2

            # we guarantee k+2 <= hi-1 <= n-1 by iterating k in [lo, hi-2)
            h, q, p0, p1, p2 = jax.lax.fori_loop(
                lo, jnp.maximum(hi - 2, lo), step, (h, q, p0, p1, p2))
        # final 2-vector rotation to clear the (hi-1, hi-3) bulge entry
        g1, g2 = p0, p1
        nrm = jnp.sqrt(g1 * g1 + g2 * g2)
        safe = jnp.where(nrm == 0, 1.0, nrm)
        cs = jnp.where(nrm == 0, jnp.ones_like(g1), g1 / safe)
        sn = jnp.where(nrm == 0, jnp.zeros_like(g2), g2 / safe)
        k = hi - 2
        h = _apply_rot2_rows(h, k, cs, sn)
        h = _apply_rot2_cols(h, k, cs, sn)
        q = _apply_rot2_cols(q, k, cs, sn)
        return h, q, locked, stuck + 1

    def cond_fn(carry):
        h, q, locked, it, stuck, hi_prev = carry
        _, hi = window(h, locked)
        return (hi > 0) & (it < max_iter)

    def body(carry):
        h, q, locked, it, stuck, hi_prev = carry
        h = _zero_small_subdiags(h, eps)
        lo, hi = window(h, locked)

        def work(args):
            h, q, locked, stuck = args
            return jax.lax.cond(
                hi - lo == 2, standardize2, chase,
                (h, q, locked, lo, hi, stuck))

        def done(args):
            h, q, locked, stuck = args
            return h, q, locked, stuck

        h, q, locked, stuck = jax.lax.cond(
            hi > 0, work, done, (h, q, locked, stuck))
        stuck = jnp.where(hi != hi_prev, 0, stuck)
        return h, q, locked, it + 1, stuck, hi

    locked0 = jnp.zeros((npad - 1,), bool)
    h, q, locked, it, _, _ = jax.lax.while_loop(
        cond_fn, body,
        (h, q, locked0, jnp.zeros((), jnp.int32),
         jnp.zeros((), jnp.int32), jnp.asarray(-1, jnp.int32)))
    if use_win:
        h, q = h[:n, :n], q[:n, :n]
    # clean below the subdiagonal (bulge-chase roundoff noise)
    r = jnp.arange(n)[:, None]
    c = jnp.arange(n)[None, :]
    h = jnp.where(r <= c + 1, h, 0.0)
    return h, q


@batched((2,))
def schur_decomp(a, max_iter_factor: int = 40):
    """[Q, T] with A = Q·T·Qᵀ, T quasi-upper-triangular (1×1 blocks for
    real eigenvalues, 2×2 for complex pairs) (ref: schur.js:372-388).
    Batched over leading dims."""
    a = jnp.asarray(a)
    if a.shape[-1] != a.shape[-2]:
        raise ValueError("schur_decomp requires square matrices")
    a = a.astype(default_float_for(a.dtype))
    t, q = _schur_core(a, max_iter_factor)
    return q, t


def _block_eigvals_reim(t):
    """Eigenvalues of quasi-triangular T, vectorised over the diagonal
    (ref: schur.js:31-88). Returns a split-complex pair (re, im) —
    TPU backends have no complex dtype (see core/cpx.py)."""
    d = jnp.diagonal(t, axis1=-2, axis2=-1)
    sub = jnp.diagonal(t, offset=-1, axis1=-2, axis2=-1)
    sup = jnp.diagonal(t, offset=1, axis1=-2, axis2=-1)
    pad1 = jnp.zeros(sub.shape[:-1] + (1,), t.dtype)
    sub = jnp.concatenate([sub, pad1], -1)
    sup = jnp.concatenate([sup, pad1], -1)
    is_start = sub != 0                       # start of a 2x2 block at i
    padb = jnp.zeros(is_start.shape[:-1] + (1,), bool)
    is_second = jnp.concatenate([padb, is_start[..., :-1]], -1)
    a = d
    dnext = jnp.concatenate([d[..., 1:], pad1], -1)
    dprev = jnp.concatenate([pad1, d[..., :-1]], -1)
    bc_next = sup * sub                        # b*c for block starting at i
    bc_prev = jnp.concatenate([pad1, bc_next[..., :-1]], -1)
    mu_s = (a + dnext) * 0.5
    disc_s = (a - dnext) * (a - dnext) * 0.25 + bc_next
    mu_p = (dprev + a) * 0.5
    disc_p = (dprev - a) * (dprev - a) * 0.25 + bc_prev
    sq_s = jnp.sqrt(jnp.abs(disc_s))
    sq_p = jnp.sqrt(jnp.abs(disc_p))
    re = jnp.where(is_start, jnp.where(disc_s >= 0, mu_s + sq_s, mu_s),
                   jnp.where(is_second,
                             jnp.where(disc_p >= 0, mu_p - sq_p, mu_p), d))
    im = jnp.where(is_start, jnp.where(disc_s >= 0, 0.0, sq_s),
                   jnp.where(is_second,
                             jnp.where(disc_p >= 0, 0.0, -sq_p), 0.0))
    return re, im


def schur_eigenvals(t, split: bool = False):
    """Eigenvalues from a real Schur form T (ref: schur.js:31).

    ``split=True`` returns a (re, im) pair of real arrays (runs on TPU);
    ``split=False`` combines into a complex array (CPU backends)."""
    lam = _block_eigvals_reim(jnp.asarray(t))
    return lam if split else cpx.to_complex(lam)


def _complex_triangularize_reim(q, t):
    """Real quasi-triangular (Q, T) → complex triangular (Qc, Tc) in
    split-complex form: each 2×2 complex-pair block is diagonalised by a
    unitary rotation; the similarity is two complex GEMMs = 8 real MXU
    GEMMs."""
    n = t.shape[-1]
    sub = jnp.diagonal(t, offset=-1)
    pad1 = jnp.zeros((1,), t.dtype)
    is_start = jnp.concatenate([sub != 0, jnp.zeros((1,), bool)], -1)
    lam = _block_eigvals_reim(t)
    d = jnp.diagonal(t)
    sup = jnp.concatenate([jnp.diagonal(t, offset=1), pad1], -1)
    subp = jnp.concatenate([sub, pad1], -1)
    dn = jnp.concatenate([d[1:], pad1], -1)
    # eigenvector of [[a,b],[c,d]] for lam: v = (b, lam−a) or (lam−d, c)
    use_b = jnp.abs(sup) >= jnp.abs(subp)
    v1 = cpx.where(use_b, cpx.cpx(sup), cpx.sub(lam, cpx.cpx(dn)))
    v2 = cpx.where(use_b, cpx.sub(lam, cpx.cpx(d)), cpx.cpx(subp))
    nrm = jnp.sqrt(cpx.abs2(v1) + cpx.abs2(v2))
    safe = jnp.where(nrm == 0, 1.0, nrm)
    v1 = cpx.scale(v1, 1 / safe)
    v2 = cpx.scale(v2, 1 / safe)
    # unitary block-diagonal G: rows i,i+1 get [[v1, -conj(v2)],
    # [v2, conj(v1)]] when is_start[i]
    is_second = jnp.concatenate([jnp.zeros((1,), bool), is_start[:-1]], -1)
    ones = jnp.ones((n,), t.dtype)
    zeros = jnp.zeros((n,), t.dtype)
    v1_prev = (jnp.concatenate([pad1 + 1, v1[0][:-1]], -1),
               jnp.concatenate([pad1, v1[1][:-1]], -1))
    gd_re = jnp.where(is_start, v1[0],
                      jnp.where(is_second, v1_prev[0], ones))
    gd_im = jnp.where(is_start, v1[1],
                      jnp.where(is_second, -v1_prev[1], zeros))
    low_re = jnp.where(is_start[:-1], v2[0][:-1], zeros[:-1])
    low_im = jnp.where(is_start[:-1], v2[1][:-1], zeros[:-1])
    up_re = jnp.where(is_start[:-1], -v2[0][:-1], zeros[:-1])
    up_im = jnp.where(is_start[:-1], v2[1][:-1], zeros[:-1])
    g = (jnp.diag(gd_re) + jnp.diag(low_re, -1) + jnp.diag(up_re, 1),
         jnp.diag(gd_im) + jnp.diag(low_im, -1) + jnp.diag(up_im, 1))
    gh = (g[0].T, -g[1].T)
    tc = cpx.matmul(cpx.matmul(gh, cpx.cpx(t)), g)
    qc = cpx.matmul(cpx.cpx(q), g)
    r = jnp.arange(n)[:, None]
    c2 = jnp.arange(n)[None, :]
    tc = (jnp.where(r <= c2, tc[0], 0.0), jnp.where(r <= c2, tc[1], 0.0))
    lam_out = (jnp.diagonal(tc[0]), jnp.diagonal(tc[1]))
    return qc, tc, lam_out


def schur_eigen(q, t, split: bool = False):
    """[Λ, V] eigen-decomposition from a real Schur form
    (ref: schur.js:90-370): A = Q·T·Qᵀ ⇒ A·V = V·diag(Λ).

    Computed entirely in split-complex form (runs on TPU);
    ``split=True`` returns ((Λre, Λim), (Vre, Vim)), ``split=False``
    combines into complex arrays (CPU backends)."""
    q, t = jnp.asarray(q), jnp.asarray(t)

    @batched((2, 2))
    def _go(q, t):
        n = t.shape[-1]
        qc, tc, lam = _complex_triangularize_reim(q, t)
        eps = jnp.finfo(t.dtype).eps
        # repeated-eigenvalue tolerance: √eps·‖T‖_F (ref: schur.js:254)
        tol = jnp.sqrt(eps) * jnp.sqrt(
            jnp.sum(tc[0] * tc[0] + tc[1] * tc[1])) \
            + jnp.finfo(t.dtype).tiny
        # backward substitution for all eigenvectors at once:
        # (T − λ_k)·x = 0, x[k,k] = 1, columns k solved simultaneously
        x = (jnp.eye(n, dtype=t.dtype), jnp.zeros((n, n), t.dtype))
        col_idx = jnp.arange(n)

        def body(step, x):
            i = n - 2 - step
            ii = _i32(jnp.maximum(i, 0))
            row = (jax.lax.dynamic_slice(tc[0], (ii, _Z()), (1, n))[0],
                   jax.lax.dynamic_slice(tc[1], (ii, _Z()), (1, n))[0])
            mask = (col_idx > i)[:, None]
            prod = cpx.mul((row[0][:, None], row[1][:, None]), x)
            acc = (jnp.sum(jnp.where(mask, prod[0], 0.0), axis=0),
                   jnp.sum(jnp.where(mask, prod[1], 0.0), axis=0))
            tii = (row[0][jnp.maximum(i, 0)], row[1][jnp.maximum(i, 0)])
            den = cpx.sub((jnp.full((n,), tii[0]), jnp.full((n,), tii[1])),
                          lam)
            # defective-matrix fallback (ref: schur.js:188-203): when
            # T_ii − λ_k is negligible, either the partial vector is
            # already valid (acc ≈ 0 → x_i = 0) or no independent
            # eigenvector exists for λ_k below row i → restart the
            # column at x_i = 1, zeroing the tail (duplicating the
            # eigenvector of the earlier equal eigenvalue, as the
            # reference does)
            small = cpx.cabs(den) <= tol
            restart = small & (cpx.cabs(acc) > tol)
            safe_den = (jnp.where(small, 1.0, den[0]),
                        jnp.where(small, 0.0, den[1]))
            xi = cpx.div((-acc[0], -acc[1]), safe_den)
            xi = cpx.where(small, cpx.where(
                restart, cpx.cpx(jnp.ones((n,), t.dtype)),
                cpx.cpx(jnp.zeros((n,), t.dtype))), xi)
            xi = cpx.where(col_idx > i, xi,
                           cpx.where(col_idx == i,
                                     cpx.cpx(jnp.ones((n,), t.dtype)),
                                     cpx.cpx(jnp.zeros((n,), t.dtype))))
            # restart wipes the already-computed tail rows (> i)
            wipe = restart[None, :] & (jnp.arange(n)[:, None] > i)
            x = (jnp.where(wipe, 0.0, x[0]), jnp.where(wipe, 0.0, x[1]))
            return (jax.lax.dynamic_update_slice(x[0], xi[0][None, :],
                                                 (ii, _Z())),
                    jax.lax.dynamic_update_slice(x[1], xi[1][None, :],
                                                 (ii, _Z())))

        x = jax.lax.fori_loop(0, n - 1, body, x)
        v = cpx.matmul(qc, x)
        nrm = jnp.sqrt(jnp.sum(cpx.abs2(v), axis=0))
        inv = 1 / jnp.where(nrm == 0, 1.0, nrm)
        v = cpx.scale(v, inv[None, :])
        return lam[0], lam[1], v[0], v[1]

    lr, li, vr, vi = _go(q, t)
    if split:
        return (lr, li), (vr, vi)
    return cpx.to_complex((lr, li)), cpx.to_complex((vr, vi))
