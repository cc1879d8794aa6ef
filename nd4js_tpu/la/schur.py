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

from .. import config as _config
from ..core.batch import batched
from ..core.mm import mm, mt
from ..config import default_float_for
from .hessenberg import _hessenberg_core
from ..core import cpx

__all__ = ["schur_decomp", "schur_eigenvals", "schur_eigen"]

# trace-time switch for the inverse-iteration refinement inside
# schur_eigen (perf/accuracy debugging hook; shipped default True)
_REFINE = True

# multishift tuning knobs (LAPACK dlaqr0's NS/NW/nibble analogues).
# Env-overridable so the TPU tuning sweep (tools/tune_schur.py) can A/B
# them without source edits; shipped defaults are the measured best.
import os as _os
# r4 sweep (tools/tune_schur.py, v5e, 1024² f32): (16,48,128) 252 ms
# beats (8,24,128) 267 ms; bigger NS loses — schur_small's in-kernel
# Francis cost scales ~SW³ (measured 0.16/1.2/5.0/8.5 ms at
# 24/48/96/128), eating the deflation-rate gains past SW=48
_NB = int(_os.environ.get("ND4JS_TPU_SCHUR_NB", "16"))      # bulges/sweep
_SW = int(_os.environ.get("ND4JS_TPU_SCHUR_SW", "48"))      # AED window
_NIBBLE = int(_os.environ.get("ND4JS_TPU_SCHUR_NIBBLE", "4"))
#   skip the sweep when AED deflated ≥ NS/_NIBBLE eigenvalues
_WCHASE = int(_os.environ.get("ND4JS_TPU_SCHUR_W", "128"))  # chase window
#   (slides per sweep ≈ n/(W − 3·NB); raising W trades VMEM block size
#   for fewer kernel launches and off-window GEMMs per sweep)


def _subdiag_floor(h, eps):
    """Norm-relative deflation floor eps·‖H‖_F: a subdiagonal below it
    is deflatable by backward stability no matter how small its two
    neighbouring diagonal entries are. Without the floor, a noise-level
    entry sitting between two small diagonal values passes the
    neighbour-relative test forever (measured at f32 512²: a 9.7e-6
    entry vs a 8.9e-6 neighbour threshold survived to the final T,
    was locked by AED as a fake complex pair, and the overlapping 2×2
    blocks made the eigenvector frame non-unitary)."""
    return eps * jnp.sqrt(jnp.sum(h * h))


def _zero_small_subdiags(h, eps):
    n = h.shape[-1]
    r = jnp.arange(n)[:, None]
    c = jnp.arange(n)[None, :]
    d = jnp.abs(jnp.diagonal(h))
    # 16·eps: each full-window sweep re-injects ~few·eps·|H| of rounding
    # noise into already-converged subdiagonals, so the exact-eps test
    # keeps *missing* them and the window never shrinks (measured: a
    # converged 1e-15 entry hovered above the 4e-16 threshold for tens
    # of sweeps, and a 6.5e-15 one slipped past 8·eps and got locked
    # into an invalid block). Backward error stays O(eps·‖H‖).
    small = jnp.abs(h) <= jnp.maximum(
        16 * eps * (d[None, :] + d[:, None]), _subdiag_floor(h, eps))
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
    w = tau * jnp.matmul(v, rows, precision=_config.matmul_precision)
    rows = rows - v[:, None] * w[None, :]
    return jax.lax.dynamic_update_slice(h, rows, (_i32(k), _Z()))


def _apply_house3_cols(h, k, v, tau):
    cols = jax.lax.dynamic_slice(h, (_Z(), _i32(k)), (h.shape[0], 3))
    w = tau * jnp.matmul(cols, v, precision=_config.matmul_precision)
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


def _chase_multishift(hp, qp, lo, hi, trs, dets, W: int, NB: int, n: int):
    """Small-bulge multishift sweep: NB Francis double-shift bulges,
    spaced 3 rows apart, chased simultaneously. Each group step applies
    all NB reflectors at once — their row supports are disjoint, so
    Π(I − τᵢvᵢvᵢᵀ) = I − V·diag(τ)·Vᵀ exactly — as rank-NB updates of
    the (W, W) window block, i.e. MXU work instead of NB sequential
    3-row passes (the TPU form of LAPACK dlaqr5's delayed-update
    train; ref seam schur.js:415-660). The whole per-slide position
    loop runs inside one Pallas kernel (ops/bulge_chase.py) — as XLA
    ops its ~8 dispatches × (W−3NB) steps dominated the 1024² Schur
    wall clock (the nested AED window Schur alone runs it ~10⁴ times).
    Off-window rows/columns and Q get the accumulated V per slide as
    three GEMMs. NB = 1 is the classic single-bulge Francis chase
    (bulges enter at lo, exit through hi−2 with a degenerate 2-element
    reflector). hp/qp are padded left by ≥ 3·(NB−1) and right by ≥ W
    (see _schur_core)."""
    from ..ops.bulge_chase import bulge_chase_steps, bulge_chase_steps_xla
    dtype = hp.dtype
    npad = hp.shape[0]
    OFF = 3 * (NB - 1)
    SL = W - 3 * NB
    n_slides = -(-(n - 1 + 3 * NB) // SL)
    interp = jax.default_backend() == "cpu"
    # ND4JS_TPU_SCHUR_KERNEL=0: masked rank-NB XLA loop instead of the
    # Pallas kernel (Mosaic-regression insurance; read at trace time)
    use_kernel = _os.environ.get("ND4JS_TPU_SCHUR_KERNEL", "1") != "0"
    if use_kernel:
        chase = partial(bulge_chase_steps, interpret=interp)
    else:
        chase = bulge_chase_steps_xla
    shifts = jnp.stack([jnp.asarray(trs, dtype),
                        jnp.asarray(dets, dtype)], axis=1)   # (NB, 2)

    def do_slide(s, hp, qp, P, seed: bool):
        w0 = lo + _i32(s) * SL - OFF

        def do(args):
            hp, qp, P = args
            b = jax.lax.dynamic_slice(hp, (w0, w0), (W, W))
            v, P = chase(b, P, shifts, lo + _i32(s) * SL, lo, hi,
                         sl=SL, seed=seed)
            rows = jax.lax.dynamic_slice(hp, (w0, _Z()), (W, npad))
            rows = jnp.einsum("ij,ik->jk", v, rows, precision=_config.matmul_precision)
            hp = jax.lax.dynamic_update_slice(hp, rows, (w0, _Z()))
            cols = jax.lax.dynamic_slice(hp, (_Z(), w0), (npad, W))
            cols = jnp.einsum("ij,jk->ik", cols, v, precision=_config.matmul_precision)
            hp = jax.lax.dynamic_update_slice(hp, cols, (_Z(), w0))
            qc = jax.lax.dynamic_slice(qp, (_Z(), w0), (npad, W))
            qc = jnp.einsum("ij,jk->ik", qc, v, precision=_config.matmul_precision)
            qp = jax.lax.dynamic_update_slice(qp, qc, (_Z(), w0))
            return hp, qp, P

        # tail bulge still has positions to process in this slide?
        return jax.lax.cond(w0 <= hi - 2, do, lambda a_: a_,
                            (hp, qp, P))

    # bulges only ever enter (k == lo) during slide 0 (SL > 3·(NB−1)),
    # so the seed-extraction branch is compiled into that call alone
    p0 = jnp.zeros((NB, 3), dtype)
    hp, qp, P = do_slide(0, hp, qp, p0, True)

    def slide(s, carry):
        hp, qp, P = carry
        return do_slide(s, hp, qp, P, False)

    hp, qp, _ = jax.lax.fori_loop(1, n_slides, slide, (hp, qp, P))
    return hp, qp


def _house_seg(x, head, limit, aw: int):
    """Householder compressing rows [head, limit) of x into row
    ``head``: (I − τ·v·vᵀ)·x has zeros at rows (head, limit). v[head]=1;
    τ = 0 (identity) when the live segment has ≤ 1 entry."""
    idxr = jnp.arange(aw)
    inseg = (idxr >= head) & (idxr < limit)
    seg = jnp.where(inseg, x, 0.0)
    h0 = jnp.sum(jnp.where(idxr == head, seg, 0.0))
    sigma = jnp.sum(seg * seg) - h0 * h0
    sigma = jnp.maximum(sigma, 0.0)
    nrm = jnp.sqrt(h0 * h0 + sigma)
    beta = jnp.where(h0 >= 0, -nrm, nrm)
    den = h0 - beta
    safe_den = jnp.where(den == 0, 1.0, den)
    v = jnp.where(inseg & (idxr != head), seg / safe_den, 0.0)
    v = v + jnp.where(inseg & (idxr == head), 1.0, 0.0)
    safe_beta = jnp.where(beta == 0, 1.0, beta)
    tau = jnp.where((sigma == 0) | (nrm == 0), 0.0,
                    (beta - h0) / safe_beta)
    return v, tau


def _aed(h, q, locked, lo, hi, AW: int, NS: int, eps, schur_small):
    """Aggressive early deflation (LAPACK dlaqr2-style, the mechanism
    that makes multishift QR converge — ref seam schur.js:415-660's
    recursive deflation plays this role in the reference).

    Takes the trailing AW×AW window, computes its real Schur form
    (``schur_small``), and tests the *spike* s·Q_w[0,:] block-by-block
    from the bottom: trailing blocks with negligible spike entries are
    converged eigenvalues of the full matrix even though no single
    subdiagonal is small yet. Deflated: commit by applying the window
    similarity, zeroing the deflated spike tail, and re-Hessenbergising
    the surviving window rows via a locally accumulated Z (masked
    Householder chain) — three GEMMs against the full matrix. Returns
    (d, h, q, locked, trs, dets): the deflation count and NS/2 fresh
    double-shift polynomials from the surviving window eigenvalues."""
    dtype = h.dtype
    npad = h.shape[0]
    aw = AW
    w0 = hi - aw
    sw = jax.lax.dynamic_slice(h, (w0, w0), (aw, aw))
    s_spike = _get(h, w0, w0 - 1)
    # raw window Schur: the nested core's final cleanup would HIDE an
    # unconverged window (zeroed tril(·,−2)) — committing that window's
    # similarity would re-inject the junk into H in a region the lock
    # below then freezes, silently corrupting the decomposition (seen:
    # f32 1024² seeds with resid ~0.25). Measure the junk, clean tw for
    # the spike/shift logic, and gate the commit on true convergence.
    tw_raw, qw, _, _lk = schur_small(sw, _debug_raw=True)
    rW = jnp.arange(aw)[:, None]
    cW = jnp.arange(aw)[None, :]
    tw = jnp.where(rW <= cW + 1, tw_raw, 0.0)
    wjunk = jnp.max(jnp.abs(jnp.where(rW > cW + 1, tw_raw, 0.0)))
    wconv = wjunk <= 16 * eps * jnp.maximum(
        jnp.max(jnp.abs(tw)), jnp.finfo(dtype).tiny)
    sp = s_spike * qw[0, :]
    idxa = jnp.arange(aw)
    dvec = jnp.abs(jnp.diagonal(tw))
    sub = jnp.concatenate([jnp.diagonal(tw, -1),
                           jnp.zeros((1,), dtype)])       # sub[j]=T[j+1,j]
    subm = jnp.concatenate([jnp.zeros((1,), dtype),
                            jnp.diagonal(tw, -1)])        # subm[j]=T[j,j-1]
    isstart = sub != 0
    is2nd = subm != 0
    blkmag = dvec + jnp.where(isstart, jnp.roll(dvec, -1), 0.0) \
        + jnp.where(is2nd, jnp.roll(dvec, 1), 0.0)
    tol = 8 * eps * jnp.maximum(blkmag, jnp.finfo(dtype).tiny)
    ok = jnp.abs(sp) <= tol
    # a 2×2 block deflates only as a whole; positions inside coupled
    # ≥3×3 junk (adjacent nonzero subdiagonals — the nested Schur hit
    # its iteration cap) must never deflate, or the lock below would
    # freeze a non-Schur block into the output
    sane = ~(isstart & is2nd)
    ok = ok & sane & (~isstart | jnp.roll(sane, -1)) \
        & (~is2nd | jnp.roll(sane, 1))
    okblk = ok & (~isstart | jnp.roll(ok, -1)) & (~is2nd | jnp.roll(ok, 1))
    lastbad = jnp.max(jnp.where(~okblk, idxa, -1))
    d = (aw - 1 - lastbad).astype(jnp.int32)
    # an unconverged window must neither deflate nor be committed; the
    # outer loop stalls, the stuck counter fires exceptional shifts,
    # and the classic chase makes progress instead
    d = jnp.where(wconv, d, 0)

    def commit(args):
        h, q, locked = args
        spm = jnp.where(idxa < aw - d, sp, 0.0)
        mloc = jnp.concatenate([spm[:, None], tw], axis=1)  # (aw, aw+1)
        z0 = jnp.eye(aw, dtype=dtype)

        def red(c, carry):
            mloc, z = carry
            # column c of [spike | T_w] may keep rows ≤ c (its H column
            # is w0−1+c): compress rows [c, aw−d) into row c
            v, tau = _house_seg(mloc[:, c], c, aw - d, aw)
            wr = tau * jnp.matmul(v, mloc, precision=_config.matmul_precision)
            mloc = mloc - v[:, None] * wr[None, :]
            mw = mloc[:, 1:]
            wc = tau * jnp.matmul(mw, v, precision=_config.matmul_precision)
            mw = mw - wc[:, None] * v[None, :]
            mloc = jnp.concatenate([mloc[:, :1], mw], axis=1)
            z = z - tau * jnp.outer(
                jnp.matmul(z, v, precision=_config.matmul_precision), v)
            return mloc, z

        mloc, z = jax.lax.fori_loop(0, aw - 1, red, (mloc, z0))
        u = mm(qw, z)                        # total window transform
        rows = jax.lax.dynamic_slice(h, (w0, _Z()), (aw, npad))
        rows = jnp.einsum("ij,ik->jk", u, rows, precision=_config.matmul_precision)
        h = jax.lax.dynamic_update_slice(h, rows, (w0, _Z()))
        cols = jax.lax.dynamic_slice(h, (_Z(), w0), (npad, aw))
        cols = jnp.einsum("ij,jk->ik", cols, u, precision=_config.matmul_precision)
        h = jax.lax.dynamic_update_slice(h, cols, (_Z(), w0))
        qc = jax.lax.dynamic_slice(q, (_Z(), w0), (npad, aw))
        qc = jnp.einsum("ij,jk->ik", qc, u, precision=_config.matmul_precision)
        q = jax.lax.dynamic_update_slice(q, qc, (_Z(), w0))
        # commit: the spike column with its deflated tail zeroed
        h = jax.lax.dynamic_update_slice(h, mloc[:, :1], (w0, w0 - 1))
        # deflated complex 2×2 blocks must be locked for window() —
        # but only SIGNIFICANT subdiagonals: locking a noise-level
        # entry freezes junk into the final T (overlapping blocks in
        # the eigenvector frame; see _subdiag_floor)
        jall = jnp.arange(npad - 1)
        sd = _subdiag(h)
        dh = jnp.abs(jnp.diagonal(h))
        sig = jnp.abs(sd) > jnp.maximum(
            16 * eps * (dh[:-1] + dh[1:]), _subdiag_floor(h, eps))
        region = (jall >= hi - d) & (jall < hi - 1)
        locked = locked | (region & sig)
        return h, q, locked

    h, q, locked = jax.lax.cond(d > 0, commit, lambda a_: a_,
                                (h, q, locked))
    # fresh shifts: trailing NS eigenvalues of the *surviving* window
    re, im = _block_eigvals_reim(tw)
    start = jnp.maximum(aw - d - NS, 0).astype(jnp.int32)
    # don't split a 2×2 pair at the selection boundary
    start = jnp.where((start > 0) & (subm[start] != 0), start - 1, start)
    rr = jax.lax.dynamic_slice(re, (start,), (NS,))
    ri = jax.lax.dynamic_slice(im, (start,), (NS,))
    trs = rr[0::2] + rr[1::2]
    dets = rr[0::2] * rr[1::2] - ri[0::2] * ri[1::2]
    return d, h, q, locked, trs, dets


def _schur_core(a, max_iter_factor: int = 40, _debug_raw: bool = False,
                _debug_hist=None):
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
        # cancellation-free eigenvector differences (see standardize2)
        p = 0.5 * (aa - dd)
        sq2 = jnp.sqrt(jnp.maximum(disc, 0.0)) * 0.5
        sgn = jnp.where(p >= 0, 1.0, -1.0)
        lam_m_aa = -sgn * (jnp.abs(p) + sq2)
        den = sq2 + jnp.abs(p)
        lam_m_dd = -sgn * bb * cc / jnp.where(den == 0, 1.0, den)
        big_b = jnp.abs(bb) >= jnp.abs(cc)
        g1 = jnp.where(big_b, bb, lam_m_dd)
        g2 = jnp.where(big_b, lam_m_aa, cc)
        nrm = jnp.sqrt(g1 * g1 + g2 * g2)
        safe = jnp.where(nrm == 0, 1.0, nrm)
        cs = jnp.where(nrm == 0, jnp.ones_like(g1), g1 / safe)
        sn = jnp.where(nrm == 0, jnp.zeros_like(g2), g2 / safe)
        real = disc >= 0
        cs = jnp.where(real, cs, 1.0)
        sn = jnp.where(real, sn, 0.0)
        g = jnp.stack([jnp.stack([cs, -sn]), jnp.stack([sn, cs])])
        t = jnp.matmul(jnp.matmul(mt(g), a, precision=_config.matmul_precision), g,
                       precision=_config.matmul_precision)
        t = jnp.where(real, t.at[1, 0].set(0.0), t)
        return t, g
    h, q = _hessenberg_core(a)
    # 8 ≤ n ≤ 128 and no debug taps: the whole iteration fits the
    # in-VMEM small-Schur kernel (the window is the whole matrix, so
    # the padded windowed machinery below is pure dispatch overhead —
    # Hessenberg reduction + ONE kernel launch replaces ~30 XLA ops ×
    # ~4·n while_loop iterations)
    if (8 <= n <= 128 and _debug_hist is None
            and _os.environ.get("ND4JS_TPU_SCHUR_KERNEL", "1") != "0"):
        from ..ops.schur_small import schur_small
        tk, qk, lkk = schur_small(
            h, max_iter_factor=max_iter_factor,
            interpret=jax.default_backend() == "cpu")
        q = mm(q, qk)
        if _debug_raw:
            return tk, q, None, (lkk[0, :n - 1] > 0.5)
        rr = jnp.arange(n)[:, None]
        cc_ = jnp.arange(n)[None, :]
        return jnp.where(rr <= cc_ + 1, tk, 0.0), q
    # windowed (GEMM-aggregated) chase for n ≥ 8: pad by the window
    # size on the right — plus 3·(NB−1) on the left for the multishift
    # bulge train — so every (W, W) block slice is in-bounds; the
    # padding is an inert identity (zero subdiagonals — never activates)
    use_win = n >= 8
    NB = _NB                     # bulges per multishift sweep
    SW = _SW                     # AED window (> NS; its SW×SW Schur is
    #                              the per-iteration deflation engine)
    use_ms = n >= 192
    if use_ms and 2 * NB + 2 > SW:
        raise ValueError(
            f"schur knobs: AED window SW={SW} must exceed NS+1=2·NB+1="
            f"{2 * NB + 1} (shift extraction slices NS window eigenvalues)")
    W = min(max(_WCHASE, 3 * NB + 16) if use_ms else 128, n)
    P0 = 3 * NB if use_ms else 0     # left pad ≥ 3·(NB−1) bulge-train room
    npad = P0 + n + W if use_win else n
    if use_win:
        pad_eye = jnp.eye(npad, dtype=dtype)
        h = pad_eye.at[P0:P0 + n, P0:P0 + n].set(h)
        q = pad_eye.at[P0:P0 + n, P0:P0 + n].set(q)
    max_iter = max_iter_factor * n
    idx = jnp.arange(npad - 1, dtype=jnp.int32)

    def window(h, locked):
        s_eff = jnp.where(locked, 0.0, _subdiag(h))
        nz = s_eff != 0
        hi = jnp.max(jnp.where(nz, idx + 2, jnp.zeros_like(idx)))
        lo = jnp.max(jnp.where((idx < hi - 1) & ~nz, idx + 1,
                               jnp.zeros_like(idx)))
        return lo, hi

    def _kill_zero(h, locked):
        """Global deflation pass + re-zero of noise seeded next to a
        locked pair (see body() — the window-split cascade)."""
        h = _zero_small_subdiags(h, eps)
        fF = jnp.zeros((1,), bool)
        nbr_locked = jnp.concatenate([locked[1:], fF]) \
            | jnp.concatenate([fF, locked[:-1]])
        kill = nbr_locked & ~locked
        rpad = jnp.arange(npad)[:, None]
        cpad = jnp.arange(npad)[None, :]
        killm = (rpad == cpad + 1) & jnp.concatenate([kill, fF])[None, :]
        return jnp.where(killm, 0.0, h)

    def _iso_pairs(h, locked):
        """Isolated unconverged 2×2 blocks + their standardizing
        rotations (vectorized over every pair position)."""
        sd = _subdiag(h)                                  # (npad-1,)
        s_eff = jnp.where(locked, 0.0, sd)
        live = s_eff != 0
        fF = jnp.zeros((1,), bool)
        left_ok = jnp.concatenate([~fF, ~live[:-1]])      # sd[i-1] == 0
        right_ok = jnp.concatenate([~live[1:], ~fF])      # sd[i+1] == 0
        iso = live & left_ok & right_ok
        d0 = jnp.diagonal(h)
        aa = d0[:-1]
        dd = d0[1:]
        bb = jnp.diagonal(h, offset=1)
        cc = sd
        disc = (aa - dd) * (aa - dd) + 4 * bb * cc
        p = 0.5 * (aa - dd)
        sq = jnp.sqrt(jnp.maximum(disc, 0.0)) * 0.5
        sgn = jnp.where(p >= 0, 1.0, -1.0)
        lam_m_aa = -sgn * (jnp.abs(p) + sq)
        den = sq + jnp.abs(p)
        lam_m_dd = -sgn * bb * cc / jnp.where(den == 0, 1.0, den)
        big_b = jnp.abs(bb) >= jnp.abs(cc)
        g1 = jnp.where(big_b, bb, lam_m_dd)
        g2 = jnp.where(big_b, lam_m_aa, cc)
        nrm = jnp.sqrt(g1 * g1 + g2 * g2)
        safe = jnp.where(nrm == 0, 1.0, nrm)
        cs = jnp.where(nrm == 0, 1.0, g1 / safe)
        sn = jnp.where(nrm == 0, 0.0, g2 / safe)
        rot = iso & (disc >= 0)
        lock_new = iso & (disc < 0)
        return rot, lock_new, jnp.where(rot, cs, 1.0), \
            jnp.where(rot, sn, 0.0)

    def standardize2(st):
        """Standardize ALL isolated unconverged 2×2 blocks at once.

        The trajectory trace at 1024² (NOTES_ROUND3) showed ~200 of 360
        while-iterations each consumed a full dispatch round on ONE
        leftover 2×2 window (AED/deflation fragments the matrix into
        many decoupled pairs, and window() visits them one at a time).
        All isolated pairs are independent similarity transforms on
        disjoint row/column pairs, so one masked roll/blend pass
        standardizes every real pair and locks every complex pair
        simultaneously — the rotation math is the cancellation-free
        form of the old single-window branch (λ−aa = −sgn(p)(|p|+sq),
        λ−dd = −sgn(p)·bc/(sq+|p|); see the in-VMEM kernel's
        symmetric-tridiagonal contract test)."""
        h, q, locked, lo, hi, stuck = st
        fF = jnp.zeros((1,), bool)

        def fix_round(c):
            """Rotate/lock every currently-isolated pair, then re-run
            the deflation pass: each rotation changes the pair's
            diagonal entries AND shrinks the subdiagonal above it by
            |cs| — which is exactly what un-gates the NEXT pair's
            deflation test, so cascades drain bottom-up one round at a
            time (measured: 8 consecutive one-pair while-iterations at
            1024² before this loop existed)."""
            h, q, locked, r = c
            rot, lock_new, cs, sn = _iso_pairs(h, locked)
            # per-row/col rotation params: row i is the FIRST of pair
            # i, row i+1 the SECOND of pair i (disjoint supports)
            first = jnp.concatenate([rot, fF])            # (npad,)
            second = jnp.concatenate([fF, rot])
            cs_f = jnp.concatenate([cs, jnp.ones((1,), dtype)])
            sn_f = jnp.concatenate([sn, jnp.zeros((1,), dtype)])
            cs_s = jnp.concatenate([jnp.ones((1,), dtype), cs])
            sn_s = jnp.concatenate([jnp.zeros((1,), dtype), sn])
            # rows: Gᵀ·H — row_i ← cs·row_i + sn·row_{i+1};
            #              row_{i+1} ← −sn·row_i + cs·row_{i+1}
            h_up = jnp.roll(h, -1, axis=0)
            h_dn = jnp.roll(h, 1, axis=0)
            h = jnp.where(first[:, None],
                          cs_f[:, None] * h + sn_f[:, None] * h_up,
                          jnp.where(second[:, None],
                                    cs_s[:, None] * h
                                    - sn_s[:, None] * h_dn, h))
            # cols: H·G — col_i ← cs·col_i + sn·col_{i+1};
            #             col_{i+1} ← −sn·col_i + cs·col_{i+1}
            h_l = jnp.roll(h, -1, axis=1)
            h_r = jnp.roll(h, 1, axis=1)
            h = jnp.where(first[None, :],
                          cs_f[None, :] * h + sn_f[None, :] * h_l,
                          jnp.where(second[None, :],
                                    cs_s[None, :] * h
                                    - sn_s[None, :] * h_r, h))
            q_l = jnp.roll(q, -1, axis=1)
            q_r = jnp.roll(q, 1, axis=1)
            q = jnp.where(first[None, :],
                          cs_f[None, :] * q + sn_f[None, :] * q_l,
                          jnp.where(second[None, :],
                                    cs_s[None, :] * q
                                    - sn_s[None, :] * q_r, q))
            # exact zeros on the rotated subdiagonals
            rpad = jnp.arange(npad)[:, None]
            cpad = jnp.arange(npad)[None, :]
            zmask = (rpad == cpad + 1) \
                & jnp.concatenate([rot, fF])[None, :]
            h = jnp.where(zmask, 0.0, h)
            locked = locked | lock_new
            return _kill_zero(h, locked), q, locked, r + 1

        def more(c):
            h, q, locked, r = c
            rot, lock_new, _, _ = _iso_pairs(h, locked)
            return (jnp.any(rot | lock_new)) & (r < 64)

        h, q, locked, _ = jax.lax.while_loop(
            more, fix_round, (h, q, locked, jnp.zeros((), jnp.int32)))
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

        if use_win:
            # single-bulge multishift: the bulge is seeded in-kernel at
            # k = lo from the same (H−s1)(H−s2)·e1 polynomial and exits
            # through hi−2 with a degenerate 2-element reflector (the
            # classic chase's final rotation)
            h, q = _chase_multishift(h, q, lo, hi, tr[None], det[None],
                                     W, 1, n)
            return h, q, locked, stuck + 1
        # first column of (H−s1)(H−s2)·e1 in the window
        h00 = _get(h, lo, lo)
        h01 = _get(h, lo, lo + 1)
        h10 = _get(h, lo + 1, lo)
        h11 = _get(h, lo + 1, lo + 1)
        h21 = _get(h, lo + 2, lo + 1)
        p0 = h00 * h00 + h01 * h10 - tr * h00 + det
        p1 = h10 * (h00 + h11 - tr)
        p2 = h10 * h21

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

    # the AED window Schur engine: ONE Pallas launch per AED call
    # (ops/schur_small.py) instead of the nested `_schur_core`
    # while_loop whose ~30 ops × ~4·SW iterations per call dominated
    # the 1024² wall clock; ND4JS_TPU_SCHUR_KERNEL=0 restores the
    # nested-XLA-core fallback
    if _os.environ.get("ND4JS_TPU_SCHUR_KERNEL", "1") != "0":
        from ..ops.schur_small import schur_small as _ss_kernel
        _interp_small = jax.default_backend() == "cpu"

        def _window_schur(sw, _debug_raw=True):
            tw, qw, lkw = _ss_kernel(sw, interpret=_interp_small)
            return tw, qw, None, lkw
    else:
        _window_schur = _schur_core

    def chase_ms(st):
        """AED + multishift sweep (LAPACK dlaqr0-style): aggressively
        deflate the trailing window, then — unless the deflation alone
        made enough progress — chase NB simultaneous bulges with fresh
        shifts from the surviving window eigenvalues."""
        h, q, locked, lo, hi, stuck = st
        NS = 2 * NB
        d, h, q, locked, trs, dets = _aed(
            h, q, locked, lo, hi, SW, NS, eps, _window_schur)

        def sweep(args):
            h, q = args
            return _chase_multishift(h, q, lo, hi - d, trs, dets,
                                     W, NB, n)

        # LAPACK's "nibble": skip the (expensive) sweep when AED alone
        # deflated a decent chunk — re-AED next iteration instead
        h, q = jax.lax.cond(d < NS // _NIBBLE, sweep, lambda a_: a_,
                            (h, q))
        return h, q, locked, stuck + 1

    SMW = 128
    # needs the Pallas window engine (the nested-XLA fallback would
    # compile a second full windowed machinery at 128)
    use_small = use_win and npad >= SMW \
        and _os.environ.get("ND4JS_TPU_SCHUR_KERNEL", "1") != "0" \
        and _os.environ.get("ND4JS_TPU_SCHUR_SMALLWIN", "1") != "0"

    def small_win(st):
        """Resolve the ENTIRE active window (3 ≤ hi−lo ≤ SMW) in one
        in-VMEM small-Schur launch + three off-window GEMMs.

        The in-body trajectory at 1024² (NOTES_ROUND3) shows ~110 of
        352 while-iterations spent on sub-56 windows — the classic
        chase deflates them 1-2 eigenvalues per iteration (including
        4-iteration stall cycles on 12-wide windows), at ~1 ms of
        dispatch each. The window sits above a zero subdiagonal, so its
        full Schur form commits exactly like an AED window with no
        spike: pad the block to SMW with identity outside [lo, hi)
        (the kernel's chase never crosses zero subdiagonals, so Q_w is
        exactly block-diagonal), transform rows/columns/Q, splice the
        clean quasi-triangular T, lock surviving complex pairs."""
        h, q, locked, lo, hi, stuck = st
        w0 = jnp.maximum(hi - SMW, 0)
        ridx = w0 + jnp.arange(SMW)
        inwin = (ridx >= lo) & (ridx < hi)
        blk = jax.lax.dynamic_slice(h, (w0, w0), (SMW, SMW))
        rS = jnp.arange(SMW)[:, None]
        cS = jnp.arange(SMW)[None, :]
        eyeS = (rS == cS).astype(dtype)
        m2 = inwin[:, None] & inwin[None, :]
        blk = jnp.where(m2, blk, eyeS)
        tw_raw, qw, _, _lk = _window_schur(blk, _debug_raw=True)
        tw = jnp.where(rS <= cS + 1, tw_raw, 0.0)
        wjunk = jnp.max(jnp.abs(jnp.where(rS > cS + 1, tw_raw, 0.0)))
        wconv = wjunk <= 16 * eps * jnp.maximum(
            jnp.max(jnp.abs(tw)), jnp.finfo(dtype).tiny)

        def commit(args):
            h, q, locked = args
            rows = jax.lax.dynamic_slice(h, (w0, _Z()), (SMW, npad))
            rows = jnp.einsum("ij,ik->jk", qw, rows,
                              precision=_config.matmul_precision)
            h = jax.lax.dynamic_update_slice(h, rows, (w0, _Z()))
            cols = jax.lax.dynamic_slice(h, (_Z(), w0), (npad, SMW))
            cols = jnp.einsum("ij,jk->ik", cols, qw,
                              precision=_config.matmul_precision)
            h = jax.lax.dynamic_update_slice(h, cols, (_Z(), w0))
            qc = jax.lax.dynamic_slice(q, (_Z(), w0), (npad, SMW))
            qc = jnp.einsum("ij,jk->ik", qc, qw,
                            precision=_config.matmul_precision)
            q = jax.lax.dynamic_update_slice(q, qc, (_Z(), w0))
            # splice the exact quasi-triangular T into the window part
            bw = jax.lax.dynamic_slice(h, (w0, w0), (SMW, SMW))
            bw = jnp.where(m2, tw, bw)
            h = jax.lax.dynamic_update_slice(h, bw, (w0, w0))
            # lock the window's surviving (complex-pair) subdiagonals
            jall = jnp.arange(npad - 1)
            sd = _subdiag(h)
            dh = jnp.abs(jnp.diagonal(h))
            sig = jnp.abs(sd) > jnp.maximum(
                16 * eps * (dh[:-1] + dh[1:]), _subdiag_floor(h, eps))
            region = (jall >= lo) & (jall < hi - 1)
            locked = locked | (region & sig)
            return h, q, locked

        h, q, locked = jax.lax.cond(wconv, commit, lambda a_: a_,
                                    (h, q, locked))
        # unconverged: stuck grows; exceptional shifts eventually route
        # the window through the classic chase
        return h, q, locked, jnp.where(wconv, 0, stuck + 1)

    def cond_fn(carry):
        h, q, locked, it, stuck, hi_prev = carry
        _, hi = window(h, locked)
        return (hi > 0) & (it < max_iter)

    def body(carry):
        h, q, locked, it, stuck, hi_prev = carry
        # deflation pass + re-zero of noise next to locked pairs (a
        # window boundary through such noise SPLITS the locked block —
        # the chase edge then clobbers the converged pair; seen: f32
        # seeds with resid ~0.25 from exactly this cascade)
        h = _kill_zero(h, locked)
        lo, hi = window(h, locked)

        def work(args):
            h, q, locked, stuck = args
            st = (h, q, locked, lo, hi, stuck)
            exc = (stuck % 10) == 9
            if not use_ms:
                tail = chase
            else:
                def tail(st):
                    # multishift needs a clean SW window below lo and
                    # room for the train; exceptional shifts go through
                    # the classic chase (which owns that logic)
                    return jax.lax.cond(
                        (hi - lo >= SW + 3 * NB + 8) & ~exc,
                        chase_ms, chase, st)

            if use_small:
                def mid(st):
                    # any window that fits the in-VMEM engine resolves
                    # in one launch; exceptional-shift rounds still go
                    # through the classic chase
                    return jax.lax.cond((hi - lo <= SMW) & ~exc,
                                        small_win, tail, st)
            else:
                mid = tail

            return jax.lax.cond(hi - lo == 2, standardize2, mid, st)

        def done(args):
            h, q, locked, stuck = args
            return h, q, locked, stuck

        h, q, locked, stuck = jax.lax.cond(
            hi > 0, work, done, (h, q, locked, stuck))
        stuck = jnp.where(hi != hi_prev, 0, stuck)
        return h, q, locked, it + 1, stuck, hi

    locked0 = jnp.zeros((npad - 1,), bool)
    if _debug_hist is not None:
        K, r0, r1 = _debug_hist

        def sbody(carry, _):
            h2 = carry[0]
            lk2 = carry[2]
            # record the IN-BODY window (post deflation pass) — the
            # branch routing sees this, not the raw carry state
            lo2, hi2 = window(_kill_zero(h2, lk2), lk2)
            carry = body(carry)
            h3, lk3 = carry[0], carry[2]
            rec = (lo2, hi2,
                   jax.lax.dynamic_slice(h3, (r0, r0),
                                         (r1 - r0, r1 - r0)),
                   jax.lax.dynamic_slice(lk3, (r0,), (r1 - r0,)),
                   # full effective subdiagonal AFTER the iteration —
                   # lets trajectory tools count *disjoint* active
                   # windows (multi-window batching diagnostics)
                   jnp.where(lk3, 0.0, _subdiag(h3)))
            return carry, rec

        carry0 = (h, q, locked0, jnp.zeros((), jnp.int32),
                  jnp.zeros((), jnp.int32), jnp.asarray(-1, jnp.int32))
        _, hist = jax.lax.scan(sbody, carry0, None, length=K)
        return hist
    h, q, locked, it, _, _ = jax.lax.while_loop(
        cond_fn, body,
        (h, q, locked0, jnp.zeros((), jnp.int32),
         jnp.zeros((), jnp.int32), jnp.asarray(-1, jnp.int32)))
    if use_win:
        h, q = h[P0:P0 + n, P0:P0 + n], q[P0:P0 + n, P0:P0 + n]
    if _debug_raw:
        lk = locked[P0:P0 + n - 1] if use_win else locked
        return h, q, it, lk
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
    from ..core.debug import dcheck_finite
    dcheck_finite((q, t), "schur_decomp (q, t)")
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
    # start of a 2×2 block at i — a *significant* subdiagonal (tiny
    # leftovers below the deflation tolerance are block boundaries)
    eps = jnp.finfo(t.dtype).eps
    dn_ = jnp.concatenate([jnp.abs(d[..., 1:]), pad1], -1)
    floor = eps * jnp.sqrt(jnp.sum(t * t, axis=(-2, -1), keepdims=False))
    is_start = jnp.abs(sub) > jnp.maximum(
        16 * eps * (jnp.abs(d) + dn_), floor[..., None])
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
    d_ = jnp.abs(jnp.diagonal(t))
    eps_ = jnp.finfo(t.dtype).eps
    sig = jnp.abs(sub) > jnp.maximum(
        16 * eps_ * (d_[:-1] + d_[1:]), _subdiag_floor(t, eps_))
    is_start = jnp.concatenate([sig, jnp.zeros((1,), bool)], -1)
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


def _trevc_backsub_blocked(tc, lam, smallnum, bignum, nbk: int = 64):
    """Blocked xTREVC backward substitution: all eigenvector columns of
    (Tc − λ_k)·x_k = 0 solved at once, rows processed in nbk-blocks
    bottom-up so each block's below-block accumulation is ONE complex
    GEMM (MXU) and only the in-block recurrence stays elementwise. The
    row-at-a-time form touches the full (n, n) every row — O(n³) VPU
    work that dominated cfg4_eigen's wall at 1024². Semantics
    (xTREVC clamped pivots + per-column growth rescale) exactly match
    the unblocked loop in schur_eigen."""
    n = tc[0].shape[-1]
    dtype = tc[0].dtype
    col_idx = jnp.arange(n)
    x = (jnp.eye(n, dtype=dtype), jnp.zeros((n, n), dtype))
    ones_n = jnp.ones((n,), dtype)
    zeros_n = jnp.zeros((n,), dtype)
    # rows n−2..0 in blocks [b0, b1); row n−1 keeps its unit init
    bounds = []
    b1 = n - 1
    while b1 > 0:
        b0 = max(0, b1 - nbk)
        bounds.append((b0, b1))
        b1 = b0
    for b0, b1 in bounds:
        nb = b1 - b0
        tb = (tc[0][b0:b1, b0:b1], tc[1][b0:b1, b0:b1])
        # rows ≥ b1 of x are final — one GEMM for the whole block
        accp = cpx.matmul((tc[0][b0:b1, b1:], tc[1][b0:b1, b1:]),
                          (x[0][b1:, :], x[1][b1:, :]))
        xb = (x[0][b0:b1, :], x[1][b0:b1, :])
        loc = jnp.arange(nb)

        def brow(step, carry, nb=nb, b0=b0, tb=tb, loc=loc):
            xb, accp, ftot = carry
            il = nb - 1 - step
            i = b0 + il
            ii = _i32(il)
            trow = (jax.lax.dynamic_slice(tb[0], (ii, _Z()), (1, nb))[0],
                    jax.lax.dynamic_slice(tb[1], (ii, _Z()), (1, nb))[0])
            mask = (loc > il)[:, None]
            prod = cpx.mul((trow[0][:, None], trow[1][:, None]), xb)
            acc = (jnp.sum(jnp.where(mask, prod[0], 0.0), axis=0)
                   + jax.lax.dynamic_slice(accp[0], (ii, _Z()), (1, n))[0],
                   jnp.sum(jnp.where(mask, prod[1], 0.0), axis=0)
                   + jax.lax.dynamic_slice(accp[1], (ii, _Z()), (1, n))[0])
            tii = (jnp.sum(jnp.where(loc == il, trow[0], 0.0)),
                   jnp.sum(jnp.where(loc == il, trow[1], 0.0)))
            den = cpx.sub((jnp.full((n,), tii[0]),
                           jnp.full((n,), tii[1])), lam)
            small = cpx.cabs(den) <= smallnum
            den = (jnp.where(small, smallnum, den[0]),
                   jnp.where(small, 0.0, den[1]))
            xi = cpx.div((-acc[0], -acc[1]), den)
            xi = cpx.where(col_idx > i, xi,
                           cpx.where(col_idx == i, cpx.cpx(ones_n),
                                     cpx.cpx(zeros_n)))
            m = jnp.maximum(jnp.abs(xi[0]), jnp.abs(xi[1]))
            f = jnp.where(m > bignum,
                          1.0 / jnp.where(m > bignum, m, 1.0), 1.0)
            fr = f[None, :]
            xi = (xi[0] * f, xi[1] * f)
            xb = (jax.lax.dynamic_update_slice(
                      xb[0] * fr, xi[0][None, :], (ii, _Z())),
                  jax.lax.dynamic_update_slice(
                      xb[1] * fr, xi[1][None, :], (ii, _Z())))
            accp = (accp[0] * fr, accp[1] * fr)
            return xb, accp, ftot * f

        xb, _, ftot = jax.lax.fori_loop(
            0, nb, brow, (xb, accp, ones_n))
        fr = ftot[None, :]
        x = (x[0].at[b0:b1, :].set(xb[0]).at[b1:, :].multiply(fr),
             x[1].at[b0:b1, :].set(xb[1]).at[b1:, :].multiply(fr))
    return x


def _trevc_refine_blocked(tc, lam, smallnum, xs, nbk: int = 64):
    """Blocked form of the inverse-iteration refinement pass: solve
    (Tc − λ_k)·y_k = x_k for every column by the same blocked backward
    substitution as _trevc_backsub_blocked (GEMM below the block,
    elementwise recurrence inside)."""
    n = tc[0].shape[-1]
    dtype = tc[0].dtype
    y = (jnp.zeros((n, n), dtype), jnp.zeros((n, n), dtype))
    ones_n = jnp.ones((n,), dtype)
    bounds = []
    b1 = n
    while b1 > 0:
        b0 = max(0, b1 - nbk)
        bounds.append((b0, b1))
        b1 = b0
    for b0, b1 in bounds:
        nb = b1 - b0
        tb = (tc[0][b0:b1, b0:b1], tc[1][b0:b1, b0:b1])
        accp = cpx.matmul((tc[0][b0:b1, b1:], tc[1][b0:b1, b1:]),
                          (y[0][b1:, :], y[1][b1:, :]))
        yb = (y[0][b0:b1, :], y[1][b0:b1, :])
        xsb = (xs[0][b0:b1, :], xs[1][b0:b1, :])
        loc = jnp.arange(nb)

        def brow(step, carry, nb=nb, tb=tb, loc=loc):
            yb, accp, xsb, ftot = carry
            il = nb - 1 - step
            ii = _i32(il)
            trow = (jax.lax.dynamic_slice(tb[0], (ii, _Z()), (1, nb))[0],
                    jax.lax.dynamic_slice(tb[1], (ii, _Z()), (1, nb))[0])
            mask = (loc > il)[:, None]
            prod = cpx.mul((trow[0][:, None], trow[1][:, None]), yb)
            acc = (jnp.sum(jnp.where(mask, prod[0], 0.0), axis=0)
                   + jax.lax.dynamic_slice(accp[0], (ii, _Z()), (1, n))[0],
                   jnp.sum(jnp.where(mask, prod[1], 0.0), axis=0)
                   + jax.lax.dynamic_slice(accp[1], (ii, _Z()), (1, n))[0])
            tii = (jnp.sum(jnp.where(loc == il, trow[0], 0.0)),
                   jnp.sum(jnp.where(loc == il, trow[1], 0.0)))
            den = cpx.sub((jnp.full((n,), tii[0]),
                           jnp.full((n,), tii[1])), lam)
            small = cpx.cabs(den) < smallnum
            den = (jnp.where(small, smallnum, den[0]),
                   jnp.where(small, 0.0, den[1]))
            rhs = (jax.lax.dynamic_slice(xsb[0], (ii, _Z()), (1, n))[0],
                   jax.lax.dynamic_slice(xsb[1], (ii, _Z()), (1, n))[0])
            yi = cpx.div(cpx.sub(rhs, acc), den)
            m = jnp.maximum(jnp.abs(yi[0]), jnp.abs(yi[1]))
            f = jnp.where(m > 1e18,
                          1.0 / jnp.where(m > 1e18, m, 1.0), 1.0)
            fr = f[None, :]
            yi = (yi[0] * f, yi[1] * f)
            yb = (jax.lax.dynamic_update_slice(
                      yb[0] * fr, yi[0][None, :], (ii, _Z())),
                  jax.lax.dynamic_update_slice(
                      yb[1] * fr, yi[1][None, :], (ii, _Z())))
            accp = (accp[0] * fr, accp[1] * fr)
            xsb = (xsb[0] * fr, xsb[1] * fr)
            return yb, accp, xsb, ftot * f

        yb, _, _, ftot = jax.lax.fori_loop(
            0, nb, brow, (yb, accp, xsb, ones_n))
        fr = ftot[None, :]
        y = (y[0].at[b0:b1, :].set(yb[0]).at[b1:, :].multiply(fr),
             y[1].at[b0:b1, :].set(yb[1]).at[b1:, :].multiply(fr))
        xs = (xs[0].at[:b0, :].multiply(fr),
              xs[1].at[:b0, :].multiply(fr))
    return y


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
        # LAPACK xTREVC-style safeguards: a near-singular diagonal
        # (repeated / clustered eigenvalue, incl. the reference's
        # defective fallback seam, schur.js:188-203) is CLAMPED to
        # smallnum = eps·‖T‖_F instead of triggering a restart — the
        # resulting huge pivot amplifies exactly the valid eigenvector
        # direction of the earlier equal eigenvalue (so defective
        # matrices duplicate the eigenvector, same semantics as the
        # reference's restart), and a per-column growth rescale keeps
        # everything inside f32 range. The round-2 √eps restart
        # threshold misfired at f32 MXU sizes: √eps(f32)·‖T‖_F ≈ 0.18
        # at 512² wiped most columns (measured 447/512 bad).
        tnorm = jnp.sqrt(jnp.sum(tc[0] * tc[0] + tc[1] * tc[1]))
        smallnum = eps * tnorm + jnp.finfo(t.dtype).tiny
        bignum = jnp.sqrt(jnp.finfo(t.dtype).max) / max(n, 1)
        # backward substitution for all eigenvectors at once:
        # (T − λ_k)·x = 0, x[k,k] = 1, columns k solved simultaneously;
        # MXU sizes take the blocked form (GEMM below the block — the
        # row-at-a-time loop is O(n³) VPU work), and on TPU the whole
        # blocked solve runs in ONE Pallas launch (ops/trevc_solve.py —
        # the XLA blocked loop is ~12 dispatches/row ≈ 87 ms at 1024²)
        use_blocked = n > 128
        use_kernel = (use_blocked and n % 64 == 0 and _os.environ.get(
            "ND4JS_TPU_TREVC_KERNEL", "1") != "0")
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
            small = cpx.cabs(den) <= smallnum
            den = (jnp.where(small, smallnum, den[0]),
                   jnp.where(small, 0.0, den[1]))
            xi = cpx.div((-acc[0], -acc[1]), den)
            xi = cpx.where(col_idx > i, xi,
                           cpx.where(col_idx == i,
                                     cpx.cpx(jnp.ones((n,), t.dtype)),
                                     cpx.cpx(jnp.zeros((n,), t.dtype))))
            # per-column growth rescale (f32 overflow guard)
            m = jnp.maximum(jnp.abs(xi[0]), jnp.abs(xi[1]))
            f = jnp.where(m > bignum,
                          1.0 / jnp.where(m > bignum, m, 1.0), 1.0)
            xi = (xi[0] * f, xi[1] * f)
            fr = f[None, :]
            x = (x[0] * fr, x[1] * fr)
            return (jax.lax.dynamic_update_slice(x[0], xi[0][None, :],
                                                 (ii, _Z())),
                    jax.lax.dynamic_update_slice(x[1], xi[1][None, :],
                                                 (ii, _Z())))

        if use_kernel:
            from ..ops.trevc_solve import trevc_solve
            x = trevc_solve(tc[0], tc[1], lam[0], lam[1], smallnum,
                            bignum,
                            interpret=jax.default_backend() == "cpu")
        elif use_blocked:
            x = _trevc_backsub_blocked(tc, lam, smallnum, bignum)
        else:
            x = jax.lax.fori_loop(0, n - 1, body, x)

        if not _REFINE:
            v = cpx.matmul(qc, x)
            nrm = jnp.sqrt(jnp.sum(cpx.abs2(v), axis=0))
            inv = 1 / jnp.where(nrm == 0, 1.0, nrm)
            v = cpx.scale(v, inv[None, :])
            return lam[0], lam[1], v[0], v[1]

        # One masked inverse-iteration refinement pass (VERDICT r2
        # weak #4; ref: schur.js:90-370 runs the same back-substitution
        # in float64 — matching the contract in f32 requires this).
        # Solve (Tc − λ_k)·y_k = x_k for every column at once by
        # backward substitution; the near-singular diagonal entry at
        # row k amplifies exactly the eigendirection.  A per-step
        # rescale of the freshly computed row guards f32 overflow
        # (LAPACK xTREVC-style column scaling).  Keep y_k only where it
        # improves the triangular-frame residual.
        tnorm = jnp.sqrt(jnp.sum(tc[0] * tc[0] + tc[1] * tc[1]))
        smallnum = jnp.finfo(t.dtype).eps * tnorm \
            + jnp.finfo(t.dtype).tiny
        rows_i = jnp.arange(n)[:, None]

        def ref_body(step, carry):
            y, xs = carry
            i = n - 1 - step
            ii = _i32(i)
            row = (jax.lax.dynamic_slice(tc[0], (ii, _Z()), (1, n))[0],
                   jax.lax.dynamic_slice(tc[1], (ii, _Z()), (1, n))[0])
            mask = (jnp.arange(n) > i)[:, None]
            prod = cpx.mul((row[0][:, None], row[1][:, None]), y)
            acc = (jnp.sum(jnp.where(mask, prod[0], 0.0), axis=0),
                   jnp.sum(jnp.where(mask, prod[1], 0.0), axis=0))
            tii = (row[0][i], row[1][i])
            den = cpx.sub((jnp.full((n,), tii[0]),
                           jnp.full((n,), tii[1])), lam)
            small = cpx.cabs(den) < smallnum
            den = (jnp.where(small, smallnum, den[0]),
                   jnp.where(small, 0.0, den[1]))
            rhs = (jax.lax.dynamic_slice(xs[0], (ii, _Z()), (1, n))[0],
                   jax.lax.dynamic_slice(xs[1], (ii, _Z()), (1, n))[0])
            yi = cpx.div(cpx.sub(rhs, acc), den)
            # rescale guard: growth first appears in the new row
            m = jnp.maximum(jnp.abs(yi[0]), jnp.abs(yi[1]))
            f = jnp.where(m > 1e18, 1.0 / jnp.where(m > 1e18, m, 1.0),
                          1.0)[None, :]
            y = (jnp.where(rows_i == i, yi[0][None, :], y[0]) * f,
                 jnp.where(rows_i == i, yi[1][None, :], y[1]) * f)
            xs = (xs[0] * f, xs[1] * f)
            return y, xs

        def _tri_resid(z):
            tz = cpx.matmul(tc, z)
            zl = cpx.mul(z, (lam[0][None, :], lam[1][None, :]))
            r_ = cpx.sub(tz, zl)
            nrm_ = jnp.sqrt(jnp.sum(cpx.abs2(z), axis=0))
            return jnp.sqrt(jnp.sum(cpx.abs2(r_), axis=0)) \
                / jnp.where(nrm_ == 0, 1.0, nrm_)

        def do_refine(x):
            if use_blocked:
                y = _trevc_refine_blocked(tc, lam, smallnum, x)
            else:
                y0 = (jnp.zeros((n, n), t.dtype),
                      jnp.zeros((n, n), t.dtype))
                y, _ = jax.lax.fori_loop(0, n, ref_body, (y0, x))
            ynrm = jnp.sqrt(jnp.sum(cpx.abs2(y), axis=0))
            yinv = 1 / jnp.where(ynrm == 0, 1.0, ynrm)
            y = cpx.scale(y, yinv[None, :])
            better = (_tri_resid(y) < _tri_resid(x))[None, :]
            return cpx.where(better, y, x)

        # refinement is *gated*: the safeguarded substitution already
        # hits eps-level residuals on healthy frames (NOTES_ROUND3 #4 —
        # measured max ≈ 10·eps·‖T‖ at f32 512²), so the expensive pass
        # only runs when a column actually exceeds the healthy band
        need = jnp.max(_tri_resid(x)) > 64 * jnp.finfo(t.dtype).eps \
            * tnorm
        x = jax.lax.cond(need, do_refine, lambda x_: x_, x)
        v = cpx.matmul(qc, x)
        nrm = jnp.sqrt(jnp.sum(cpx.abs2(v), axis=0))
        inv = 1 / jnp.where(nrm == 0, 1.0, nrm)
        v = cpx.scale(v, inv[None, :])
        return lam[0], lam[1], v[0], v[1]

    lr, li, vr, vi = _go(q, t)
    if split:
        return (lr, li), (vr, vi)
    return cpx.to_complex((lr, li)), cpx.to_complex((vr, vi))
