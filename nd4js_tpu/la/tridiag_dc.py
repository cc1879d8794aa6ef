"""Divide-&-conquer symmetric tridiagonal eigensolver.

The engine behind svd_dc.py (parity with the reference's
divide-&-conquer SVD, /root/reference/src/la/svd_dc.js — its
`_svd_dc_neves` secular-equation machinery :169-658 plays the role this
module's vectorised secular solver plays here).

TPU-first design (SURVEY.md §7 hard part #2: "the secular solver is
sequential and data-dependent — implement as masked fixed-iteration
Newton"):

  * the Cuppen split T = diag(T₁, T₂) + β·v·vᵀ recurses over *static*
    python halves (shapes known at trace time),
  * each merge solves ALL n secular roots simultaneously — n
    independent intervals, each bisected/Newton-stepped for a fixed
    iteration count on VPU lanes,
  * Gu-Eisenstat ẑ-refinement (the product formula) restores
    eigenvector orthogonality without explicit data-dependent
    deflation: near-deflated entries come out with ẑᵢ ≈ zᵢ ≈ 0 and the
    vector collapses to ±eᵢ automatically,
  * duplicate dᵢ are separated by an eps-scale jitter (static-shape
    stand-in for deflation),
  * the block eigenvector back-transform is one GEMM per merge — the
    MXU does the O(n³) work.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.batch import batched
from ..core.mm import mm

__all__ = ["tridiag_eigh_dc"]

_BASE = 16


def _dense_tridiag(d, e):
    n = d.shape[0]
    t = jnp.diag(d)
    if n > 1:
        t = t + jnp.diag(e, 1) + jnp.diag(e, -1)
    return t


def _base_eigh(d, e):
    from .eigh import eigh_jacobi   # handles odd sizes by padding
    return eigh_jacobi(_dense_tridiag(d, e))


def _secular_roots_shifted(dd, z2, rho, iters: int | None = None):
    """All roots of f(λ) = 1 + ρ·Σ z²ᵢ/(dᵢ − λ) in *shifted*
    coordinates: root r is returned as μᵣ = λᵣ − ddᵣ ∈ (0, hiᵣ).
    Shifting kills the catastrophic cancellation of dⱼ − λ when λ hugs
    a pole (LAPACK dlaed4's central trick). Fixed-count bisection sized
    to the dtype's mantissa *relative to the gap*: 60 halvings for f64
    (53 bits), 34 for f32 (24 bits) — each halving sweeps a full
    (n, n) pole-difference array per merge, so the count is a real
    slice of the level-batched D&C wall at MXU sizes."""
    if iters is None:
        iters = 60 if jnp.finfo(dd.dtype).bits > 32 else 34
    n = dd.shape[0]
    zsum = jnp.sum(z2)
    # delta[r, j] = dd_j − dd_r  (exact fp subtraction)
    delta = dd[None, :] - dd[:, None]
    gap = jnp.concatenate([dd[1:] - dd[:-1], (rho * zsum)[None]])

    def f(mu):
        # f_r(μ) = 1 + ρ Σ_j z²_j / (delta[r, j] − μ_r)
        den = delta - mu[:, None]
        safe = jnp.where(den == 0, jnp.finfo(dd.dtype).tiny, den)
        return 1 + rho * jnp.sum(z2[None, :] / safe, axis=1)

    lo = jnp.zeros_like(dd)
    hi = gap

    def body(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        fm = f(mid)
        # f is increasing in μ between the poles: move lo while f < 0
        lo2 = jnp.where(fm < 0, mid, lo)
        hi2 = jnp.where(fm < 0, hi, mid)
        return lo2, hi2

    lo, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
    return 0.5 * (lo + hi)


def _merge(w1, v1, w2, v2, beta, dtype):
    """Combine eigensystems of the two halves through the rank-one
    update diag(D) + β·z·zᵀ."""
    n1 = w1.shape[0]
    n2 = w2.shape[0]
    n = n1 + n2
    eps = jnp.finfo(dtype).eps
    z = jnp.concatenate([v1[-1, :], v2[0, :]])
    d = jnp.concatenate([w1, w2])
    rho = beta
    # β may be negative: solve for −T and negate back
    neg = rho < 0
    d_s = jnp.where(neg, -d, d)
    rho_s = jnp.abs(rho) + jnp.finfo(dtype).tiny
    order = jnp.argsort(d_s)
    dd = d_s[order]
    zz = z[order]
    # eps-jitter duplicate diagonal entries (static-shape deflation)
    scale = jnp.maximum(jnp.max(jnp.abs(dd)), rho_s * jnp.sum(z * z)) \
        + jnp.finfo(dtype).tiny
    gap = jnp.diff(dd)
    bump = jnp.concatenate(
        [jnp.zeros((1,), dtype),
         jnp.cumsum(jnp.where(gap < 8 * eps * scale,
                              8 * eps * scale - gap, 0.0))])
    dd = dd + bump
    z2 = zz * zz + (eps * scale) ** 2 / n   # floor keeps intervals alive
    mu = _secular_roots_shifted(dd, z2, rho_s)
    lam = dd + mu
    # Gu-Eisenstat ẑ refinement in shifted/log form:
    #   ẑᵢ² = Πⱼ (λⱼ − ddᵢ) / (ρ · Πⱼ≠ᵢ (ddⱼ − ddᵢ))
    # with λⱼ − ddᵢ = (ddⱼ − ddᵢ) + μⱼ accurate in shifted coords.
    delta = dd[None, :] - dd[:, None]                # (i, j): ddⱼ − ddᵢ
    num = delta + mu[None, :]                        # λⱼ − ddᵢ
    eye = jnp.eye(n, dtype=bool)
    # guard Δ = 0 (duplicates whose jitter underflowed at scale ≈ 0):
    # 0/0 here would poison even the trivially-merged branch via NaN
    safe_delta = jnp.where(delta == 0, jnp.finfo(dtype).tiny, delta)
    den = jnp.where(eye, 1.0, safe_delta)
    ratio = jnp.where(eye, num, num / den)
    log_z2 = jnp.sum(jnp.log(jnp.abs(ratio)
                             + jnp.finfo(dtype).tiny), axis=1) \
        - jnp.log(rho_s)
    # a COMMON shift of log_z2 rescales every ẑᵢ by the same factor,
    # which cancels in the column normalisation below — it exists only
    # to keep exp/u²/Σu² inside the dtype range when ρ → 0 (a pad seam
    # or a negligible coupling drives log_z2 toward −log ρ ≈ +∞ and the
    # normalisation Σu² used to overflow to inf → zero columns)
    log_z2 = log_z2 - jnp.max(log_z2)
    z_hat = jnp.exp(0.5 * log_z2)
    z_hat = z_hat * jnp.where(zz == 0, 1.0, jnp.sign(zz))
    # eigenvectors: u[i, r] = ẑᵢ / (ddᵢ − λᵣ) with
    # ddᵢ − λᵣ = (ddᵢ − ddᵣ) − μᵣ = delta.T[i, r] − μᵣ (shifted: exact)
    dmat = delta.T - mu[None, :]                     # (i, r)
    safe = jnp.where(dmat == 0, jnp.finfo(dtype).tiny, dmat)
    u = z_hat[:, None] / safe
    # two-stage normalisation (max, then 2-norm): overflow-free for any
    # ẑ/μ dynamic range
    umax = jnp.max(jnp.abs(u), axis=0, keepdims=True)
    u = u / jnp.where(umax == 0, 1.0, umax)
    u = u / jnp.sqrt(jnp.sum(u * u, axis=0, keepdims=True))
    # a numerically-zero coupling (ρ·Σz² below eps²·scale — e.g. the
    # decoupled pad seam of the level-batched driver) merges trivially:
    # eigenvalues stay dd, eigenvectors stay the sorted identity. The
    # RAW ρ (not the tiny-floored rho_s) keeps the β = 0 case exact
    # even when scale itself underflows (an all-zero block: 0 ≤ 0)
    trivial = jnp.abs(rho) * jnp.sum(z * z) <= (eps * scale) ** 2
    lam = jnp.where(trivial, dd, lam)
    u = jnp.where(trivial, jnp.eye(n, dtype=dtype), u)
    lam_out = jnp.where(neg, -lam, lam)
    inv = jnp.argsort(order)
    u_unsorted = u[inv, :]
    top = mm(v1, u_unsorted[:n1, :])
    bot = mm(v2, u_unsorted[n1:, :])
    v = jnp.concatenate([top, bot], axis=0)
    fin = jnp.argsort(lam_out)
    return lam_out[fin], v[:, fin]


def _tdc(d, e):
    n = d.shape[0]
    if n <= _BASE:
        return _base_eigh(d, e)
    k = n // 2
    beta = e[k - 1]
    d1 = d[:k].at[k - 1].add(-beta)
    d2 = d[k:].at[0].add(-beta)
    w1, v1 = _tdc(d1, e[:k - 1])
    w2, v2 = _tdc(d2, e[k:])
    return _merge(w1, v1, w2, v2, beta, d.dtype)


def _tdc_level_batched(d, e, base: int = _BASE):
    """Level-batched Cuppen D&C: pad T to M = base·2^L (appending
    decoupled, above-spectrum diagonal entries), apply ALL split
    corrections up front (each junction touches two d entries, and
    junctions are ≥ base apart so they never collide), solve every leaf
    in ONE batched Jacobi call, then run ONE vmapped merge per level —
    L+1 traced calls instead of 2^L leaf + (2^L − 1) merge traces.
    Zero-β junctions (the pad seam) degenerate gracefully: with ρ → 0⁺
    the shifted secular roots collapse to μ ≈ 0 and the Gu-Eisenstat
    product formula yields u → I, i.e. the trivial merge — no branch
    needed."""
    from .eigh import eigh_jacobi
    n = d.shape[0]
    dt = d.dtype
    if n <= base:
        return _base_eigh(d, e)
    nleaf = -(-n // base)
    L = max(0, (nleaf - 1).bit_length())
    M = base << L
    if M > n:
        # decoupled pads strictly above the Gershgorin bound, pairwise
        # distinct at every scale (the absolute term covers T == 0)
        bound = jnp.max(jnp.abs(d)) + 2 * jnp.max(jnp.abs(e))
        ar = jnp.arange(1, M - n + 1, dtype=dt)
        pads = bound * (1.25 + ar / 8) + ar
        d = jnp.concatenate([d, pads])
        e = jnp.concatenate([e, jnp.zeros((M - n,), dt)])
    e_in = jnp.concatenate([e, jnp.zeros((1,), dt)])        # length M
    P0 = M // base
    junc = base * jnp.arange(1, P0)
    betas = e_in[junc - 1]
    d = d.at[junc - 1].add(-betas).at[junc].add(-betas)
    dl = d.reshape(P0, base)
    el = e_in.reshape(P0, base)[:, :base - 1]
    tl = jax.vmap(_dense_tridiag)(dl, el)
    w, v = eigh_jacobi(tl)                 # (P0, base), (P0, base, base)
    m = base
    while m < M:
        P = M // (2 * m)
        w = w.reshape(P, 2, m)
        v = v.reshape(P, 2, m, m)
        beta = e_in[jnp.arange(P) * 2 * m + m - 1]
        w, v = jax.vmap(
            lambda w1, v1, w2, v2, b: _merge(w1, v1, w2, v2, b, dt))(
                w[:, 0], v[:, 0], w[:, 1], v[:, 1], beta)
        m *= 2
    w, v = w[0], v[0]
    if M > n:
        # pads sit strictly above the real spectrum: ascending sort puts
        # them in the last M − n columns, and their rows are inert
        w, v = w[:n], v[:n, :n]
    return w, v


def tridiag_eigh_dc(d, e, method: str = "batched"):
    """Eigendecomposition of the symmetric tridiagonal (diag d, offdiag
    e): T = V·diag(w)·Vᵀ, w ascending. Batched over leading dims
    (d: (..., n), e: (..., n−1)).

    method: 'batched' (default — level-batched merges, one traced call
    per D&C level) or 'recursive' (per-merge traces; the accuracy
    reference for tests)."""
    d = jnp.asarray(d)
    e = jnp.asarray(e)

    def core(d1, e1):
        # below ~4 leaves the level-batching buys nothing and its
        # padding adds eps-scale noise that degenerate-input contracts
        # at tight f64 tolerances can see (measured 5.0e-13 vs a
        # 3.3e-13 gate at n=22) — small problems keep the per-merge
        # recursion
        if method == "batched" and d1.shape[0] > 64:
            return _tdc_level_batched(d1, e1)
        return _tdc(d1, e1)

    return batched((1, 1))(core)(d, e)
