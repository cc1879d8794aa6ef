"""Pallas kernel: complete small-matrix real Schur iteration in VMEM.

The AED deflation engine (la/schur.py `_aed`; the TPU analog of the
reference's recursive deflation, /root/reference/src/la/schur.js:415-660
— LAPACK dlaqr2's role) needs the real Schur form of its trailing SW×SW
window at EVERY outer iteration. As XLA ops that nested `_schur_core`
while_loop costs ~30 dispatched ops × ~4·SW iterations per call — ~10⁴
dispatches per 1024² decomposition, the measured wall-clock hog
(NOTES_ROUND3). This kernel runs the entire Francis iteration —
deflation scans, window detection, 2×2 standardisation, single-bulge
double-shift chases, locked complex pairs, exceptional shifts — in ONE
kernel launch with H and Q VMEM-resident.

Input MUST be upper Hessenberg (the AED window always is); the kernel
performs no Hessenberg reduction.

Algorithm parity with la/schur.py `_schur_core`'s n < 192 regime (the
one `_aed` invokes): norm-relative deflation floor eps·‖H‖_F, 16·eps
neighbour test, locked-pair-adjacent re-zeroing, Wilkinson trailing-2×2
double shift, dlahqr-style exceptional shift every 10 stagnant sweeps.

Mosaic constraints shaping the code (CLAUDE.md): no dynamic indexing of
the lane dim — every scalar extraction T[i, j] is a masked full-block
reduction, reflectors/rotations are broadcasted-iota masked (1, W) /
(W, 1) vectors applied as rank-1 (or full-G GEMM) updates, and the
lane shift needed by the neighbour test is a one-hot shift-matrix
matmul.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["schur_small"]

_HI = jax.lax.Precision.HIGHEST


def _make_kernel(W: int, max_iter: int):
    def kernel(a_ref, t_ref, q_ref, lk_ref):
        dtype = a_ref.dtype
        eps = jnp.finfo(dtype).eps
        rW = jax.lax.broadcasted_iota(jnp.int32, (W, W), 0)
        cW = jax.lax.broadcasted_iota(jnp.int32, (W, W), 1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
        rcol = jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0)
        eye = (rW == cW).astype(dtype)
        # SH[i, j] = 1 iff i == j+1: (row ∘ SH)[j] = row[j+1] (lane
        # shift as a matmul — Mosaic cannot relayout the lane dim)
        shm = (rW == cW + 1).astype(dtype)
        subm = rW == cW + 1
        t_ref[:] = a_ref[:]
        q_ref[:] = eye
        lk_ref[:] = jnp.zeros((1, W), dtype)

        def dot(a, b, ca, cb):
            return jax.lax.dot_general(
                a, b, (((ca,), (cb,)), ((), ())), precision=_HI,
                preferred_element_type=dtype)

        def ext(t, i, j):
            """T[i, j] as a masked reduction; out-of-range → 0."""
            return jnp.sum(jnp.where((rW == i) & (cW == j), t, 0.0))

        def rot2(g1, g2):
            nrm = jnp.sqrt(g1 * g1 + g2 * g2)
            safe = jnp.where(nrm == 0, 1.0, nrm)
            cs = jnp.where(nrm == 0, jnp.ones_like(g1), g1 / safe)
            sn = jnp.where(nrm == 0, jnp.zeros_like(g2), g2 / safe)
            return cs, sn

        def apply_rot2(k, cs, sn):
            """T ← Gᵀ·T·G, Q ← Q·G; G = I except [[cs,−sn],[sn,cs]]
            at rows/cols (k, k+1) — built masked, applied as GEMMs
            (trivial at window sizes, and layout-free)."""
            g = eye \
                + jnp.where((rW == k) & (cW == k), cs - 1.0, 0.0) \
                + jnp.where((rW == k) & (cW == k + 1), -sn, 0.0) \
                + jnp.where((rW == k + 1) & (cW == k), sn, 0.0) \
                + jnp.where((rW == k + 1) & (cW == k + 1), cs - 1.0, 0.0)
            t = t_ref[:]
            t = dot(dot(g, t, 0, 0), g, 1, 0)      # gᵀ·t·g
            t_ref[:] = t
            q_ref[:] = dot(q_ref[:], g, 1, 0)

        def house3(p0, p1, p2):
            """la/schur.py `_house3` (v0 ≡ 1)."""
            sigma = p1 * p1 + p2 * p2
            nrm = jnp.sqrt(p0 * p0 + sigma)
            beta = jnp.where(p0 >= 0, -nrm, nrm)
            den = p0 - beta
            sden = jnp.where(den == 0, jnp.ones_like(den), den)
            v1 = jnp.where(sigma == 0, jnp.zeros_like(p1), p1 / sden)
            v2 = jnp.where(sigma == 0, jnp.zeros_like(p2), p2 / sden)
            sbeta = jnp.where(beta == 0, jnp.ones_like(beta), beta)
            tau = jnp.where(nrm == 0, jnp.zeros_like(beta),
                            (beta - p0) / sbeta)
            tau = jnp.where(sigma == 0, jnp.zeros_like(tau), tau)
            return v1, v2, tau

        def body(carry):
            it, stuck, hi_prev = carry
            t = t_ref[:]
            # -------- deflation scan (la/schur.py _zero_small_subdiags)
            drow = jnp.sum(jnp.where(rW == cW, jnp.abs(t), 0.0),
                           axis=0, keepdims=True)          # |T[j,j]|
            dnext = dot(drow, shm, 1, 0)                    # |T[j+1,j+1]|
            sub = jnp.sum(jnp.where(subm, t, 0.0), axis=0,
                          keepdims=True)                    # T[j+1,j]
            floor = eps * jnp.sqrt(jnp.sum(t * t))
            small = jnp.abs(sub) <= jnp.maximum(
                16 * eps * (drow + dnext), floor)
            t = jnp.where(subm & small, 0.0, t)
            # locked-pair-adjacent re-zeroing (see _schur_core body)
            lk = lk_ref[:] > 0.5
            lkl = dot(lk_ref[:], (rW == cW - 1).astype(dtype), 1, 0) > 0.5
            lkr = dot(lk_ref[:], shm, 1, 0) > 0.5
            kill = (lkl | lkr) & ~lk
            t = jnp.where(subm & kill, 0.0, t)
            t_ref[:] = t
            # -------- active window [lo, hi)
            sub2 = jnp.sum(jnp.where(subm, t, 0.0), axis=0,
                           keepdims=True)
            # logical ops only: jnp.where(lk, False, ...) broadcasts the
            # scalar through an i8 intermediate whose i8→i1 trunci Mosaic
            # cannot lower (found by the compiled-vs-interpret HW test)
            nz = ~lk & (sub2 != 0.0)
            hi = jnp.max(jnp.where(nz, lane + 2, 0))
            lo = jnp.max(jnp.where((lane < hi - 1) & ~nz, lane + 1, 0))
            size2 = (hi - lo) == 2
            dostd = (hi > 0) & size2
            dochase = (hi > 0) & ~size2

            @pl.when(dostd)
            def _():
                t = t_ref[:]
                aa = ext(t, lo, lo)
                bb = ext(t, lo, lo + 1)
                cc = ext(t, lo + 1, lo)
                dd = ext(t, lo + 1, lo + 1)
                disc = (aa - dd) * (aa - dd) + 4 * bb * cc

                @pl.when(disc >= 0)
                def _():
                    # eigenvector of the λ closest to dd, with BOTH
                    # differences cancellation-free: λ−aa = −sgn(p)(|p|+sq)
                    # and λ−dd = −sgn(p)·bc/(sq+|p|) (rationalized).
                    # Naive λ−dd loses ALL digits when bc ≪ (aa−dd)²
                    # (λ rounds to dd exactly) — measured: a symmetric
                    # near-diagonal pair got a rotation wrong by ~1e-6,
                    # breaking the similarity at √eps scale.
                    p = 0.5 * (aa - dd)
                    sq = jnp.sqrt(jnp.maximum(disc, 0.0)) * 0.5
                    sgn = jnp.where(p >= 0, 1.0, -1.0)
                    lam_m_aa = -sgn * (jnp.abs(p) + sq)
                    den = sq + jnp.abs(p)
                    lam_m_dd = -sgn * bb * cc / jnp.where(den == 0,
                                                          1.0, den)
                    big_b = jnp.abs(bb) >= jnp.abs(cc)
                    g1 = jnp.where(big_b, bb, lam_m_dd)
                    g2 = jnp.where(big_b, lam_m_aa, cc)
                    cs, sn = rot2(g1, g2)
                    apply_rot2(lo, cs, sn)
                    t2 = t_ref[:]
                    t_ref[:] = jnp.where((rW == lo + 1) & (cW == lo),
                                         0.0, t2)

                @pl.when(disc < 0)
                def _():
                    lk_ref[:] = jnp.where(lane == lo, jnp.asarray(1.0, dtype),
                                          lk_ref[:])

            @pl.when(dochase)
            def _():
                t = t_ref[:]
                m = hi - 2
                h_mm = ext(t, m, m)
                h_nn = ext(t, hi - 1, hi - 1)
                h_mn = ext(t, m, hi - 1)
                h_nm = ext(t, hi - 1, m)
                tr = h_mm + h_nn
                det = h_mm * h_nn - h_mn * h_nm
                # exceptional shift every 10 stagnant sweeps (dlahqr)
                exc = (stuck % 10) == 9
                s_mag = jnp.abs(h_nm) + jnp.abs(ext(t, m, m - 1))
                lam_exc = h_nn + 0.75 * s_mag
                tr = jnp.where(exc, 2 * lam_exc, tr)
                det = jnp.where(exc, lam_exc * lam_exc, det)
                h00 = ext(t, lo, lo)
                h01 = ext(t, lo, lo + 1)
                h10 = ext(t, lo + 1, lo)
                h11 = ext(t, lo + 1, lo + 1)
                h21 = ext(t, lo + 2, lo + 1)
                p0 = h00 * h00 + h01 * h10 - tr * h00 + det
                p1 = h10 * (h00 + h11 - tr)
                p2 = h10 * h21

                def step(k, P):
                    p0, p1, p2 = P
                    v1, v2, tau = house3(p0, p1, p2)
                    relr = rcol - k
                    vcol = jnp.where(relr == 0, 1.0, 0.0) \
                        + jnp.where(relr == 1, v1, 0.0) \
                        + jnp.where(relr == 2, v2, 0.0)
                    relc = lane - k
                    vrow = jnp.where(relc == 0, 1.0, 0.0) \
                        + jnp.where(relc == 1, v1, 0.0) \
                        + jnp.where(relc == 2, v2, 0.0)
                    t = t_ref[:]
                    t = t - (tau * vcol) * dot(vrow, t, 1, 0)
                    t = t - dot(t, vcol, 1, 0) * (tau * vrow)
                    t_ref[:] = t
                    q = q_ref[:]
                    q_ref[:] = q - dot(q, vcol, 1, 0) * (tau * vrow)
                    np0 = ext(t, k + 1, k)
                    np1 = ext(t, k + 2, k)
                    np2 = jnp.where(k + 3 < hi, ext(t, k + 3, k), 0.0)
                    return np0, np1, np2

                p0, p1, p2 = jax.lax.fori_loop(
                    lo, jnp.maximum(hi - 2, lo), step, (p0, p1, p2))
                # final 2-rotation clearing the exit bulge entry
                cs, sn = rot2(p0, p1)
                apply_rot2(hi - 2, cs, sn)

            stuck = jnp.where(dostd, 0, jnp.where(dochase, stuck + 1,
                                                  stuck))
            stuck = jnp.where(hi != hi_prev, 0, stuck)
            return it + 1, stuck, hi

        def cond(carry):
            it, stuck, hi_prev = carry
            return (hi_prev != 0) & (it < max_iter)

        jax.lax.while_loop(
            cond, body,
            (jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32),
             jnp.full((), -1, jnp.int32)))

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("max_iter_factor", "interpret"))
def schur_small(a, *, max_iter_factor: int = 40,
                interpret: bool = False):
    """Real Schur form of a small upper-HESSENBERG matrix, entirely in
    one kernel launch. Returns (t_raw, q, locked):

    t_raw: the converged (or iteration-capped) quasi-triangular T with
        bulge-chase roundoff below the first subdiagonal NOT cleaned —
        callers that need the convergence defect (la/schur.py `_aed`)
        measure tril(t_raw, −2) themselves.
    q: the accumulated orthogonal similarity (A = q·t·qᵀ).
    locked: (1, W) 0/1 mask of subdiagonal positions locked as
        converged complex 2×2 pairs.
    """
    W = a.shape[-1]
    kern = _make_kernel(W, max_iter_factor * W)
    t, q, lk = pl.pallas_call(
        kern,
        grid=(1,),
        in_specs=[pl.BlockSpec((W, W), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((W, W), lambda i: (0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((W, W), lambda i: (0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, W), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((W, W), a.dtype),
                   jax.ShapeDtypeStruct((W, W), a.dtype),
                   jax.ShapeDtypeStruct((1, W), a.dtype)),
        interpret=interpret,
    )(a)
    return t, q, lk
