"""Pallas kernel: blocked complex xTREVC backward substitution.

Computes all eigenvector columns of (T − λ_k)·x_k = 0 for a (split-
complex) upper-triangular T in ONE kernel launch. The XLA blocked form
(la/schur.py::_trevc_backsub_blocked) is dispatch-bound: its in-block
recurrence issues ~12 XLA ops per row — ~87 ms at 1024² (measured),
virtually all launch overhead. Here the whole solve runs in VMEM:

  * grid over 64-row blocks, bottom-up; the solution matrix x (re, im)
    is a VMEM-resident output revisited by every grid step (~8 MB at
    1024² — inside the ~16 MB/core budget),
  * per block, the below-block accumulation T[b, b1:]·x[b1:, :] is one
    masked complex MXU contraction (the lane mask replaces a dynamic-
    size slice, which Mosaic cannot express),
  * the in-block recurrence keeps a running accumulator: after row i is
    solved, acc += T[block, i]·x_i — outer-product VPU passes on
    (64, n) values carried through the loop, zero ref traffic,
  * LAPACK xTREVC semantics exactly as the XLA path: eps-clamped
    near-singular pivots (repeated eigenvalues amplify the earlier
    eigendirection — the reference's defective fallback seam,
    schur.js:188-203) and per-column growth rescaling with the scale
    factor propagated to finished rows once per block.

Used by la/schur.py::schur_eigen for n > 128 with n % 64 == 0 (the
XLA blocked path remains the fallback and the CI reference).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["trevc_solve"]

_NB = 64


def _trevc_kernel(nblocks, n, tre_ref, tim_ref, par_ref, xre_ref,
                  xim_ref):
    nb = _NB
    g = pl.program_id(0)
    b0 = (nblocks - 1 - g) * nb
    dt = tre_ref.dtype

    @pl.when(g == 0)
    def _init():
        # uninitialized VMEM could hold NaN/inf, and the masked GEMM's
        # 0·junk would propagate it — zero in chunks (scoped-VMEM)
        for c0 in range(0, n, nb):
            xre_ref[pl.ds(c0, nb), pl.ds(0, n)] = \
                jnp.zeros((nb, n), dt)
            xim_ref[pl.ds(c0, nb), pl.ds(0, n)] = \
                jnp.zeros((nb, n), dt)

    lam = (par_ref[0:1, :], par_ref[1:2, :])                 # (1, n)
    smallnum = par_ref[2:3, 0:1]                             # (1, 1)
    bignum = par_ref[3:4, 0:1]

    lane_nb = jax.lax.broadcasted_iota(jnp.int32, (nb, n), 1)
    sub_nb = jax.lax.broadcasted_iota(jnp.int32, (nb, n), 0)
    coln = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)

    tre = tre_ref[:]                                         # (nb, n)
    tim = tim_ref[:]
    # below-block accumulation: mask the row block to columns ≥ b1 and
    # contract with the (already final) lower rows of x — one complex
    # GEMM, CHUNKED over x row-blocks so no full (n, n) value is ever
    # live (the scoped-VMEM stack is ~16 MB; a live x copy is 4 MB per
    # part and the fused temporaries blew 39 MB at 1024²)
    mask_b = (lane_nb >= b0 + nb).astype(dt)
    tbr = tre * mask_b
    tbi = tim * mask_b
    dims = (((1,), (0,)), ((), ()))

    def dg(a, b):
        return jax.lax.dot_general(a, b, dims,
                                   precision=jax.lax.Precision.HIGHEST,
                                   preferred_element_type=dt)

    CH = 128 if n % 128 == 0 else _NB
    acc_re = jnp.zeros((nb, n), dt)
    acc_im = jnp.zeros((nb, n), dt)
    for c0 in range(0, n, CH):
        tbr_c = tbr[:, c0:c0 + CH]
        tbi_c = tbi[:, c0:c0 + CH]
        xr_c = xre_ref[pl.ds(c0, CH), pl.ds(0, n)]
        xi_c = xim_ref[pl.ds(c0, CH), pl.ds(0, n)]
        acc_re = acc_re + dg(tbr_c, xr_c) - dg(tbi_c, xi_c)
        acc_im = acc_im + dg(tbr_c, xi_c) + dg(tbi_c, xr_c)

    ones_1n = jnp.ones((1, n), dt)

    def row_step(s, carry):
        xbre, xbim, are, aim, ftot = carry
        il = nb - 1 - s
        i = b0 + il
        # row il of the in-block accumulator / T row (sublane masks)
        m_il = sub_nb == il
        arow_re = jnp.sum(jnp.where(m_il, are, 0.0), axis=0,
                          keepdims=True)                     # (1, n)
        arow_im = jnp.sum(jnp.where(m_il, aim, 0.0), axis=0,
                          keepdims=True)
        trow_re = jnp.sum(jnp.where(m_il, tre, 0.0), axis=0,
                          keepdims=True)
        trow_im = jnp.sum(jnp.where(m_il, tim, 0.0), axis=0,
                          keepdims=True)
        tii_re = jnp.sum(jnp.where(coln == i, trow_re, 0.0), axis=1,
                         keepdims=True)                      # (1, 1)
        tii_im = jnp.sum(jnp.where(coln == i, trow_im, 0.0), axis=1,
                         keepdims=True)
        den_re = tii_re - lam[0]
        den_im = tii_im - lam[1]
        cab = jnp.sqrt(den_re * den_re + den_im * den_im)
        small = cab <= smallnum
        den_re = jnp.where(small, smallnum, den_re)
        den_im = jnp.where(small, 0.0, den_im)
        d2 = den_re * den_re + den_im * den_im
        xi_re = (-arow_re * den_re - arow_im * den_im) / d2
        xi_im = (-arow_im * den_re + arow_re * den_im) / d2
        xi_re = jnp.where(coln > i, xi_re,
                          jnp.where(coln == i, 1.0, 0.0))
        xi_im = jnp.where(coln > i, xi_im, 0.0)
        m = jnp.maximum(jnp.abs(xi_re), jnp.abs(xi_im))
        f = jnp.where(m > bignum, 1.0 / jnp.where(m > bignum, m, 1.0),
                      ones_1n)
        xi_re = xi_re * f
        xi_im = xi_im * f
        xbre = jnp.where(m_il, xi_re, xbre * f)
        xbim = jnp.where(m_il, xi_im, xbim * f)
        # running in-block accumulation: T[block, i] ⊗ x_i lands on the
        # rows still unsolved (sublane < il)
        tcol_re = jnp.sum(jnp.where(lane_nb == i, tre, 0.0), axis=1,
                          keepdims=True)                     # (nb, 1)
        tcol_im = jnp.sum(jnp.where(lane_nb == i, tim, 0.0), axis=1,
                          keepdims=True)
        upd_re = tcol_re * xi_re - tcol_im * xi_im
        upd_im = tcol_re * xi_im + tcol_im * xi_re
        live = sub_nb < il
        are = jnp.where(live, are * f + upd_re, are)
        aim = jnp.where(live, aim * f + upd_im, aim)
        return xbre, xbim, are, aim, ftot * f

    z_nb = jnp.zeros((nb, n), dt)
    xbre, xbim, _, _, ftot = jax.lax.fori_loop(
        0, nb, row_step, (z_nb, z_nb, acc_re, acc_im, ones_1n),
        unroll=False)
    # commit the block; finished rows below pick up this block's
    # accumulated column scaling (chunked — see the scoped-VMEM note)
    for c0 in range(0, n, CH):
        sub_c = c0 + jax.lax.broadcasted_iota(jnp.int32, (CH, n), 0)
        scale = jnp.where(sub_c >= b0 + nb, ftot, 1.0)
        xre_ref[pl.ds(c0, CH), pl.ds(0, n)] = \
            xre_ref[pl.ds(c0, CH), pl.ds(0, n)] * scale
        xim_ref[pl.ds(c0, CH), pl.ds(0, n)] = \
            xim_ref[pl.ds(c0, CH), pl.ds(0, n)] * scale
    xre_ref[pl.ds(b0, nb), pl.ds(0, n)] = xbre
    xim_ref[pl.ds(b0, nb), pl.ds(0, n)] = xbim


@functools.partial(jax.jit, static_argnames=("interpret",))
def trevc_solve(tc_re, tc_im, lam_re, lam_im, smallnum, bignum,
                interpret: bool = False):
    """All-column backward substitution for the triangular eigenvector
    problem (see module docstring). tc: (n, n) split-complex upper
    triangular; lam: (n,) diagonal eigenvalues; smallnum/bignum: the
    xTREVC clamping and growth thresholds (scalars). Returns x (re, im)
    with x[k, k] = 1 (up to growth rescaling), x[j > k, k] = 0."""
    n = tc_re.shape[-1]
    assert n % _NB == 0, "trevc_solve needs n % 64 == 0"
    nblocks = n // _NB
    dt = tc_re.dtype
    par = jnp.stack([
        lam_re.astype(dt), lam_im.astype(dt),
        jnp.full((n,), smallnum, dt), jnp.full((n,), bignum, dt)])
    xre, xim = pl.pallas_call(
        functools.partial(_trevc_kernel, nblocks, n),
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((_NB, n), lambda g: (nblocks - 1 - g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_NB, n), lambda g: (nblocks - 1 - g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, n), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec((n, n), lambda g: (0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((n, n), lambda g: (0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((n, n), dt),
                   jax.ShapeDtypeStruct((n, n), dt)),
        interpret=interpret,
    )(tc_re, tc_im, par)
    return xre, xim
