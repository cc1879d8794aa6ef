"""Pallas kernel: latrd-style symmetric tridiagonalization panel.

One launch factors a whole 64-column panel of the trailing symmetric
block and applies the rank-2b two-sided update — replacing the XLA
fori-loop panel of la/sytrd.py whose ~15 small ops + full-HBM matvec
per column made the reduction the eigh-dc hog (measured 12.5 of
13.5 ms at f32 1024²; see NOTES_ROUND3).

Design (the reference has no symmetric eigensolver — TODO at
/root/reference/src/la/eigen.js:28-30; the panel recurrence is the
LAPACK latrd shape, built TPU-first):

  * the trailing block C stays VMEM-resident across all ``bk`` columns
    (one HBM read + one write per panel instead of one full C matvec
    stream per column),
  * C is EXACTLY symmetric (the rank-2 update preserves symmetry
    entrywise), so "column j" is the dynamic *sublane* row slice
    C[j, :] and every matvec C·v is computed lane-major as vᵀ·C —
    no transposed-layout bookkeeping, no dynamic lane indexing
    (Mosaic cannot index the lane dim; CLAUDE.md),
  * V and W panels live in VMEM refs (Bt, bk, m) row-per-reflector;
    reading natural-V row j (needed for the latrd correction
    c_j − V·Wᵀe_j − W·Vᵀe_j) is a broadcasted-iota masked reduction,
  * per column: 6 small MXU dots + O(1) VPU passes over (Bt, m) /
    (Bt, bk, m) tiles — ~1-2 µs vs ~12 µs for the XLA fori body,
  * the rank-2b update C ← C − V·Wᵀ − W·Vᵀ runs in-kernel as two
    (Bt, m, m) MXU contractions before the single writeback.

Dot precision: Mosaic lowers only DEFAULT (one-pass bf16) and HIGHEST
dots; reductions here feed 1e-5-tier eigh contracts, so dots default
to HIGHEST ('exact' plain dots for CPU interpret mode).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["sytrd_panel"]


def _sytrd_panel_kernel(bk, dot_mode, c_ref, out_ref, v_ref, w_ref,
                        tau_ref, d_ref, e_ref):
    Bt, m, _ = c_ref.shape
    dt = c_ref.dtype
    prec = jax.lax.Precision.HIGHEST if dot_mode == "highest" else None

    def dot(a, b, dims):
        return jax.lax.dot_general(a, b, dims, precision=prec,
                                   preferred_element_type=dt)

    # every vector stays rank-3 (Bt, 1, m)/(Bt, 1, bk): Mosaic dots
    # want explicit free dims on both operands
    cm_k = (((2,), (1,)), ((0,), (0,)))   # (Bt,1,bk)·(Bt,bk,m)→(Bt,1,m)
    cm_c = (((2,), (1,)), ((0,), (0,)))   # (Bt,1,m)·(Bt,m,m) →(Bt,1,m)
    cm_m = (((2,), (2,)), ((0,), (0,)))   # (Bt,1,m)·(Bt,bk,m)→(Bt,1,bk)

    lane3 = jax.lax.broadcasted_iota(jnp.int32, (Bt, 1, m), 2)
    lane3k = jax.lax.broadcasted_iota(jnp.int32, (Bt, bk, m), 2)
    sub2 = jax.lax.broadcasted_iota(jnp.int32, (Bt, bk), 1)

    v_ref[:] = jnp.zeros((Bt, bk, m), dt)
    w_ref[:] = jnp.zeros((Bt, bk, m), dt)

    def step(j, carry):
        taus, dd, ee = carry                        # (Bt, bk) each
        c = c_ref[:]                                # (Bt, m, m)
        V = v_ref[:]                                # (Bt, bk, m)
        W = w_ref[:]
        col = c_ref[pl.ds(0, Bt), pl.ds(j, 1), pl.ds(0, m)]  # (Bt,1,m)
        # natural-V/W row j (coefficients of finished reflectors at
        # lane j) — masked lane reductions, then the latrd correction
        vrow = jnp.sum(jnp.where(lane3k == j, V, 0.0), axis=2,
                       keepdims=True)               # (Bt, bk, 1)
        wrow = jnp.sum(jnp.where(lane3k == j, W, 0.0), axis=2,
                       keepdims=True)
        vrow = jnp.swapaxes(vrow, 1, 2)             # (Bt, 1, bk)
        wrow = jnp.swapaxes(wrow, 1, 2)
        col = col - dot(wrow, V, cm_k) - dot(vrow, W, cm_k)  # (Bt,1,m)
        dd = jnp.where(sub2 == j,
                       jnp.sum(jnp.where(lane3 == j, col, 0.0),
                               axis=2), dd)
        x0 = jnp.sum(jnp.where(lane3 == j + 1, col, 0.0), axis=2,
                     keepdims=True)                 # (Bt, 1, 1)
        sigma = jnp.sum(jnp.where(lane3 > j + 1, col * col, 0.0),
                        axis=2, keepdims=True)
        nrm = jnp.sqrt(x0 * x0 + sigma)
        beta = jnp.where(x0 >= 0, -nrm, nrm)
        beta = jnp.where(sigma == 0, x0, beta)      # no-op reflector
        den = x0 - beta
        safe_den = jnp.where(den == 0, 1.0, den)
        v = jnp.where(lane3 > j + 1, col / safe_den, 0.0)
        v = v + jnp.where(lane3 == j + 1, 1.0, 0.0).astype(dt)
        safe_beta = jnp.where(beta == 0, 1.0, beta)
        tau = jnp.where(sigma == 0, 0.0, (beta - x0) / safe_beta)
        ee = jnp.where(sub2 == j, beta[:, 0, :], ee)
        taus = jnp.where(sub2 == j, tau[:, 0, :], taus)
        # w = τ·(C·v − V·(Wᵀv) − W·(Vᵀv));  C symmetric ⇒ C·v = vᵀC
        cv = dot(v, c, cm_c)                        # (Bt, 1, m)
        cv = cv - dot(dot(v, W, cm_m), V, cm_k) \
            - dot(dot(v, V, cm_m), W, cm_k)
        w = tau * cv
        w = w - (0.5 * tau * jnp.sum(w * v, axis=2, keepdims=True)) * v
        v_ref[:, pl.ds(j, 1), :] = v
        w_ref[:, pl.ds(j, 1), :] = w
        return taus, dd, ee

    z = jnp.zeros((Bt, bk), dt)
    taus, dd, ee = jax.lax.fori_loop(0, bk, step, (z, z, z),
                                     unroll=False)
    # scalar outputs ride a sublane-padded (Bt, 8, bk) buffer: Mosaic
    # requires the last two block dims be (8k, 128k) or whole-array,
    # and (Bt, bk) blocks violate that whenever Bt < Nb (batched grid)
    tau_ref[:] = jnp.broadcast_to(taus[:, None, :], (Bt, 8, bk))
    d_ref[:] = jnp.broadcast_to(dd[:, None, :], (Bt, 8, bk))
    e_ref[:] = jnp.broadcast_to(ee[:, None, :], (Bt, 8, bk))
    # rank-2b two-sided update: C ← C − V·Wᵀ − W·Vᵀ (two MXU
    # contractions over the bk reflectors, one writeback)
    # V·Wᵀ as Σ_k Vt[k] ⊗ Wt[k]: contract the bk axis of both panels
    V = v_ref[:]
    W = w_ref[:]
    vwt = jax.lax.dot_general(
        jnp.swapaxes(V, 1, 2), W, (((2,), (1,)), ((0,), (0,))),
        precision=prec, preferred_element_type=dt)  # (Bt, m, m)
    wvt = jnp.swapaxes(vwt, 1, 2)
    out_ref[:] = c_ref[:] - vwt - wvt


def _budget_bt(per_mat_bytes):
    return max(1, (14 * 2 ** 20) // max(per_mat_bytes, 1))


@functools.partial(jax.jit, static_argnames=("bk", "interpret",
                                             "dot_mode"))
def sytrd_panel(c, bk: int, interpret: bool = False,
                dot_mode: str = "highest"):
    """latrd panel + in-kernel rank-2b trailing update, one launch.

    c: (Nb, m, m) exactly-symmetric trailing blocks. Returns
    (c_updated, V, W, taus, d, e): c_updated = C − V·Wᵀ − W·Vᵀ over the
    full (m, m) block (callers slice off the leading bk rows/cols),
    V/W (Nb, m, bk) natural layout, taus/d/e (Nb, bk)."""
    Nb, m, m2 = c.shape
    assert m == m2
    if interpret:
        dot_mode = "exact"
    # c_ref + out + vwt/wvt dot temporaries (~3 m·m live) + V/W + scalars
    per_mat = (5 * m * m + 4 * bk * m + 3 * bk) * c.dtype.itemsize
    bt = min(_budget_bt(per_mat), Nb)
    while Nb % bt != 0:
        bt -= 1
    grid = (Nb // bt,)
    out, vt, wt, taus, d, e = pl.pallas_call(
        functools.partial(_sytrd_panel_kernel, bk, dot_mode),
        grid=grid,
        in_specs=[pl.BlockSpec((bt, m, m), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((bt, m, m), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((bt, bk, m), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((bt, bk, m), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((bt, 8, bk), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((bt, 8, bk), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((bt, 8, bk), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(
            jax.ShapeDtypeStruct((Nb, m, m), c.dtype),
            jax.ShapeDtypeStruct((Nb, bk, m), c.dtype),
            jax.ShapeDtypeStruct((Nb, bk, m), c.dtype),
            jax.ShapeDtypeStruct((Nb, 8, bk), c.dtype),
            jax.ShapeDtypeStruct((Nb, 8, bk), c.dtype),
            jax.ShapeDtypeStruct((Nb, 8, bk), c.dtype),
        ),
        interpret=interpret,
    )(c)
    return (out, jnp.swapaxes(vt, 1, 2), jnp.swapaxes(wt, 1, 2),
            taus[:, 0], d[:, 0], e[:, 0])
