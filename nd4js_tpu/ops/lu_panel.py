"""Pallas kernel: LU panel factorisation, transposed layout.

VMEM-resident partially-pivoted panel factorisation
(ref: /root/reference/src/la/lu.js:34-81); the panel lives in VMEM
TRANSPOSED — (Bt, B, M): panel columns on sublanes, matrix rows on
lanes — which fixes both measured bottlenecks of the earlier designs:

  * the earlier natural-layout kernel paid ~5 full (Bt, M, B) masked passes per pivot step
    (~8.6 µs/step — column extraction, two row extractions, fused
    swap+update) because the lane dim cannot be dynamically indexed;
    here the pivot COLUMN is one dynamic-start *sublane* read (legal in
    Mosaic) and the pivot "row" is a lane vector that never moves,
  * a stripe-delayed variant on the natural layout lost 4× to
    non-128-aligned lane slices; sublane slices at 8-aligned stripe
    boundaries are free.

Virtual pivoting: rows (lanes) never move; ``rank[t, i]`` records the
step at which row i was chosen (B if never — an L row). Per step the
in-stripe update touches (Bt, w≤8, M); each stripe's eight rank-1
updates hit the remaining sublanes once, walked in step order so the
triangular dependency resolves exactly.

Returns (panel_factored (Nb, M, B) — rows in input order, transposed
back — and rank (Nb, M)). Sorting rows by (rank, original index)
yields the LAPACK-packed LU with ``panel_in[t, perm[t]] = L @ U``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["lu_panel"]

_STRIPE = 8


def _lu_panel_kernel(at_ref, out_ref, rank_ref):
    Bt, B, M = at_ref.shape
    lane2 = jax.lax.broadcasted_iota(jnp.int32, (Bt, M), 1)   # rows

    out_ref[:] = at_ref[:]
    rank_ref[:] = jnp.full((Bt, M), B, jnp.int32)

    for s0 in range(0, B, _STRIPE):
        w = min(_STRIPE, B - s0)
        sub_w = jax.lax.broadcasted_iota(jnp.int32, (Bt, w, 1), 1)

        def step(jl, _):
            j = s0 + jl
            rank = rank_ref[:]
            unused = rank >= B                                # (Bt, M)
            col = out_ref[pl.ds(0, Bt), pl.ds(j, 1), pl.ds(0, M)]
            col = col[:, 0, :]                                # (Bt, M)
            cand = jnp.where(unused, jnp.abs(col), -1.0)
            cmax = jnp.max(cand, axis=1, keepdims=True)
            p = jnp.min(jnp.where(cand == cmax, lane2, M), axis=1) \
                .astype(jnp.int32)                            # (Bt,)
            is_p = lane2 == p[:, None]                        # (Bt, M)
            piv = jnp.sum(jnp.where(is_p, col, 0.0), axis=1)  # (Bt,)
            safe = jnp.where(piv == 0.0, 1.0, piv)
            l = jnp.where(unused & ~is_p, col / safe[:, None], 0.0)
            # finalize column j: L entries on unused rows, pivot/used
            # rows keep their (already final) U values
            newcol = jnp.where(unused & ~is_p, l, col)
            out_ref[pl.ds(0, Bt), pl.ds(j, 1), pl.ds(0, M)] = \
                newcol[:, None, :]
            # in-stripe rank-1 update of columns (j, s0+w)
            stripe = out_ref[:, s0:s0 + w, :]                 # (Bt, w, M)
            # 3-D masks from 32-bit comparisons (Mosaic cannot
            # dim-expand i1 vectors)
            u_str = jnp.sum(
                jnp.where(lane2[:, None, :] == p[:, None, None], stripe,
                          0.0), axis=2)                       # (Bt, w)
            live = (rank[:, None, :] >= B) \
                & (lane2[:, None, :] != p[:, None, None])
            upd = stripe - u_str[:, :, None] * l[:, None, :]
            out_ref[:, s0:s0 + w, :] = \
                jnp.where((sub_w > jl) & live, upd, stripe)
            rank_ref[:] = jnp.where(is_p, j, rank)
            return 0

        jax.lax.fori_loop(0, w, step, 0, unroll=False)

        if s0 + w < B:
            rest_h = B - s0 - w
            for a_loc in range(w):
                # pivot row of step s0+a_loc: its rest-column values are
                # read AFTER updates from earlier pivots landed — the
                # triangular resolution
                rank = rank_ref[:]
                mask_p = rank[:, None, :] == s0 + a_loc       # (Bt,1,M)
                rest = out_ref[:, s0 + w:, :]                 # (Bt,R,M)
                u_a = jnp.sum(jnp.where(mask_p, rest, 0.0),
                              axis=2)                         # (Bt, R)
                l_a = out_ref[:, s0 + a_loc, :]               # (Bt, M)
                touch = (rank >= B) | (rank > s0 + a_loc)
                l_a = jnp.where(touch & (rank != s0 + a_loc), l_a, 0.0)
                out_ref[:, s0 + w:, :] = \
                    rest - u_a[:, :, None] * l_a[:, None, :]


@functools.partial(jax.jit, static_argnames=("interpret", "batch_tile"))
def lu_panel(panel, interpret: bool = False, batch_tile: int = 32):
    """Factor a batched panel (N_b, M, B) in VMEM (transposed layout).

    Returns (LU_panel, rank): rows in input order; see module
    docstring for the rank/reorder contract."""
    Nb, M, B = panel.shape
    per_mat = (2 * M * B + M) * 4 * 2
    bt_budget = max(1, (10 * 2 ** 20) // per_mat)
    bt = min(batch_tile, bt_budget, Nb)
    if bt < Nb:
        bt = max(8 * (bt // 8), min(8, Nb)) if Nb >= 8 else Nb
    if Nb % bt != 0:
        pad = (-Nb) % bt
        panel = jnp.concatenate(
            [panel, jnp.zeros((pad, M, B), panel.dtype)], axis=0)
        out, rank = lu_panel(panel, interpret=interpret, batch_tile=bt)
        return out[:Nb], rank[:Nb]
    at = jnp.swapaxes(panel, -1, -2)                  # (Nb, B, M)
    grid = (panel.shape[0] // bt,)
    out_t, rank = pl.pallas_call(
        _lu_panel_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((bt, B, M), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((bt, B, M), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((bt, M), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(
            jax.ShapeDtypeStruct((panel.shape[0], B, M), panel.dtype),
            jax.ShapeDtypeStruct((panel.shape[0], M), jnp.int32),
        ),
        interpret=interpret,
    )(at)
    return jnp.swapaxes(out_t, -1, -2), rank
