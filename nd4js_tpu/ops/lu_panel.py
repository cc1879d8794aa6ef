"""Pallas kernel: partially-pivoted LU panel factorisation.

The sequential column loop of LU (ref: /root/reference/src/la/lu.js:34-81)
is HBM-bound when expressed as an XLA ``fori_loop`` — every step streams
the whole batched panel through HBM (measured 180 ms for 1024×128² vs
<10 ms here). This kernel keeps the (Bt, M, B) panel resident in VMEM
for all B steps.

Mosaic constraint: the lane (last) dimension cannot be dynamically
indexed, so column extraction / pivot-row swaps / L-writeback are done
with broadcasted-iota masked blends — full-tile VPU ops instead of
scalar loads, which is exactly how the VPU wants it.

Returns (panel_factored, pivots): pivots[t, j] is the *local* row index
swapped with row j at step j (LAPACK ipiv convention, 0-based). The
caller replays the swaps on the rest of the matrix.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["lu_panel"]


def _lu_panel_kernel(a_ref, out_ref, perm_ref):
    Bt, M, B = a_ref.shape
    row2 = jax.lax.broadcasted_iota(jnp.int32, (Bt, M), 1)         # rows
    row3 = jax.lax.broadcasted_iota(jnp.int32, (Bt, M, 1), 1)
    lane3 = jax.lax.broadcasted_iota(jnp.int32, (Bt, 1, B), 2)
    lane2 = jax.lax.broadcasted_iota(jnp.int32, (Bt, B), 1)

    out_ref[:] = a_ref[:]
    perm_ref[:] = row2

    def body(j, _):
        a = out_ref[:]
        # pass 1: column j and pivot rows j/p (lane/row-masked reduces)
        col = jnp.sum(jnp.where(lane3 == j, a, 0.0), axis=2)        # (Bt, M)
        cand = jnp.where(row2 >= j, jnp.abs(col), -1.0)
        # manual argmax (Mosaic lacks an argmax lowering): max, then the
        # smallest row index attaining it
        cmax = jnp.max(cand, axis=1, keepdims=True)
        p = jnp.min(jnp.where(cand == cmax, row2, M), axis=1) \
            .astype(jnp.int32)                                      # (Bt,)
        is_j2 = row2 == j
        is_p2 = row2 == p[:, None]
        perm = perm_ref[:]
        pj = jnp.sum(jnp.where(is_j2, perm, 0), axis=1)             # (Bt,)
        pp = jnp.sum(jnp.where(is_p2, perm, 0), axis=1)
        perm_ref[:] = jnp.where(is_j2, pp[:, None],
                                jnp.where(is_p2, pj[:, None], perm))
        is_j = row3 == j
        is_p = row3 == p[:, None, None]
        # pass 2: both pivot rows in one traversal
        rowj = jnp.sum(jnp.where(is_j, a, 0.0), axis=1)             # (Bt, B)
        rowp = jnp.sum(jnp.where(is_p, a, 0.0), axis=1)             # (Bt, B)
        # swapped column j (vector-level, no matrix traversal)
        colj = jnp.sum(jnp.where(is_j2, col, 0.0), axis=1)          # (Bt,)
        colp = jnp.sum(jnp.where(is_p2, col, 0.0), axis=1)
        col = jnp.where(is_j2, colp[:, None],
                        jnp.where(is_p2, colj[:, None], col))
        pv = colp
        safe = jnp.where(pv == 0.0, 1.0, pv)
        l = jnp.where(row2 > j, col / safe[:, None], 0.0)           # (Bt, M)
        urow = jnp.where(lane2 > j, rowp, 0.0)                      # (Bt, B)
        # pass 3: swap + rank-1 update + L write-back fused into one
        # composite select expression over the matrix
        swapped = jnp.where(is_j, rowp[:, None, :],
                            jnp.where(is_p, rowj[:, None, :], a))
        updated = swapped - l[:, :, None] * urow[:, None, :]
        out_ref[:] = jnp.where((lane3 == j) & (row3 > j),
                               l[:, :, None], updated)
        return 0

    jax.lax.fori_loop(0, min(B, M), body, 0, unroll=False)


@functools.partial(jax.jit, static_argnames=("interpret", "batch_tile"))
def lu_panel(panel, interpret: bool = False, batch_tile: int = 32):
    """Factor a batched panel (N_b, M, B) in VMEM, tiled over the batch.

    Returns (LU_panel, perm (N_b, M) int32) with
    ``panel_in[t, perm[t]] = L@U`` per batch element. The batch is
    processed in VMEM-resident tiles of ``batch_tile`` (grid-pipelined by
    Mosaic, so HBM↔VMEM transfers overlap compute).
    """
    Nb, M, B = panel.shape
    # VMEM budget: in + out (+ pipelining headroom) under ~10 MB
    per_mat = (2 * M * B + M) * 4 * 2
    bt_budget = max(1, (10 * 2 ** 20) // per_mat)
    bt = min(batch_tile, bt_budget, Nb)
    # 2-D outputs need a sublane-divisible batch tile (multiple of 8,
    # or the whole batch)
    if bt < Nb:
        bt = max(8 * (bt // 8), min(8, Nb)) if Nb >= 8 else Nb
    if Nb % bt != 0:
        # pad the batch to a tile multiple
        pad = (-Nb) % bt
        panel = jnp.concatenate(
            [panel, jnp.zeros((pad, M, B), panel.dtype)], axis=0)
        out, perm = lu_panel(panel, interpret=interpret, batch_tile=bt)
        return out[:Nb], perm[:Nb]
    grid = (panel.shape[0] // bt,)
    out, perm = pl.pallas_call(
        _lu_panel_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((bt, M, B), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((bt, M, B), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((bt, M), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(
            jax.ShapeDtypeStruct((panel.shape[0], M, B), panel.dtype),
            jax.ShapeDtypeStruct((panel.shape[0], M), jnp.int32),
        ),
        interpret=interpret,
    )(panel)
    return out, perm
