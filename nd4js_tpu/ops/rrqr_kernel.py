"""Pallas kernel: full column-pivoted Householder QR, VMEM-resident.

The rank-revealing factor loop (la/rrqr.py `_rrqr_factor`) is HBM-bound
as an XLA fori_loop. Unlike LU/QR, column pivoting is *global* — every
step may pull any trailing column — so it cannot be panel-blocked; this
kernel instead keeps the whole (Bt, M, N) matrix, the reflector store
and the downdated column norms resident in VMEM for all K steps.

The squared column norms are *downdated* after each reflector
(‖c‖² ← ‖c‖² − r²) exactly like the reference
(/root/reference/src/la/rrqr.js:29-55), with the reference's
cancellation guard replaced by a periodic-free clamp: norms are
recomputed from scratch only once (entry), and the pivot decision only
needs relative order, for which the clamped downdate is adequate; the
final R diagonal (which rank decisions use) comes from the actual
reflector betas.

Outputs (R_packed, V, taus, perm): A[:, perm] = Q·R with
Q = H_0···H_{K−1} = I − V·T·Vᵀ (T via la/qr._form_t_batched).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["rrqr_kernel"]


def _rrqr_kernel(a_ref, r_ref, v_ref, tau_ref, perm_ref, norm_ref):
    Bt, M, N = a_ref.shape
    K = min(M, N)
    row2 = jax.lax.broadcasted_iota(jnp.int32, (Bt, M), 1)
    row3 = jax.lax.broadcasted_iota(jnp.int32, (Bt, M, 1), 1)
    lane3 = jax.lax.broadcasted_iota(jnp.int32, (Bt, 1, N), 2)
    lane2 = jax.lax.broadcasted_iota(jnp.int32, (Bt, N), 1)
    lane3k = jax.lax.broadcasted_iota(jnp.int32, (Bt, 1, K), 2)
    lane3n = jax.lax.broadcasted_iota(jnp.int32, (Bt, 1, N), 2)

    r_ref[:] = a_ref[:]
    v_ref[:] = jnp.zeros((Bt, M, K), a_ref.dtype)
    # small per-column outputs are (Bt, 8, ...) so a batch tile of 1 is
    # tile-legal; only sublane 0 is meaningful
    tau_ref[:] = jnp.zeros((Bt, 8, K), a_ref.dtype)
    perm_ref[:] = jnp.broadcast_to(lane3n, (Bt, 8, N))
    norm_ref[:] = jnp.broadcast_to(
        jnp.sum(a_ref[:] * a_ref[:], axis=1)[:, None, :], (Bt, 8, N))

    def body(j, _):
        a = r_ref[:]
        norms = jnp.maximum(norm_ref[:, 0, :], 0.0)
        # pivot: trailing column of largest downdated norm
        cand = jnp.where(lane2 >= j, norms, -1.0)
        cmax = jnp.max(cand, axis=1, keepdims=True)
        p = jnp.min(jnp.where(cand == cmax, lane2, N), axis=1) \
            .astype(jnp.int32)                            # (Bt,)
        # swap columns j <-> p (matrix, perm, norms)
        is_j = lane3 == j
        is_p = lane3 == p[:, None, None]
        colj = jnp.sum(jnp.where(is_j, a, 0.0), axis=2)   # (Bt, M)
        colp = jnp.sum(jnp.where(is_p, a, 0.0), axis=2)
        a = jnp.where(is_j, colp[:, :, None],
                      jnp.where(is_p, colj[:, :, None], a))
        is_j2 = lane2 == j
        is_p2 = lane2 == p[:, None]
        perm = perm_ref[:, 0, :]
        pj = jnp.sum(jnp.where(is_j2, perm, 0), axis=1)
        pp = jnp.sum(jnp.where(is_p2, perm, 0), axis=1)
        perm = jnp.where(is_j2, pp[:, None],
                         jnp.where(is_p2, pj[:, None], perm))
        perm_ref[:] = jnp.broadcast_to(perm[:, None, :],
                                       perm_ref.shape)
        nj = jnp.sum(jnp.where(is_j2, norms, 0.0), axis=1)
        np_ = jnp.sum(jnp.where(is_p2, norms, 0.0), axis=1)
        norms = jnp.where(is_j2, np_[:, None],
                          jnp.where(is_p2, nj[:, None], norms))
        # Householder on (swapped) column j, rows >= j
        x = colp                                           # new column j
        x0 = jnp.sum(jnp.where(row2 == j, x, 0.0), axis=1)
        sigma = jnp.sum(jnp.where(row2 > j, x * x, 0.0), axis=1)
        nrm = jnp.sqrt(x0 * x0 + sigma)
        beta = jnp.where(x0 >= 0, -nrm, nrm)
        den = x0 - beta
        safe_den = jnp.where(den == 0, 1.0, den)
        v = jnp.where(row2 > j, x / safe_den[:, None], 0.0)
        v = jnp.where(row2 == j, 1.0, v)
        safe_beta = jnp.where(beta == 0, 1.0, beta)
        tau = jnp.where(nrm == 0, 0.0, (beta - x0) / safe_beta)
        w = tau[:, None] * jnp.sum(a * v[:, :, None], axis=1)  # (Bt, N)
        w = jnp.where(lane2 > j, w, 0.0)
        a = a - v[:, :, None] * w[:, None, :]
        # write column j = beta·e_j (keep R above); store reflector
        newc = jnp.where(row2 == j, beta[:, None],
                         jnp.where(row2 < j, x, 0.0))
        a = jnp.where(is_j, newc[:, :, None], a)
        r_ref[:] = a
        v_ref[:] = jnp.where(lane3[:, :, :K] == j, v[:, :, None],
                             v_ref[:])
        tau_ref[:] = jnp.where(lane3k == j, tau[:, None, None],
                               tau_ref[:])
        # downdate trailing norms by the new R row j: ‖c‖² −= r_jc²
        rrow = jnp.sum(jnp.where(row3 == j, a, 0.0), axis=1)   # (Bt, N)
        norms = jnp.where(lane2 > j, norms - rrow * rrow, norms)
        norm_ref[:] = jnp.broadcast_to(norms[:, None, :], norm_ref.shape)
        return 0

    jax.lax.fori_loop(0, K, body, 0, unroll=False)


@functools.partial(jax.jit, static_argnames=("interpret", "batch_tile"))
def rrqr_kernel(a, interpret: bool = False, batch_tile: int = 8):
    """Column-pivoted Householder factorisation of (Nb, M, N), fully
    VMEM-resident. Returns (R_packed, V, taus, perm)."""
    Nb, M, N = a.shape
    K = min(M, N)
    per_mat = (2 * M * N + M * K + 24 * N + 8 * K) * 4 * 2
    bt_budget = max(1, (10 * 2 ** 20) // per_mat)
    bt = min(batch_tile, bt_budget, Nb)
    if Nb % bt != 0:
        pad = (-Nb) % bt
        a = jnp.concatenate([a, jnp.zeros((pad, M, N), a.dtype)], 0)
        r, v, t, p = rrqr_kernel(a, interpret=interpret, batch_tile=bt)
        return r[:Nb], v[:Nb], t[:Nb], p[:Nb]
    grid = (a.shape[0] // bt,)
    r, v, t, p, _ = pl.pallas_call(
        _rrqr_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((bt, M, N), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((bt, M, N), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, M, K), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 8, K), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 8, N), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 8, N), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((a.shape[0], M, N), a.dtype),
            jax.ShapeDtypeStruct((a.shape[0], M, K), a.dtype),
            jax.ShapeDtypeStruct((a.shape[0], 8, K), a.dtype),
            jax.ShapeDtypeStruct((a.shape[0], 8, N), jnp.int32),
            jax.ShapeDtypeStruct((a.shape[0], 8, N), a.dtype),
        ),
        interpret=interpret,
    )(a)
    return r, v, t[:, 0, :], p[:, 0, :]
