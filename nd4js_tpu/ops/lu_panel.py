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

__all__ = ["lu_panel", "lu_gesv"]

_STRIPE = 8


def _stripe_rest_gemm(out_ref, rank_ref, s0: int, w: int,
                      exact_dots: bool = False):
    """Deferred rank-w update of the rest region (columns s0+w..BT) as
    MXU contractions instead of w sequential masked VPU passes.

    The stripe's pivot rows in the rest region must resolve their
    triangular interdependence (pivot a's U-row is read after updates
    from pivots b < a landed). Extract the w pivot rows r8 and the w×w
    coupling T8 with one-hot lane contractions, invert the unit-lower
    (I + T8) by the telescoped Neumann product (T8 is strictly lower ⇒
    nilpotent), and apply ONE rank-w GEMM to the whole rest region:
    3 memory passes over rest instead of ~3·w.
    """
    Bt, BT, M = out_ref.shape
    dt = out_ref.dtype
    rank = rank_ref[:]                                      # (Bt, M)
    steps = s0 + jax.lax.broadcasted_iota(jnp.int32, (Bt, w, 1), 1)
    onehot = (rank[:, None, :] == steps).astype(dt)         # (Bt, w, M)
    # L columns of the stripe, masked to rows not yet consumed by step
    # s0+a (unused rows and later-pivoted rows keep their l values)
    lmask = rank[:, None, :] > steps
    l8 = jnp.where(lmask, out_ref[:, s0:s0 + w, :], 0.0)    # (Bt, w, M)
    rest = out_ref[:, s0 + w:, :]                           # (Bt, R, M)
    # The MXU's native multiply truncates f32 to bf16 (measured resid
    # 4.9e-3 vs 4.3e-6 on the cfg2 SPD batch at default dot precision),
    # and Mosaic lowers only DEFAULT and HIGHEST (6-pass) dots. Manual
    # bf16 splitting gets the bf16_3x middle ground: the one-hot
    # extraction contractions are EXACT in 2 passes (0/1 coefficients
    # are bf16-exact, so oh·xh + oh·xl reconstructs x's f32 value), and
    # the rank-w update runs the 3-pass ah·bh + ah·bl + al·bh with
    # ~1.2e-5 relative error — inside every downstream gate.
    # ``exact_dots`` skips the splitting where the hardware dot is
    # already exact (CPU interpret mode — where f64 inputs would be
    # DESTROYED by a bf16 split, and f32 gains nothing from it).
    def _split(x):
        hi = x.astype(jnp.bfloat16).astype(dt)
        return hi, x - hi

    def _dg(a, b, dims):
        return jax.lax.dot_general(a, b, dims,
                                   preferred_element_type=dt)

    def _dot_onehot(oh, x, dims):
        if exact_dots:
            return _dg(oh, x, dims)
        xh, xl = _split(x)
        return _dg(oh, xh, dims) + _dg(oh, xl, dims)

    def _dot3(a, b, dims):
        if exact_dots:
            return _dg(a, b, dims)
        ah, al = _split(a)
        bh, bl = _split(b)
        return (_dg(ah, bl, dims) + _dg(al, bh, dims)) \
            + _dg(ah, bh, dims)

    cm = (((2,), (2,)), ((0,), (0,)))                       # contract lanes
    r8 = _dot_onehot(onehot, rest, cm)                      # (Bt, w, R)
    T8 = _dot_onehot(onehot, l8, cm)                        # (Bt, w, w)

    def mmb(a, b):
        return _dot3(a, b, (((2,), (1,)), ((0,), (0,))))

    X = jnp.eye(w, dtype=dt)[None] - T8
    S = T8
    span = 2
    while span < w:
        S = mmb(S, S)
        X = X + mmb(X, S)
        span *= 2
    u8 = mmb(X, r8)                                         # (Bt, w, R)
    upd = _dot3(u8, l8, (((1,), (1,)), ((0,), (0,))))       # (Bt, R, M)
    out_ref[:, s0 + w:, :] = rest - upd


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

        # deferred rest update: the sequential masked-VPU passes. The
        # MXU rank-w variant (_stripe_rest_gemm) measured SLOWER here
        # (3.13 vs 2.70 ms at 32×512², 6-pass f32 dots over ≤120-column
        # rest regions) and its 3-pass bf16 form broke the 512-suite
        # reconstruction gate (1.5e-3 vs 1.18e-3 — element growth
        # amplifies the 1.2e-5 dot error); the gesv kernel, whose rest
        # region spans the RHS and whose 128² gates are loose, uses it.
        if s0 + w < B:
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


def _lu_gesv_kernel(n_pivot, n_rhs, exact_dots, at_ref, out_ref, rank_ref, x_ref):
    """Fused gesv: partial-pivot elimination over the first ``n_pivot``
    columns of a square system WITH the RHS appended as extra sublane
    columns — forward substitution rides the elimination for free — then
    in-kernel back substitution in the virtual-pivot layout.

    at_ref: (Bt, BT, M) transposed [A | y] with BT = n_pivot + K rhs
    columns (sublanes) and M = n_pivot rows (lanes). Outputs: the
    factored buffer (same layout), rank (Bt, M) as in _lu_panel_kernel,
    and x (Bt, K, M): x[:, k, j] = solution component j of RHS k.
    """
    B = n_pivot
    Bt, BT, M = at_ref.shape
    K = n_rhs          # real RHS columns; BT − B − K are alignment pads
    lane2 = jax.lax.broadcasted_iota(jnp.int32, (Bt, M), 1)   # rows

    out_ref[:] = at_ref[:]
    rank_ref[:] = jnp.full((Bt, M), B, jnp.int32)

    # ---- elimination (identical control structure to _lu_panel_kernel,
    # but the deferred "rest" updates run through the RHS columns too,
    # so after the last stripe the RHS holds z with L·z = P·y) ----
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
            newcol = jnp.where(unused & ~is_p, l, col)
            out_ref[pl.ds(0, Bt), pl.ds(j, 1), pl.ds(0, M)] = \
                newcol[:, None, :]
            stripe = out_ref[:, s0:s0 + w, :]                 # (Bt, w, M)
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

        # rest region now includes the RHS columns (s0 + w .. BT)
        _stripe_rest_gemm(out_ref, rank_ref, s0, w,
                          exact_dots=exact_dots)

    # ---- back substitution: column-oriented, virtual-pivot layout.
    # For j = B−1..0: x_j = z_(row with rank j) / U_jj, then subtract
    # x_j·U[:, j] from the z entries of rows still unsolved (rank < j).
    # U[:, j] is one dynamic *sublane* read — rows never move. ----
    x_ref[:] = jnp.zeros(x_ref.shape, out_ref.dtype)
    rankv = rank_ref[:]

    def bs_step(i, _):
        j = B - 1 - i
        ucol = out_ref[pl.ds(0, Bt), pl.ds(j, 1), pl.ds(0, M)][:, 0, :]
        is_j = rankv == j                                     # (Bt, M)
        diag = jnp.sum(jnp.where(is_j, ucol, 0.0), axis=1)    # (Bt,)
        for k in range(K):
            rhs = out_ref[:, B + k, :]                        # (Bt, M)
            zj = jnp.sum(jnp.where(is_j, rhs, 0.0), axis=1)
            xj = zj / diag          # inf/nan on singular, like lu.js
            out_ref[:, B + k, :] = \
                jnp.where(rankv < j, rhs - xj[:, None] * ucol, rhs)
            xk = x_ref[:, k, :]
            x_ref[:, k, :] = jnp.where(lane2 == j, xj[:, None], xk)
        return 0

    jax.lax.fori_loop(0, B, bs_step, 0, unroll=False)


@functools.partial(jax.jit, static_argnames=("interpret", "batch_tile"))
def lu_gesv(a, y, interpret: bool = False, batch_tile: int = 64):
    """Fused batched solve A·x = y via partial-pivot LU, one Pallas
    launch per batch tile: elimination carries the RHS (forward
    substitution is free) and back substitution runs in-kernel — no
    packing gathers, no separate O(N²·nb)-op substitution chains
    (measured: the split lu_decomp + lu_solve path costs 15.7 ms at
    1024×128²; see la/lu.py::lu_solve_fused).

    a: (Nb, N, N); y: (Nb, N, K). Returns x (Nb, N, K). Singular pivots
    produce inf/nan, matching lu.js:84-177 semantics.
    """
    Nb, N, N2 = a.shape
    assert N == N2, "lu_gesv needs square systems"
    K = y.shape[-1]
    kpad = (-K) % _STRIPE
    at = jnp.swapaxes(a, -1, -2)                      # (Nb, N, N)
    yt = jnp.swapaxes(y, -1, -2)                      # (Nb, K, N)
    if kpad:
        yt = jnp.concatenate(
            [yt, jnp.zeros((Nb, kpad, N), y.dtype)], axis=1)
    buf = jnp.concatenate([at, yt], axis=1)           # (Nb, BT, N)
    BT = N + K + kpad
    # in + out blocks both live in VMEM (the HBM alias does not merge
    # the VMEM blocks), and Pallas double-buffers grid blocks — hence
    # the ×2 on top of (in + out + x + rank)
    per_mat = (2 * BT * N + N + (K + kpad) * N) * 4 * 2
    bt_budget = max(1, (10 * 2 ** 20) // per_mat)
    bt = min(batch_tile, bt_budget, Nb)
    if bt < Nb:
        bt = max(8 * (bt // 8), min(8, Nb)) if Nb >= 8 else Nb
    if Nb % bt != 0:
        pad = (-Nb) % bt
        apad = jnp.concatenate(
            [a, jnp.broadcast_to(jnp.eye(N, dtype=a.dtype),
                                 (pad, N, N))], axis=0)
        ypad = jnp.concatenate(
            [y, jnp.zeros((pad, N, K), y.dtype)], axis=0)
        return lu_gesv(apad, ypad, interpret=interpret,
                       batch_tile=bt)[:Nb]
    grid = (Nb // bt,)
    _, _, xt = pl.pallas_call(
        functools.partial(_lu_gesv_kernel, N, K, interpret),
        grid=grid,
        input_output_aliases={0: 0},
        in_specs=[pl.BlockSpec((bt, BT, N), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((bt, BT, N), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((bt, N), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((bt, K + kpad, N), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(
            jax.ShapeDtypeStruct((Nb, BT, N), a.dtype),
            jax.ShapeDtypeStruct((Nb, N), jnp.int32),
            jax.ShapeDtypeStruct((Nb, K + kpad, N), a.dtype),
        ),
        interpret=interpret,
    )(buf)
    return jnp.swapaxes(xt[:, :K, :], -1, -2)         # (Nb, N, K)


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
