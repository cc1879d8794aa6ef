"""Pallas kernel: stripe-WY Householder elimination, transposed layout,
with an optional fused in-kernel least-squares back substitution.

The natural-layout panel kernel (ops/house_panel.py) pays ~5 full
(Bt, M, B) masked passes per reflector step because the lane dimension
cannot be dynamically indexed — the same measured bottleneck the LU
panel fixed by transposing (ops/lu_panel.py docstring: 4.7× at 32×512²).
This kernel applies the identical cure to QR (ref: the reference's
`_qr_decomp_inplace`, /root/reference/src/la/qr.js:148-183, which also
rides the RHS through the factorisation):

  * layout (Bt, BT, M): matrix COLUMNS on sublanes, rows on lanes —
    reading reflector column j is one dynamic *sublane* slice,
  * reflector steps touch only their 8-column stripe (Bt, 8, M),
  * each finished stripe hits the rest region (remaining columns AND
    the appended RHS) once, as a compact-WY block reflector
    I − V·Tᵀ·Vᵀ built in-kernel: T = (I + diag(τ)·striu(V·Vᵀ))⁻¹·diag(τ)
    with the strictly-upper Neumann series telescoped in log₂(8) = 3
    GEMM steps (nilpotent ⇒ exact) — three MXU contractions over the
    rest instead of 8 sequential masked VPU passes,
  * `qr_gesv` then back-substitutes in-kernel: x = R⁻¹·(Qᵀy) without
    ever leaving VMEM — the whole BASELINE config-1 workload
    (qr.js:186-273 `qr_lstsq`) in ONE Pallas launch.

Dot precision: Mosaic lowers only DEFAULT (one-pass bf16 — breaks f32
contracts) and HIGHEST (6-pass) dot_generals; ``dot_mode`` picks
'highest' (default — full f32 accuracy for the 1e-5-tier gates),
'x3' (manual bf16 hi/lo splitting, ~1.2e-5 relative — the 48-vs-23 TF
middle ground for loose-gate callers), or 'exact' (plain dots for CPU
interpret mode, where f64 inputs must not be split).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["house_stripe_t", "qr_gesv"]

_STRIPE = 8


def _make_dot(dot_mode: str, dt):
    def _dg(a, b, dims):
        prec = (jax.lax.Precision.HIGHEST if dot_mode == "highest"
                else None)
        return jax.lax.dot_general(a, b, dims, precision=prec,
                                   preferred_element_type=dt)

    if dot_mode != "x3":
        return _dg

    def _split(x):
        hi = x.astype(jnp.bfloat16).astype(dt)
        return hi, x - hi

    # a·b ≈ ah·bh + ah·bl + al·bh: ~1.2e-5 relative (the missing al·bl
    # term), 3 one-pass MXU dots (48 TF measured vs HIGHEST's 23 TF)
    def _dot3_strict(a, b, dims):
        ah, al = _split(a)
        bh, bl = _split(b)
        return (jax.lax.dot_general(ah, bl, dims,
                                    preferred_element_type=dt)
                + jax.lax.dot_general(al, bh, dims,
                                      preferred_element_type=dt)) \
            + jax.lax.dot_general(ah, bh, dims,
                                  preferred_element_type=dt)

    return _dot3_strict


def _house_stripe_body(out_ref, tau_ref, n_house: int, dot_mode: str):
    """Shared elimination core: Householder-factor the first ``n_house``
    sublane columns of out_ref (Bt, BT, M), updating every later column
    (including appended RHS columns) via per-stripe compact-WY block
    reflectors. Reflector tails are stored in place (lanes > j of
    column j), β on the diagonal lane, R above; τ in tau_ref (Bt, NH).
    """
    Bt, BT, M = out_ref.shape
    dt = out_ref.dtype
    dot = _make_dot(dot_mode, dt)
    lane2 = jax.lax.broadcasted_iota(jnp.int32, (Bt, M), 1)

    for s0 in range(0, n_house, _STRIPE):
        w = min(_STRIPE, n_house - s0)
        sub_w = jax.lax.broadcasted_iota(jnp.int32, (Bt, w, 1), 1)
        lane3 = jax.lax.broadcasted_iota(jnp.int32, (Bt, w, M), 2)

        def step(jl, tau_acc, s0=s0, w=w, sub_w=sub_w):
            j = s0 + jl
            col = out_ref[pl.ds(0, Bt), pl.ds(j, 1), pl.ds(0, M)]
            col = col[:, 0, :]                               # (Bt, M)
            x0 = jnp.sum(jnp.where(lane2 == j, col, 0.0), axis=1)
            sigma = jnp.sum(jnp.where(lane2 > j, col * col, 0.0), axis=1)
            nrm = jnp.sqrt(x0 * x0 + sigma)
            beta = jnp.where(x0 >= 0, -nrm, nrm)
            den = x0 - beta
            safe_den = jnp.where(den == 0, 1.0, den)
            v = jnp.where(lane2 > j, col / safe_den[:, None], 0.0)
            v = jnp.where(lane2 == j, 1.0, v)
            safe_beta = jnp.where(beta == 0, 1.0, beta)
            tau = jnp.where(nrm == 0, 0.0, (beta - x0) / safe_beta)
            # rank-1 update of stripe columns with sublane index > jl,
            # and column j's finalized form (R above the diagonal, β on
            # it, the reflector tail below) — ONE stripe write
            stripe = out_ref[:, s0:s0 + w, :]                # (Bt, w, M)
            wv = tau[:, None] * jnp.sum(stripe * v[:, None, :], axis=2)
            upd = stripe - wv[:, :, None] * v[:, None, :]
            newcol = jnp.where(lane2 < j, col,
                               jnp.where(lane2 == j, beta[:, None], v))
            out_ref[:, s0:s0 + w, :] = \
                jnp.where(sub_w > jl, upd,
                          jnp.where(sub_w == jl, newcol[:, None, :],
                                    stripe))
            # τ accumulates in the loop carry (a ref write per step
            # costs a full (Bt, NH) pass)
            tau_acc = jnp.where(
                jax.lax.broadcasted_iota(jnp.int32, tau_acc.shape, 1)
                == jl, tau[:, None], tau_acc)
            return tau_acc

        tau_acc = jax.lax.fori_loop(
            0, w, step, jnp.zeros((Bt, w), dt), unroll=False)
        tau_ref[:, s0:s0 + w] = tau_acc

        if s0 + w >= BT:
            continue
        # ---- compact-WY rest update: rest ← rest·(I − V·T·Vᵀ)ᵀ ----
        steps3 = s0 + jax.lax.broadcasted_iota(jnp.int32, (Bt, w, M), 1)
        stripe = out_ref[:, s0:s0 + w, :]
        V = jnp.where(lane3 > steps3, stripe, 0.0) \
            + jnp.where(lane3 == steps3, 1.0, 0.0)           # (Bt, w, M)
        taus = tau_ref[:, s0:s0 + w]                         # (Bt, w)
        # 3-D compare, not a dim-expanded i1 vector (Mosaic cannot
        # insert minor dims on i1 — same gotcha as ops/lu_panel.py)
        V = jnp.where(taus[:, :, None] != 0.0, V, 0.0)
        cmM = (((2,), (2,)), ((0,), (0,)))                   # contract M
        G = dot(V, V, cmM)                                   # (Bt, w, w)
        a_ = jax.lax.broadcasted_iota(jnp.int32, (Bt, w, w), 1)
        b_ = jax.lax.broadcasted_iota(jnp.int32, (Bt, w, w), 2)
        N8 = jnp.where(b_ > a_, G, 0.0) * taus[:, :, None]
        cm8 = (((2,), (1,)), ((0,), (0,)))

        def mm8(x, y):
            return dot(x, y, cm8)

        X = jnp.where(a_ == b_, 1.0, 0.0) - N8
        S = N8
        span = 2
        while span < w:
            S = mm8(S, S)
            X = X + mm8(X, S)
            span *= 2
        T = X * taus[:, None, :]                             # X·diag(τ)
        rest = out_ref[:, s0 + w:, :]                        # (Bt, R, M)
        W1 = dot(rest, V, cmM)                               # (Bt, R, w)
        W2 = mm8(W1, T)                                      # (Bt, R, w)
        out_ref[:, s0 + w:, :] = rest - mm8(W2, V)


def _qr_gesv_kernel(n_house, n_rhs, dot_mode, a_ref, out_ref, tau_ref,
                    x_ref):
    """Fused QR solve: eliminate the first n_house (= N) columns of the
    square system [A | y] (transposed layout), then back-substitute
    R·x = Qᵀy in-kernel. x_ref: (Bt, Kp, M), x[:, k, j] = x_j of RHS k.
    """
    Bt, BT, M = a_ref.shape
    N = n_house
    K = n_rhs
    lane2 = jax.lax.broadcasted_iota(jnp.int32, (Bt, M), 1)
    out_ref[:] = a_ref[:]
    tau_ref[:] = jnp.zeros(tau_ref.shape, out_ref.dtype)
    _house_stripe_body(out_ref, tau_ref, N, dot_mode)

    # all RHS columns advance together, carried in the loop (a ref
    # read+write per step per RHS costs ~2.5× this kernel's total)
    Kp = BT - N
    laneK = jax.lax.broadcasted_iota(jnp.int32, (Bt, Kp, M), 2)

    def bs_step(i, carry):
        rhsb, xacc = carry                               # (Bt, Kp, M)
        j = N - 1 - i
        ucol = out_ref[pl.ds(0, Bt), pl.ds(j, 1), pl.ds(0, M)][:, 0, :]
        # singular R yields inf/nan, matching lu.js:84-177 semantics
        diag = jnp.sum(jnp.where(lane2 == j, ucol, 0.0), axis=1)
        zj = jnp.sum(jnp.where(laneK == j, rhsb, 0.0), axis=2)
        xj = zj / diag[:, None]                          # (Bt, Kp)
        rhsb = jnp.where(laneK < j,
                         rhsb - xj[:, :, None] * ucol[:, None, :], rhsb)
        xacc = jnp.where(laneK == j, xj[:, :, None], xacc)
        return rhsb, xacc

    rhs0 = out_ref[:, N:, :]
    _, xacc = jax.lax.fori_loop(
        0, N, bs_step, (rhs0, jnp.zeros((Bt, Kp, M), out_ref.dtype)),
        unroll=False)
    x_ref[:] = xacc


@functools.partial(jax.jit,
                   static_argnames=("interpret", "batch_tile",
                                    "dot_mode"))
def qr_gesv(a, y, interpret: bool = False, batch_tile: int = 8,
            dot_mode: str = "highest"):
    """Solve the square system A·x = y by Householder QR, factor + Qᵀy +
    back substitution fused in ONE Pallas launch (the BASELINE config-1
    workload; ref: qr.js:148-183 + 186-273). a: (Nb, N, N), y:
    (Nb, N, K) → x (Nb, N, K). Singular R yields inf/nan, matching the
    reference's behaviour on rank-deficient square systems."""
    Nb, N, N2 = a.shape
    assert N == N2, "qr_gesv needs square systems"
    K = y.shape[-1]
    if interpret:
        dot_mode = "exact"
    kpad = (-K) % _STRIPE
    at = jnp.swapaxes(a, -1, -2)                      # cols on sublanes
    yt = jnp.swapaxes(y, -1, -2)
    if kpad:
        yt = jnp.concatenate(
            [yt, jnp.zeros((Nb, kpad, N), y.dtype)], axis=1)
    buf = jnp.concatenate([at, yt], axis=1)           # (Nb, BT, N)
    BT = N + K + kpad
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
        return qr_gesv(apad, ypad, interpret=interpret, batch_tile=bt,
                       dot_mode=dot_mode)[:Nb]
    grid = (Nb // bt,)
    _, _, xt = pl.pallas_call(
        functools.partial(_qr_gesv_kernel, N, K, dot_mode),
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
            jax.ShapeDtypeStruct((Nb, N), a.dtype),
            jax.ShapeDtypeStruct((Nb, K + kpad, N), a.dtype),
        ),
        interpret=interpret,
    )(buf)
    return jnp.swapaxes(xt[:, :K, :], -1, -2)


def _house_stripe_kernel(dot_mode, a_ref, out_ref, tau_ref):
    Bt, B, M = a_ref.shape
    out_ref[:] = a_ref[:]
    tau_ref[:] = jnp.zeros(tau_ref.shape, out_ref.dtype)
    _house_stripe_body(out_ref, tau_ref, min(B, M), dot_mode)


@functools.partial(jax.jit,
                   static_argnames=("interpret", "batch_tile",
                                    "dot_mode"))
def house_stripe_t(panel, interpret: bool = False, batch_tile: int = 16,
                   dot_mode: str = "highest"):
    """Householder-factor a batched panel (Nb, M, B) via the transposed
    stripe-WY kernel. Returns (R_panel, V, taus) in the natural layout
    of ops/house_panel.py::house_panel (drop-in replacement): R_panel's
    top B rows are R (zeros below), V unit-diagonal reflectors."""
    Nb, M, B = panel.shape
    if interpret:
        dot_mode = "exact"
    per_mat = (2 * B * M + B) * 4 * 2
    bt_budget = max(1, (10 * 2 ** 20) // per_mat)
    bt = min(batch_tile, bt_budget, Nb)
    if bt < Nb:
        bt = max(8 * (bt // 8), min(8, Nb)) if Nb >= 8 else Nb
    if Nb % bt != 0:
        pad = (-Nb) % bt
        panel = jnp.concatenate(
            [panel, jnp.zeros((pad, M, B), panel.dtype)], axis=0)
        r, v, t = house_stripe_t(panel, interpret=interpret,
                                 batch_tile=bt, dot_mode=dot_mode)
        return r[:Nb], v[:Nb], t[:Nb]
    at = jnp.swapaxes(panel, -1, -2)                  # (Nb, B, M)
    grid = (panel.shape[0] // bt,)
    out_t, taus = pl.pallas_call(
        functools.partial(_house_stripe_kernel, dot_mode),
        grid=grid,
        in_specs=[pl.BlockSpec((bt, B, M), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((bt, B, M), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((bt, B), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(
            jax.ShapeDtypeStruct((panel.shape[0], B, M), panel.dtype),
            jax.ShapeDtypeStruct((panel.shape[0], B), panel.dtype),
        ),
        interpret=interpret,
    )(at)
    # unpack the in-place store: R above+on the diagonal, v below
    out = jnp.swapaxes(out_t, -1, -2)                 # (Nb, M, B)
    r3 = jax.lax.broadcasted_iota(jnp.int32, out.shape, 1)
    c3 = jax.lax.broadcasted_iota(jnp.int32, out.shape, 2)
    rpan = jnp.where(r3 <= c3, out, 0.0)
    v = jnp.where(r3 > c3, out, 0.0) \
        + jnp.where(r3 == c3, 1.0, 0.0).astype(out.dtype)
    kdead = (taus == 0)[:, None, :]
    v = jnp.where(kdead & (r3 != c3), 0.0, v)
    return rpan, v, taus
