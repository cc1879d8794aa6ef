"""Pallas kernel: full sweeps of one-sided Jacobi rotations.

The inner loop of Hestenes SVD (la/svd_jac.py) is HBM-bound as an XLA
fori_loop — every tournament round streams W and V through HBM. This
kernel keeps (W, V) resident in VMEM for whole sweeps of n−1 rounds.

Layout: the Brent-Luk two-row tournament — W's columns are split into
aligned halves (wt, wb) so every round's N/2 rotations are pure
lane-aligned arithmetic (no gathers, no lane reversal — Mosaic has no
`rev` lowering). The between-round shuffle

    nt = [t0, b0, t1, …, t_{h−2}],  nb = [b1, …, b_{h−1}, t_{h−1}]

is two `pltpu.roll`s plus lane-0 / lane-(h−1) masked blends.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["jacobi_sweeps"]


def _lane0(x):
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    return jnp.sum(jnp.where(lane == 0, x, 0.0), axis=-1, keepdims=True)


def _lane_last(x):
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    h = x.shape[-1]
    return jnp.sum(jnp.where(lane == h - 1, x, 0.0), axis=-1,
                   keepdims=True)


def _shuffle(t, b):
    """Brent-Luk tournament step on the two rows (lane ops only)."""
    h = t.shape[-1]
    if h == 1:
        return t, b
    lane = jax.lax.broadcasted_iota(jnp.int32, t.shape, t.ndim - 1)
    t0 = _lane0(t)
    b0 = _lane0(b)
    t_last = _lane_last(t)
    tr = pltpu.roll(t, 1, t.ndim - 1)      # [t_{h-1}, t0, …, t_{h-2}]
    br = pltpu.roll(b, h - 1, b.ndim - 1)  # ≡ roll −1: [b1, …, b_{h-1}, b0]
    nt = jnp.where(lane == 0, t0, jnp.where(lane == 1, b0, tr))
    nb = jnp.where(lane == h - 1, t_last, br)
    return nt, nb


def _sweep_kernel(sweeps_ref, wt_ref, wb_ref, vt_ref, vb_ref,
                  wto, wbo, vto, vbo, off_ref):
    Bt, M, h = wt_ref.shape
    wto[:] = wt_ref[:]
    wbo[:] = wb_ref[:]
    vto[:] = vt_ref[:]
    vbo[:] = vb_ref[:]
    off_ref[:] = jnp.zeros_like(off_ref)
    n_sweeps = sweeps_ref[0]

    def round_body(_, carry):
        app, aqq = carry
        wt, wb = wto[:], wbo[:]
        vt, vb = vto[:], vbo[:]
        # only the CROSS product needs a fresh reduction; the column
        # norms are carried analytically through the rotations (the
        # sublane reductions over M dominate this kernel's cost)
        apq = jnp.sum(wt * wb, axis=1)
        tiny = jnp.finfo(wt.dtype).tiny
        # NaN-free relative off measure: sqrt(app)·sqrt(aqq) cannot
        # underflow-to-0/0 the way sqrt(app·aqq) can, and carried norms
        # are clamped non-negative (rounding can push them below 0)
        app = jnp.maximum(app, 0.0)
        aqq = jnp.maximum(aqq, 0.0)
        denom = jnp.sqrt(app) * jnp.sqrt(aqq) + tiny
        off_ref[:] = jnp.maximum(
            off_ref[:],
            jnp.max(jnp.abs(apq) / denom, axis=1)[:, None, None])
        small = jnp.abs(apq) <= tiny
        safe = jnp.where(small, 1.0, apq)
        tau = (aqq - app) / (2 * safe)
        t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1 + tau * tau))
        t = jnp.where(tau == 0, 1.0, t)
        t = jnp.where(small, 0.0, t)
        c = jax.lax.rsqrt(1 + t * t)
        s = t * c
        c3 = c[:, None, :]
        s3 = s[:, None, :]
        nwt = c3 * wt - s3 * wb
        nwb = s3 * wt + c3 * wb
        nvt = c3 * vt - s3 * vb
        nvb = s3 * vt + c3 * vb
        # norm update: app' = c²·app − 2cs·apq + s²·aqq (and symmetric)
        c2, s2, cs2 = c * c, s * s, 2 * c * s
        napp = c2 * app - cs2 * apq + s2 * aqq
        naqq = s2 * app + cs2 * apq + c2 * aqq
        napp, naqq = _shuffle(napp[:, None, :], naqq[:, None, :])
        nwt, nwb = _shuffle(nwt, nwb)
        nvt, nvb = _shuffle(nvt, nvb)
        wto[:], wbo[:] = nwt, nwb
        vto[:], vbo[:] = nvt, nvb
        return napp[:, 0, :], naqq[:, 0, :]

    def sweep_body(_, carry):
        # refresh the carried norms once per sweep (rounding drift)
        wt, wb = wto[:], wbo[:]
        app = jnp.sum(wt * wt, axis=1)
        aqq = jnp.sum(wb * wb, axis=1)
        app, aqq = jax.lax.fori_loop(0, 2 * h - 1, round_body,
                                     (app, aqq), unroll=False)
        return 0

    jax.lax.fori_loop(0, n_sweeps, sweep_body, 0, unroll=False)


@functools.partial(jax.jit, static_argnames=("interpret", "batch_tile"))
def jacobi_sweeps(w, v, sweeps, interpret: bool = False,
                  batch_tile: int = 4):
    """Run ``sweeps`` full one-sided Jacobi sweeps on (Nb, M, n) W
    (n even) accumulating rotations into (Nb, n, n) V. Returns
    (W, V, off): off (Nb, 8, 128) broadcasts each matrix's max relative
    off-diagonal (a convergence signal; read [:, 0, 0]).

    Columns return in tournament order — consistently permuted in W and
    V, so U·Σ·Vᵀ is unchanged (callers sort by singular value anyway).
    """
    Nb, M, n = w.shape
    h = n // 2
    # VMEM budget: in+out copies of W and V halves live simultaneously
    # (plus pipelining headroom) — keep the tile under ~10 MB
    per_mat = (2 * M * n + 2 * n * n) * 4 * 2
    bt_budget = max(1, (10 * 2 ** 20) // per_mat)
    bt = min(batch_tile, bt_budget, Nb)
    if Nb % bt != 0:
        pad = (-Nb) % bt
        w = jnp.concatenate([w, jnp.zeros((pad, M, n), w.dtype)], 0)
        v = jnp.concatenate(
            [v, jnp.broadcast_to(jnp.eye(n, dtype=v.dtype),
                                 (pad, n, n))], 0)
        wo, vo, off = jacobi_sweeps(w, v, sweeps, interpret=interpret,
                                    batch_tile=bt)
        return wo[:Nb], vo[:Nb], off[:Nb]
    grid = (w.shape[0] // bt,)
    sweeps_arr = jnp.asarray([sweeps], jnp.int32)
    spec_w = pl.BlockSpec((bt, M, h), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_v = pl.BlockSpec((bt, n, h), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    wt, wb = w[:, :, :h], w[:, :, h:]
    vt, vb = v[:, :, :h], v[:, :, h:]
    wto, wbo, vto, vbo, off = pl.pallas_call(
        _sweep_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  spec_w, spec_w, spec_v, spec_v],
        out_specs=(spec_w, spec_w, spec_v, spec_v,
                   pl.BlockSpec((bt, 8, 128), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(
            jax.ShapeDtypeStruct(wt.shape, w.dtype),
            jax.ShapeDtypeStruct(wt.shape, w.dtype),
            jax.ShapeDtypeStruct(vt.shape, v.dtype),
            jax.ShapeDtypeStruct(vt.shape, v.dtype),
            jax.ShapeDtypeStruct((w.shape[0], 8, 128), w.dtype),
        ),
        interpret=interpret,
    )(sweeps_arr, wt, wb, vt, vb)
    return (jnp.concatenate([wto, wbo], axis=-1),
            jnp.concatenate([vto, vbo], axis=-1), off)
