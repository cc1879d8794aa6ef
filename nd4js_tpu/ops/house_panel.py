"""Pallas kernel: Householder QR panel factorisation.

The sequential reflector loop of blocked QR
(/root/reference/src/la/qr.js:27-77 uses Givens for CPU-cache reasons;
we use Householder-WY, see la/qr.py) is HBM-bound as an XLA fori_loop —
every step streams the whole batched panel through HBM. This kernel
keeps the (Bt, M, B) panel and its reflector store resident in VMEM for
all B steps; one grid step per batch tile, Mosaic pipelines the
HBM↔VMEM transfers across tiles.

Same masked-iota idiom as ops/lu_panel.py (Mosaic cannot dynamically
index the lane dimension).

Outputs (panel_R, V, taus): panel_R's top B rows are the R block (zeros
below), V holds unit-diagonal reflectors (zeros above the diagonal),
H_0···H_{B−1} = I − V·T·Vᵀ with T from la/qr._form_t.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["house_panel"]


def _house_panel_kernel(a_ref, r_ref, v_ref, tau_ref):
    Bt, M, B = a_ref.shape
    row2 = jax.lax.broadcasted_iota(jnp.int32, (Bt, M), 1)
    row3 = jax.lax.broadcasted_iota(jnp.int32, (Bt, M, 1), 1)
    lane3 = jax.lax.broadcasted_iota(jnp.int32, (Bt, 1, B), 2)
    lane2 = jax.lax.broadcasted_iota(jnp.int32, (Bt, B), 1)

    r_ref[:] = a_ref[:]
    v_ref[:] = jnp.zeros((Bt, M, B), a_ref.dtype)
    tau_ref[:] = jnp.zeros((Bt, B), a_ref.dtype)

    def body(j, _):
        a = r_ref[:]
        col = jnp.sum(jnp.where(lane3 == j, a, 0.0), axis=2)     # (Bt, M)
        x0 = jnp.sum(jnp.where(row2 == j, col, 0.0), axis=1)     # (Bt,)
        sigma = jnp.sum(jnp.where(row2 > j, col * col, 0.0), axis=1)
        nrm = jnp.sqrt(x0 * x0 + sigma)
        beta = jnp.where(x0 >= 0, -nrm, nrm)
        den = x0 - beta
        safe_den = jnp.where(den == 0, 1.0, den)
        v = jnp.where(row2 > j, col / safe_den[:, None], 0.0)
        v = jnp.where(row2 == j, 1.0, v)
        safe_beta = jnp.where(beta == 0, 1.0, beta)
        tau = jnp.where(nrm == 0, 0.0, (beta - x0) / safe_beta)
        # w = tau · vᵀA over rows, masked to columns > j
        w = tau[:, None] * jnp.sum(a * v[:, :, None], axis=1)    # (Bt, B)
        w = jnp.where(lane2 > j, w, 0.0)
        a = a - v[:, :, None] * w[:, None, :]
        # column j -> beta·e_j (keep R rows above j)
        newc = jnp.where(row2 == j, beta[:, None],
                         jnp.where(row2 < j, col, 0.0))
        a = jnp.where(lane3 == j, newc[:, :, None], a)
        r_ref[:] = a
        v_ref[:] = jnp.where(lane3 == j, v[:, :, None], v_ref[:])
        tau_ref[:] = jnp.where(lane2 == j, tau[:, None], tau_ref[:])
        return 0

    jax.lax.fori_loop(0, min(B, M), body, 0, unroll=False)


@functools.partial(jax.jit, static_argnames=("interpret", "batch_tile"))
def house_panel(panel, interpret: bool = False, batch_tile: int = 16):
    """Householder-factor a batched panel (N_b, M, B), VMEM-resident.

    Returns (R_panel, V, taus).
    """
    Nb, M, B = panel.shape
    # VMEM budget: in + R + V outputs (+ pipelining headroom) ~10 MB
    per_mat = (3 * M * B + B) * 4 * 2
    bt_budget = max(1, (10 * 2 ** 20) // per_mat)
    bt = min(batch_tile, bt_budget, Nb)
    # 2-D outputs need a sublane-divisible batch tile (multiple of 8,
    # or the whole batch)
    if bt < Nb:
        bt = max(8 * (bt // 8), min(8, Nb)) if Nb >= 8 else Nb
    if Nb % bt != 0:
        pad = (-Nb) % bt
        panel = jnp.concatenate(
            [panel, jnp.zeros((pad, M, B), panel.dtype)], axis=0)
        r, v, t = house_panel(panel, interpret=interpret, batch_tile=bt)
        return r[:Nb], v[:Nb], t[:Nb]
    grid = (panel.shape[0] // bt,)
    return pl.pallas_call(
        _house_panel_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((bt, M, B), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((bt, M, B), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((bt, M, B), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((bt, B), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(
            jax.ShapeDtypeStruct(panel.shape, panel.dtype),
            jax.ShapeDtypeStruct(panel.shape, panel.dtype),
            jax.ShapeDtypeStruct((panel.shape[0], B), panel.dtype),
        ),
        interpret=interpret,
    )(panel)
