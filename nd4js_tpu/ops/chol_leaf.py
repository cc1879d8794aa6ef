"""Pallas kernel: batched small-Cholesky leaf factor (+ fused inverse).

The half/half Cholesky recursion (la/cholesky.py::_chol_rec) bottoms
out in unrolled base cases; measured on a v5e, the base-case columns
dominate the wall time — each of the N diagonal columns costs ~4 tiny
XLA ops no matter the base width (the recursion only changes how many
GEMM tree nodes sit above them), so a (32, 512^2) factorisation pays
~2000 dispatches (~1.8 ms, vs ~0.5 ms of actual arithmetic).

This kernel replaces a leaf's whole unrolled column loop with ONE
pallas launch: the (bt, n, n) block lives in VMEM TRANSPOSED (columns
on sublanes, rows on lanes — the pivot column is a contiguous sublane
read; the rank-1 update is layout-invariant because the block is
symmetric), the n factor steps are an unrolled in-kernel loop of VPU
passes, and the leaf inverse — when requested — is the telescoped
nilpotent product

    Lt = (I + M)·D,  M = (Lt − D)·D⁻¹ strictly upper  ⇒
    Lt⁻¹ = D⁻¹·(I − M)(I + M²)(I + M⁴)···           (⌈log₂ n⌉ dots)

computed in-kernel on the MXU (HIGHEST-precision dots — exact f32
results; Mosaic lowers DEFAULT and HIGHEST only, and DEFAULT's bf16
pass would break the library accuracy contracts, see core/mm.py).

Semantics match la/cholesky.py::_chol_base / _inv_base exactly:
non-SPD inputs produce NaN columns (sqrt of a negative) rather than
raising, per /root/reference/src/la/cholesky.js:27-47 parity notes.

Used on the TPU backend only: the CPU test suite keeps the unrolled
XLA base case (compiled CPU code beats interpret-mode Pallas by ~100×
on the hot path); kernel-vs-base equivalence is pinned by
tests/test_lu_chol.py::test_chol_leaf_kernel_matches_base (interpret
mode) and tests/test_tpu_hw.py (compiled, real chip).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["chol_leaf", "LEAF"]

LEAF = 64          # widest leaf the kernel is instantiated for


def _hdot(a, b):
    """Batched (bt, n, n) @ (bt, n, n) at HIGHEST precision (f32-exact
    on the MXU; six passes — negligible at leaf sizes)."""
    return jax.lax.dot_general(
        a, b, (((2,), (1,)), ((0,), (0,))),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=a.dtype)


def _chol_leaf_kernel(n: int, with_inv: bool, at_ref, lt_ref,
                      lit_ref=None):
    """at_ref: (bt, n, n) transposed/symmetric input block. Writes the
    transposed factor Ltᵀ-layout (lt_ref[b, j, :] = L[:, j]) and, when
    ``with_inv``, the transposed inverse (lit_ref[b, j, :] = L⁻¹[:, j]).
    """
    dt = at_ref.dtype
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    # in-place in the OUTPUT ref: the unrolled loop would otherwise
    # keep every step's value copy live on the scoped-VMEM stack
    # (measured: 19 MB at bt=32, n=64 — over the 16 MB limit)
    lt_ref[:] = at_ref[:]
    for j in range(n):
        cur = lt_ref[:]                              # (bt, n, n)
        colj = cur[:, j, :]                          # (bt, n) = A[:, j]
        piv = colj[:, j]                             # (bt,)
        d = jax.lax.rsqrt(piv)                       # NaN/Inf on non-SPD
        colj = colj * d[:, None]                     # L[:, j]; [j] = √piv
        colj = jnp.where(lane >= j, colj, jnp.zeros_like(colj))
        # rank-1 symmetric update; rows/cols < j see a zero colj entry,
        # and row j is rewritten with the final factor column below
        lt_ref[:] = cur - colj[:, :, None] * colj[:, None, :]
        lt_ref[:, j, :] = colj
    if not with_inv:
        return
    # lt_ref now holds U := Lᵀ in natural (row, col)=(sublane, lane)
    # layout. Invert by the nilpotent-squaring product.
    u = lt_ref[:]
    ri = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    onmask = (ri == ci)[None]                        # identity mask
    eye = jnp.where(onmask, jnp.ones((), dt), jnp.zeros((), dt))
    dg = jnp.sum(jnp.where(onmask, u, 0.0), axis=-1)  # (bt, n) diagonal
    dinv = 1.0 / dg
    m = jnp.where(onmask, 0.0, u) * dinv[:, None, :]  # strictly upper
    x = eye - m
    s = m
    span = 2
    while span < n:
        s = _hdot(s, s)
        x = x + _hdot(x, s)
        span *= 2
    lit_ref[:] = dinv[:, :, None] * x      # = U⁻¹ = (L⁻¹)ᵀ; caller transposes


def chol_leaf(a, with_inv: bool, interpret: bool = False,
              batch_tile: int = 32):
    """Cholesky factor (and optional inverse) of a batch of small SPD
    blocks in one Pallas launch per batch tile.

    a: (..., n, n) with n ≤ LEAF. Returns (L, L⁻¹ | None), matching
    la/cholesky.py::_chol_base/_inv_base semantics."""
    lead = a.shape[:-2]
    n = a.shape[-1]
    assert n <= LEAF, (n, LEAF)
    B = max(1, math.prod(lead))
    a3 = a.reshape((B, n, n))
    # transposed layout is a no-op for symmetric inputs — pass as-is
    # (the kernel reads sublane j as column j; A = Aᵀ makes that exact)
    # lanes pad to 128 in VMEM regardless of n; beyond the (double-
    # buffered) grid blocks, the unrolled kernel keeps ~6 live value
    # temps of the block size on the scoped-VMEM stack — budget for
    # both or Mosaic hits the 16 MB scoped limit (measured: bt=40 at
    # n=64 with the inverse OOMs at 17.76 MB)
    per_mat = ((3 if with_inv else 2) * 2 + 6) * n * 128 * 4 + 4096
    # 8 MB target: the scoped-VMEM limit is 16 MB and the surrounding
    # XLA fusion shares it (measured: bt=32 no-inv lands at 16.07 MB)
    bt = max(1, min(batch_tile, (8 * 2 ** 20) // per_mat, B))
    if bt > 8:
        bt = 8 * (bt // 8)
    if B % bt:
        pad = (-B) % bt
        a3 = jnp.concatenate(
            [a3, jnp.broadcast_to(jnp.eye(n, dtype=a.dtype),
                                  (pad, n, n))], axis=0)
    grid = (a3.shape[0] // bt,)
    spec = pl.BlockSpec((bt, n, n), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct(a3.shape, a.dtype)]
    out_specs = [spec]
    if with_inv:
        out_shape.append(jax.ShapeDtypeStruct(a3.shape, a.dtype))
        out_specs.append(spec)
    outs = pl.pallas_call(
        functools.partial(_chol_leaf_kernel, n, with_inv),
        grid=grid,
        in_specs=[spec],
        out_specs=tuple(out_specs) if with_inv else out_specs[0],
        out_shape=tuple(out_shape) if with_inv else out_shape[0],
        interpret=interpret,
    )(a3)
    if not with_inv:
        lt = outs
        li = None
    else:
        lt, lit = outs
        # lit[b] = U⁻¹ = (Lᵀ)⁻¹ = (L⁻¹)ᵀ → transpose back to L⁻¹
        li = jnp.swapaxes(lit[:B], -1, -2).reshape(lead + (n, n))
    l = jnp.swapaxes(lt[:B], -1, -2).reshape(lead + (n, n))
    return l, li
