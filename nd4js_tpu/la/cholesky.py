"""Cholesky decomposition & solve, blocked panels for the MXU.

Parity with /root/reference/src/la/cholesky.js (`_cholesky_decomp`
row-oriented with Kahan-compensated inner products :27-47, public
`cholesky_decomp` :50, `cholesky_solve` :75).

TPU-first redesign: half/half recursion over unrolled 16-wide bases
that propagates L⁻¹ alongside L (two extra GEMMs per node, see
_chol_inv_rec) — all trailing updates and every downstream triangular
solve become MXU GEMMs (the reference's Kahan inner products are
replaced by f32-full MXU accumulation; see core/mm.py).

Chosen by head-to-head measurement on a v5e: 0.79 ms at (32, 512²)
[1.8 TF] and 1.11 ms at (1024, 128²) [920k matrices/s] — vs ~5 ms for
panel loops with separate Neumann inverses, and ~23 ms for a Pallas
VMEM panel kernel (whose in-kernel step loop costs ~4-9 µs/step and
whose batch grid serializes). The price is XLA compile time (the
unrolled leaves fuse into fast kernels but compile slowly) — amortised
by the persistent compilation cache (bench.py).

Non-SPD inputs produce NaNs (sqrt of a negative) rather than the
reference's thrown Error; the eager wrapper can check when not traced.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import config as _config
from ..core.mm import mm, mt
from ..config import default_float_for
from .tri import tril_solve, tril_t_solve

__all__ = ["cholesky_decomp", "cholesky_solve"]

_BASE = 16
_LEAF_TPU = 64     # leaf width when the Pallas leaf kernel is in play


def _use_leaf_kernel() -> bool:
    """The Pallas leaf kernel runs on accelerator backends only: the
    CPU test suite keeps the unrolled XLA base case (compiled CPU code
    beats interpret-mode Pallas ~100× on this hot path); equivalence is
    pinned by tests/test_lu_chol.py and tests/test_tpu_hw.py."""
    try:
        return jax.default_backend() != "cpu"
    except Exception:          # backend not initialised yet
        return False


def _chol_base(a):
    """Unrolled classical Cholesky for n <= _BASE (static python loop)."""
    n = a.shape[-1]
    rows = []
    for j in range(n):
        if j == 0:
            d = jnp.sqrt(a[..., 0, 0])
            rows.append(a[..., :, 0] / d[..., None])
        else:
            lj = jnp.stack([r[..., j] for r in rows], axis=-1)   # (..., j)
            prev = jnp.stack(rows, axis=-1)                      # (..., n, j)
            acc = jnp.einsum("...nj,...j->...n", prev, lj,
                             precision=_config.matmul_precision)
            col = a[..., :, j] - acc
            d = jnp.sqrt(col[..., j])
            rows.append(col / d[..., None])
    l = jnp.stack(rows, axis=-1)                                 # (..., n, n)
    return jnp.tril(l)


def _inv_base(l):
    """Unrolled forward substitution against I for small lower-tri
    blocks (one per recursion leaf; the ops stay fused elementwise
    chains, which XLA dispatches as a handful of kernels)."""
    n = l.shape[-1]
    eye = jnp.eye(n, dtype=l.dtype)
    rows = []
    for i in range(n):
        if i == 0:
            xi = eye[0] / l[..., 0, 0, None]
        else:
            prev = jnp.stack(rows, axis=-2)              # (..., i, n)
            acc = jnp.einsum("...j,...jk->...k", l[..., i, :i], prev,
                             precision=_config.matmul_precision)
            xi = (eye[i] - acc) / l[..., i, i, None]
        rows.append(xi)
    return jnp.stack(rows, axis=-2)


def _chol_rec(a, with_inv: bool, base: int | None = None):
    """Half/half Cholesky recursion that propagates L⁻¹ alongside L:

        L   = [[L11, 0], [L21, L22]]
        L⁻¹ = [[iL11, 0], [−iL22·L21·iL11, iL22]]

    The inverse costs two extra GEMMs per node and removes every
    separate triangular inversion from the factorisation and from its
    consumers (CholeskyQR2 whitening, Gram-SVD orthogonalisation,
    trailing solves) — measured fastest of the panel/Pallas/Neumann
    alternatives on a v5e at both (32, 512²) and (1024, 128²).

    ``with_inv=False`` prunes what the caller doesn't need: the left
    child's inverse is always required (it whitens the panel,
    l21 = A21·iL11ᵀ), but i21 — the two LARGEST inverse GEMMs of each
    node — and the right spine's inverses are skipped.

    ``base`` sets the leaf size (default: 64 on accelerators when the
    Pallas leaf kernel is in play — ops/chol_leaf.py — else 16 for the
    unrolled XLA base whose compile cost grows with width).

    Kernel-vs-XLA leaf policy (measured on a v5e): the kernel replaces
    ~4 XLA dispatches per factor column with ~0.4 µs in-kernel steps,
    but its grid serializes over the batch (bt ≤ 16-24 by the scoped-
    VMEM limit), so it WINS at small batch × large matrix (32×512²:
    1.83 → 1.38 ms) and LOSES whenever B/bt grids pile up (1024×128²:
    2.34 → 8.7 ms) or the tree above the leaves is shallow (the 128²
    Gram inverses inside qr-cholqr2 panels: qr 2.84 → 3.96 ms). Hence:
    kernel iff flat batch ≤ 32 AND the recursion's TOP matrix is
    ≥ 256 (leaf work dominated by deep-tree contexts)."""
    import math as _math
    kernel_ok = (_use_leaf_kernel()
                 and a.shape[-1] >= 256
                 and max(1, _math.prod(a.shape[:-2])) <= 32)
    if base is None:
        base = _LEAF_TPU if kernel_ok else _BASE
    return _chol_rec_inner(a, with_inv, base, kernel_ok)


def _chol_rec_inner(a, with_inv: bool, base: int, kernel_ok: bool):
    n = a.shape[-1]
    if n <= base:
        if kernel_ok and n >= 8:
            from ..ops.chol_leaf import chol_leaf
            return chol_leaf(a, with_inv)
        l = _chol_base(a)
        return l, (_inv_base(l) if with_inv else None)
    m = n // 2
    l11, i11 = _chol_rec_inner(a[..., :m, :m], True, base, kernel_ok)
    l21 = mm(a[..., m:, :m], mt(i11))
    l22, i22 = _chol_rec_inner(a[..., m:, m:] - mm(l21, mt(l21)),
                               with_inv, base, kernel_ok)
    ztop = jnp.zeros(a.shape[:-2] + (m, n - m), a.dtype)
    L = jnp.concatenate(
        [jnp.concatenate([l11, ztop], axis=-1),
         jnp.concatenate([l21, l22], axis=-1)], axis=-2)
    if not with_inv:
        return L, None
    i21 = -mm(i22, mm(l21, i11))
    Li = jnp.concatenate(
        [jnp.concatenate([i11, ztop], axis=-1),
         jnp.concatenate([i21, i22], axis=-1)], axis=-2)
    return L, Li


def _chol_inv_rec(a, base: int | None = None):
    return _chol_rec(a, True, base)


def _chol_core(a):
    """Cholesky core for arbitrary leading dims."""
    return _chol_rec(a, False)[0]


def _chol_inv_core(a, base: int | None = None):
    """(L, L⁻¹) — the inverse rides along the recursion, so downstream
    triangular solves become GEMMs."""
    return _chol_inv_rec(a, base)


def cholesky_decomp(a, inv: bool = False):
    """Lower Cholesky factor L with A = L·Lᵀ (ref: cholesky.js:50).
    Batched over leading dims.

    ``inv=True`` additionally returns L⁻¹ (computed fused inside the
    recursion — two extra GEMMs per node, far cheaper than a separate
    inversion); pass it to :func:`cholesky_solve` to make each solve
    two GEMMs."""
    a = jnp.asarray(a)
    a = a.astype(default_float_for(a.dtype))
    if a.ndim < 2:
        raise ValueError("cholesky_decomp expects ndim >= 2")
    l, li = _chol_rec(a, inv)
    from ..core.debug import dassert, dcheck_finite
    dcheck_finite(l, "cholesky_decomp L")
    dassert(jnp.diagonal(l, axis1=-2, axis2=-1) > 0,
            "cholesky_decomp: non-positive pivot (input not SPD?)")
    return (l, li) if inv else l


def cholesky_solve(l, y, l_inv=None):
    """Solve A @ x = y given L from :func:`cholesky_decomp`
    (ref: cholesky.js:75). With ``l_inv`` (from
    ``cholesky_decomp(a, inv=True)``) the solve is two GEMMs:
    x = L⁻ᵀ·(L⁻¹·y)."""
    if l_inv is not None:
        l_inv = jnp.asarray(l_inv)
        y = jnp.asarray(y).astype(l_inv.dtype)
        return mm(mt(l_inv), mm(l_inv, y))
    z = tril_solve(l, y)
    return tril_t_solve(l, z)
