"""SVD facade: rank, solve, lstsq (pseudo-inverse application).

Parity with /root/reference/src/la/svd.js: `svd_decomp` (:25, delegates
to the default algorithm), `svd_rank` with the √eps·sv₀ threshold (:31),
`svd_solve` (:61, errors on singular input outside jit), `svd_lstsq`
(:103-228, rank-truncated pseudo-inverse apply).

The default algorithm is size-dispatched at trace time ('auto'):
MXU-size inputs go to the simultaneous-rotation gram Jacobi
(svd_gram.py — the throughput path, with a built-in scalar-sweep
accuracy fallback), small inputs to the element-level one-sided Jacobi
(svd_jac.py). The shipped default IS the benched path (bench.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import dt
from ..core.batch import batched
from ..core.mm import mm, mt
from .svd_jac import svd_jac_1sided
from .singular_matrix_solve_error import SingularMatrixSolveError

__all__ = ["svd_decomp", "svd_rank", "svd_solve", "svd_lstsq",
           "rank", "lstsq"]


def svd_decomp(a, method: str = "auto", **kw):
    """Default SVD: A = U·diag(sv)·V (ref: svd.js:25). Batched.

    method: 'auto' (default — MXU-size inputs, min(M,N) ≥ 128, route to
    the all-GEMM simultaneous-rotation Jacobi with its built-in
    scalar-sweep accuracy fallback, mirroring qr_decomp's 'auto'; small
    inputs route to the element-level one-sided Jacobi whose dispatch
    pattern wins below the MXU tile), 'jacobi' (element-level
    one-sided), 'gram' (simultaneous-rotation, all-GEMM), 'blocked'
    (MXU block Jacobi), or 'dc' (divide & conquer)."""
    if method == "auto":
        shape = jnp.shape(a)
        big = len(shape) >= 2 and min(shape[-2:]) >= 128
        method = "gram" if big else "jacobi"
    if method == "jacobi":
        return svd_jac_1sided(a, **kw)
    if method == "gram":
        from .svd_gram import svd_gram
        return svd_gram(a, **kw)
    if method == "blocked":
        from .svd_block_jac import svd_jac_blocked
        return svd_jac_blocked(a, **kw)
    if method == "dc":
        from .svd_dc import svd_dc
        return svd_dc(a, **kw)
    raise ValueError(f"unknown method {method!r}")


def svd_rank(sv, tol=None):
    """Numerical rank from singular values: #{i : sv_i > √eps·sv₀}
    (ref: svd.js:31-53)."""
    sv = jnp.asarray(sv)
    if tol is None:
        tol = float(np.sqrt(np.finfo(np.dtype(sv.dtype)).eps))
    thresh = tol * sv[..., :1]
    return jnp.sum(sv > thresh, axis=-1).astype(jnp.int32)


def svd_lstsq(u, sv, v, y, rcond=None):
    """Minimum-norm least squares via the truncated pseudo-inverse:
    x = Vᵀ·diag(1/sv_trunc)·Uᵀ·y (ref: svd.js:103-228). jit-safe with a
    traced rank (masked reciprocal)."""
    u, sv, v = jnp.asarray(u), jnp.asarray(sv), jnp.asarray(v)
    y = jnp.asarray(y).astype(u.dtype)
    if rcond is None:
        rcond = float(np.sqrt(np.finfo(np.dtype(u.dtype)).eps))

    @batched((2, 1, 2, 2))
    def _go(u, sv, v, y):
        live = sv > rcond * sv[0]
        inv = jnp.where(live, 1 / jnp.where(sv == 0, 1, sv), 0)
        uty = mm(mt(u), y)
        return mm(mt(v), uty * inv[:, None])

    return _go(u, sv, v, y)


def svd_solve(u, sv, v, y):
    """Square solve; raises SingularMatrixSolveError outside jit when
    numerically singular (ref: svd.js:61-101)."""
    x = svd_lstsq(u, sv, v, y)
    r = svd_rank(jnp.asarray(sv))
    n = jnp.asarray(v).shape[-1]
    if not isinstance(r, jax.core.Tracer):
        if bool(jnp.any(r < n)):
            raise SingularMatrixSolveError(x)
    return x


def rank(a, tol=None):
    """Numerical rank of A (ref: la/rank.js:23 — svd_rank ∘ svd)."""
    _, sv, _ = svd_decomp(a)
    return svd_rank(sv, tol=tol)


def lstsq(a, y, rcond=None, method: str = "svd"):
    """Minimum-norm least squares (ref: la/lstsq.js:23 — SVD-backed).

    method: 'svd' (reference parity, default) or 'urv' — the complete
    orthogonal decomposition gives the same minimum-norm solution at
    QR speed (the throughput choice for large batched systems)."""
    if method == "urv":
        from .urv import urv_decomp_full, urv_lstsq
        u, r, v, rank = urv_decomp_full(a)
        return urv_lstsq(u, r, v, rank, y)
    u, sv, v = svd_decomp(a)
    return svd_lstsq(u, sv, v, y, rcond=rcond)
