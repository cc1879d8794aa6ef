"""Box-constrained L-BFGS-B.

Parity with /root/reference/src/opt/lbfgsb.js:37-239 (`min_lbfgsb_gen`)
and the full machinery of _lbfgsb_solver.js (:72-784): compact-
representation B·v products, the generalized Cauchy point over the box
breakpoints, and subspace minimisation on the free set — see
``_lbfgsb_solver.py`` for the TPU-shaped mechanisms (masked fixed-length
breakpoint scan, Woodbury subspace solve). The driver couples them to
the bounded more_thuente_u123 line search exactly as the reference
(lbfgsb.js:37), with the forget-half-history recovery on failure.

Contract: monotone descent to a KKT point of min f s.t. lo ≤ x ≤ hi,
every step a fixed-shape vector op (jit/while_loop-safe).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ._lbfgs_solver import (LBFGSState, lbfgs_init, lbfgs_update,
                            lbfgs_forget)
from .optimization_error import OptimizationNoProgressError

__all__ = ["min_lbfgsb_gen", "lbfgsb_minimize"]


class _BState(NamedTuple):
    x: jax.Array
    f: jax.Array
    g: jax.Array
    mem: LBFGSState
    it: jax.Array
    fails: jax.Array


def _project(x, lo, hi):
    return jnp.clip(x, lo, hi)


def _kkt_residual(x, g, lo, hi):
    """Projected-gradient norm: 0 at a KKT point."""
    return jnp.max(jnp.abs(_project(x - g, lo, hi) - x))


def _lbfgsb_step(fg, lo, hi, s: _BState, max_ls: int = 30) -> _BState:
    """One L-BFGS-B iteration (ref: lbfgsb.js:37-239 driver over the
    _lbfgsb_solver.js machinery):

      1. generalized Cauchy point along the projected gradient path
         (breakpoint scan with the compact B model),
      2. subspace minimisation of the quadratic over the free set
         (Sherman-Morrison-Woodbury direct primal method),
      3. bounded strong-Wolfe search (more_thuente_u123 semantics,
         αMax = 1 — the subspace minimiser is the far end of the path),
      4. curvature-guarded memory update; on failure, forget half the
         history (the reference's recovery, lbfgs.js:208-214).
    """
    from ._lbfgsb_solver import compact_wk, cauchy_point, subspace_step
    from .line_search._engine import line_search_engine, OK, BOUND_REACHED
    import math as _math

    wk = compact_wk(s.mem)
    x_cp, c, free = cauchy_point(wk, s.x, s.g, lo, hi)
    x_bar = subspace_step(wk, s.x, s.g, x_cp, c, free, lo, hi)

    d = x_bar - s.x
    descent = jnp.vdot(d, s.g) < 0
    # fall back to the Cauchy point path when the subspace step is not
    # a descent direction (degenerate model)
    d_cp = x_cp - s.x
    cp_descent = jnp.vdot(d_cp, s.g) < 0
    d = jnp.where(descent, d, jnp.where(cp_descent, d_cp, -s.g))

    def fg_proj(x):
        return fg(_project(x, lo, hi))

    x_new, f_new, g_new, alpha, status, _ = line_search_engine(
        fg_proj, s.x, s.f, s.g, -d,
        fRed=1e-2, gRed=0.9, growMin=_math.pi / 3,
        growMax=_math.e - 1.5, shrinkLeast=0.1, variant="u123",
        alpha0=jnp.ones((), s.f.dtype), alpha_max=jnp.ones((), s.f.dtype),
        max_iter=max_ls)
    x_new = _project(x_new, lo, hi)
    found = ((status == OK) | (status == BOUND_REACHED)) & (f_new < s.f)

    def success(s):
        dx = x_new - s.x
        dg = g_new - s.g
        mem = lbfgs_update(s.mem, dx, dg)
        return _BState(x=x_new, f=f_new, g=g_new, mem=mem, it=s.it + 1,
                       fails=jnp.zeros((), jnp.int32))

    def failure(s):
        mem = lbfgs_forget(s.mem, (s.mem.s.shape[0] + 1) // 2)
        return s._replace(mem=mem, it=s.it + 1, fails=s.fails + 1)

    return jax.lax.cond(found, success, failure, s)


def _init_b(fg, x0, lo, hi, hist_size):
    x0 = _project(jnp.asarray(x0), lo, hi)
    f0, g0 = fg(x0)
    return _BState(x=x0, f=jnp.asarray(f0), g=jnp.asarray(g0),
                   mem=lbfgs_init(hist_size, x0.size, x0.dtype),
                   it=jnp.zeros((), jnp.int32),
                   fails=jnp.zeros((), jnp.int32))


def _bounds(bounds, n, dtype):
    lo = jnp.asarray(bounds[0], dtype)
    hi = jnp.asarray(bounds[1], dtype)
    return jnp.broadcast_to(lo, (n,)), jnp.broadcast_to(hi, (n,))


def min_lbfgsb_gen(fg, x0, bounds, hist_size: int = 8):
    """Generator yielding (x, f, ∇f) for min f s.t. lo ≤ x ≤ hi
    (ref: lbfgsb.js:37). ``bounds = (lo, hi)`` broadcastable to x."""
    from .lbfgs import _ensure_fg
    x0 = jnp.asarray(x0)
    fg = _ensure_fg(fg, x0)
    lo, hi = _bounds(bounds, x0.size, x0.dtype)
    s = _init_b(fg, x0, lo, hi, hist_size)
    step = jax.jit(functools.partial(_lbfgsb_step, fg, lo, hi))
    while True:
        yield s.x, s.f, s.g
        s = step(s)
        if int(s.fails) > 5:
            raise OptimizationNoProgressError(x=s.x)


def lbfgsb_minimize(fg, x0, bounds, hist_size: int = 8,
                    tol: float = 1e-8, max_iter: int = 500):
    """In-graph box-constrained minimisation. Returns (x, f, g, n_iter);
    convergence = projected-gradient (KKT) residual ≤ tol."""
    from .lbfgs import _ensure_fg
    x0 = jnp.asarray(x0)
    fg = _ensure_fg(fg, x0)
    lo, hi = _bounds(bounds, x0.size, x0.dtype)
    s0 = _init_b(fg, x0, lo, hi, hist_size)

    def cond(s):
        return (s.it < max_iter) & (s.fails < 5) \
            & (_kkt_residual(s.x, s.g, lo, hi) > tol)

    s = jax.lax.while_loop(
        cond, functools.partial(_lbfgsb_step, fg, lo, hi), s0)
    return s.x, s.f, s.g, s.it
