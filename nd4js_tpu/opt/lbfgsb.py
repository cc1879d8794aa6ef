"""Box-constrained L-BFGS (L-BFGS-B capability).

Parity with /root/reference/src/opt/lbfgsb.js:37-239 (`min_lbfgsb_gen`)
and the machinery of _lbfgsb_solver.js (:72-784).

TPU-first mechanism: a projected-path quasi-Newton method — the
generalized-Cauchy breakpoint walk of the reference (sequential,
data-dependent segment count) is replaced by

  1. a Cauchy step along the *projected* gradient path with the
     diagonal model θI (one vectorised breakpoint clamp),
  2. a subspace step: the L-BFGS two-loop direction restricted to the
     free set (variables not at an active bound with inward gradient),
  3. projection of the trial onto the box + backtracking Armijo search
     along the projected path (the reference's more_thuente_u123
     projected search, :37),
  4. curvature-guarded memory update exactly as in lbfgs.py.

Same contract — monotone descent to a KKT point of min f s.t.
lo ≤ x ≤ hi — with every step a fixed-shape vector op.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ._lbfgs_solver import (LBFGSState, lbfgs_init, lbfgs_update,
                            lbfgs_forget, lbfgs_hv)
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
    # free set: not pinned at a bound by the gradient
    at_lo = (s.x <= lo) & (s.g > 0)
    at_hi = (s.x >= hi) & (s.g < 0)
    free = ~(at_lo | at_hi)
    g_eff = jnp.where(free, s.g, 0.0)
    # subspace quasi-Newton direction on the free set
    d = -lbfgs_hv(s.mem, g_eff)
    d = jnp.where(free, d, 0.0)
    # fall back to projected steepest descent if not a descent direction
    descent = jnp.vdot(d, g_eff) < 0
    gn = jnp.sqrt(jnp.vdot(g_eff, g_eff))
    d = jnp.where(descent, d, -g_eff / jnp.maximum(gn, 1.0))

    # backtracking Armijo along the projected path
    def ls_body(carry):
        alpha, best_x, best_f, k, done = carry
        xt = _project(s.x + alpha * d, lo, hi)
        ft, _ = fg(xt)
        dx = xt - s.x
        ok = ft <= s.f + 1e-4 * jnp.vdot(s.g, dx)
        improved = ok & (ft < s.f)
        return (alpha * 0.5,
                jnp.where(improved & ~done, xt, best_x),
                jnp.where(improved & ~done, ft, best_f),
                k + 1, done | improved)

    def ls_cond(carry):
        alpha, _, _, k, done = carry
        return (~done) & (k < max_ls)

    alpha0 = jnp.ones((), s.f.dtype)
    _, x_new, f_new, _, found = jax.lax.while_loop(
        ls_cond, ls_body, (alpha0, s.x, s.f, jnp.zeros((), jnp.int32),
                           jnp.zeros((), bool)))

    def success(s):
        _, g_new = fg(x_new)
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
