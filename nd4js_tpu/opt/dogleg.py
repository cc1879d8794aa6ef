"""Dogleg trust-region methods.

Parity with /root/reference/src/opt/dogleg.js: `min_dogleg_gen` (:31,
L-BFGS Hessian model via _trust_region_solver_lbfgs.js), `lsq_dogleg_gen`
(:57) and the fit front (:222) — the same trust-region outer loop as
lm.py but with the dogleg path (Cauchy point → Newton point, sphere
intersection by the stable quadratic of polyquad.js) instead of Moré's
λ iteration.

`min_dogleg` models curvature along the gradient with a secant
gradient-difference (one extra fg evaluation per step) where the
reference uses its L-BFGS B·v product — same role, cheaper state.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ._trust_region import LsqState, lsq_state, newton_step
from ._lbfgs_solver import lbfgs_init, lbfgs_update, lbfgs_hv, LBFGSState
from .polyquad import roots1d_polyquad
from .optimization_error import OptimizationNoProgressError
from .lm import _DEFAULTS, _report, _LMState, _init, _fit_fJ

__all__ = ["lsq_dogleg_gen", "lsq_dogleg", "fit_dogleg_gen",
           "min_dogleg_gen", "min_dogleg"]


def _dogleg_dx(st: LsqState, radius):
    """Dogleg step in D-scaled space (ref: dogleg.js:57-215)."""
    dx_gn, r_gn, _ = newton_step(st)
    # Cauchy point: dx_c = −t·g, t = ‖g‖²/‖J·g‖²
    jg = jnp.einsum("ij,j->i", st.j, st.g, precision="highest")
    gg = jnp.vdot(st.g, st.g)
    jg2 = jnp.vdot(jg, jg)
    t = gg / jnp.where(jg2 == 0, 1.0, jg2)
    dx_c = -t * st.g
    r_c = jnp.sqrt(jnp.sum((st.d * dx_c) ** 2))

    def newton(_):
        return dx_gn

    def scaled_cauchy(_):
        safe = jnp.where(r_c == 0, 1.0, r_c)
        return dx_c * (radius / safe)

    def leg(_):
        # ‖D(dx_c + s·(dx_gn − dx_c))‖ = radius, s ∈ [0, 1]
        dd = st.d * (dx_gn - dx_c)
        dc = st.d * dx_c
        c2 = jnp.vdot(dd, dd)
        c1 = 2 * jnp.vdot(dc, dd)
        c0 = jnp.vdot(dc, dc) - radius * radius
        _, s = roots1d_polyquad(c0, c1, c2)
        s = jnp.clip(jnp.nan_to_num(s, nan=0.0), 0.0, 1.0)
        return dx_c + s * (dx_gn - dx_c)

    return jax.lax.cond(
        r_gn <= radius, newton,
        lambda _: jax.lax.cond(r_c >= radius, scaled_cauchy, leg, None),
        None)


def _dogleg_step(fJ, opt, s: _LMState) -> _LMState:
    st = s.st
    dx = _dogleg_dx(st, s.radius)
    x_new = st.x + dx
    f_new, j_new = fJ(x_new)
    loss_new = 0.5 * jnp.sum(f_new * f_new)
    pred = st.f + jnp.einsum("ij,j->i", st.j, dx, precision="highest")
    predicted = s.loss - 0.5 * jnp.sum(pred * pred)
    actual = s.loss - loss_new
    rho = actual / jnp.where(predicted == 0, 1.0, predicted)
    dnorm = jnp.sqrt(jnp.sum((st.d * dx) ** 2))
    radius = jnp.where(
        rho < opt["expectGainMin"],
        jnp.maximum(s.radius * opt["shrinkUpper"], opt["rMin"]),
        jnp.where((rho > opt["expectGainMax"]) & (dnorm >= 0.9 * s.radius),
                  jnp.minimum(s.radius * opt["grow"], opt["rMax"]),
                  s.radius))
    accept = (actual > 0) & jnp.isfinite(loss_new)

    def acc(_):
        st2 = lsq_state(x_new, f_new, j_new, d_prev=st.d)
        return _LMState(st=st2, radius=radius, it=s.it + 1,
                        stuck=jnp.zeros((), jnp.int32), loss=loss_new)

    def rej(_):
        return _LMState(st=st, radius=radius, it=s.it + 1,
                        stuck=s.stuck + 1, loss=s.loss)

    return jax.lax.cond(accept, acc, rej, None)


def lsq_dogleg_gen(fJ, x0, **options):
    """Least-squares dogleg generator: yields (x, mse, ∇mse)
    (ref: dogleg.js:57)."""
    opt = {**_DEFAULTS, **options}
    s = _init(fJ, x0, opt)
    step = jax.jit(functools.partial(_dogleg_step, fJ, opt))
    while True:
        yield _report(s)
        s = step(s)
        if int(s.stuck) > opt["stuckLimit"]:
            raise OptimizationNoProgressError(x=s.st.x)


def lsq_dogleg(fJ, x0, gtol: float = 1e-8, max_iter: int = 200,
               **options):
    """In-graph dogleg least squares. Returns (x, mse, ∇mse, n_iter)."""
    opt = {**_DEFAULTS, **options}
    s0 = _init(fJ, x0, opt)

    def cond(s):
        return (s.it < max_iter) & (jnp.max(jnp.abs(s.st.g)) > gtol) \
            & (s.stuck <= opt["stuckLimit"])

    s = jax.lax.while_loop(cond,
                           functools.partial(_dogleg_step, fJ, opt), s0)
    x, mse, g = _report(s)
    return x, mse, g, s.it


def fit_dogleg_gen(x, y, f, p0, jac=None, **options):
    """Curve-fit dogleg generator (ref: dogleg.js:222)."""
    return lsq_dogleg_gen(_fit_fJ(x, y, f, jac), jnp.asarray(p0),
                          **options)


# ---------------------------------------------------------------------
# general minimisation with an L-BFGS trust-region model
# ---------------------------------------------------------------------

class _MinDLState(NamedTuple):
    x: jax.Array
    f: jax.Array
    g: jax.Array
    mem: LBFGSState
    radius: jax.Array
    it: jax.Array
    stuck: jax.Array


def _min_dogleg_step(fg, opt, s: _MinDLState) -> _MinDLState:
    from ._lbfgsb_solver import compact_wk, bv
    # quasi-Newton point from the L-BFGS inverse-Hessian model
    dx_qn = -lbfgs_hv(s.mem, s.g)
    # Cauchy point from the exact L-BFGS B·v model (compact form,
    # ref: _trust_region_solver_lbfgs.js:47 cauchyTravel): t = g·g/g·Bg
    wk = compact_wk(s.mem)
    bg = bv(wk, s.g)
    gg = jnp.vdot(s.g, s.g)
    gbg = jnp.vdot(s.g, bg)
    t = jnp.where(gbg > 0, gg / jnp.where(gbg == 0, 1.0, gbg), 1.0)
    dx_c = -t * s.g
    r_qn = jnp.sqrt(jnp.vdot(dx_qn, dx_qn))
    r_c = jnp.sqrt(jnp.vdot(dx_c, dx_c))

    def qn(_):
        return dx_qn

    def cauchy(_):
        return dx_c * (s.radius / jnp.where(r_c == 0, 1.0, r_c))

    def leg(_):
        dd = dx_qn - dx_c
        c2 = jnp.vdot(dd, dd)
        c1 = 2 * jnp.vdot(dx_c, dd)
        c0 = jnp.vdot(dx_c, dx_c) - s.radius ** 2
        _, t2 = roots1d_polyquad(c0, c1, c2)
        t2 = jnp.clip(jnp.nan_to_num(t2, nan=0.0), 0.0, 1.0)
        return dx_c + t2 * dd

    dx = jax.lax.cond(
        r_qn <= s.radius, qn,
        lambda _: jax.lax.cond(r_c >= s.radius, cauchy, leg, None), None)

    x_new = s.x + dx
    f_new, g_new = fg(x_new)
    # exact model decrease: m(0) − m(dx) = −gᵀdx − ½·dxᵀ·B·dx
    predicted = -jnp.vdot(s.g, dx) - 0.5 * jnp.vdot(dx, bv(wk, dx))
    predicted = jnp.maximum(predicted, -jnp.vdot(s.g, dx) * 0.5)
    actual = s.f - f_new
    rho = actual / jnp.where(predicted == 0, 1.0, predicted)
    radius = jnp.where(
        rho < opt["expectGainMin"],
        jnp.maximum(s.radius * opt["shrinkUpper"], opt["rMin"]),
        jnp.where(rho > opt["expectGainMax"],
                  jnp.minimum(s.radius * opt["grow"], opt["rMax"]),
                  s.radius))
    accept = (actual > 0) & jnp.isfinite(f_new)

    def acc(_):
        mem = lbfgs_update(s.mem, dx, g_new - s.g)
        return _MinDLState(x=x_new, f=f_new, g=g_new, mem=mem,
                           radius=radius, it=s.it + 1,
                           stuck=jnp.zeros((), jnp.int32))

    def rej(_):
        return s._replace(radius=radius, it=s.it + 1, stuck=s.stuck + 1)

    return jax.lax.cond(accept, acc, rej, None)


def min_dogleg_gen(fg, x0, hist_size: int = 8, **options):
    """General trust-region minimisation generator: yields (x, f, ∇f)
    (ref: dogleg.js:31)."""
    from .lbfgs import _ensure_fg
    opt = {**_DEFAULTS, **options}
    x0 = jnp.asarray(x0)
    fg = _ensure_fg(fg, x0)
    f0, g0 = fg(x0)
    s = _MinDLState(x=x0, f=jnp.asarray(f0), g=jnp.asarray(g0),
                    mem=lbfgs_init(hist_size, x0.size, x0.dtype),
                    radius=jnp.asarray(opt["r0"], x0.dtype),
                    it=jnp.zeros((), jnp.int32),
                    stuck=jnp.zeros((), jnp.int32))
    step = jax.jit(functools.partial(_min_dogleg_step, fg, opt))
    while True:
        yield s.x, s.f, s.g
        s = step(s)
        if int(s.stuck) > opt["stuckLimit"]:
            raise OptimizationNoProgressError(x=s.x)


def min_dogleg(fg, x0, hist_size: int = 8, gtol: float = 1e-8,
               max_iter: int = 500, **options):
    """In-graph trust-region minimisation. Returns (x, f, g, n_iter)."""
    from .lbfgs import _ensure_fg
    opt = {**_DEFAULTS, **options}
    x0 = jnp.asarray(x0)
    fg = _ensure_fg(fg, x0)
    f0, g0 = fg(x0)
    s0 = _MinDLState(x=x0, f=jnp.asarray(f0), g=jnp.asarray(g0),
                     mem=lbfgs_init(hist_size, x0.size, x0.dtype),
                     radius=jnp.asarray(opt["r0"], x0.dtype),
                     it=jnp.zeros((), jnp.int32),
                     stuck=jnp.zeros((), jnp.int32))

    def cond(s):
        return (s.it < max_iter) & (jnp.max(jnp.abs(s.g)) > gtol) \
            & (s.stuck <= opt["stuckLimit"])

    s = jax.lax.while_loop(
        cond, functools.partial(_min_dogleg_step, fg, opt), s0)
    return s.x, s.f, s.g, s.it
