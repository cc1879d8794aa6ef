"""Trust-region Levenberg-Marquardt (Moré).

Parity with /root/reference/src/opt/lm.js: `lsq_lm_gen` (:44), the `_lm`
loop with Gauss-Newton-in-radius test, Moré λ iteration (Algorithm
5.5a-c, :132-153), trust-radius update with polynomial shrink
(:174-206), the stuckometer (:214 — here a status/early-exit instead of
OptimizationNoProgressError), and `fit_lm_gen` (:226-304).

Option names follow the reference's knobs (lm.js:48-82) where they map:
{r0, rMin, rMax, rTol, shrinkLower, shrinkUpper, grow, expectGainMin,
expectGainMax, stuckLimit}.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ._trust_region import LsqState, lsq_state, newton_step, more_lambda_step
from .optimization_error import OptimizationNoProgressError

__all__ = ["lsq_lm_gen", "lsq_lm", "fit_lm_gen", "fit_lm"]


class _LMState(NamedTuple):
    st: LsqState
    radius: jax.Array
    it: jax.Array
    stuck: jax.Array
    loss: jax.Array       # 0.5 ‖F‖²


_DEFAULTS = dict(r0=1.0, rMin=1e-10, rMax=1e10,
                 shrinkLower=0.05, shrinkUpper=0.5, grow=1.5,
                 expectGainMin=0.25, expectGainMax=0.75,
                 stuckLimit=32)


def _lm_step(fJ, opt, s: _LMState) -> _LMState:
    st = s.st
    dx = more_lambda_step(st, s.radius)
    x_new = st.x + dx
    f_new, j_new = fJ(x_new)
    loss_new = 0.5 * jnp.sum(f_new * f_new)
    # predicted reduction from the model ‖F + J·dx‖
    pred = st.f + jnp.einsum("ij,j->i", st.j, dx, precision="highest")
    loss_pred = 0.5 * jnp.sum(pred * pred)
    predicted = s.loss - loss_pred
    actual = s.loss - loss_new
    safe_pred = jnp.where(predicted == 0, 1.0, predicted)
    rho = actual / safe_pred

    # radius update (ref: lm.js:174-206): polynomial shrink via the
    # quadratic through (0, loss), slope g·dx, (1, loss_new)
    gdx = jnp.vdot(st.g, dx)
    denom = 2 * (loss_new - s.loss - gdx)
    shrink = jnp.where(denom > 0, -gdx / jnp.where(denom == 0, 1., denom),
                       opt["shrinkUpper"])
    shrink = jnp.clip(shrink, opt["shrinkLower"], opt["shrinkUpper"])
    dnorm = jnp.sqrt(jnp.sum((st.d * dx) ** 2))
    radius = jnp.where(
        rho < opt["expectGainMin"], jnp.maximum(s.radius * shrink,
                                                opt["rMin"]),
        jnp.where((rho > opt["expectGainMax"])
                  & (dnorm >= 0.9 * s.radius),
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


def _init(fJ, x0, opt) -> _LMState:
    x0 = jnp.asarray(x0)
    f0, j0 = fJ(x0)
    st = lsq_state(x0, f0, j0)
    return _LMState(st=st, radius=jnp.asarray(opt["r0"], x0.dtype),
                    it=jnp.zeros((), jnp.int32),
                    stuck=jnp.zeros((), jnp.int32),
                    loss=0.5 * jnp.sum(f0 * f0))


def _report(s: _LMState):
    """(x, mse, ∇mse) like the reference's report()
    (ref: _trust_region_solver_lsq.js:181-203)."""
    m = s.st.f.size
    return s.st.x, 2 * s.loss / m, 2 * s.st.g / m


def lsq_lm_gen(fJ, x0, **options):
    """Infinite generator yielding (x, mse, ∇mse) per iteration
    (ref: lm.js:44). Raises OptimizationNoProgressError when the
    stuckometer exceeds its limit, like the reference (lm.js:215)."""
    opt = {**_DEFAULTS, **options}
    s = _init(fJ, x0, opt)
    step = jax.jit(functools.partial(_lm_step, fJ, opt))
    while True:
        yield _report(s)
        s = step(s)
        if int(s.stuck) > opt["stuckLimit"]:
            raise OptimizationNoProgressError(x=s.st.x)


def lsq_lm(fJ, x0, gtol: float = 1e-8, max_iter: int = 200, **options):
    """Fully in-graph LM: returns (x, mse, ∇mse, n_iter). jit-safe."""
    opt = {**_DEFAULTS, **options}
    s0 = _init(fJ, x0, opt)

    def cond(s):
        return (s.it < max_iter) & (jnp.max(jnp.abs(s.st.g)) > gtol) \
            & (s.stuck <= opt["stuckLimit"])

    s = jax.lax.while_loop(cond, functools.partial(_lm_step, fJ, opt), s0)
    x, mse, g = _report(s)
    return x, mse, g, s.it


def _fit_fJ(x, y, f, jac=None):
    x = jnp.asarray(x)
    y = jnp.asarray(y)

    def fJ(p):
        F = f(p, x) - y
        J = (jac(p, x) if jac is not None
             else jax.jacobian(lambda q: f(q, x))(p))
        return F.reshape(-1), J.reshape(F.size, -1)

    return fJ


def fit_lm_gen(x, y, f, p0, jac=None, **options):
    """Curve-fit LM generator (ref: lm.js:226-304): yields
    (p, mse, ∇mse). ``f(p, x)`` vectorised over x; Jacobian via
    ``jax.jacobian`` unless supplied."""
    return lsq_lm_gen(_fit_fJ(x, y, f, jac), jnp.asarray(p0), **options)


def fit_lm(x, y, f, p0, jac=None, **kw):
    """In-graph curve fit. Returns (p, mse, ∇mse, n_iter)."""
    return lsq_lm(_fit_fJ(x, y, f, jac), jnp.asarray(p0), **kw)
