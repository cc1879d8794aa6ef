"""Orthogonal distance regression / total least squares.

Parity with /root/reference/src/opt/_trust_region_solver_tls.js (the
ODR/TLS trust-region solver, :34-152 wrapper `odr_gen`, :160-260 sparse
block Jacobian [[J11=diag, 0], [J21, J22]]) and the fronts
`odr_{lm,dogleg}_gen` / `tls_{lm,dogleg}_gen` (lm.js:220-223,
dogleg.js:216-222).

Problem: min_{p, Δx}  Σᵢ ‖Δxᵢ‖² + Σᵢ ‖f(p, xᵢ+Δxᵢ) − yᵢ‖².

Two mechanisms:

  * method='schur' (default): the structured solver
    (_trust_region_tls.py) — per-point Schur elimination of the Δx
    block, so memory is O(M·NY·(NP+NX)) and the λ iteration solves only
    an NP×NP system. This is the TPU-native counterpart of the
    reference's banded Givens QR (:160-260) and handles M = 10⁴⁺ points
    in-graph.
  * method='dense': the block Jacobian is materialised and fed to the
    generic dense LM/dogleg drivers — exercises the same machinery as
    every other lsq front; O((M·NX)²) memory, fine for small M.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .lm import lsq_lm_gen, lsq_lm
from .dogleg import lsq_dogleg_gen, lsq_dogleg
from .optimization_error import OptimizationNoProgressError

__all__ = ["odr_lm_gen", "odr_dogleg_gen", "odr_lm", "odr_dogleg",
           "tls_lm_gen", "tls_dogleg_gen", "fit_odr_lm", "fit_odr_dogleg"]


def _odr_problem(x, y, f, p0, dx0=None):
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    p0 = jnp.asarray(p0)
    x2 = x if x.ndim == 2 else x[:, None]
    y2 = y if y.ndim == 2 else y[:, None]
    M, NX = x2.shape
    MY, NY = y2.shape
    if M != MY:
        raise ValueError("x and y must have the same number of rows")
    NP = p0.size
    x_shape = x.shape

    def apply_f(p, xx_flat):
        xx = xx_flat.reshape(x_shape)
        out = f(p, xx)
        return jnp.asarray(out).reshape(M, NY)

    def f_point(p, xi_flat):
        # evaluate f on a single point by broadcasting through the
        # vectorised f (rows are independent)
        xx = jnp.broadcast_to(xi_flat.reshape((1,) + x_shape[1:]),
                              x2.shape[:1] + x_shape[1:]) \
            .reshape(x_shape)
        return jnp.asarray(f(p, xx)).reshape(M, NY)[0]

    eyeM = jnp.eye(M, dtype=p0.dtype)

    def fJ(u):
        p = u[:NP]
        dx = u[NP:].reshape(M, NX)
        xx_flat = (x2 + dx).reshape(-1)
        F1 = (apply_f(p, xx_flat) - y2).reshape(-1)          # (M·NY,)
        Jp = jax.jacfwd(lambda q: apply_f(q, xx_flat))(p) \
            .reshape(M * NY, NP)
        # per-point dy/dx, embedded block-diagonally
        Jx = jax.vmap(
            lambda xi: jax.jacfwd(lambda z: f_point(p, z))(xi)
        )((x2 + dx))                                          # (M, NY, NX)
        J21 = (eyeM[:, None, :, None] * Jx[:, :, None, :]) \
            .reshape(M * NY, M * NX)
        F2 = dx.reshape(-1)
        top = jnp.concatenate([Jp, J21], axis=1)
        bot = jnp.concatenate(
            [jnp.zeros((M * NX, NP), p0.dtype),
             jnp.eye(M * NX, dtype=p0.dtype)], axis=1)
        return (jnp.concatenate([F1, F2]),
                jnp.concatenate([top, bot], axis=0))

    dx0 = jnp.zeros_like(x2) if dx0 is None \
        else jnp.asarray(dx0).reshape(M, NX)
    u0 = jnp.concatenate([p0, dx0.reshape(-1)])

    def unpack(u):
        return u[:NP], u[NP:].reshape(x_shape)

    return fJ, u0, unpack


# ---------------------------------------------------------------------
# structured (Schur-complement) driver — the default mechanism
# ---------------------------------------------------------------------

class _OdrLMState(NamedTuple):
    st: object           # TlsState
    radius: jax.Array
    it: jax.Array
    stuck: jax.Array
    loss: jax.Array


_ODR_DEFAULTS = dict(r0=1.0, rMin=1e-10, rMax=1e10,
                     shrinkLower=0.05, shrinkUpper=0.5, grow=1.5,
                     expectGainMin=0.25, expectGainMax=0.75,
                     stuckLimit=32)


def _odr_blocks(x2, y2, f, x_shape):
    """Return eval(p, dx) -> (f1, A, B): residuals and per-point
    Jacobian blocks via forward-mode AD. B comes from NX jvp passes with
    an all-points tangent (rows are independent, so one jvp in direction
    e_k yields every point's ∂f/∂x_k at once)."""
    M, NX = x2.shape
    NY = y2.shape[1]

    def apply_f(p, xx2):
        out = f(p, xx2.reshape(x_shape))
        return jnp.asarray(out).reshape(M, NY)

    def ev(p, dx):
        xx2 = x2 + dx
        f1 = apply_f(p, xx2) - y2
        a = jax.jacfwd(lambda q: apply_f(q, xx2))(p)     # (M, NY, NP)
        cols = []
        for k in range(NX):
            tang = jnp.zeros_like(xx2).at[:, k].set(1.0)
            _, bk = jax.jvp(lambda z: apply_f(p, z), (xx2,), (tang,))
            cols.append(bk)                              # (M, NY)
        b = jnp.stack(cols, axis=-1)                     # (M, NY, NX)
        return f1, a, b

    return ev


def _odr_lm_step(ev, opt, s: _OdrLMState) -> _OdrLMState:
    from ._trust_region_tls import tls_state, tls_more_lambda_step
    st = s.st
    dp, ddx = tls_more_lambda_step(st, s.radius)
    p_new = st.p + dp
    dx_new = st.dx + ddx
    f1_new, a_new, b_new = ev(p_new, dx_new)
    loss_new = 0.5 * (jnp.sum(f1_new * f1_new) + jnp.sum(dx_new * dx_new))
    # model prediction
    pred1 = st.f1 + jnp.einsum("myp,p->my", st.a, dp,
                               precision="highest") \
        + jnp.einsum("myx,mx->my", st.b, ddx, precision="highest")
    pred2 = st.dx + ddx
    loss_pred = 0.5 * (jnp.sum(pred1 * pred1) + jnp.sum(pred2 * pred2))
    predicted = s.loss - loss_pred
    actual = s.loss - loss_new
    rho = actual / jnp.where(predicted == 0, 1.0, predicted)
    gdx = jnp.vdot(st.g_p, dp) + jnp.vdot(st.g_dx.ravel(), ddx.ravel())
    denom = 2 * (loss_new - s.loss - gdx)
    shrink = jnp.where(denom > 0,
                       -gdx / jnp.where(denom == 0, 1.0, denom),
                       opt["shrinkUpper"])
    shrink = jnp.clip(shrink, opt["shrinkLower"], opt["shrinkUpper"])
    dnorm = jnp.sqrt(jnp.sum((st.d_p * dp) ** 2)
                     + jnp.sum((st.d_dx * ddx) ** 2))
    radius = jnp.where(
        rho < opt["expectGainMin"],
        jnp.maximum(s.radius * shrink, opt["rMin"]),
        jnp.where((rho > opt["expectGainMax"]) & (dnorm >= 0.9 * s.radius),
                  jnp.minimum(s.radius * opt["grow"], opt["rMax"]),
                  s.radius))
    accept = (actual > 0) & jnp.isfinite(loss_new)

    def acc(_):
        from ._trust_region_tls import tls_state
        st2 = tls_state(p_new, dx_new, f1_new, a_new, b_new,
                        d_prev=(st.d_p, st.d_dx))
        return _OdrLMState(st=st2, radius=radius, it=s.it + 1,
                           stuck=jnp.zeros((), jnp.int32), loss=loss_new)

    def rej(_):
        return _OdrLMState(st=st, radius=radius, it=s.it + 1,
                           stuck=s.stuck + 1, loss=s.loss)

    return jax.lax.cond(accept, acc, rej, None)


def _odr_init(ev, p0, dx0, opt):
    from ._trust_region_tls import tls_state
    f1, a, b = ev(p0, dx0)
    st = tls_state(p0, dx0, f1, a, b)
    loss = 0.5 * (jnp.sum(f1 * f1) + jnp.sum(dx0 * dx0))
    return _OdrLMState(st=st, radius=jnp.asarray(opt["r0"], p0.dtype),
                       it=jnp.zeros((), jnp.int32),
                       stuck=jnp.zeros((), jnp.int32), loss=loss)


def _odr_report(s, x_shape):
    m = s.st.f1.size + s.st.dx.size
    g = jnp.concatenate([s.st.g_p, s.st.g_dx.ravel()])
    return ((s.st.p, s.st.dx.reshape(x_shape)), 2 * s.loss / m,
            2 * g / m)


def _odr_setup(x, y, f, p0, dx0):
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    p0 = jnp.asarray(p0)
    x2 = x if x.ndim == 2 else x[:, None]
    y2 = y if y.ndim == 2 else y[:, None]
    if x2.shape[0] != y2.shape[0]:
        raise ValueError("x and y must have the same number of rows")
    dx0 = jnp.zeros_like(x2) if dx0 is None \
        else jnp.asarray(dx0).reshape(x2.shape)
    return x2, y2, p0, dx0, x.shape


def odr_lm_gen(x, y, f, p0, dx0=None, method: str = "schur", **options):
    """ODR fit via trust-region LM (ref: lm.js:223): yields
    ((p, Δx), mse, ∇mse). ``f(p, x)`` vectorised over x rows.

    method='schur' (default) uses the structured Δx-eliminated solver
    (O(M) memory); method='dense' materialises the block Jacobian."""
    if method == "dense":
        fJ, u0, unpack = _odr_problem(x, y, f, p0, dx0)
        for u, mse, g in lsq_lm_gen(fJ, u0, **options):
            yield unpack(u), mse, g
        return
    x2, y2, p0, dx0, x_shape = _odr_setup(x, y, f, p0, dx0)
    opt = {**_ODR_DEFAULTS, **options}
    ev = _odr_blocks(x2, y2, f, x_shape)
    s = _odr_init(ev, p0, dx0, opt)
    step = jax.jit(functools.partial(_odr_lm_step, ev, opt))
    while True:
        yield _odr_report(s, x_shape)
        s = step(s)
        if int(s.stuck) > opt["stuckLimit"]:
            raise OptimizationNoProgressError(x=s.st.p)


def odr_dogleg_gen(x, y, f, p0, dx0=None, **options):
    """ODR fit via dogleg (ref: dogleg.js:219) — dense block Jacobian
    through the generic dogleg driver."""
    fJ, u0, unpack = _odr_problem(x, y, f, p0, dx0)
    for u, mse, g in lsq_dogleg_gen(fJ, u0, **options):
        yield unpack(u), mse, g


def odr_lm(x, y, f, p0, dx0=None, method: str = "schur",
           gtol: float = 1e-8, max_iter: int = 200, **options):
    """In-graph ODR (LM). Returns ((p, Δx), mse, ∇mse, n_iter)."""
    if method == "dense":
        fJ, u0, unpack = _odr_problem(x, y, f, p0, dx0)
        u, mse, g, it = lsq_lm(fJ, u0, gtol=gtol, max_iter=max_iter,
                               **options)
        return unpack(u), mse, g, it
    x2, y2, p0, dx0, x_shape = _odr_setup(x, y, f, p0, dx0)
    opt = {**_ODR_DEFAULTS, **options}
    ev = _odr_blocks(x2, y2, f, x_shape)
    s0 = _odr_init(ev, p0, dx0, opt)

    def cond(s):
        g = jnp.maximum(jnp.max(jnp.abs(s.st.g_p)),
                        jnp.max(jnp.abs(s.st.g_dx)))
        return (s.it < max_iter) & (g > gtol) \
            & (s.stuck <= opt["stuckLimit"])

    s = jax.lax.while_loop(
        cond, functools.partial(_odr_lm_step, ev, opt), s0)
    (p, dx), mse, g = _odr_report(s, x_shape)
    return (p, dx), mse, g, s.it


def odr_dogleg(x, y, f, p0, dx0=None, **kw):
    """In-graph ODR (dogleg) — dense path."""
    fJ, u0, unpack = _odr_problem(x, y, f, p0, dx0)
    u, mse, g, it = lsq_dogleg(fJ, u0, **kw)
    return unpack(u), mse, g, it


# The reference's TLS fronts share the ODR solver
# (_trust_region_solver_tls.js handles both; lm.js:220-223).
tls_lm_gen = odr_lm_gen
tls_dogleg_gen = odr_dogleg_gen
fit_odr_lm = odr_lm
fit_odr_dogleg = odr_dogleg
