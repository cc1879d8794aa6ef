"""Orthogonal distance regression / total least squares.

Parity with /root/reference/src/opt/_trust_region_solver_tls.js (the
ODR/TLS trust-region solver, :34-152 wrapper `odr_gen`, :160-260 sparse
block Jacobian [[J11=diag, 0], [J21, J22]]) and the fronts
`odr_{lm,dogleg}_gen` / `tls_{lm,dogleg}_gen` (lm.js:220-223,
dogleg.js:216-222).

Problem: min_{p, Δx}  Σᵢ ‖Δxᵢ‖² + Σᵢ ‖f(p, xᵢ+Δxᵢ) − yᵢ‖².

TPU-first mechanism: the unknowns u = [p, Δx] feed the *dense* LM/dogleg
drivers with the block Jacobian assembled from AD pieces
(∂f/∂p via jacfwd, per-point ∂f/∂x via vmap(jacfwd) embedded
block-diagonally). The reference's banded-Givens QR exploits sparsity a
scalar CPU needs; on the MXU a dense QR of the
(M(NY+NX)) × (NP+M·NX) system is a handful of GEMM panels and the
assembly is one fused mask product. For very large M a structured
(Schur-complement) path can land later.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .lm import lsq_lm_gen, lsq_lm
from .dogleg import lsq_dogleg_gen, lsq_dogleg

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


def odr_lm_gen(x, y, f, p0, dx0=None, **options):
    """ODR fit via trust-region LM (ref: lm.js:223): yields
    ((p, Δx), mse, ∇mse). ``f(p, x)`` vectorised over x rows."""
    fJ, u0, unpack = _odr_problem(x, y, f, p0, dx0)
    for u, mse, g in lsq_lm_gen(fJ, u0, **options):
        yield unpack(u), mse, g


def odr_dogleg_gen(x, y, f, p0, dx0=None, **options):
    """ODR fit via dogleg (ref: dogleg.js:219)."""
    fJ, u0, unpack = _odr_problem(x, y, f, p0, dx0)
    for u, mse, g in lsq_dogleg_gen(fJ, u0, **options):
        yield unpack(u), mse, g


def odr_lm(x, y, f, p0, dx0=None, **kw):
    """In-graph ODR (LM). Returns ((p, Δx), mse, ∇mse, n_iter)."""
    fJ, u0, unpack = _odr_problem(x, y, f, p0, dx0)
    u, mse, g, it = lsq_lm(fJ, u0, **kw)
    return unpack(u), mse, g, it


def odr_dogleg(x, y, f, p0, dx0=None, **kw):
    """In-graph ODR (dogleg)."""
    fJ, u0, unpack = _odr_problem(x, y, f, p0, dx0)
    u, mse, g, it = lsq_dogleg(fJ, u0, **kw)
    return unpack(u), mse, g, it


# The reference's TLS fronts share the ODR solver
# (_trust_region_solver_tls.js handles both; lm.js:220-223).
tls_lm_gen = odr_lm_gen
tls_dogleg_gen = odr_dogleg_gen
fit_odr_lm = odr_lm
fit_odr_dogleg = odr_dogleg
