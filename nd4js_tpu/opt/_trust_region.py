"""Trust-region least-squares machinery (Moré's Levenberg-Marquardt).

Parity with /root/reference/src/opt/_trust_region_solver_lsq.js: the
solver state {X0, F0, J0, G0, column-scaling D} (:298), `computeNewton`
via rank-revealing QR (:298), `computeNewtonRegularized(λ)` returning
(‖D·dx‖, d‖D·dx‖/dλ) for Moré's λ iteration (:415), and the two-phase
consider/commit move protocol (:205,255) — re-expressed as pure
functions of a pytree so the LM driver is one ``lax.while_loop``.

The regularized step solves min ‖[J; √λ·D]·dx + [F; 0]‖ by QR of the
augmented matrix (GEMM-shaped, MXU-friendly) instead of the reference's
incremental Givens update of a pre-factorised system; the derivative
φ'(λ) = −‖R⁻ᵀ·D²·dx‖²/‖D·dx‖ comes from one extra triangular solve,
exactly Moré's formula.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..la.qr import _qr_core
from ..la.tri import triu_solve, triu_t_solve

__all__ = ["LsqState", "lsq_state", "newton_step", "regularized_step",
           "more_lambda_step"]


class LsqState(NamedTuple):
    x: jax.Array        # (N,) parameters
    f: jax.Array        # (M,) residuals
    j: jax.Array        # (M, N) jacobian
    g: jax.Array        # (N,) gradient of 0.5‖F‖²  = JᵀF
    d: jax.Array        # (N,) column scaling (monotone max, ref :84)


def lsq_state(x, f, j, d_prev=None):
    x = jnp.asarray(x)
    f = jnp.asarray(f)
    j = jnp.asarray(j)
    g = jnp.einsum("ij,i->j", j, f, precision="highest")
    d = jnp.sqrt(jnp.sum(j * j, axis=0))
    if d_prev is not None:
        d = jnp.maximum(d, d_prev)      # Moré: never shrink the scaling
    d = jnp.where(d == 0, 1.0, d)
    return LsqState(x=x, f=f, j=j, g=g, d=d)


def regularized_step(st: LsqState, lam):
    """Solve min ‖[J; √λ·D]·dx + [F; 0]‖. Returns (dx, r, dr) with
    r = ‖D·dx‖ and dr = dr/dλ (ref: _trust_region_solver_lsq.js:415)."""
    m, n = st.j.shape
    sqrt_lam = jnp.sqrt(lam)
    aug = jnp.concatenate([st.j, sqrt_lam * jnp.diag(st.d)], axis=0)
    rhs = jnp.concatenate([-st.f, jnp.zeros((n,), st.f.dtype)])[:, None]
    q, r_fac = _qr_core(aug, economic=True)
    qty = jnp.einsum("ij,ik->jk", q, rhs, precision="highest")
    dx = triu_solve.core(r_fac, qty, method="block")[:, 0]
    dnorm = jnp.sqrt(jnp.sum((st.d * dx) ** 2))
    # Moré: φ'(λ) = −‖R⁻ᵀ·(D²·dx)‖² / ‖D·dx‖
    w = (st.d * st.d * dx)[:, None]
    z = triu_t_solve(r_fac, w)[:, 0]
    safe = jnp.where(dnorm == 0, 1.0, dnorm)
    dr = -jnp.sum(z * z) / safe
    return dx, dnorm, dr


def newton_step(st: LsqState):
    """Gauss-Newton step via QR with a tiny Tikhonov floor for
    rank-deficient J (the reference falls back to URV; a scaled-eps
    floor delivers the same bounded step without a second
    factorisation path inside the loop)."""
    eps = jnp.finfo(st.j.dtype).eps
    jn = jnp.max(jnp.abs(st.j))
    lam0 = (eps * jnp.maximum(jn, 1.0)) ** 2
    return regularized_step(st, lam0)


def more_lambda_step(st: LsqState, radius, max_inner: int = 32):
    """Find λ ≥ 0 with ‖D·dx(λ)‖ ≈ radius (Moré Algorithm 5.5;
    ref: lm.js:122-153). Returns dx."""
    dx_gn, r_gn, dr_gn = newton_step(st)

    def inside(_):
        return dx_gn

    def solve_secular(_):
        gnorm = jnp.sqrt(jnp.sum((st.g / st.d) ** 2))
        up0 = gnorm / radius
        lo0 = jnp.zeros((), st.x.dtype)
        lam0 = jnp.maximum(1e-3 * up0, jnp.sqrt(lo0 * up0))

        def cond(carry):
            lam, lo, up, dx, r, it = carry
            return (it < max_inner) & (jnp.abs(r - radius) > 0.1 * radius)

        def body(carry):
            lam, lo, up, dx, r, it = carry
            dx, r, dr = regularized_step(st, lam)
            up2 = jnp.where(r < radius, lam, up)
            lo2 = jnp.where(r > radius, jnp.maximum(lo, lam - (r - radius) / dr), lo)
            lam2 = lam - ((r - radius) / radius) * (r / dr)
            lam2 = jnp.where((lam2 <= lo2) | (lam2 >= up2) | ~jnp.isfinite(lam2),
                             jnp.maximum(1e-3 * up2, jnp.sqrt(lo2 * up2)),
                             lam2)
            return lam2, lo2, up2, dx, r, it + 1

        dx0, r0, _ = regularized_step(st, lam0)
        lam, lo, up, dx, r, _ = jax.lax.while_loop(
            cond, body, (lam0, lo0, up0, dx0, r0,
                         jnp.zeros((), jnp.int32)))
        return dx

    return jax.lax.cond(r_gn <= radius, inside, solve_secular,
                        operand=None)
