"""Trust-region least-squares machinery (Moré's Levenberg-Marquardt).

Parity with /root/reference/src/opt/_trust_region_solver_lsq.js: the
solver state {X0, F0, J0, G0, column-scaling D} (:280-296),
`computeNewton` via rank-revealing QR **with a complete-orthogonal
(URV) fallback for rank-deficient J** that returns the minimum-‖D·dx‖
Gauss-Newton step (:298-386), and `computeNewtonRegularized(λ)`
returning (‖D·dx‖, d‖D·dx‖/dλ) for Moré's λ iteration (:415-556) —
re-expressed as pure functions of a pytree so the LM driver is one
``lax.while_loop``.

Like the reference, J is RRQR-factorised **once** per outer iteration;
each inner λ step then works on the (K, N) R factor — a QR of the
(K+N, N) stack [R_masked; √λ·D_P] instead of the (M+N, N) augmented
matrix (ref :476-520 does the same elimination with Givens rows). The
derivative φ'(λ) = −‖R⁻ᵀ·(D²·dx)_P‖²/‖D·dx‖ is Moré eq. (5.8)
(ref :536-556). The rank-deficient branch runs under ``lax.cond`` so
full-rank problems never pay for the URV.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import dt
from ..core.mm import mm, mt
from ..la.qr import _qr_core
from ..la.rrqr import _rrqr_core, rrqr_rank
from ..la.urv import _urv_core
from ..la.tri import triu_solve, triu_t_solve, _tril_inv_core

__all__ = ["LsqState", "lsq_state", "LsqFactor", "lsq_factor",
           "newton_step", "regularized_step", "more_lambda_step"]


class LsqState(NamedTuple):
    x: jax.Array        # (N,) parameters
    f: jax.Array        # (M,) residuals
    j: jax.Array        # (M, N) jacobian
    g: jax.Array        # (N,) gradient of 0.5‖F‖²  = JᵀF
    d: jax.Array        # (N,) column scaling (monotone max, ref :295)


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


class LsqFactor(NamedTuple):
    """One RRQR of J, shared by the Newton step and every λ step
    (ref :322-334 backs R0 up for exactly this reuse)."""
    r0: jax.Array       # (K, N) upper-tri R of J[:, P], K = min(M, N)
    perm: jax.Array     # (N,) column pivots P
    qtf: jax.Array      # (K,)  Qᵀ·F
    rank: jax.Array     # ()    numerical rank of J
    d_perm: jax.Array   # (N,)  D[P]


def lsq_factor(st: LsqState) -> LsqFactor:
    q, r0, perm = _rrqr_core(st.j, economic=True)
    qtf = mm(mt(q), st.f[:, None])[:, 0]
    return LsqFactor(r0=r0, perm=perm, qtf=qtf, rank=rrqr_rank(r0),
                     d_perm=st.d[perm])


def _unpermute(z_p, perm):
    n = perm.shape[0]
    return jnp.zeros((n,), z_p.dtype).at[perm].set(z_p)


def _phi_prime(r_fac, dx, d, perm, dnorm):
    """Moré eq. (5.8): φ'(λ) = −‖R⁻ᵀ·(D²·dx)_P‖² / ‖D·dx‖
    (ref :536-556). ``r_fac`` upper-triangular in permuted columns."""
    w = (dx * d * d)[perm][:, None]
    z = triu_t_solve(r_fac, w)[:, 0]
    safe = jnp.where(dnorm == 0, 1.0, dnorm)
    return jnp.where(dnorm == 0, 0.0, -jnp.sum(z * z) / safe)


def _newton_full_rank(fac: LsqFactor, st: LsqState):
    """rank == N: the global minimiser is unique; scaling irrelevant
    (ref :379-386)."""
    n = fac.r0.shape[1]
    z = triu_solve.core(fac.r0[:n], -fac.qtf[:n, None],
                        method="block")[:, 0]
    dx = _unpermute(z, fac.perm)
    dnorm = jnp.sqrt(jnp.sum((st.d * dx) ** 2))
    dr = _phi_prime(fac.r0[:n], dx, st.d, fac.perm, dnorm)
    return dx, dnorm, dr


def _newton_deficient(fac: LsqFactor, st: LsqState):
    """rank < N: minimum-‖D·dx‖ solution via complete orthogonal
    decomposition of the D-scaled R block (ref :337-377)."""
    k, n = fac.r0.shape
    rows = jnp.arange(k)[:, None] < fac.rank
    r_m = jnp.where(rows, fac.r0, 0.0)
    rs = r_m / fac.d_perm[None, :]          # scale in (ref :341-346)
    dtol = dt.eps(rs.dtype) * max(k, n)
    u2, r2, v2, rank2 = _urv_core(rs, dtol, 2.0)  # rs = U₂·L·V₂, L lower
    # masked min-norm solve with J's rank (ref passes `rank` in :352);
    # clamped to the URV's own rank so the masked L₁₁ stays invertible
    kk = min(k, n)
    idx = jnp.arange(kk)
    live = idx < jnp.minimum(fac.rank, rank2)
    eye = jnp.eye(kk, dtype=r2.dtype)
    l11 = jnp.where(live[:, None] & live[None, :], r2[:kk, :kk], eye)
    rhs = jnp.where(rows, -fac.qtf[:, None], 0.0)
    y1 = mm(mt(u2[:, :kk]), rhs)
    linv = _tril_inv_core(l11)
    z = jnp.where(live[:, None], mm(linv, y1), 0.0)    # (kk, 1)
    zfull = jnp.concatenate(
        [z, jnp.zeros((n - kk, 1), z.dtype)], 0) if n > kk else z
    x_s = mm(mt(v2), zfull)[:, 0]           # min-norm in D-scaled coords
    dx = _unpermute(x_s / fac.d_perm, fac.perm)   # scale out (ref :371-376)
    dnorm = jnp.sqrt(jnp.sum(x_s * x_s))    # ≡ ‖D·dx‖ by construction
    # φ'(0) via the URV triangle: V₂·x_s = [z; 0] so the Moré solve
    # collapses to w = L₁₁⁻ᵀ·z (ref :443-469)
    w = jnp.where(live[:, None], mm(mt(linv), z), 0.0)
    safe = jnp.where(dnorm == 0, 1.0, dnorm)
    dr = jnp.where(dnorm == 0, 0.0, -jnp.sum(w * w) / safe)
    return dx, dnorm, dr


def _newton_from_factor(fac: LsqFactor, st: LsqState):
    m, n = st.j.shape
    if m < n:
        # K < N: always rank-deficient in the square sense
        return _newton_deficient(fac, st)
    return jax.lax.cond(fac.rank == n,
                        lambda _: _newton_full_rank(fac, st),
                        lambda _: _newton_deficient(fac, st),
                        operand=None)


def newton_step(st: LsqState):
    """Gauss-Newton step: unique solution when J has full column rank,
    minimum-‖D·dx‖ solution via URV otherwise (ref :298-386). Returns
    (dx, ‖D·dx‖, dr/dλ)."""
    return _newton_from_factor(lsq_factor(st), st)


def _regularized_from_factor(fac: LsqFactor, st: LsqState, lam):
    """Solve min ‖[J; √λ·D]·dx + [F; 0]‖ from the cached RRQR: QR of the
    (K+N, N) stack [R_masked; √λ·D_P] (ref :476-520). Returns
    (dx, r, dr)."""
    k, n = fac.r0.shape
    rows = jnp.arange(k)[:, None] < fac.rank
    r_m = jnp.where(rows, fac.r0, 0.0)
    sqrt_lam = jnp.sqrt(lam)
    stack = jnp.concatenate([r_m, sqrt_lam * jnp.diag(fac.d_perm)], 0)
    rhs = jnp.concatenate(
        [jnp.where(rows, -fac.qtf[:, None], 0.0),
         jnp.zeros((n, 1), fac.qtf.dtype)], 0)
    q, r_fac = _qr_core(stack, economic=True)
    qty = mm(mt(q), rhs)
    dx_p = triu_solve.core(r_fac, qty, method="block")[:, 0]
    dx = _unpermute(dx_p, fac.perm)
    dnorm = jnp.sqrt(jnp.sum((st.d * dx) ** 2))
    dr = _phi_prime(r_fac, dx, st.d, fac.perm, dnorm)
    return dx, dnorm, dr


def regularized_step(st: LsqState, lam):
    """Solve min ‖[J; √λ·D]·dx + [F; 0]‖. Returns (dx, r, dr) with
    r = ‖D·dx‖ and dr = dr/dλ (ref :415)."""
    return _regularized_from_factor(lsq_factor(st), st, lam)


def more_lambda_step(st: LsqState, radius, max_inner: int = 32):
    """Find λ ≥ 0 with ‖D·dx(λ)‖ ≈ radius (Moré Algorithm 5.5;
    ref: lm.js:122-153). Factors J once; every inner iteration reuses
    the R factor. Returns dx."""
    fac = lsq_factor(st)
    dx_gn, r_gn, dr_gn = _newton_from_factor(fac, st)

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
            dx, r, dr = _regularized_from_factor(fac, st, lam)
            up2 = jnp.where(r < radius, lam, up)
            lo2 = jnp.where(r > radius,
                            jnp.maximum(lo, lam - (r - radius) / dr), lo)
            lam2 = lam - ((r - radius) / radius) * (r / dr)
            lam2 = jnp.where(
                (lam2 <= lo2) | (lam2 >= up2) | ~jnp.isfinite(lam2),
                jnp.maximum(1e-3 * up2, jnp.sqrt(lo2 * up2)),
                lam2)
            return lam2, lo2, up2, dx, r, it + 1

        dx0, r0, _ = _regularized_from_factor(fac, st, lam0)
        lam, lo, up, dx, r, _ = jax.lax.while_loop(
            cond, body, (lam0, lo0, up0, dx0, r0,
                         jnp.zeros((), jnp.int32)))
        return dx

    return jax.lax.cond(r_gn <= radius, inside, solve_secular,
                        operand=None)
