"""Structured trust-region solver for ODR/TLS block systems.

Parity with /root/reference/src/opt/_trust_region_solver_tls.js:160-260:
the ODR Jacobian over unknowns u = [Δx, p] is

    J = [[ J21 = blockdiag(Bᵢ), J22 = Jp ],
         [ I                  , 0        ]]     (residuals [F1; Δx])

The reference exploits this with a banded Givens QR; the TPU-native
equivalent is per-point *Schur elimination of the Δx block*: with
H = JᵀJ, the (Δx, Δx) block is block-diagonal (BᵢᵀBᵢ + (1+λdᵢ²)I per
point), so the regularized normal equations

    (H + λD²) [ddx; dp] = −JᵀF

reduce to M independent NX×NX Cholesky solves plus one NP×NP solve of
the Schur complement S = Σᵢ (AᵢᵀAᵢ − Qᵢ Cᵢ⁻¹ Qᵢᵀ) + λDp². Memory is
O(M·NY·(NP+NX)) — no (M·NX)² Jacobian is ever materialised — and every
op is a batched GEMM / small Cholesky.

Moré's φ′(λ) = −‖(H+λD²)^{-1}D²u‖_{·}… derivative comes from one more
structured solve with the same factorisation, so the λ iteration
(lm.js:122-153) runs unchanged.

Note on conditioning: this is a normal-equations method (κ² of the QR
route). For ODR fits this is the standard trade (the per-point blocks
are tiny and regularized by the +I of the Δx residual); float64 runs
exactly, float32 keeps ~√eps accuracy like any normal-equation LM.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.mm import mm, mt

__all__ = ["TlsState", "tls_state", "tls_regularized_step",
           "tls_newton_step", "tls_more_lambda_step"]


class TlsState(NamedTuple):
    p: jax.Array       # (NP,) parameters
    dx: jax.Array      # (M, NX) input errors
    f1: jax.Array      # (M, NY) fit residuals f(p, x+dx) − y
    a: jax.Array       # (M, NY, NP) ∂f/∂p per point
    b: jax.Array       # (M, NY, NX) ∂f/∂x per point
    g_p: jax.Array     # (NP,) gradient block
    g_dx: jax.Array    # (M, NX) gradient block
    d_p: jax.Array     # (NP,) column scaling
    d_dx: jax.Array    # (M, NX) column scaling


def tls_state(p, dx, f1, a, b, d_prev=None):
    g_p = jnp.einsum("myp,my->p", a, f1, precision="highest")
    g_dx = jnp.einsum("myx,my->mx", b, f1, precision="highest") + dx
    d_p = jnp.sqrt(jnp.einsum("myp,myp->p", a, a, precision="highest"))
    d_dx = jnp.sqrt(
        jnp.einsum("myx,myx->mx", b, b, precision="highest") + 1.0)
    if d_prev is not None:
        d_p = jnp.maximum(d_p, d_prev[0])
        d_dx = jnp.maximum(d_dx, d_prev[1])
    d_p = jnp.where(d_p == 0, 1.0, d_p)
    return TlsState(p=p, dx=dx, f1=f1, a=a, b=b, g_p=g_p, g_dx=g_dx,
                    d_p=d_p, d_dx=d_dx)


def _solve_structured(st: TlsState, lam, rhs_p, rhs_dx):
    """Solve (JᵀJ + λD²)[ddx; dp] = [rhs_dx; rhs_p] by Schur elimination
    of the ddx block. Returns (dp, ddx)."""
    from ..la.cholesky import _chol_core
    from ..la.tri import _tril_inv_core
    NP = st.p.shape[0]
    # per-point C_i = BᵢᵀBᵢ + I + λ·diag(d_dxᵢ²)   (M, NX, NX)
    c = jnp.einsum("myi,myj->mij", st.b, st.b, precision="highest")
    eye = jnp.eye(st.dx.shape[1], dtype=st.dx.dtype)
    c = c + eye + lam * st.d_dx[:, :, None] ** 2 * eye
    lc = _chol_core(c)
    lc_inv = _tril_inv_core(lc)
    cinv = jnp.einsum("mki,mkj->mij", lc_inv, lc_inv,
                      precision="highest")          # C⁻¹ = L⁻ᵀL⁻¹
    q = jnp.einsum("myp,myx->mpx", st.a, st.b,
                   precision="highest")             # Qᵢ = AᵢᵀBᵢ
    qcinv = jnp.einsum("mpx,mxz->mpz", q, cinv, precision="highest")
    # Schur complement S = Σ AᵀA + λDp² − Σ Q C⁻¹ Qᵀ
    s = jnp.einsum("myp,myq->pq", st.a, st.a, precision="highest") \
        + lam * jnp.diag(st.d_p ** 2) \
        - jnp.einsum("mpz,mqz->pq", qcinv, q, precision="highest")
    rp = rhs_p - jnp.einsum("mpz,mz->p", qcinv, rhs_dx,
                            precision="highest")
    ls = _chol_core(s + jnp.finfo(s.dtype).tiny * jnp.eye(NP))
    ls_inv = _tril_inv_core(ls)
    dp = jnp.matmul(mt(ls_inv), jnp.matmul(ls_inv, rp,
                precision="highest"), precision="highest")
    ddx = jnp.einsum("mij,mj->mi", cinv,
                     rhs_dx - jnp.einsum("mpx,p->mx", q, dp,
                                         precision="highest"),
                     precision="highest")
    return dp, ddx


def tls_regularized_step(st: TlsState, lam):
    """Regularized step: min ‖[J; √λD]u + [F; 0]‖. Returns
    (dp, ddx, r = ‖D·u‖, dr/dλ) — Moré's quantities
    (ref: _trust_region_solver_lsq.js:415, structure :160-260)."""
    dp, ddx = _solve_structured(st, lam, -st.g_p, -st.g_dx)
    r2 = jnp.sum((st.d_p * dp) ** 2) + jnp.sum((st.d_dx * ddx) ** 2)
    r = jnp.sqrt(r2)
    # φ'(λ) = −wᵀ(H+λD²)⁻¹w / r with w = D²·u
    wp = st.d_p ** 2 * dp
    wdx = st.d_dx ** 2 * ddx
    zp, zdx = _solve_structured(st, lam, wp, wdx)
    safe = jnp.where(r == 0, 1.0, r)
    dr = -(jnp.vdot(wp, zp) + jnp.vdot(wdx.ravel(), zdx.ravel())) / safe
    return dp, ddx, r, dr


def tls_newton_step(st: TlsState):
    eps = jnp.finfo(st.f1.dtype).eps
    jn = jnp.maximum(jnp.max(jnp.abs(st.a)), jnp.max(jnp.abs(st.b)))
    lam0 = (eps * jnp.maximum(jn, 1.0)) ** 2
    return tls_regularized_step(st, lam0)


def tls_more_lambda_step(st: TlsState, radius, max_inner: int = 32):
    """λ iteration for ‖D·u(λ)‖ ≈ radius (Moré Alg. 5.5;
    ref: lm.js:122-153). Returns (dp, ddx)."""
    dp_gn, ddx_gn, r_gn, _ = tls_newton_step(st)

    def inside(_):
        return dp_gn, ddx_gn

    def secular(_):
        gnorm = jnp.sqrt(jnp.sum((st.g_p / st.d_p) ** 2)
                         + jnp.sum((st.g_dx / st.d_dx) ** 2))
        up0 = gnorm / radius
        lo0 = jnp.zeros((), st.p.dtype)
        lam0 = jnp.maximum(1e-3 * up0, jnp.sqrt(lo0 * up0))

        def cond(carry):
            lam, lo, up, dp, ddx, r, it = carry
            return (it < max_inner) & (jnp.abs(r - radius) > 0.1 * radius)

        def body(carry):
            lam, lo, up, dp, ddx, r, it = carry
            dp, ddx, r, dr = tls_regularized_step(st, lam)
            up2 = jnp.where(r < radius, lam, up)
            lo2 = jnp.where(r > radius,
                            jnp.maximum(lo, lam - (r - radius) / dr), lo)
            lam2 = lam - ((r - radius) / radius) * (r / dr)
            lam2 = jnp.where(
                (lam2 <= lo2) | (lam2 >= up2) | ~jnp.isfinite(lam2),
                jnp.maximum(1e-3 * up2, jnp.sqrt(lo2 * up2)), lam2)
            return lam2, lo2, up2, dp, ddx, r, it + 1

        dp0, ddx0, r0, _ = tls_regularized_step(st, lam0)
        out = jax.lax.while_loop(
            cond, body, (lam0, lo0, up0, dp0, ddx0, r0,
                         jnp.zeros((), jnp.int32)))
        return out[3], out[4]

    return jax.lax.cond(r_gn <= radius, inside, secular, operand=None)
