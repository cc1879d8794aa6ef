"""SVD via one-sided (Hestenes) Jacobi — the TPU-native workhorse.

Capability parity with the reference's Jacobi SVD family
(/root/reference/src/la/svd_jac_classic.js, svd_jac_2sided.js,
svd_jac_2sided_blocked.js): same contract — U orthogonal to
eps·4·max(M,N), singular values sorted non-negative, U·diag(sv)·V ≈ A —
but a different mechanism, chosen for the hardware:

  * The reference's *two-sided* Jacobi variants rotate rows and columns
    (cache-tiled at 4×4, svd_jac_2sided_blocked.js:33-63). On TPU the
    *one-sided* Hestenes form is strictly better: each rotation touches
    only two columns, so a whole parallel round of N/2 disjoint
    rotations is a single fused VPU op over an (M, N/2) panel.
  * Pair scheduling uses the Brent-Luk tournament ordering, whose
    between-round shuffle is a static slice/concat (no gathers), so a
    full sweep of N−1 rounds compiles to a fixed `fori_loop`.
  * Sweeps run under a `lax.while_loop` with Demmel's stopping
    criterion max |wᵢ·wⱼ|/(‖wᵢ‖‖wⱼ‖) ≤ eps·N (the reference's analog:
    svd_jac_2sided.js:58).
  * Rectangular inputs are pre-reduced by QR exactly like the
    reference's Jacobi drivers (svd_jac_2sided.js:39-53).
  * Rank-deficient inputs: zero singular values leave U columns
    undefined; a `lax.cond`-guarded Householder-QR repair completes U
    to an orthonormal basis (the reference gets this for free from its
    pre-QR; we only pay when rank deficiency is detected).

Returns (U, sv, V) with A = U·diag(sv)·V — note V is what NumPy calls
Vᵀ, matching the reference convention
(/root/reference/src/la/_generic_test_svd_decomp.js:107).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.batch import batched
from ..core.mm import mm, mt
from ..config import default_float_for
from .qr import qr_decomp, _qr_core

__all__ = ["svd_jac_1sided", "svd_jac_classic", "svd_jac_2sided",
           "svd_jac_2sided_blocked"]


def _rotation(app, aqq, apq, eps):
    """Stable two-sided rotation angles diagonalising [[app,apq],[apq,aqq]]."""
    small = jnp.abs(apq) <= eps * jnp.sqrt(app * aqq) * 0.01 + jnp.finfo(apq.dtype).tiny
    safe_apq = jnp.where(small, jnp.ones_like(apq), apq)
    tau = (aqq - app) / (2 * safe_apq)
    t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1 + tau * tau))
    t = jnp.where(tau == 0, jnp.ones_like(t), t)  # 45° when app == aqq
    t = jnp.where(small, jnp.zeros_like(t), t)
    c = jax.lax.rsqrt(1 + t * t)
    s = t * c
    return c, s


def _brent_luk_shuffle(xt, xb):
    """Tournament rotation: t0 fixed, everyone else moves one seat."""
    h = xt.shape[-1]
    if h == 1:
        return xt, xb
    nt = jnp.concatenate([xt[..., :1], xb[..., :1], xt[..., 1:h - 1]], -1)
    nb = jnp.concatenate([xb[..., 1:], xt[..., h - 1:]], -1)
    return nt, nb


def _jacobi_core(w, max_sweeps: int, tol):
    """One-sided Jacobi on square-ish w (M, N), N even. Returns (w, v)
    with original_w = w_out @ v_outᵀ ... accumulated v (N, N)."""
    M, N = w.shape
    h = N // 2
    eps = jnp.finfo(w.dtype).eps
    v = jnp.eye(N, dtype=w.dtype)
    wt, wb = w[:, :h], w[:, h:]
    vt, vb = v[:, :h], v[:, h:]

    def round_body(_, carry):
        wt, wb, vt, vb, off = carry
        app = jnp.sum(wt * wt, 0)
        aqq = jnp.sum(wb * wb, 0)
        apq = jnp.sum(wt * wb, 0)
        denom = jnp.sqrt(app * aqq) + jnp.finfo(w.dtype).tiny
        off = jnp.maximum(off, jnp.max(jnp.abs(apq) / denom))
        c, s = _rotation(app, aqq, apq, eps)
        nwt = c * wt - s * wb
        nwb = s * wt + c * wb
        nvt = c * vt - s * vb
        nvb = s * vt + c * vb
        nwt, nwb = _brent_luk_shuffle(nwt, nwb)
        nvt, nvb = _brent_luk_shuffle(nvt, nvb)
        return nwt, nwb, nvt, nvb, off

    def sweep_cond(carry):
        i, _, off = carry
        return (i < max_sweeps) & (off > tol)

    def sweep_body(carry):
        i, (wt, wb, vt, vb), _ = carry
        wt, wb, vt, vb, off = jax.lax.fori_loop(
            0, N - 1, round_body, (wt, wb, vt, vb, jnp.zeros((), w.dtype)))
        return i + 1, (wt, wb, vt, vb), off

    _, (wt, wb, vt, vb), _ = jax.lax.while_loop(
        sweep_cond, sweep_body,
        (jnp.zeros((), jnp.int32), (wt, wb, vt, vb),
         jnp.asarray(jnp.inf, w.dtype)))
    return (jnp.concatenate([wt, wb], -1),
            jnp.concatenate([vt, vb], -1))


def _complete_u(u_scaled, sv, tol_rank, force=False):
    """Orthonormal completion of U columns with sv ≈ 0 (Householder QR,
    sign-fixed) — only executed (via lax.cond) when needed. ``force``
    (traced bool) triggers the repair regardless of the sv test —
    callers that detect dead columns another way (svd_dc's TGK balance
    test) pass it."""
    def repair(u):
        q, r = _qr_core(u, economic=True)
        d = jnp.diagonal(r)
        sign = jnp.where(d < 0, -1.0, 1.0).astype(u.dtype)
        return q * sign[None, :]

    need = (jnp.min(sv) <= tol_rank) | jnp.asarray(force)
    return jax.lax.cond(need, repair, lambda u: u, u_scaled)


def _svd_square(a, max_sweeps: int):
    """Jacobi SVD of a square (N, N) matrix. Returns (U, sv, V)."""
    N = a.shape[-1]
    eps = jnp.finfo(a.dtype).eps
    pad = N % 2
    w = a
    if pad:
        # pad to an even column count; the zero column never mixes
        # (rotations against it are identity) and sorts last
        w = jnp.concatenate([w, jnp.zeros((N, 1), a.dtype)], -1)
    w, v = _jacobi_core(w, max_sweeps, tol=eps * N)
    sv = jnp.sqrt(jnp.sum(w * w, 0))
    order = jnp.argsort(-sv)
    sv = sv[order][:N]
    w = w[:, order][:, :N]
    v = v[:, order][:, :N]
    if pad:
        v = v[:N, :]    # drop the fake input dimension
    safe = jnp.where(sv > 0, sv, jnp.ones_like(sv))
    u = w / safe[None, :]
    u = _complete_u(u, sv, tol_rank=eps * N * jnp.max(sv))
    return u, sv, mt(v)


def _svd_1sided_core(a, max_sweeps: int = 24):
    M, N = a.shape
    if M < N:
        u, sv, v = _svd_1sided_core(a.T, max_sweeps)
        return mt(v), sv, mt(u)
    if M > N:
        # pre-QR like the reference Jacobi drivers (svd_jac_2sided.js:39)
        q, r = _qr_core(a, economic=True)
        u, sv, v = _svd_square(r, max_sweeps)
        return mm(q, u), sv, v
    return _svd_square(a, max_sweeps)


def _svd_square_batched(a3, max_sweeps: int):
    """Natively-batched Jacobi SVD of square (Bn, N, N) via the Pallas
    full-sweep kernel (ops/jacobi_sweep.py): one kernel invocation per
    sweep, convergence checked between sweeps, W/V VMEM-resident for
    all N−1 rounds of each sweep."""
    from ..ops.jacobi_sweep import jacobi_sweeps
    interp = jax.default_backend() == "cpu"
    Bn, N, _ = a3.shape
    eps = jnp.finfo(a3.dtype).eps
    pad = N % 2
    w = a3
    if pad:
        w = jnp.concatenate([w, jnp.zeros((Bn, N, 1), a3.dtype)], -1)
    n2 = N + pad
    v = jnp.broadcast_to(jnp.eye(n2, dtype=a3.dtype), (Bn, n2, n2))
    tol = eps * N

    def cond(st):
        w, v, off, i = st
        # NaN-safe: treat a non-finite off measure as not-converged
        return (i < max_sweeps) & ~(jnp.max(off) <= tol)

    def body(st):
        w, v, _, i = st
        w, v, off = jacobi_sweeps(w, v, 1, interpret=interp)
        return w, v, off, i + 1

    w, v, _, _ = jax.lax.while_loop(
        cond, body, (w, v, jnp.full((Bn, 8, 128), jnp.inf, a3.dtype),
                     jnp.zeros((), jnp.int32)))
    sv = jnp.sqrt(jnp.sum(w * w, axis=1))
    order = jnp.argsort(-sv, axis=-1)[..., :N]
    sv = jnp.take_along_axis(sv, order, axis=-1)
    w = jnp.take_along_axis(w, order[:, None, :], axis=-1)
    v = jnp.take_along_axis(v, order[:, None, :], axis=-1)[:, :N, :]
    safe = jnp.where(sv > 0, sv, jnp.ones_like(sv))
    u = w / safe[:, None, :]
    u = jax.vmap(lambda uu, ss: _complete_u(
        uu, ss, tol_rank=eps * N * jnp.max(ss)))(u, sv)
    return u, sv, mt(v)


def svd_jac_1sided(a, max_sweeps: int = 24):
    """One-sided Jacobi SVD (see module docstring). Batched.

    Returns (U (...,M,K), sv (...,K), V (...,K,N)) with
    A = U·diag(sv)·V, K = min(M, N).
    """
    import math as _math
    a = jnp.asarray(a)
    a = a.astype(default_float_for(a.dtype))
    if a.ndim < 2:
        raise ValueError("svd expects ndim >= 2")
    lead = a.shape[:-2]
    M, N = a.shape[-2:]
    a3 = a.reshape((max(1, _math.prod(lead)), M, N))
    if M < N:
        u, sv, v = svd_jac_1sided(jnp.swapaxes(a3, -1, -2),
                                  max_sweeps=max_sweeps)
        u, sv, v = mt(v), sv, mt(u)
    else:
        # pre-QR and run Jacobi on Rᵀ: the lower-triangular profile
        # cuts ~3 of ~13 sweeps at N=512 (measured), far more than the
        # QR costs. Rᵀ = u·Σ·v ⇒ A = Q·R = (Q·vᵀ)·Σ·uᵀ.
        from .qr import _qr_batched
        q, r = _qr_batched(a3, economic=True)
        u, sv, v = _svd_square_batched(mt(r), max_sweeps)
        u, v = mm(q, mt(v)), mt(u)
    K = min(M, N)
    return (u.reshape(lead + (M, K)), sv.reshape(lead + (K,)),
            v.reshape(lead + (K, N)))


def _svd_jac_1sided_xla(a, max_sweeps: int = 24):
    """The pure-XLA vmap path (kept for composition inside other
    traced code where the Pallas kernel is unavailable)."""
    return batched((2,))(
        lambda x: _svd_1sided_core(x, max_sweeps))(
            jnp.asarray(a).astype(default_float_for(jnp.asarray(a).dtype)))




# The reference's four Jacobi variants, each with its own mechanism:
# one-sided Brent-Luk (this module), greedy max-pivot classic
# (svd_jac_classic below), sequential row-cyclic two-sided Kogbetliantz
# (svd_kogbetliantz.py), and the MXU block-tiled variant
# (svd_block_jac.py).
def svd_jac_classic(a, max_sweeps: int = 60):
    """Classic two-sided Jacobi with greedy max-off-diagonal pivot
    search (ref: src/la/svd_jac_classic.js:86-180 — the tournament tree
    is the reference's O(log N) *incremental* argmax; on TPU a full
    masked argmax reduction per rotation is the idiomatic equivalent,
    one fused reduce instead of a pointer tree). Sequential by nature —
    mechanism parity; use svd_gram/svd_jac_2sided_blocked for MXU-size
    throughput."""
    from .svd_classic import svd_jac_classic_greedy
    return svd_jac_classic_greedy(a, max_sweeps=max_sweeps)


def svd_jac_2sided(a, max_sweeps: int = 30):
    """Cyclic two-sided Jacobi / Kogbetliantz
    (ref: src/la/svd_jac_2sided.js:30-144): sequential row-cyclic
    sweeps with the reference's closed-form angle pair — the real
    two-sided mechanism (see svd_kogbetliantz.py for why the parallel
    tournament does not apply to the two-sided iteration)."""
    from .svd_kogbetliantz import svd_kogbetliantz
    return svd_kogbetliantz(a, max_sweeps=max_sweeps)


def svd_jac_2sided_blocked(a, **kw):
    """ref: src/la/svd_jac_2sided_blocked.js (4×4-tiled two-sided).
    On TPU the tile is a column block sized for the MXU — delegates to
    the genuinely blocked implementation (svd_block_jac.py)."""
    from .svd_block_jac import svd_jac_blocked
    return svd_jac_blocked(a, **kw)
