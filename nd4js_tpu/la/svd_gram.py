"""SVD via simultaneous-rotation ("Gram") one-sided Jacobi — the MXU
throughput path.

Capability parity with the reference's Jacobi SVD family
(/root/reference/src/la/svd_jac_classic.js, svd_jac_2sided.js,
svd_jac_2sided_blocked.js) — same contract (U, V orthogonal to
eps·4·max(M,N), sorted non-negative singular values, U·diag(sv)·V ≈ A) —
but a mechanism designed for the TPU's compute profile: where classic
Jacobi applies O(N²) sequential 2×2 rotations per sweep on the VPU, this
method applies *all* N(N−1)/2 pairwise rotations at once as a single
orthogonal transform built from GEMMs:

  per iteration (everything on the MXU):
    G = WᵀW                          one GEMM
    t_ij = Jacobi tangent of the 2×2 pencil [[Gii,Gij],[Gij,Gjj]]
                                      (elementwise, VPU, one pass)
    S = skew(t),  Φ₀ = I + S
    Φ = Φ₀·R⁻¹ with RᵀR = Φ₀ᵀΦ₀ = I − S²  (Cholesky-QR correction:
        I − S² ⪰ I for skew S, so the Cholesky never breaks and Φ is
        orthogonal to machine precision)
    [W; P] ← [W; P]·Φ                one stacked GEMM

Convergence: preconditioning by two QR passes (A = Q₁R₁, R₁ᵀ = Q₂R₂ — a
Stewart QLP-style grading step) makes the iteration converge in ~18
iterations (f32, random 512²), ~11 for κ=1e6, vs ~34 unpreconditioned;
without it, ill-conditioned inputs can stall. Tightly clustered singular
values converge linearly near the end (simultaneous 45° rotations
interact); an optional finishing stage of classic scalar sweeps
(lax.cond-guarded, rarely taken) closes the last distance — needed in
practice only for float64 contracts on adversarially tied spectra.

Cost: ~10·N³ FLOPs/iteration (GEMMs) + one N×N Cholesky + triangular
inverse; ~20 iterations ≈ 200·N³ of pure MXU work. At 32×512² f32 this
is ~15-20× faster than the element-level Pallas Jacobi kernel and
~10-30× faster than XLA's own jnp.linalg.svd on the same chip.
"""
from __future__ import annotations

import math as _math

import jax
import jax.numpy as jnp

from ..core.mm import mm, mt
from ..config import default_float_for
from .svd_jac import _brent_luk_shuffle, _rotation

__all__ = ["svd_gram"]


def _robust_qr(a3):
    """Economic QR of (B, M, N) whose Q is orthogonal to machine
    precision for *any* input conditioning.

    Householder (compact-WY, Pallas panel): CholeskyQR2 cannot
    orthonormalize directions with σ² below its stabilizing shift, and
    the measured-defect 'auto' hybrid (la/qr.py:_qr_auto_flat) carries
    BOTH code paths — three instances of it dominated svd_gram's XLA
    compile (~450 s). The preconditioner is ~7% of svd_gram's runtime,
    so the always-robust single-graph path is the right trade here."""
    from .qr import _qr_house_flat
    return _qr_house_flat(a3, True)


def _pair_tangents(g, eps):
    """Elementwise Jacobi tangents for every (i, j) pair of the Gram
    matrix: t_ij rotates columns (i, j) to orthogonality. Antisymmetric
    by construction (t(−τ) = −t(τ)); diagonal zeroed."""
    d = jnp.diagonal(g, axis1=-2, axis2=-1)
    di = d[..., :, None]
    dj = d[..., None, :]
    tiny = jnp.finfo(g.dtype).tiny
    denom = jnp.sqrt(di) * jnp.sqrt(dj) + tiny
    small = jnp.abs(g) <= eps * 0.01 * denom + tiny
    # rank floor: pairs whose BOTH columns sit below eps·max(d) on the
    # σ² scale (σ ≤ √eps·σmax — the reference's rank-detection
    # threshold, svd.js:37-53) are numerically-zero cluster members:
    # their couplings are roundoff noise normalised by noise, so the
    # relative measure keeps rattling them forever (measured: the
    # rank-384/512 cfg3 workload ran ~3× more iterations than full
    # rank). Freeze them — _complete_u owns the null-space basis.
    dmax = jnp.max(d, axis=-1)[..., None, None]
    frozen = (di <= eps * dmax) & (dj <= eps * dmax)
    small = small | frozen
    safe = jnp.where(small, 1.0, g)
    tau = (dj - di) / (2 * safe)
    t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1 + tau * tau))
    t = jnp.where(tau == 0, 1.0, t)          # 45° for exact ties
    t = jnp.where(small, 0.0, t)
    # enforce exact skewness from the upper triangle: for exact ties
    # (d_i == d_j) the elementwise formula yields t_ij = t_ji = 1,
    # which would silently break the I − S² Gram identity below
    n = g.shape[-1]
    t = jnp.triu(t, 1)
    t = t - jnp.swapaxes(t, -1, -2)
    # relative off-diagonal measure (Demmel criterion input); frozen
    # zero-cluster pairs are converged by definition
    off = jnp.where(frozen, 0.0, jnp.abs(g) / denom) \
        * (1 - jnp.eye(n, dtype=g.dtype))
    return t, jnp.max(off, axis=(-2, -1))


def _gram_iterations(w, p, max_iters: int, tol):
    """Run the simultaneous-rotation iteration on (B, K, K) ``w``,
    accumulating the right orthogonal factor into ``p``. Returns
    (w, p, off) with off the per-batch relative off-diagonal max."""
    from .cholesky import _chol_inv_core
    B, K, _ = w.shape
    eps = jnp.finfo(w.dtype).eps
    eye = jnp.eye(K, dtype=w.dtype)

    def cond(st):
        i, w, p, off = st
        return (i < max_iters) & ~(jnp.max(off) <= tol)

    def body(st):
        i, w, p, _ = st
        g = mm(mt(w), w)
        t, off = _pair_tangents(g, eps)
        s = t
        s2 = mm(s, s)
        # σmax(S) ≤ ‖S‖_F; gates the cheap tail orthogonalisation
        sfro2 = jnp.max(jnp.sum(s * s, axis=(-2, -1)))

        def exact(args):
            s, s2 = args
            # Φ₀ᵀΦ₀ = I − S·S for skew S; SPD with λ ∈ [1, 1+σmax(S)²]
            c = eye - s2
            # base=64: the chol_inv runs once per GEMM-Jacobi step — the
            # larger unrolled leaf quarters the recursion's dispatch
            # count (the iteration's dominant non-GEMM cost)
            _, linv = _chol_inv_core(c, base=64)
            linv_t = mt(linv)
            return linv_t + mm(s, linv_t)     # (I + S)·R⁻¹

        def poly(args):
            # tail iterations (‖S‖_F < 0.15): symmetric orthogonalisation
            # Φ = (I + S)·(I − S²)^{-1/2} with the inverse sqrt as the
            # 3-term binomial series in S² — error 35/128·‖S‖⁸ < 1e-7,
            # three GEMMs instead of the chol_inv recursion's ~90-op
            # dispatch chain (the measured per-iteration hog at 32×512²)
            s, s2 = args
            s4 = mm(s2, s2)
            corr = eye + 0.5 * s2 + 0.375 * s4 + 0.3125 * mm(s4, s2)
            return corr + mm(s, corr)

        phi = jax.lax.cond(sfro2 < 0.15 ** 2, poly, exact, (s, s2))
        stacked = jnp.concatenate([w, p], axis=-2)
        stacked = mm(stacked, phi)
        return i + 1, stacked[:, :K], stacked[:, K:], off

    i0 = jnp.zeros((), jnp.int32)
    off0 = jnp.full((B,), jnp.inf, w.dtype)
    _, w, p, off = jax.lax.while_loop(cond, body, (i0, w, p, off0))
    return w, p, off


def _finishing_sweeps(w, p, max_sweeps: int, tol):
    """Classic scalar one-sided Jacobi sweeps (XLA Brent-Luk tournament,
    batched) seeded with accumulated (w, p) — the lax.cond fallback for
    spectra the simultaneous iteration converges on only linearly."""
    B, K, _ = w.shape
    eps = jnp.finfo(w.dtype).eps
    pad = K % 2
    if pad:
        # the zero w column never rotates (its couplings vanish), and
        # the matching p column starts at e_K so the pad space is inert
        w = jnp.concatenate([w, jnp.zeros((B, K, 1), w.dtype)], -1)
        corner = jnp.broadcast_to(
            jnp.eye(K + 1, dtype=p.dtype)[K:, :], (B, 1, K + 1))
        p = jnp.concatenate([
            jnp.concatenate([p, jnp.zeros((B, K, 1), p.dtype)], -1),
            corner], -2)
    n = K + pad
    h = n // 2

    def split(x):
        return x[..., :h], x[..., h:]

    def round_body(_, carry):
        wt, wb, pt, pb, off = carry
        app = jnp.sum(wt * wt, -2)
        aqq = jnp.sum(wb * wb, -2)
        apq = jnp.sum(wt * wb, -2)
        denom = jnp.sqrt(app) * jnp.sqrt(aqq) + jnp.finfo(w.dtype).tiny
        off = jnp.maximum(off, jnp.max(jnp.abs(apq) / denom, axis=-1))
        c, s = _rotation(app, aqq, apq, eps)
        c3, s3 = c[..., None, :], s[..., None, :]
        nwt = c3 * wt - s3 * wb
        nwb = s3 * wt + c3 * wb
        npt = c3 * pt - s3 * pb
        npb = s3 * pt + c3 * pb
        nwt, nwb = _brent_luk_shuffle(nwt, nwb)
        npt, npb = _brent_luk_shuffle(npt, npb)
        return nwt, nwb, npt, npb, off

    def cond(st):
        i, _, off = st
        return (i < max_sweeps) & ~(jnp.max(off) <= tol)

    def body(st):
        i, (wt, wb, pt, pb), _ = st
        wt, wb, pt, pb, off = jax.lax.fori_loop(
            0, n - 1, round_body,
            (wt, wb, pt, pb, jnp.zeros((w.shape[0],), w.dtype)))
        return i + 1, (wt, wb, pt, pb), off

    wt, wb = split(w)
    pt, pb = split(p)
    _, (wt, wb, pt, pb), off = jax.lax.while_loop(
        cond, body,
        (jnp.zeros((), jnp.int32), (wt, wb, pt, pb),
         jnp.full((w.shape[0],), jnp.inf, w.dtype)))
    w = jnp.concatenate([wt, wb], -1)
    p = jnp.concatenate([pt, pb], -1)
    if pad:
        w = w[..., :K]
        p = p[..., :K, :K]
    return w, p, off


def _svd_gram_core(a3, max_iters: int, finish_sweeps: int,
                   precond: str = "auto"):
    """a3: (B, N, N) square. Returns (U, sv, Vt) with a3 = U·Σ·Vt.

    precond:
      'spectral' — one eigendecomposition of the Gram matrix
        G = AᵀA = V·Λ·Vᵀ (blocked sytrd + level-batched D&C,
        la/eigh.py) seeds the iteration at W₀ = A·V, whose Gram is
        diagonal up to the eigensolver's O(eps·‖G‖) backward error —
        the Jacobi loop is then a 1-3 iteration *polish* restoring the
        one-sided method's full column-wise accuracy (the κ²-squaring
        of the plain gram-eigh SVD never reaches the output: U, V come
        from rotations of A's own columns, not from Λ).
      'qlp' — two QR grading passes (Stewart QLP; ~18 f32 iterations).
      'auto' — spectral at MXU sizes (N ≥ 128), qlp below.
    """
    B, N, _ = a3.shape
    eps = jnp.finfo(a3.dtype).eps
    tol = eps * N
    if precond == "auto":
        precond = "spectral" if N >= 128 else "qlp"
    if precond == "spectral":
        from .eigh import eigh_tridiag_dc
        g = mm(mt(a3), a3)
        _, vg = eigh_tridiag_dc(g)          # ascending eigenvalues
        vg = vg[..., ::-1]                  # descending σ² ordering
        w = mm(a3, vg)                      # A = W₀·Vgᵀ exactly
        q1 = None
        q2 = vg
    else:
        # QLP-style grading preconditioner: A = Q1·R1, R1ᵀ = Q2·R2, so
        # W0 = R2ᵀ = Q1ᵀ·A·Q2 and A = Q1·W0·Q2ᵀ exactly up to the
        # (machine-level) orthogonality of the CholeskyQR2 Q factors.
        q1, r1 = _robust_qr(a3)
        q2, r2 = _robust_qr(mt(r1))
        w = mt(r2)
    p = jnp.broadcast_to(jnp.eye(N, dtype=a3.dtype), (B, N, N))
    w, p, off = _gram_iterations(w, p, max_iters, tol)
    if finish_sweeps > 0:
        def fin(args):
            w, p = args
            w2, p2, _ = _finishing_sweeps(w, p, finish_sweeps, tol)
            return w2, p2
        w, p = jax.lax.cond(jnp.max(off) <= tol,
                            lambda args: args, fin, (w, p))
    sv = jnp.sqrt(jnp.sum(w * w, axis=-2))
    order = jnp.argsort(-sv, axis=-1)
    sv = jnp.take_along_axis(sv, order, axis=-1)
    w = jnp.take_along_axis(w, order[:, None, :], axis=-1)
    p = jnp.take_along_axis(p, order[:, None, :], axis=-1)
    safe = jnp.where(sv > 0, sv, jnp.ones_like(sv))
    uw = w / safe[:, None, :]
    # batch-hoisted dead-column repair: the former per-matrix
    # vmap(_complete_u) turned its lax.cond into a select, so the
    # Householder-QR repair branch RAN for all B matrices on every
    # call (vmapped cond executes both branches) — ~half the polish
    # wall at 32×512² for full-rank inputs that never need it. One
    # scalar any() predicate keeps a real branch under jit; the repair
    # itself is the batched panel QR over the whole batch (healthy
    # matrices reproduce U exactly up to the R-diagonal sign fix).
    need = jnp.any(jnp.min(sv, axis=-1)
                   <= eps * N * jnp.max(sv, axis=-1))

    def _repair(uu):
        q, r = _robust_qr(uu)
        d = jnp.diagonal(r, axis1=-2, axis2=-1)
        sign = jnp.where(d < 0, -1.0, 1.0).astype(uu.dtype)
        return q * sign[:, None, :]

    uw = jax.lax.cond(need, _repair, lambda uu: uu, uw)
    u = uw if q1 is None else mm(q1, uw)
    v = mm(q2, p)
    return u, sv, mt(v)


def svd_gram(a, max_iters: int = 100, finish_sweeps: int = 8,
             precond: str = "auto"):
    """Simultaneous-rotation Jacobi SVD: A = U·diag(sv)·V (see module
    docstring). Batched over leading dims; rectangular inputs handled by
    the preconditioning QR (M > N) or by transposition (M < N).

    ``max_iters`` bounds the GEMM iteration (exits early on Demmel's
    criterion); ``finish_sweeps`` bounds the scalar-sweep fallback for
    tied spectra (0 disables it); ``precond`` selects the seed
    transform ('spectral' gram-eigh / 'qlp' QR grading / 'auto' —
    see _svd_gram_core)."""
    a = jnp.asarray(a)
    a = a.astype(default_float_for(a.dtype))
    if a.ndim < 2:
        raise ValueError("svd expects ndim >= 2")
    lead = a.shape[:-2]
    M, N = a.shape[-2:]
    a3 = a.reshape((max(1, _math.prod(lead)), M, N))
    if M < N:
        u, sv, v = svd_gram(jnp.swapaxes(a3, -1, -2),
                            max_iters=max_iters,
                            finish_sweeps=finish_sweeps,
                            precond=precond)
        u, sv, v = mt(v), sv, mt(u)
    elif M > N:
        q, r = _robust_qr(a3)
        u, sv, v = _svd_gram_core(r, max_iters, finish_sweeps, precond)
        u = mm(q, u)
    else:
        u, sv, v = _svd_gram_core(a3, max_iters, finish_sweeps, precond)
    K = min(M, N)
    u, sv, v = (u.reshape(lead + (M, K)), sv.reshape(lead + (K,)),
                v.reshape(lead + (K, N)))
    from ..core.debug import dassert, dcheck_finite
    dcheck_finite((u, sv, v), "svd_gram (u, sv, v)")
    dassert(sv[..., :-1] >= sv[..., 1:],
            "svd_gram: singular values not sorted descending")
    dassert(sv >= 0, "svd_gram: negative singular value")
    return u, sv, v
