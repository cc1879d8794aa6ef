"""QR decomposition — blocked Householder with compact-WY aggregation.

Parity with /root/reference/src/la/qr.js (`qr_decomp_full` :27-77,
economic `qr_decomp` :80-145, `_qr_decomp_inplace` :148-183,
`qr_lstsq` :186-273).

TPU-first redesign (SURVEY.md §7 stage 4): the reference uses cache-
blocked *Givens* rotations because scalar CPUs favour them; on TPU the
idiomatic choice is blocked *Householder* with the compact-WY
representation — the panel factorisation is a ``lax.fori_loop`` of
vectorised rank-1 updates, and everything else (T-matrix formation,
trailing updates, Q accumulation) is GEMMs on the MXU:

    per panel of width b:
      V, taus, R_panel  = unblocked Householder on A[k:, k:k+b]
      T (b×b upper)     = compact-WY recurrence  T[:j,j] = -tau_j·T·VᵀV[:,j]
      A[k:, k+b:]      -= V·Tᵀ·Vᵀ·A[k:, k+b:]            (3 GEMMs)
    Q = (I−V₁T₁V₁ᵀ)···(I−VₚTₚVₚᵀ) applied to I in reverse   (GEMMs)

Capability parity, different mechanism — same contract: Q orthogonal to
eps·4·max(M,N), Q·R ≈ A.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import config as _config
from ..core.batch import batched
from ..core.mm import mm, mt
from ..config import default_float_for
from .tri import triu_solve

__all__ = ["qr_decomp", "qr_decomp_full", "qr_lstsq", "qr_solve",
           "qr_lstsq_fused"]

_PANEL = 128


def _householder_panel(p):
    """Unblocked Householder QR of panel ``p`` (m, b), m >= b.

    Returns (V, taus, R_panel): V (m, b) unit-diagonal reflectors (zeros
    above the diagonal), taus (b,), and the transformed panel whose top
    b rows are the triangular factor.
    """
    m, b = p.shape
    rows = jnp.arange(m)
    cols = jnp.arange(b)
    V0 = jnp.zeros_like(p)
    taus0 = jnp.zeros((b,), p.dtype)

    def body(j, carry):
        p, V, taus = carry
        x = p[:, j]
        x0 = x[j]
        sigma = jnp.sum(jnp.where(rows > j, x * x, 0))
        nrm = jnp.sqrt(x0 * x0 + sigma)
        beta = jnp.where(x0 >= 0, -nrm, nrm)
        denom = x0 - beta
        safe_den = jnp.where(denom == 0, jnp.ones_like(denom), denom)
        v = jnp.where(rows > j, x / safe_den, jnp.zeros_like(x))
        v = jnp.where(rows == j, jnp.ones_like(x), v)
        safe_beta = jnp.where(beta == 0, jnp.ones_like(beta), beta)
        tau = jnp.where(nrm == 0, jnp.zeros_like(beta),
                        (beta - x0) / safe_beta)
        # apply H = I - tau·v·vᵀ to the remaining panel columns
        w = tau * jnp.einsum("ij,i->j", p, v, precision=_config.matmul_precision)
        w = jnp.where(cols > j, w, 0)
        p = p - jnp.outer(v, w)
        # column j becomes beta·e_j (R part); rows above j keep R values
        newc = jnp.where(rows == j, beta, jnp.zeros_like(x))
        newc = jnp.where(rows < j, p[:, j], newc)
        p = p.at[:, j].set(newc)
        V = V.at[:, j].set(v)
        taus = taus.at[j].set(tau)
        return p, V, taus

    p, V, taus = jax.lax.fori_loop(0, b, body, (p, V0, taus0))
    return V, taus, p


def _form_t(V, taus):
    """Compact-WY T factor: H_1···H_b = I − V·T·Vᵀ, T upper triangular."""
    b = V.shape[1]
    W = mm(mt(V), V)                                    # (b, b) Gram
    cols = jnp.arange(b)

    def body(j, T):
        wj = W[:, j]
        col = -taus[j] * jnp.einsum("ik,k->i", T, wj, precision=_config.matmul_precision)
        col = jnp.where(cols < j, col, 0)
        col = jnp.where(cols == j, taus[j], col)
        return T.at[:, j].set(col)

    return jax.lax.fori_loop(0, b, body, jnp.zeros((b, b), V.dtype))


def _qr_factor(a, panel=_PANEL):
    """Blocked factorisation. Returns (R_packed, [(k, V, T), ...])."""
    M, N = a.shape
    K = min(M, N)
    vts = []
    for k in range(0, K, panel):
        b = min(panel, K - k)
        V, taus, pdone = _householder_panel(a[k:, k:k + b])
        T = _form_t(V, taus)
        vts.append((k, V, T))
        if k + b < N:
            trail = a[k:, k + b:]
            w = mm(mt(V), trail)
            w = mm(mt(T), w)
            trail = trail - mm(V, w)
        else:
            trail = a[k:, k + b:]
        a = jnp.concatenate(
            [a[:k], jnp.concatenate([a[k:, :k], pdone, trail], axis=1)],
            axis=0)
    return a, vts


def _apply_q(vts, B, transpose=False):
    """B ← Q·B (or Qᵀ·B). Q = Π_i (I − V_i·T_i·V_iᵀ), panels applied in
    reverse for Q, forward for Qᵀ."""
    order = vts if transpose else list(reversed(vts))
    for k, V, T in order:
        sub = B[k:, :]
        w = mm(mt(V), sub)
        w = mm(mt(T), w) if transpose else mm(T, w)
        B = jnp.concatenate([B[:k], sub - mm(V, w)], axis=0)
    return B


def _qr_core(a, economic: bool):
    M, N = a.shape
    K = min(M, N)
    r, vts = _qr_factor(a)
    ncols = K if economic else M
    q = _apply_q(vts, jnp.eye(M, ncols, dtype=a.dtype))
    r = jnp.triu(r[:K] if economic else r)
    return q, r


def _cholqr2_panel(p, q_prev):
    """Orthogonalise flat-batched panel ``p`` (B, M, b) against q_prev
    (BCGS2) and internally (CholeskyQR2; the panel Cholesky emits its
    inverse so the whitening is a GEMM). Returns (q_new, r_top,
    r_diag)."""
    from .cholesky import _chol_inv_core
    eps = jnp.finfo(p.dtype).eps
    b = p.shape[-1]
    eye = jnp.eye(b, dtype=p.dtype)

    def cholqr(p):
        g = mm(mt(p), p)
        # tiny diagonal shift: keeps chol alive on nearly rank-deficient
        # panels; reconstruction stays exact (Q·R == P by construction)
        tr = jnp.trace(g, axis1=-2, axis2=-1)[..., None, None]
        shift = 10 * eps * tr / b + jnp.finfo(p.dtype).tiny
        l, linv = _chol_inv_core(g + shift * eye)
        q = mm(p, mt(linv))
        return q, mt(l)

    if q_prev is not None:
        s1 = mm(mt(q_prev), p)
        p = p - mm(q_prev, s1)
    else:
        s1 = None
    q1, r1 = cholqr(p)
    if q_prev is not None:
        s2 = mm(mt(q_prev), q1)
        q1 = q1 - mm(q_prev, s2)
    q2, r2 = cholqr(q1)
    r_diag = mm(r2, r1)
    r_top = None if s1 is None else s1 + mm(s2, r1)
    return q2, r_top, r_diag


def _qr_cholqr2_flat(a3, economic: bool):
    """All-GEMM QR of a flat (B, M, N) batch: blocked classical
    Gram-Schmidt with reorthogonalisation (BCGS2), CholeskyQR2 panels.
    ~2x the FLOPs of Householder but zero sequential scalar work —
    every op is an MXU GEMM or a VMEM-resident Pallas panel.
    Orthogonality holds for κ(A) ≲ 1/√eps(dtype); the Householder path
    remains the robust default."""
    B, M, N = a3.shape
    K = min(M, N)
    q_panels = []
    r_cols = []
    q_prev = None
    for k in range(0, K, _PANEL):
        b = min(_PANEL, K - k)
        qk, r_top, r_diag = _cholqr2_panel(a3[:, :, k:k + b], q_prev)
        block = [r_diag] if r_top is None else [r_top, r_diag]
        if K - (k + b) > 0:
            block.append(jnp.zeros((B, K - k - b, b), a3.dtype))
        r_cols.append(jnp.concatenate(block, axis=1))
        q_panels.append(qk)
        q_prev = jnp.concatenate(q_panels, axis=2)
    r = jnp.concatenate(r_cols, axis=2)
    if N > K:
        r = jnp.concatenate([r, mm(mt(q_prev), a3[:, :, K:])], axis=2)
    q = q_prev
    if not economic:
        # extend Q to a full orthogonal basis: orthogonalise the residual
        # of identity columns (only needed for M > K)
        if M > K:
            extra = jnp.broadcast_to(
                jnp.eye(M, dtype=a3.dtype)[:, K:], (B, M, M - K))
            qe, _, _ = _cholqr2_panel(extra, q)
            q = jnp.concatenate([q, qe], axis=2)
        r = jnp.concatenate(
            [r, jnp.zeros((B, M - K, N), a3.dtype)], axis=1)
    return q, jnp.triu(r)


def _qr_cholqr2_core(a, economic: bool):
    """2-D wrapper of the flat-batched cholqr2 core."""
    q, r = _qr_cholqr2_flat(a[None], economic)
    return q[0], r[0]


def _form_t_batched(V, taus):
    """Compact-WY T for batched reflector stores (..., M, b), via the
    closed form T = (diag(1/τ) + striu(VᵀV))⁻¹ — verified identity for
    the forward product H_0···H_{b−1} = I − V·T·Vᵀ. One Gram GEMM plus
    a log-depth triangular inversion instead of a b-step fori_loop
    (which round-trips HBM every step). Null reflectors (τ = 0) are
    handled by masking their V columns, which zeroes their T coupling.

    Returns (V_masked, T) — use V_masked for all V·T·Vᵀ applications.
    """
    from .tri import _tril_inv_core
    b = V.shape[-1]
    live = taus != 0
    V = V * live[..., None, :].astype(V.dtype)
    W = mm(mt(V), V)
    inv_tau = jnp.where(live, 1.0 / jnp.where(live, taus, 1.0), 1.0)
    U = jnp.triu(W, 1) + inv_tau[..., None, :] * jnp.eye(b, dtype=V.dtype)
    # upper-triangular inverse via the reversed lower-tri inversion
    T = _tril_inv_core(U[..., ::-1, ::-1])[..., ::-1, ::-1]
    return V, T


def _use_interpret() -> bool:
    return jax.default_backend() == "cpu"


def _qr_factor_batched(a3, panel=_PANEL, kmax=None):
    """Blocked Householder factorisation of (Bn, M, N) with the Pallas
    VMEM panel kernel (ops/house_panel.py). Returns (R_packed, vts).
    ``kmax`` limits the factored columns (trailing columns are still
    transformed — the fused-lstsq seam)."""
    from ..ops.house_panel import house_panel
    interp = _use_interpret()
    Bn, M, N = a3.shape
    K = min(M, N) if kmax is None else kmax
    vts = []
    for k in range(0, K, panel):
        b = min(panel, K - k)
        rpan, V, taus = house_panel(a3[:, k:, k:k + b], interpret=interp)
        V, T = _form_t_batched(V, taus)
        vts.append((k, V, T))
        if k + b < N:
            trail = a3[:, k:, k + b:]
            w = mm(mt(V), trail)
            w = mm(mt(T), w)
            trail = trail - mm(V, w)
        else:
            trail = a3[:, k:, k + b:]
        bottom = jnp.concatenate([a3[:, k:, :k], rpan, trail], axis=2)
        a3 = jnp.concatenate([a3[:, :k], bottom], axis=1)
    return a3, vts


def _apply_q_batched(vts, Bmat, transpose=False):
    order = vts if transpose else list(reversed(vts))
    for k, V, T in order:
        sub = Bmat[:, k:, :]
        w = mm(mt(V), sub)
        w = mm(mt(T), w) if transpose else mm(T, w)
        Bmat = jnp.concatenate([Bmat[:, :k], sub - mm(V, w)], axis=1)
    return Bmat


def _qr_house_flat(a3, economic: bool):
    """Householder QR of a flat (B, M, N) batch -> (Q3, R3)."""
    Bn, M, N = a3.shape
    K = min(M, N)
    r, vts = _qr_factor_batched(a3)
    ncols = K if economic else M
    eye = jnp.broadcast_to(jnp.eye(M, ncols, dtype=a3.dtype),
                           (Bn, M, ncols))
    q = _apply_q_batched(vts, eye)
    r = jnp.triu(r[:, :K] if economic else r)
    return q, r


def _qr_batched(a, economic: bool):
    """Natively-batched public QR path (leading dims flattened to one
    batch axis; the panel runs in VMEM via Pallas)."""
    import math as _math
    lead = a.shape[:-2]
    M, N = a.shape[-2:]
    a3 = a.reshape((max(1, _math.prod(lead)), M, N))
    q, r = _qr_house_flat(a3, economic)
    q = q.reshape(lead + q.shape[-2:])
    r = r.reshape(lead + (r.shape[-2], N))
    return q, r


def _qr_auto_flat(a3, economic: bool):
    """Condition-adaptive QR of a flat (B, M, N) batch.

    Runs the all-GEMM CholeskyQR2 path, *measures* its orthogonality
    defect ‖QᵀQ − I‖_max (one GEMM — no condition-number estimate
    needed), and lax.conds into the robust Householder path only when
    the defect exceeds the library contract (eps·4·max(M,N), the
    reference's orthogonality budget from _generic_test_svd_decomp.js:
    93-103). Well-conditioned batches pay only the defect GEMM;
    κ ≳ 1/√eps inputs transparently get Householder accuracy."""
    Bn, M, N = a3.shape
    qf, rf = _qr_cholqr2_flat(a3, economic)
    ncols = qf.shape[-1]
    eye = jnp.eye(ncols, dtype=a3.dtype)
    defect = jnp.max(jnp.abs(mm(mt(qf), qf) - eye))
    tol = 4 * jnp.finfo(a3.dtype).eps * max(M, N)
    return jax.lax.cond(defect <= tol,
                        lambda _: (qf, rf),
                        lambda _: _qr_house_flat(a3, economic),
                        None)


def _qr_auto(a, economic: bool):
    import math as _math
    lead = a.shape[:-2]
    M, N = a.shape[-2:]
    a3 = a.reshape((max(1, _math.prod(lead)), M, N))
    q, r = _qr_auto_flat(a3, economic)
    return (q.reshape(lead + q.shape[-2:]),
            r.reshape(lead + (r.shape[-2], N)))


def _qr_public(a, economic: bool, method: str):
    a = jnp.asarray(a)
    a = a.astype(default_float_for(a.dtype))
    if a.ndim < 2:
        raise ValueError("qr_decomp expects ndim >= 2")
    if method == "cholqr2":
        import math as _math
        lead = a.shape[:-2]
        M, N = a.shape[-2:]
        a3 = a.reshape((max(1, _math.prod(lead)), M, N))
        q, r = _qr_cholqr2_flat(a3, economic)
        return (q.reshape(lead + q.shape[-2:]),
                r.reshape(lead + (r.shape[-2], N)))
    if method == "auto":
        return _qr_auto(a, economic=economic)
    if method != "householder":
        raise ValueError(f"unknown method {method!r}")
    return _qr_batched(a, economic=economic)


def _qr_debug_guard(q, r):
    """debug_checks guards: finite outputs + orthogonality spot-check
    (the reference's /*DEBUG*/ density in qr.js:150-167)."""
    from ..core.debug import dassert, dcheck_finite
    from .. import config
    if not config.debug_checks:
        return
    dcheck_finite((q, r), "qr_decomp (q, r)")
    ncols = q.shape[-1]
    eye = jnp.eye(ncols, dtype=q.dtype)
    defect = jnp.max(jnp.abs(mm(mt(q), q) - eye))
    tol = 64 * jnp.finfo(q.dtype).eps * max(q.shape[-2], ncols)
    dassert(defect <= tol, "qr_decomp: Q orthogonality defect")


def qr_decomp(a, method: str = "householder"):
    """Economic QR: A = Q·R, Q (..., M, K), R (..., K, N), K = min(M, N)
    (ref: qr.js:80-145). Batched over leading dims.

    method: 'householder' (robust default; compact-WY with the panel
    factorisation in a Pallas VMEM kernel), 'cholqr2' (all-GEMM
    BCGS2+CholeskyQR2 — needs κ(A) ≲ 1/√eps), or 'auto' (cholqr2 with
    a measured-orthogonality-defect fallback to householder — the fast
    path at householder robustness; the benchmark path)."""
    q, r = _qr_public(a, economic=True, method=method)
    _qr_debug_guard(q, r)
    return q, r


def qr_decomp_full(a, method: str = "householder"):
    """Full QR: Q (..., M, M), R (..., M, N) (ref: qr.js:27-77)."""
    return _qr_public(a, economic=False, method=method)


def qr_lstsq(q, r, y):
    """Least-squares solve from a QR factorisation: x = R⁻¹·Qᵀ·y
    (ref: qr.js:186-273). Accepts economic or full Q/R; for full, only
    the leading K columns/rows participate."""
    q, r, y = jnp.asarray(q), jnp.asarray(r), jnp.asarray(y)
    k = min(r.shape[-2], r.shape[-1])

    @batched((2, 2, 2))
    def _go(q, r, y):
        qty = mm(mt(q[:, :k]), y.astype(q.dtype))
        return triu_solve.core(r[:k, :k], qty, method="block")

    return _go(q, r, y)


def qr_solve(q, r, y):
    """Exact-solve alias for square systems (matches the reference's use
    of qr_lstsq on square inputs)."""
    return qr_lstsq(q, r, y)


def qr_lstsq_fused(a, y):
    """Least-squares solve x = argmin‖A·x − y‖ WITHOUT forming Q: the
    RHS rides through the Householder factorisation as appended columns
    (the block-reflector form of the reference's `_qr_decomp_inplace`,
    qr.js:148-183, which applies each Givens rotation to A and Y
    simultaneously) — so the whole solve is the panel factorisation,
    the trailing updates (which transform y for free), and one blocked
    triangular solve. Skips Q formation and the separate Qᵀ·y apply,
    the dominant dispatch cost for single-matrix latency (BASELINE
    config 1). Requires M ≥ N; batched over leading dims."""
    import math as _math
    a, y = jnp.asarray(a), jnp.asarray(y)
    a = a.astype(default_float_for(a.dtype))
    y = y.astype(a.dtype)
    M, N = a.shape[-2:]
    if M < N:
        # parity with the reference: under-determined systems are
        # rrqr/urv territory (qr.js:210 throws the same way)
        raise ValueError("qr_lstsq_fused: under-determined systems not "
                         "supported; use rrqr_lstsq or urv_lstsq")
    L = y.shape[-1]
    lead = jnp.broadcast_shapes(a.shape[:-2], y.shape[:-2])
    a = jnp.broadcast_to(a, lead + (M, N))
    y = jnp.broadcast_to(y, lead + (M, L))
    Bn = max(1, _math.prod(lead))
    if M == N and N <= 256:
        # square systems up to 256²: the ENTIRE workload (factor, Qᵀy,
        # back substitution) runs in ONE Pallas launch
        # (ops/house_stripe.py::qr_gesv) — the panel/T/trailing/solve
        # op chain below is pure dispatch overhead at this size
        from ..ops.house_stripe import qr_gesv
        x = qr_gesv(a.reshape((Bn, M, N)), y.reshape((Bn, M, L)),
                    interpret=_use_interpret())
        from ..core.debug import dcheck_finite
        dcheck_finite(x, "qr_lstsq_fused x")
        return x.reshape(lead + (N, L))
    aug = jnp.concatenate([a.reshape((Bn, M, N)),
                           y.reshape((Bn, M, L))], axis=-1)
    r, _ = _qr_factor_batched(aug, kmax=N)
    rr = jnp.triu(r[:, :N, :N])
    z = r[:, :N, N:]
    from .tri import _triu_solve_blocked
    x = _triu_solve_blocked(rr, z)
    return x.reshape(lead + (N, L))
