"""Deepened contract sweeps — MXU sizes, float32, conditioning, and
adversarial structure (VERDICT round-1 item 9).

Covers what the shallow n ≤ 28 sweeps miss:
  * float32 contracts at MXU-relevant sizes (128/256): the bench dtype
    at the bench block sizes, through the same public API the bench
    drives (reference scale analog: the 313 `forEachItemIn` property
    blocks, /root/reference/src/jasmine_utils.js:268).
  * condition sweeps κ up to 1/eps — probes the cholqr2 orthogonality
    limit (κ ≲ 1/√eps, la/qr.py) and proves the 'auto' path's measured
    -defect fallback restores Householder-grade Q.
  * the Kahan matrix — the classic adversarial input for column-pivoted
    QR rank revelation (the worst case SRRQR exists to fix,
    ref: /root/reference/src/la/srrqr.js:62-65).
  * defective (repeated-eigenvalue) schur_eigen inputs
    (ref: src/la/schur.js:90-370 repeated-eigenvalue fallback).
  * eigh method cross-checks (jacobi vs dc) on clustered spectra.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from nd4js_tpu import la
from tests.utils import TestRNG, eps


def _orth_defect(q):
    q = np.asarray(q, np.float64)
    k = q.shape[-1]
    return np.abs(np.swapaxes(q, -1, -2) @ q - np.eye(k)).max()


# ------------------------------------------------- f32 @ MXU sizes

@pytest.mark.parametrize("n", [128, 256])
def test_f32_qr_contracts_mxu(n):
    rng = TestRNG(f"deep-qr-{n}")
    a = rng.normal(2, n, n).astype(np.float32)
    e = eps(np.float32)
    for method in ("householder", "cholqr2", "auto"):
        q, r = la.qr_decomp(jnp.asarray(a), method=method)
        q, r = np.asarray(q, np.float64), np.asarray(r, np.float64)
        assert _orth_defect(q) <= 4 * n * e, method
        assert np.abs(q @ r - a).max() <= 16 * n * e * np.abs(a).max(), method
        assert np.abs(np.tril(r, -1)).max() == 0, method


@pytest.mark.parametrize("n", [128, 256])
def test_f32_lu_chol_contracts_mxu(n):
    rng = TestRNG(f"deep-luchol-{n}")
    a = rng.normal(2, n, n).astype(np.float32)
    e = eps(np.float32)
    lu, p = la.lu_decomp(jnp.asarray(a))
    lu = np.asarray(lu, np.float64)
    L = np.tril(lu, -1) + np.eye(n)
    U = np.triu(lu)
    ap = np.take_along_axis(a.astype(np.float64),
                            np.asarray(p)[..., None], axis=-2)
    # pivot growth on random matrices is modest; 64·n·eps·‖A‖ is ample
    assert np.abs(L @ U - ap).max() <= 64 * n * e * np.abs(a).max()

    spd = a @ np.swapaxes(a, -1, -2) / n + 2 * np.eye(n, dtype=np.float32)
    Lc = np.asarray(la.cholesky_decomp(jnp.asarray(spd)), np.float64)
    assert np.abs(Lc @ np.swapaxes(Lc, -1, -2) - spd).max() \
        <= 16 * n * e * np.abs(spd).max()


@pytest.mark.parametrize("n", [128, 256])
def test_f32_svd_gram_contracts_mxu(n):
    rng = TestRNG(f"deep-svdgram-{n}")
    a = rng.normal(2, n, n).astype(np.float32)
    e = eps(np.float32)
    u, sv, v = la.svd_gram(jnp.asarray(a))
    u, sv, v = (np.asarray(u, np.float64), np.asarray(sv, np.float64),
                np.asarray(v, np.float64))
    assert np.all(sv >= 0) and np.all(np.diff(sv, axis=-1) <= 0)
    assert _orth_defect(u) <= 4 * n * e
    assert _orth_defect(np.swapaxes(v, -1, -2)) <= 4 * n * e
    rec = u * sv[..., None, :] @ v
    assert np.abs(rec - a).max() <= 1e-5 * np.abs(a).max() * n ** 0.5


# ------------------------------------------------- condition sweeps

@pytest.mark.parametrize("kappa", [1e3, 1e8, 1e12, 1e15])
def test_qr_auto_condition_sweep(kappa):
    """'auto' must deliver Householder-grade orthogonality at every κ —
    including far beyond cholqr2's κ ≲ 1/√eps validity."""
    rng = TestRNG(f"deep-kappa-{kappa}")
    n = 96
    u = rng.ortho(n, n)
    v = rng.ortho(n, n)
    sv = np.logspace(0, -np.log10(kappa), n)
    a = (u * sv) @ v.T
    q, r = la.qr_decomp(jnp.asarray(a), method="auto")
    assert _orth_defect(np.asarray(q)) <= 4 * n * eps(np.float64)
    assert np.abs(np.asarray(q) @ np.asarray(r) - a).max() \
        <= 16 * n * eps(np.float64) * np.abs(a).max()


def test_cholqr2_documented_limit():
    """The raw cholqr2 path is *expected* to lose orthogonality past
    κ ~ 1/√eps — this pins the documented limitation the 'auto' method
    exists to fix (a passing xfail would mean the doc is stale)."""
    rng = TestRNG("deep-cholqr2-limit")
    n = 96
    u = rng.ortho(n, n)
    v = rng.ortho(n, n)
    sv = np.logspace(0, -15, n)
    a = (u * sv) @ v.T
    q, _ = la.qr_decomp(jnp.asarray(a), method="cholqr2")
    d = _orth_defect(np.asarray(q))
    # NaN also violates the contract (and `auto`'s defect <= tol test
    # is False for NaN, so the fallback fires either way)
    assert not (d <= 4 * n * eps(np.float64))


# ------------------------------------------------- Kahan matrix

def _kahan(n, theta=1.2):
    """Kahan's matrix: upper triangular, graded, the classic column-
    pivoted-QR failure case (Gu & Eisenstat's motivating example)."""
    c, s = np.cos(theta), np.sin(theta)
    k = np.triu(-c * np.ones((n, n)), 1) + np.eye(n)
    scale = s ** np.arange(n)
    return scale[:, None] * k


def test_srrqr_kahan_rank_reveal():
    """SRRQR must reveal the Kahan matrix's small trailing singular
    value: |R[n-1, n-1]| within the Gu-Eisenstat factor of σ_min
    (RRQR alone overestimates it by an exponential factor)."""
    n = 24
    a = _kahan(n)
    sv = np.linalg.svd(a, compute_uv=False)
    q, r, p, rank = la.srrqr_decomp_full(jnp.asarray(a))
    r = np.asarray(r)
    # Gu-Eisenstat bound: σ_min ≤ |r_nn| ≤ σ_min·√(1 + f²·n·(n−rank))
    bound = sv[-1] * np.sqrt(1 + 4 * n * n)
    assert abs(r[-1, -1]) <= bound
    assert abs(r[-1, -1]) >= sv[-1] * (1 - 1e-8)
    # factorisation itself must hold: Q·R = A·P
    ap = np.asarray(a)[:, np.asarray(p)]
    assert np.abs(np.asarray(q) @ r - ap).max() <= 1e-10


# ------------------------------------------------- defective eigenproblems

def test_schur_eigen_defective_jordan():
    """A true Jordan block: one eigenvector, repeated eigenvalue. The
    eigenvector residual A·v − λ·v must stay bounded (the reference's
    repeated-eigenvalue fallback, schur.js:188-203) — no NaN/Inf, and
    each returned vector is unit-norm."""
    n = 6
    rng = TestRNG("deep-defective")
    jord = np.eye(n) * 0.5 + np.diag(np.ones(n - 1), 1)
    s = rng.ortho(n, n)
    a = s @ jord @ s.T
    w, v = la.eigen(jnp.asarray(a))
    w, v = np.asarray(w), np.asarray(v)
    assert np.all(np.isfinite(v.real)) and np.all(np.isfinite(v.imag))
    norms = np.linalg.norm(v, axis=0)
    assert np.allclose(norms, 1.0, atol=1e-8)
    # eigenvalues of a Jordan perturbation scatter as eps^(1/n); the
    # residual bound is correspondingly loose but must be *bounded*
    resid = np.abs(a @ v - v * w[None, :]).max()
    assert resid <= 1e-2


def test_schur_eigen_repeated_diagonalizable():
    """Repeated eigenvalues with a full eigenbasis (A = S·diag·S⁻¹,
    duplicated entries): eigen must still produce true eigenvectors."""
    rng = TestRNG("deep-repeated-diag")
    n = 8
    d = np.array([2.0, 2.0, 2.0, -1.0, -1.0, 0.5, 0.5, 0.5])
    s = rng.ortho(n, n)
    a = s @ np.diag(d) @ s.T
    w, v = la.eigen(jnp.asarray(a))
    w, v = np.asarray(w), np.asarray(v)
    resid = np.abs(a @ v - v * w[None, :]).max()
    assert resid <= 1e-7
    assert np.allclose(np.sort(w.real), np.sort(d), atol=1e-7)
    assert np.abs(w.imag).max() <= 1e-7


# ------------------------------------------------- eigh cross-checks

@pytest.mark.parametrize("n", [33, 64, 129])
def test_eigh_dc_matches_numpy(n):
    rng = TestRNG(f"deep-eighdc-{n}")
    a = rng.normal(n, n)
    a = (a + a.T) / 2
    w, v = la.eigh(jnp.asarray(a), method="dc")
    w, v = np.asarray(w), np.asarray(v)
    w_np = np.linalg.eigvalsh(a)
    assert np.abs(w - w_np).max() <= 1e-9 * max(1, np.abs(w_np).max())
    assert _orth_defect(v) <= 4 * n * eps(np.float64)
    rec = (v * w) @ v.T
    assert np.abs(rec - a).max() <= 1e-9 * max(1, np.abs(w_np).max()) * n


def test_eigh_dc_clustered_spectrum():
    """Tight clusters are the D&C deflation stress case."""
    rng = TestRNG("deep-eighdc-clustered")
    n = 48
    d = np.concatenate([np.full(16, 1.0), np.full(16, 1.0 + 1e-13),
                        np.linspace(-2, 2, 16)])
    s = rng.ortho(n, n)
    a = s @ np.diag(d) @ s.T
    w, v = la.eigh(jnp.asarray(a), method="dc")
    w, v = np.asarray(w), np.asarray(v)
    assert np.abs(np.sort(w) - np.sort(d)).max() <= 1e-10
    assert _orth_defect(v) <= 8 * n * eps(np.float64)


# ------------------------------------------------- LU edge semantics

def test_lu_zero_pivot_semantics():
    """A structurally singular column must yield a zero U diagonal (and
    lu_solve then produces inf/nan like the reference's division —
    ref: lu.js:24-81; no exception inside the decomposition)."""
    z = np.eye(6)
    z[:, 2] = 0.0
    lu, p = la.lu_decomp(jnp.asarray(z[None]))
    d = np.asarray(lu)[0].diagonal()
    assert d[2] == 0.0
    x = np.asarray(la.lu_solve(lu, p, jnp.asarray(np.ones((1, 6, 1)))))
    assert not np.all(np.isfinite(x))


def test_lu_rectangular_shapes():
    rng = TestRNG("deep-lu-rect")
    for m, n in ((300, 260), (260, 300), (129, 129)):
        a = rng.normal(2, m, n)
        lu, p = la.lu_decomp(jnp.asarray(a))
        lu, p = np.asarray(lu), np.asarray(p)
        k = min(m, n)
        L = np.tril(lu[..., :k], -1) + np.eye(m, k)
        U = np.triu(lu)[..., :k, :]
        ap = np.take_along_axis(a, p[..., None], axis=-2)
        assert np.abs(L @ U - ap).max() <= 1e-10 * max(1, np.abs(a).max()) * m
        for t in range(2):
            assert sorted(p[t]) == list(range(m))


def test_svd_gram_rank_deficient():
    """svd_gram on an exactly rank-deficient batch: trailing singular
    values ≈ 0, U/V still orthogonal (the _complete_u repair path)."""
    rng = TestRNG("deep-gram-rankdef")
    n, r = 96, 60
    a = rng.normal(2, n, r) @ rng.normal(2, r, n)
    u, sv, v = la.svd_gram(jnp.asarray(a))
    u, sv, v = np.asarray(u), np.asarray(sv), np.asarray(v)
    assert np.abs(sv[:, r:]).max() <= 1e-8 * sv.max()
    assert _orth_defect(u) <= 8 * n * eps(np.float64)
    assert _orth_defect(np.swapaxes(v, -1, -2)) <= 8 * n * eps(np.float64)
    rec = (u * sv[..., None, :]) @ v
    assert np.abs(rec - a).max() <= 1e-10 * max(1, np.abs(a).max()) * n


# ------------------------------------------------- small-σ fidelity (TGK)

def test_svd_dc_small_singular_values():
    """Direct bidiagonal D&C must keep singular values far below
    √eps·‖A‖ — the exact failure mode of the old BᵀB route
    (ref: svd_dc.js:169-658 operates on the bidiagonal directly)."""
    rng = TestRNG("deep-svddc-small")
    n = 32
    u = rng.ortho(n, n)
    v = rng.ortho(n, n)
    sv_true = np.logspace(0, -12, n)
    a = (u * sv_true) @ v.T
    _, sv, _ = la.svd_dc(jnp.asarray(a))
    sv = np.asarray(sv)
    rel = np.abs(sv - sv_true) / sv_true
    # σ ≥ eps·‖A‖·n has meaningful relative accuracy
    meaning = sv_true >= 1e-12
    assert rel[meaning].max() <= 1e-3


# ---------------------------------------------- MXU-size f32 eigensystem tier
# (VERDICT r2 missing #4: schur/eigen/eigh contracts stopped at n≤50
# while the bench gates at 1024 — mirror the reference benchmark pages'
# in-loop residual checks, bench_la_decomps.html:72-88, at MXU sizes.)

@pytest.mark.parametrize("n", [128, 256])
def test_f32_schur_contract_mxu(n):
    rng = TestRNG(f"deep-schur-f32-{n}")
    a = rng.matrix(n, n).astype(np.float32)
    q, t = la.schur_decomp(jnp.asarray(a))
    q, t = np.asarray(q, np.float64), np.asarray(t, np.float64)
    eps = np.finfo(np.float32).eps
    assert np.abs(q.T @ q - np.eye(n)).max() <= 4 * eps * n * 4
    assert np.abs(np.tril(t, -2)).max() == 0.0
    rec = q @ t @ q.T
    assert np.abs(rec - a).max() <= 16 * eps * n * np.abs(a).max()


@pytest.mark.parametrize("n", [128, 256])
def test_f32_eigh_dc_contract_mxu(n):
    rng = TestRNG(f"deep-eigh-f32-{n}")
    a = rng.matrix(n, n).astype(np.float32)
    sym = (a + a.T) / 2
    w, v = la.eigh(jnp.asarray(sym), method="dc")
    w, v = np.asarray(w, np.float64), np.asarray(v, np.float64)
    eps = np.finfo(np.float32).eps
    assert np.all(np.diff(w) >= 0)
    assert np.abs(v.T @ v - np.eye(n)).max() <= 4 * eps * n * 4
    rec = (v * w) @ v.T
    assert np.abs(rec - sym).max() <= 1e-4 * np.abs(sym).max() * n ** 0.5
    w_np = np.linalg.eigvalsh(sym.astype(np.float64))
    assert np.abs(w - w_np).max() <= 1e-3


@pytest.mark.parametrize("n", [128, 256])
def test_f32_svd_dc_contract_mxu(n):
    rng = TestRNG(f"deep-svddc-f32-{n}")
    a = rng.matrix(n, n).astype(np.float32)
    u, sv, v = la.svd_decomp(jnp.asarray(a), method="dc")
    u = np.asarray(u, np.float64)
    sv = np.asarray(sv, np.float64)
    v = np.asarray(v, np.float64)
    eps = np.finfo(np.float32).eps
    assert np.all(np.diff(sv) <= 1e-7) and np.all(sv >= 0)
    assert np.abs(u.T @ u - np.eye(n)).max() <= 4 * eps * n * 4
    rec = (u * sv) @ v
    assert np.abs(rec - a).max() <= 1e-5 * np.abs(a).max() * n ** 0.5
    sv_np = np.linalg.svd(a.astype(np.float64), compute_uv=False)
    assert np.abs(sv - sv_np).max() <= 1e-3
