"""bidiag / SRRQR / URV / Bunch-Kaufman contracts (ref: src/la/
bidiag_test.js, srrqr_test.js, urv_test.js, pldlp_test.js)."""
import numpy as np
import pytest

from nd4js_tpu import la
from tests.utils import assert_all_close, assert_band, TestRNG, eps, trials


def test_bidiag_shapes_and_contract():
    rng = TestRNG("bidiag")
    for (m, n) in [(1, 1), (2, 2), (7, 7), (9, 4), (4, 9), (25, 14),
                   (14, 25), (1, 6), (6, 1)]:
        a = rng.matrix(m, n)
        u, b, v = la.bidiag_decomp(a)
        u, b, v = np.asarray(u), np.asarray(b), np.asarray(v)
        I = min(m, n)
        J = I if m >= n else I + 1
        assert u.shape == (m, I) and b.shape == (I, J) and v.shape == (J, n)
        assert_band(b, 0, 1)
        tol = eps(a.dtype) * 8 * max(m, n)
        assert np.abs(u.T @ u - np.eye(I)).max() <= tol
        assert np.abs(v @ v.T - np.eye(J)).max() <= tol
        assert_all_close(u @ b @ v, a, rtol=0,
                         atol=1e-12 * max(1, np.abs(a).max()) * max(m, n))


def test_bidiag_batched():
    rng = TestRNG("bidiag_batched")
    a = rng.matrix(3, 8, 5)
    u, b, v = la.bidiag_decomp(a)
    assert u.shape == (3, 8, 5) and b.shape == (3, 5, 5)
    for i in range(3):
        assert_all_close(np.asarray(u[i]) @ np.asarray(b[i]) @ np.asarray(v[i]),
                         a[i], atol=1e-12)


def test_srrqr_contract_and_rank():
    rng = TestRNG("srrqr")
    for trial in range(trials(6)):
        m, n = rng.int(4, 25), rng.int(4, 25)
        a, r_true = rng.rankdef(m, n)
        q, r, p, rank = la.srrqr_decomp_full(a)
        q, r, p = np.asarray(q), np.asarray(r), np.asarray(p)
        assert int(rank) == r_true
        tol = eps(a.dtype) * 4 * max(m, n)
        assert np.abs(q.T @ q - np.eye(m)).max() <= tol
        assert_all_close(q @ r, a[:, p], rtol=0, atol=1e-13 * max(m, n))


def test_srrqr_kahan_matrix():
    """Kahan matrices defeat plain column pivoting for large n; the
    strong-swap loop must still expose the numerical rank structure."""
    n = 40
    c = 0.285
    s = np.sqrt(1 - c * c)
    K = np.triu(-c * np.ones((n, n)), 1) + np.eye(n)
    a = (s ** np.arange(n))[:, None] * K
    q, r, p, rank = la.srrqr_decomp_full(a)
    # R diagonal must reveal the tiny trailing singular value scale
    d = np.abs(np.diag(np.asarray(r)))
    sv = np.linalg.svd(a, compute_uv=False)
    assert d[-1] <= sv[-1] * 50, "SRRQR failed to reveal the small sv"


def test_urv_contract():
    rng = TestRNG("urv_contract")
    for trial in range(trials(5)):
        m, n = rng.int(4, 25), rng.int(4, 25)
        a, r_true = rng.rankdef(m, n)
        u, r, v, rank = la.urv_decomp_full(a)
        u, r, v = np.asarray(u), np.asarray(r), np.asarray(v)
        assert int(rank) == r_true
        tol = eps(a.dtype) * 4 * max(m, n)
        assert np.abs(u.T @ u - np.eye(m)).max() <= tol
        assert np.abs(v @ v.T - np.eye(n)).max() <= tol
        assert_all_close(u @ r @ v, a, rtol=0, atol=1e-13 * max(m, n))
        # R supported only on leading rank x rank block
        if r_true < min(m, n):
            assert np.abs(r[r_true:, :]).max() <= 1e-12
            assert np.abs(r[:, r_true:]).max() <= 1e-12


def test_urv_lstsq_minimum_norm():
    rng = TestRNG("urv_lstsq")
    m, n = 20, 30
    a, r_true = rng.rankdef(m, n, rank=11)
    y = rng.matrix(m, 2)
    u, r, v, rank = la.urv_decomp_full(a)
    x = np.asarray(la.urv_lstsq(u, r, v, rank, y))
    x_np = np.linalg.lstsq(a, y, rcond=None)[0]
    assert_all_close(x, x_np, rtol=1e-9, atol=1e-11)


def test_pldlp_contract():
    rng = TestRNG("pldlp")
    for n in [1, 2, 3, 6, 15, 30]:
        a = rng.matrix(n, n)
        a = (a + a.T) / 2
        ld, p, blk = la.pldlp_decomp(a)
        L = np.asarray(la.pldlp_l(ld, blk))
        D = np.asarray(la.pldlp_d(ld, blk))
        p = np.asarray(p)
        # L unit lower-triangular with bounded growth (Bunch-Kaufman)
        assert np.abs(np.diag(L) - 1).max() == 0
        assert np.abs(np.triu(L, 1)).max() == 0
        assert_all_close(L @ D @ L.T, a[p][:, p], rtol=0,
                         atol=1e-13 * max(1, np.abs(a).max()) * max(1, n))
        # D block diagonal
        assert_band(D, 1, 1)


def test_pldlp_solve():
    rng = TestRNG("pldlp_solve")
    n = 25
    a = rng.matrix(n, n)
    a = (a + a.T) / 2
    y = rng.matrix(n, 3)
    ld, p, blk = la.pldlp_decomp(a)
    x = np.asarray(la.pldlp_solve(ld, p, blk, y))
    assert_all_close(a @ x, y, rtol=1e-9, atol=1e-9)


def test_pldlp_p_matrix():
    p = np.array([2, 0, 1], dtype=np.int32)
    P = np.asarray(la.pldlp_p(p))
    a = np.arange(9.0).reshape(3, 3)
    assert_all_close(P @ a @ P.T, a[p][:, p], atol=0)
