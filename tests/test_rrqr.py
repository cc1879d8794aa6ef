"""RRQR contracts (ref: src/la/rrqr_test.js): pivoted QR structure,
monotone R diagonal, rank detection on known-rank inputs, rank-aware
solves."""
import numpy as np
import pytest

from nd4js_tpu import la
from tests.utils import assert_all_close, assert_triu, TestRNG, eps, trials


def _check(a, q, r, p, economic=True):
    m, n = a.shape
    k = min(m, n)
    q, r, p = np.asarray(q), np.asarray(r), np.asarray(p)
    tol = eps(a.dtype) * 4 * max(m, n)
    assert np.abs(q.T @ q - np.eye(q.shape[1])).max() <= tol
    assert_triu(r)
    assert_all_close(q @ r, a[:, p], rtol=0,
                     atol=eps(a.dtype) * 32 * max(m, n)
                     * max(1.0, np.abs(a).max()))
    # R diagonal non-increasing in magnitude (pivoting invariant)
    d = np.abs(np.diag(r[:k, :k]))
    assert np.all(d[:-1] >= d[1:] - 1e-12 * max(1, d[0]))


def test_rrqr_shapes():
    rng = TestRNG("rrqr_shapes")
    for (m, n) in [(1, 1), (5, 3), (3, 5), (17, 17), (40, 60), (60, 40),
                   (140, 130)]:
        a = rng.matrix(m, n, zeros_frac=0.05)
        q, r, p = la.rrqr_decomp(a)
        _check(a, q, r, p)


def test_rrqr_full():
    rng = TestRNG("rrqr_full")
    a = rng.matrix(30, 20)
    q, r, p = la.rrqr_decomp_full(a)
    assert np.asarray(q).shape == (30, 30)
    _check(a, q, r, p, economic=False)


def test_rrqr_rank_detection():
    rng = TestRNG("rrqr_rank")
    for trial in range(trials(10)):
        m = rng.int(5, 40)
        n = rng.int(5, 40)
        a, rank = rng.rankdef(m, n)
        q, r, p = la.rrqr_decomp(a)
        got = int(la.rrqr_rank(r))
        assert got == rank, f"trial {trial}: {m}x{n} rank {rank} got {got}"


def test_rrqr_lstsq_full_rank():
    rng = TestRNG("rrqr_lstsq")
    m, n = 50, 20
    a = rng.matrix(m, n)
    x_true = rng.matrix(n, 2)
    y = a @ x_true
    q, r, p = la.rrqr_decomp(a)
    x = la.rrqr_lstsq(q, r, p, y)
    assert_all_close(x, x_true, rtol=1e-7, atol=1e-7)


def test_rrqr_lstsq_rank_deficient():
    rng = TestRNG("rrqr_lstsq_rankdef")
    m, n = 40, 25
    a, rank = rng.rankdef(m, n, rank=10)
    x_true = rng.matrix(n, 1)
    y = a @ x_true  # consistent system
    q, r, p = la.rrqr_decomp(a)
    x = np.asarray(la.rrqr_lstsq(q, r, p, y))
    # residual must be (near) zero for a consistent system
    assert_all_close(a @ x, y, rtol=1e-7, atol=1e-7)


def test_rrqr_solve_singular_raises():
    rng = TestRNG("rrqr_solve_sing")
    n = 12
    a, _ = rng.rankdef(n, n, rank=8)
    q, r, p = la.rrqr_decomp(a)
    y = rng.matrix(n, 1)
    with pytest.raises(la.SingularMatrixSolveError) as ei:
        la.rrqr_solve(q, r, p, y)
    assert ei.value.x is not None


def test_rrqr_solve_ok():
    rng = TestRNG("rrqr_solve_ok")
    n = 30
    a = rng.matrix(n, n) + 4 * np.eye(n)
    y = rng.matrix(n, 3)
    q, r, p = la.rrqr_decomp(a)
    x = la.rrqr_solve(q, r, p, y)
    assert_all_close(a @ np.asarray(x), y, rtol=1e-8, atol=1e-8)


def test_rrqr_batched():
    rng = TestRNG("rrqr_batched")
    a = rng.matrix(5, 14, 10)
    q, r, p = la.rrqr_decomp(a)
    assert q.shape == (5, 14, 10) and r.shape == (5, 10, 10) \
        and p.shape == (5, 10)
    for i in range(5):
        _check(a[i], q[i], r[i], p[i])
