"""LU / Cholesky / LDL contracts (ref: src/la/lu_test.js,
cholesky_test.js, ldl_test.js)."""
import numpy as np
import jax.numpy as jnp
import pytest

from nd4js_tpu import la
from tests.utils import assert_all_close, assert_tril, assert_triu, TestRNG


def test_lu_decomp_square():
    rng = TestRNG("lu_square")
    for n in [1, 2, 5, 16, 40, 130, 200]:
        a = rng.matrix(n, n)
        lu, p = la.lu_decomp(a)
        lu, p = np.asarray(lu), np.asarray(p)
        L = np.tril(lu, -1) + np.eye(n)
        U = np.triu(lu)
        assert_all_close(L @ U, a[p], rtol=1e-9, atol=1e-9,
                         err_msg=f"n={n}")
        assert sorted(p.tolist()) == list(range(n))


def test_lu_decomp_rect():
    rng = TestRNG("lu_rect")
    for (m, n) in [(7, 3), (3, 7), (150, 40), (40, 150), (129, 131)]:
        a = rng.matrix(m, n)
        lu, p = la.lu_decomp(a)
        lu, p = np.asarray(lu), np.asarray(p)
        k = min(m, n)
        L = np.tril(lu, -1)[:, :k] + np.eye(m, k)
        U = np.triu(lu)[:k]
        assert_all_close(L @ U, a[p], rtol=1e-9, atol=1e-9,
                         err_msg=f"{m}x{n}")


def test_lu_solve():
    rng = TestRNG("lu_solve")
    for n in [4, 32, 100]:
        a = rng.matrix(n, n)
        y = rng.matrix(n, 3)
        lu, p = la.lu_decomp(a)
        x = la.lu_solve(lu, p, y)
        assert_all_close(a @ np.asarray(x), y, rtol=1e-7, atol=1e-7)


def test_lu_batched():
    rng = TestRNG("lu_batched")
    a = rng.matrix(2, 3, 12, 12)
    lu, p = la.lu_decomp(a)
    assert lu.shape == (2, 3, 12, 12) and p.shape == (2, 3, 12)
    y = rng.matrix(12, 2)
    x = la.lu_solve(lu, p, y)
    assert x.shape == (2, 3, 12, 2)
    assert_all_close(np.einsum("abij,abjk->abik", a, np.asarray(x)),
                     np.broadcast_to(y, (2, 3, 12, 2)), rtol=1e-8, atol=1e-8)


def test_lu_needs_pivoting():
    # matrix with zero in (0,0) requires pivoting
    a = np.array([[0.0, 1.0], [1.0, 0.0]])
    lu, p = la.lu_decomp(a)
    L = np.tril(np.asarray(lu), -1) + np.eye(2)
    U = np.triu(np.asarray(lu))
    assert_all_close(L @ U, a[np.asarray(p)], atol=1e-14)


def test_cholesky():
    rng = TestRNG("chol")
    for n in [1, 3, 16, 33, 100, 150]:
        a = rng.spd(n, n)
        L = np.asarray(la.cholesky_decomp(a))
        assert_tril(L)
        assert_all_close(L @ L.T, a, rtol=1e-9, atol=1e-9, err_msg=f"n={n}")


def test_cholesky_solve():
    rng = TestRNG("chol_solve")
    n = 64
    a = rng.spd(n, n)
    y = rng.matrix(n, 5)
    L = la.cholesky_decomp(a)
    x = la.cholesky_solve(L, y)
    assert_all_close(a @ np.asarray(x), y, rtol=1e-8, atol=1e-8)


def test_cholesky_batched():
    rng = TestRNG("chol_batched")
    a = rng.spd(8, 20, 20)
    L = np.asarray(la.cholesky_decomp(a))
    assert_all_close(np.einsum("bij,bkj->bik", L, L), a,
                     rtol=1e-9, atol=1e-9)


def test_ldl():
    rng = TestRNG("ldl")
    for n in [2, 8, 30, 100]:
        # symmetric, diagonally dominant (so unpivoted LDL is stable)
        a = rng.matrix(n, n)
        a = (a + a.T) / 2
        a[np.arange(n), np.arange(n)] = np.abs(a).sum(axis=1) + 1
        # make some indefinite: flip sign of the whole thing sometimes
        if rng.bool():
            a = -a
        L, d = la.ldl_decomp(a)
        L, d = np.asarray(L), np.asarray(d)
        assert_tril(L)
        assert_all_close(np.diag(L), 1.0, atol=1e-12)
        assert_all_close((L * d) @ L.T, a, rtol=1e-9, atol=1e-9)


def test_ldl_solve():
    rng = TestRNG("ldl_solve")
    n = 48
    a = rng.matrix(n, n)
    a = (a + a.T) / 2
    a[np.arange(n), np.arange(n)] = np.abs(a).sum(axis=1) + 1
    y = rng.matrix(n, 2)
    L, d = la.ldl_decomp(a)
    x = la.ldl_solve(L, d, y)
    assert_all_close(a @ np.asarray(x), y, rtol=1e-8, atol=1e-8)


def test_lu_solve_fused():
    # fused gesv kernel == decomp+solve (ref: lu.js:24-177)
    rng = TestRNG("lu_gesv")
    for n, k in [(4, 1), (16, 2), (64, 3), (128, 1), (128, 8)]:
        a = rng.matrix(2, n, n)
        y = rng.matrix(2, n, k)
        x = la.lu_solve_fused(a, y)
        assert x.shape == (2, n, k)
        assert_all_close(np.einsum("bij,bjk->bik", a, np.asarray(x)), y,
                         rtol=1e-7, atol=1e-7, err_msg=f"n={n} k={k}")


def test_lu_solve_fused_matches_split_and_edge_cases():
    rng = TestRNG("lu_gesv_edge")
    # pivoting required
    a = np.array([[0.0, 1.0], [1.0, 0.0]])
    y = np.array([[1.0], [2.0]])
    x = la.lu_solve_fused(a, y)
    assert_all_close(a @ np.asarray(x), y, atol=1e-12)
    # 1-D rhs squeeze + broadcasting over leading dims
    a = rng.matrix(3, 24, 24)
    y1 = rng.matrix(24)
    x1 = la.lu_solve_fused(a, y1)
    assert x1.shape == (3, 24)
    # singular input -> non-finite (matching lu_solve semantics)
    a0 = np.zeros((8, 8))
    x0 = la.lu_solve_fused(a0, np.ones((8, 1)))
    assert not bool(np.all(np.isfinite(np.asarray(x0))))
    # N > 128 falls back to decomp+solve
    a = rng.matrix(160, 160)
    y = rng.matrix(160, 2)
    x = la.lu_solve_fused(a, y)
    assert_all_close(a @ np.asarray(x), y, rtol=1e-7, atol=1e-7)


def test_chol_leaf_kernel_matches_base():
    """ops/chol_leaf.py (interpret mode) vs the unrolled XLA base case
    — the Pallas leaf is TPU-only in production (cholesky.py::
    _use_leaf_kernel), so CI pins its semantics here explicitly."""
    from nd4js_tpu.ops.chol_leaf import chol_leaf
    from nd4js_tpu.la.cholesky import _chol_base, _inv_base
    rng = TestRNG("chol_leaf")
    for n in (8, 16, 33, 64):
        for b in ((), (5,), (2, 3)):
            g = rng.matrix(*b, n, n)
            spd = np.einsum("...ij,...kj->...ik", g, g) / n + 2 * np.eye(n)
            l0 = _chol_base(jnp.asarray(spd))
            li0 = _inv_base(l0)
            l1, li1 = chol_leaf(jnp.asarray(spd), True, interpret=True)
            assert_all_close(l1, l0, rtol=1e-12, atol=1e-12,
                             err_msg=f"L n={n} lead={b}")
            assert_all_close(li1, li0, rtol=1e-9, atol=1e-9,
                             err_msg=f"Li n={n} lead={b}")
            l2, none = chol_leaf(jnp.asarray(spd), False, interpret=True)
            assert none is None
            assert_all_close(l2, l0, rtol=1e-12, atol=1e-12)
