"""Triangular solve/inverse contracts (ref: src/la/tri_test.js)."""
import numpy as np
import jax.numpy as jnp
import pytest

from nd4js_tpu import la
from tests.utils import assert_all_close, TestRNG


def _rand_tril(rng, *shape, unit=False):
    a = np.tril(rng.matrix(*shape))
    n = shape[-1]
    idx = np.arange(n)
    # diagonally dominant: random triangular matrices are otherwise
    # exponentially ill-conditioned in n
    a[..., idx, idx] = np.abs(a).sum(axis=-1) + 1.0
    return a


@pytest.mark.parametrize("method", ["scan", "inv", "block"])
def test_tril_solve(method):
    rng = TestRNG(f"tril_solve-{method}")
    for shape in [(4, 4), (16, 16), (37, 37), (130, 130)]:
        L = _rand_tril(rng, *shape)
        y = rng.matrix(shape[0], 3)
        x = la.tril_solve(L, y, method=method)
        assert_all_close(L @ np.asarray(x), y, rtol=1e-9, atol=1e-9)


@pytest.mark.parametrize("method", ["scan", "inv", "block"])
def test_triu_solve(method):
    rng = TestRNG(f"triu_solve-{method}")
    for n in [5, 23, 64, 129]:
        U = _rand_tril(rng, n, n).T.copy()
        y = rng.matrix(n, 2)
        x = la.triu_solve(U, y, method=method)
        assert_all_close(U @ np.asarray(x), y, rtol=1e-9, atol=1e-9)


def test_tri_t_solves():
    rng = TestRNG("tri_t_solves")
    n = 33
    L = _rand_tril(rng, n, n)
    y = rng.matrix(n, 4)
    x = la.tril_t_solve(L, y)
    assert_all_close(L.T @ np.asarray(x), y, rtol=1e-9, atol=1e-9)
    U = L.T.copy()
    x = la.triu_t_solve(U, y)
    assert_all_close(U.T @ np.asarray(x), y, rtol=1e-9, atol=1e-9)


def test_tril_solve_batched_broadcast():
    rng = TestRNG("tril_solve_batched")
    L = np.stack([_rand_tril(rng, 8, 8) for _ in range(6)]).reshape(2, 3, 8, 8)
    y = rng.matrix(3, 8, 2)  # broadcasts against (2,3)
    x = la.tril_solve(L, y)
    assert x.shape == (2, 3, 8, 2)
    assert_all_close(np.einsum("abij,abjk->abik", L, np.asarray(x)),
                     np.broadcast_to(y, (2, 3, 8, 2)), rtol=1e-9, atol=1e-9)


def test_tri_inv():
    rng = TestRNG("tri_inv")
    for n in [3, 16, 50, 128]:
        L = _rand_tril(rng, n, n)
        iL = np.asarray(la.tri_inv(L, lower=True))
        assert_all_close(iL @ L, np.eye(n), rtol=1e-8, atol=1e-8)
        U = L.T.copy()
        iU = np.asarray(la.tri_inv(U, lower=False))
        assert_all_close(iU @ U, np.eye(n), rtol=1e-8, atol=1e-8)
        # inverse of triangular is triangular
        assert np.abs(np.triu(iL, 1)).max() == 0.0
        assert np.abs(np.tril(iU, -1)).max() == 0.0


def test_matmul_chain():
    rng = TestRNG("matmul_chain")
    a = rng.matrix(7, 2)
    b = rng.matrix(2, 9)
    c = rng.matrix(9, 3)
    d = rng.matrix(3, 5)
    got = la.matmul(a, b, c, d)
    want = a @ b @ c @ d
    assert_all_close(got, want, rtol=1e-9, atol=1e-12)


def test_matmul2_promotion_and_broadcast():
    rng = TestRNG("matmul2")
    a = jnp.asarray(rng.matrix(3, 4, 5))
    b = jnp.asarray(rng.matrix(5, 6))
    out = la.matmul2(a, b)
    assert out.shape == (3, 4, 6)
    ai = jnp.arange(4, dtype=jnp.int32).reshape(2, 2)
    out2 = la.matmul2(ai, ai)
    assert out2.dtype == jnp.float64  # int32 promotes to float64


def test_permute_roundtrip():
    rng = TestRNG("permute")
    a = rng.matrix(5, 7)
    p = np.asarray(rng.shuffle(np.arange(5)))
    q = np.asarray(rng.shuffle(np.arange(7)))
    pr = la.permute_rows(a, p)
    assert_all_close(pr, a[p])
    assert_all_close(la.unpermute_rows(pr, p), a)
    pc = la.permute_cols(a, q)
    assert_all_close(pc, a[:, q])
    assert_all_close(la.unpermute_cols(pc, q), a)


def test_eye_diag():
    e = la.eye(3, 4, 5)
    assert e.shape == (3, 4, 5)
    d = la.diag_mat(jnp.asarray([1.0, 2.0, 3.0]))
    assert_all_close(d, np.diag([1, 2, 3.0]))
    a = np.arange(12.0).reshape(3, 4)
    assert_all_close(la.diag(a, 1), np.diagonal(a, 1))


def test_norm_fro_safe():
    big = np.full((4,), 1e200)
    assert np.isfinite(float(la.norm_fro(big)))
    assert_all_close(float(la.norm_fro(big)), np.sqrt(4) * 1e200, rtol=1e-12)
    tiny = np.full((4,), 1e-300)
    assert float(la.norm_fro(tiny)) > 0
    rngm = TestRNG("norm").matrix(6, 7)
    assert_all_close(float(la.norm(rngm)), np.linalg.norm(rngm), rtol=1e-12)
