"""Symmetric eig + Hessenberg contracts (ref: src/la/hessenberg_test.js;
eigh is the capability nd4js lacks, tested against numpy)."""
import numpy as np
import pytest

from nd4js_tpu import la
from tests.utils import assert_all_close, assert_hessenberg, TestRNG, eps


def test_eigh_random_symmetric():
    rng = TestRNG("eigh")
    for n in [1, 2, 3, 5, 16, 33, 64, 101]:
        a = rng.matrix(n, n)
        a = (a + a.T) / 2
        w, v = la.eigh(a)
        w, v = np.asarray(w), np.asarray(v)
        assert np.all(np.diff(w) >= 0)
        tol = eps(a.dtype) * 4 * n
        assert np.abs(v.T @ v - np.eye(n)).max() <= max(tol, 1e-14), f"n={n}"
        assert_all_close((v * w) @ v.T, a, rtol=0,
                         atol=1e-10 * max(1, np.abs(a).max()) * n)
        w_np = np.linalg.eigvalsh(a)
        assert_all_close(w, w_np, rtol=1e-9, atol=1e-10)


def test_eigh_degenerate():
    # repeated eigenvalues
    a = np.diag([2.0, 2.0, 2.0, 1.0])
    w, v = la.eigh(a)
    assert_all_close(np.asarray(w), [1, 2, 2, 2.0], atol=1e-12)
    v = np.asarray(v)
    assert np.abs(v.T @ v - np.eye(4)).max() < 1e-12


def test_eigh_batched():
    rng = TestRNG("eigh_batched")
    a = rng.matrix(4, 12, 12)
    a = (a + np.swapaxes(a, -1, -2)) / 2
    w, v = la.eigh(a)
    assert w.shape == (4, 12) and v.shape == (4, 12, 12)
    for i in range(4):
        assert_all_close(np.asarray(v[i]) * np.asarray(w[i]) @ np.asarray(v[i]).T,
                         a[i], atol=1e-10)


def test_eigh_spd_matches_cholesky_logdet():
    rng = TestRNG("eigh_spd")
    a = rng.spd(20, 20)
    w, _ = la.eigh(a)
    assert np.all(np.asarray(w) > 0)
    _, logdet = la.slogdet(a)
    assert_all_close(float(np.log(np.asarray(w)).sum()), float(logdet),
                     rtol=1e-8)


def test_hessenberg():
    rng = TestRNG("hessenberg")
    for n in [1, 2, 3, 4, 10, 33, 80, 100, 131]:
        a = rng.matrix(n, n)
        q, h = la.hessenberg_decomp(a)
        q, h = np.asarray(q), np.asarray(h)
        tol = eps(a.dtype) * 4 * max(2, n)
        assert np.abs(q.T @ q - np.eye(n)).max() <= tol
        assert_hessenberg(h, atol=0.0)
        assert_all_close(q @ h @ q.T, a, rtol=0,
                         atol=1e-12 * max(1, np.abs(a).max()) * max(1, n) * 10)


def test_hessenberg_batched():
    rng = TestRNG("hess_batched")
    a = rng.matrix(3, 9, 9)
    q, h = la.hessenberg_decomp(a)
    assert q.shape == (3, 9, 9)
    for i in range(3):
        assert_all_close(np.asarray(q[i]) @ np.asarray(h[i]) @ np.asarray(q[i]).T,
                         a[i], atol=1e-10)


def test_eigh_via_svd():
    rng = TestRNG("eigh_via_svd")
    for n in [5, 20, 48]:
        a = rng.matrix(n, n)
        a = (a + a.T) / 2
        w, v = la.eigh(a, method="via_svd")
        w, v = np.asarray(w), np.asarray(v)
        assert np.all(np.diff(w) >= 0)
        assert np.abs(v.T @ v - np.eye(n)).max() < 1e-12
        assert_all_close((v * w) @ v.T, a, atol=1e-10 * n)
        assert_all_close(w, np.linalg.eigvalsh(a), rtol=1e-9, atol=1e-10)


def test_sytrd_blocked():
    """Blocked tridiagonalization contract: A = Q·T·Qᵀ, Q orthogonal,
    T tridiagonal — incl. sizes straddling the panel width."""
    from nd4js_tpu.la.sytrd import sytrd
    import jax
    rng = TestRNG("sytrd")
    for n in [1, 2, 3, 5, 17, 64, 65, 130]:
        a = rng.matrix(n, n)
        a = (a + a.T) / 2
        d, e, q = jax.jit(sytrd)(a)
        d, e, q = np.asarray(d), np.asarray(e), np.asarray(q)
        t = np.diag(d)
        if n > 1:
            t += np.diag(e, 1) + np.diag(e, -1)
        tol = eps(a.dtype) * 8 * max(2, n)
        assert np.abs(q.T @ q - np.eye(n)).max() <= tol, f"n={n}"
        scale = max(1.0, np.abs(a).max())
        assert np.abs(q @ t @ q.T - a).max() <= tol * scale, f"n={n}"


def test_eigh_dc_mxu_sizes():
    """eigh(method='dc') at panel-straddling sizes against numpy."""
    rng = TestRNG("eigh_dc_mxu")
    for n in [33, 64, 100, 129]:
        a = rng.matrix(n, n)
        a = (a + a.T) / 2
        w, v = la.eigh(a, method="dc")
        w, v = np.asarray(w), np.asarray(v)
        assert np.all(np.diff(w) >= -1e-12)
        assert np.abs(v.T @ v - np.eye(n)).max() <= 1e-9 * n, f"n={n}"
        assert_all_close((v * w) @ v.T, a, rtol=0, atol=1e-9 * n)
        assert_all_close(w, np.linalg.eigvalsh(a), rtol=1e-8, atol=1e-8)


def test_sytrd_kernel_matches_xla_fallback(monkeypatch):
    """The Pallas latrd panel (ops/sytrd_panel.py, interpret mode here)
    must agree with the XLA fori-loop reference panel bit-for-bit-ish:
    same reflector recurrence, same update — differences only from
    reassociated dot reductions (f64 on CPU: ~1e-13)."""
    from nd4js_tpu.la.sytrd import sytrd
    import jax
    rng = TestRNG("sytrd_kernel_eq")
    for n in [5, 17, 64, 65, 130]:
        a = rng.matrix(n, n)
        a = (a + a.T) / 2
        monkeypatch.setenv("ND4JS_TPU_SYTRD_KERNEL", "1")
        dk, ek, qk = map(np.asarray, jax.jit(sytrd)(a))
        monkeypatch.setenv("ND4JS_TPU_SYTRD_KERNEL", "0")
        dx, ex, qx = map(np.asarray, jax.jit(sytrd)(a))
        scale = max(1.0, np.abs(a).max())
        assert np.abs(dk - dx).max() <= 1e-11 * scale, f"n={n}"
        if n > 1:
            assert np.abs(ek - ex).max() <= 1e-11 * scale, f"n={n}"
        assert np.abs(qk - qx).max() <= 1e-11 * max(1, n), f"n={n}"
