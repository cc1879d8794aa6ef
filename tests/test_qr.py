"""QR contracts — port of the reference generic QR suite
(ref: src/la/qr_test.js:44-83, _generic_test_svd_decomp.js orthogonality
bounds: ||QᵀQ−I||∞ ≤ eps·4·max(M,N), reconstruction)."""
import numpy as np
import pytest

from nd4js_tpu import la
from tests.utils import assert_all_close, assert_triu, TestRNG, eps


def _check_qr(a, q, r, full):
    m, n = a.shape
    k = min(m, n)
    q, r = np.asarray(q), np.asarray(r)
    if full:
        assert q.shape == (m, m) and r.shape == (m, n)
    else:
        assert q.shape == (m, k) and r.shape == (k, n)
    tol = eps(a.dtype) * 4 * max(m, n)
    orth = np.abs(q.T @ q - np.eye(q.shape[1])).max()
    assert orth <= tol, f"orthogonality {orth} > {tol} for {m}x{n}"
    assert_triu(r, atol=0.0)
    recon = np.abs(q @ r - a).max()
    rtol = eps(a.dtype) * 32 * max(m, n) * max(1.0, np.abs(a).max())
    assert recon <= rtol, f"reconstruction {recon} > {rtol} for {m}x{n}"


@pytest.mark.parametrize("full", [False, True])
def test_qr_shapes_sweep(full):
    rng = TestRNG(f"qr_sweep_{full}")
    shapes = [(1, 1), (2, 3), (3, 2), (7, 7), (20, 5), (5, 20),
              (64, 64), (130, 70), (70, 130), (150, 150), (260, 140)]
    fn = la.qr_decomp_full if full else la.qr_decomp
    for (m, n) in shapes:
        a = rng.matrix(m, n, zeros_frac=0.05)
        q, r = fn(a)
        _check_qr(a, q, r, full)


def test_qr_zero_matrix():
    a = np.zeros((6, 4))
    q, r = la.qr_decomp(a)
    _check_qr(a, q, r, False)


def test_qr_rank_deficient():
    rng = TestRNG("qr_rankdef")
    a, rank = rng.rankdef(40, 30)
    q, r = la.qr_decomp(a)
    _check_qr(a, q, r, False)


def test_qr_batched():
    rng = TestRNG("qr_batched")
    a = rng.matrix(3, 4, 17, 11)
    q, r = la.qr_decomp(a)
    assert q.shape == (3, 4, 17, 11) and r.shape == (3, 4, 11, 11)
    for i in range(3):
        for j in range(4):
            _check_qr(a[i, j], q[i, j], r[i, j], False)


def test_qr_float32():
    rng = TestRNG("qr_f32")
    a = rng.matrix(100, 60, dtype=np.float32)
    q, r = la.qr_decomp(a)
    assert np.asarray(q).dtype == np.float32
    _check_qr(a, q, r, False)


def test_qr_lstsq_overdetermined():
    rng = TestRNG("qr_lstsq")
    m, n = 60, 25
    a = rng.matrix(m, n)
    x_true = rng.matrix(n, 3)
    y = a @ x_true
    q, r = la.qr_decomp(a)
    x = la.qr_lstsq(q, r, y)
    assert_all_close(x, x_true, rtol=1e-7, atol=1e-7)
    # residual orthogonality for inconsistent rhs
    y2 = y + rng.matrix(m, 3)
    x2 = np.asarray(la.qr_lstsq(q, r, y2))
    grad = a.T @ (a @ x2 - y2)
    assert np.abs(grad).max() < 1e-8 * max(1, np.abs(y2).max()) * m


def test_qr_lstsq_square_solve():
    rng = TestRNG("qr_solve")
    n = 50
    a = rng.matrix(n, n) + 5 * np.eye(n)
    y = rng.matrix(n, 2)
    q, r = la.qr_decomp_full(a)
    x = la.qr_solve(q, r, y)
    assert_all_close(a @ np.asarray(x), y, rtol=1e-8, atol=1e-8)


def test_qr_lstsq_fused():
    """Fused lstsq (RHS rides the factorisation, no Q formation —
    the block-reflector form of _qr_decomp_inplace, qr.js:148-183)
    must match the unfused qr_decomp + qr_lstsq path."""
    import jax.numpy as jnp
    rng = TestRNG("qr_fused")
    for (b, m, n, l) in [(1, 8, 8, 1), (3, 40, 24, 2), (2, 65, 64, 3)]:
        a = rng.matrix(b, m, n)
        y = rng.matrix(b, m, l)
        x = np.asarray(la.qr_lstsq_fused(jnp.asarray(a), jnp.asarray(y)))
        q, r = la.qr_decomp(jnp.asarray(a))
        x_ref = np.asarray(la.qr_lstsq(q, r, jnp.asarray(y)))
        assert np.abs(x - x_ref).max() < 1e-10 * max(
            1, np.abs(x_ref).max()), (b, m, n)
    # underdetermined raises, as the reference does (qr.js:210)
    import pytest
    a = rng.matrix(10, 14)
    y = rng.matrix(10, 2)
    with pytest.raises(ValueError):
        la.qr_lstsq_fused(jnp.asarray(a), jnp.asarray(y))


def test_house_stripe_t_matches_house_panel():
    """The transposed stripe-WY panel kernel (ops/house_stripe.py) must
    be a drop-in for ops/house_panel.py::house_panel — same (R, V, tau)
    up to roundoff reassociation."""
    import jax
    import jax.numpy as jnp
    from nd4js_tpu.ops.house_panel import house_panel
    from nd4js_tpu.ops.house_stripe import house_stripe_t
    rng = TestRNG("house_stripe")
    for (b, m, w) in [(2, 200, 64), (1, 128, 128), (3, 96, 24),
                      (2, 64, 17)]:
        a = jnp.asarray(rng.matrix(b, m, w))
        r1, v1, t1 = house_stripe_t(a, interpret=True)
        r0, v0, t0 = house_panel(a, interpret=True)
        sc = max(1.0, float(jnp.abs(r0).max()))
        assert float(jnp.abs(r1 - r0).max()) < 1e-12 * sc, (b, m, w)
        assert float(jnp.abs(v1 - v0).max()) < 1e-12 * 10, (b, m, w)
        assert float(jnp.abs(t1 - t0).max()) < 1e-12 * 10, (b, m, w)


def test_qr_gesv_fused_kernel():
    """One-launch square QR solve (factor + Qᵀy + back substitution in
    VMEM): residual contract + agreement with the split path."""
    import jax.numpy as jnp
    from nd4js_tpu.ops.house_stripe import qr_gesv
    rng = TestRNG("qr_gesv")
    for (b, n, k) in [(2, 64, 4), (1, 250, 3), (3, 130, 1)]:
        a = rng.matrix(b, n, n) + 3 * np.eye(n)
        y = rng.matrix(b, n, k)
        x = qr_gesv(jnp.asarray(a), jnp.asarray(y), interpret=True)
        resid = np.abs(a @ np.asarray(x) - y).max()
        assert resid < 1e-10 * np.abs(a).max() * n ** 0.5, (b, n, k)
        q, r = la.qr_decomp(jnp.asarray(a))
        x_ref = np.asarray(la.qr_lstsq(q, r, jnp.asarray(y)))
        assert np.abs(np.asarray(x) - x_ref).max() < 1e-8 * max(
            1, np.abs(x_ref).max()), (b, n, k)
