"""SVD contracts — port of the reference generic suite
(/root/reference/src/la/_generic_test_svd_decomp.js:35-107): shapes,
sorted non-negative singular values, orthogonality ≤ eps·4·max(M,N),
reconstruction, then lstsq/rank/solve on compositions."""
import numpy as np
import jax.numpy as jnp
import pytest

from nd4js_tpu import la
from tests.utils import assert_all_close, TestRNG, eps, trials


def _check_svd(a, u, sv, v):
    m, n = a.shape
    k = min(m, n)
    u, sv, v = np.asarray(u), np.asarray(sv), np.asarray(v)
    assert u.shape == (m, k) and sv.shape == (k,) and v.shape == (k, n)
    # sorted, non-negative
    assert np.all(sv >= 0)
    assert np.all(sv[:-1] >= sv[1:])
    tol = eps(a.dtype) * 4 * max(m, n)
    assert np.abs(u.T @ u - np.eye(k)).max() <= tol, "U orthogonality"
    assert np.abs(v @ v.T - np.eye(k)).max() <= tol, "V orthogonality"
    # reconstruction (reference: atol 1e-7 for float64)
    atol = 1e-7 * max(1.0, np.abs(a).max()) if a.dtype == np.float64 \
        else eps(a.dtype) * 32 * max(m, n) * max(1.0, np.abs(a).max())
    assert np.abs((u * sv) @ v - a).max() <= atol, "reconstruction"
    # singular values match numpy
    sv_np = np.linalg.svd(a, compute_uv=False)
    assert_all_close(sv, sv_np, rtol=1e-6, atol=atol)


def test_svd_shapes_sweep():
    rng = TestRNG("svd_sweep")
    for (m, n) in [(1, 1), (2, 2), (3, 3), (5, 2), (2, 5), (16, 16),
                   (31, 31), (40, 25), (25, 40), (70, 70), (129, 40)]:
        a = rng.matrix(m, n, zeros_frac=0.05)
        u, sv, v = la.svd_decomp(a)
        _check_svd(a, u, sv, v)


def test_svd_rank_deficient():
    rng = TestRNG("svd_rankdef")
    for trial in range(trials(6)):
        m = rng.int(4, 40)
        n = rng.int(4, 40)
        a, r_true = rng.rankdef(m, n)
        u, sv, v = la.svd_decomp(a)
        _check_svd(a, u, sv, v)
        assert int(la.svd_rank(sv)) == r_true


def test_svd_zero_matrix():
    a = np.zeros((5, 3))
    u, sv, v = la.svd_decomp(a)
    _check_svd(a, u, sv, v)
    assert int(la.svd_rank(np.asarray(sv))) == 0


def test_svd_batched():
    rng = TestRNG("svd_batched")
    a = rng.matrix(2, 3, 10, 8)
    u, sv, v = la.svd_decomp(a)
    assert u.shape == (2, 3, 10, 8) and sv.shape == (2, 3, 8) \
        and v.shape == (2, 3, 8, 8)
    for i in range(2):
        for j in range(3):
            _check_svd(a[i, j], u[i, j], sv[i, j], v[i, j])


def test_svd_float32():
    rng = TestRNG("svd_f32")
    a = rng.matrix(60, 60, dtype=np.float32)
    u, sv, v = la.svd_decomp(a)
    assert np.asarray(u).dtype == np.float32
    _check_svd(a, u, sv, v)


def test_svd_lstsq_minimum_norm():
    rng = TestRNG("svd_lstsq")
    m, n = 30, 20
    a, r = rng.rankdef(m, n, rank=12)
    x0 = rng.matrix(n, 1)
    y = a @ x0
    x = np.asarray(la.lstsq(a, y))
    # consistent system: residual ~ 0
    assert_all_close(a @ x, y, rtol=1e-8, atol=1e-8)
    # minimum-norm: x orthogonal to null(A) ⇒ x = A⁺·y unique
    x_np, *_ = np.linalg.lstsq(a, y, rcond=None)
    assert_all_close(x, x_np, rtol=1e-6, atol=1e-8)


def test_svd_solve_and_rank():
    rng = TestRNG("svd_solve")
    n = 24
    a = rng.matrix(n, n) + 4 * np.eye(n)
    y = rng.matrix(n, 2)
    u, sv, v = la.svd_decomp(a)
    x = la.svd_solve(u, sv, v, y)
    assert_all_close(a @ np.asarray(x), y, rtol=1e-8, atol=1e-8)
    assert int(la.rank(a)) == n
    a_sing, r_true = rng.rankdef(n, n, rank=17)
    us, svs, vs = la.svd_decomp(a_sing)
    with pytest.raises(la.SingularMatrixSolveError):
        la.svd_solve(us, svs, vs, y)


def test_svd_variant_mechanisms():
    """Every Jacobi variant is a real distinct engine now: greedy
    max-pivot classic (svd_classic.py), sequential row-cyclic
    Kogbetliantz (svd_kogbetliantz.py), MXU block-tiled
    (svd_block_jac.py) — all must satisfy the same generic contract."""
    rng = TestRNG("svd_variants")
    a = rng.matrix(12, 9)
    for fn in [la.svd_jac_classic, la.svd_jac_2sided,
               la.svd_jac_2sided_blocked]:
        u, sv, v = fn(a)
        _check_svd(a, u, sv, v)


def test_svd_kogbetliantz_adversarial():
    """Two-sided Kogbetliantz on the shapes that stall a *parallel*
    two-sided ordering: clustered/near-equal singular values, repeated
    blocks, odd sizes (the reason this engine is sequential row-cyclic;
    see svd_kogbetliantz.py docstring)."""
    rng = TestRNG("kog_adversarial")
    # near-equal singular values
    n = 14
    q1 = rng.ortho(n, n)
    q2 = rng.ortho(n, n)
    sv_true = np.sort(1.0 + 1e-6 * rng.normal(n))[::-1]
    a = (q1 * sv_true) @ q2.T
    u, sv, v = la.svd_jac_2sided(a)
    _check_svd(a, np.asarray(u), np.asarray(sv), np.asarray(v))
    assert np.abs(np.sort(np.asarray(sv)) - np.sort(sv_true)).max() < 1e-12
    # odd size, rank-deficient
    a2, _ = rng.rankdef(11, 11, rank=7)
    u, sv, v = la.svd_jac_2sided(a2)
    _check_svd(a2, np.asarray(u), np.asarray(sv), np.asarray(v))


def test_svd_classic_greedy_pivot_order():
    """The greedy engine must reduce the largest coupling first and
    converge on a matrix with one dominant off-diagonal pair."""
    a = np.eye(6)
    a[1, 4] = 0.9
    a[4, 1] = -0.3
    u, sv, v = la.svd_jac_classic(a)
    _check_svd(a, np.asarray(u), np.asarray(sv), np.asarray(v))


def test_svd_dc_contract():
    """svd_dc through the same generic contract as the default SVD."""
    rng = TestRNG("svd_dc")
    for (m, n) in [(1, 1), (3, 3), (9, 6), (6, 9), (40, 40), (65, 50)]:
        a = rng.matrix(m, n, zeros_frac=0.05)
        u, sv, v = la.svd_dc(a)
        _check_svd(a, u, sv, v)


def test_svd_dc_rank_deficient():
    rng = TestRNG("svd_dc_rankdef")
    a, r_true = rng.rankdef(30, 22, rank=9)
    u, sv, v = la.svd_dc(a)
    _check_svd(a, u, sv, v)
    assert int(la.svd_rank(np.asarray(sv))) == r_true


def test_svd_dc_batched_f32():
    rng = TestRNG("svd_dc_f32")
    a = rng.matrix(4, 48, 48, dtype=np.float32)
    u, sv, v = la.svd_dc(a)
    assert np.asarray(u).dtype == np.float32
    for i in range(4):
        _check_svd(a[i], u[i], sv[i], v[i])


def test_tridiag_eigh_dc():
    rng = TestRNG("tdc")
    for n in [5, 40, 129]:
        d = rng.normal(n)
        e = rng.normal(n - 1)
        w, v = la.tridiag_eigh_dc(d, e)
        w, v = np.asarray(w), np.asarray(v)
        T = np.diag(d) + np.diag(e, 1) + np.diag(e, -1)
        assert np.abs(v.T @ v - np.eye(n)).max() < eps(np.float64) * 8 * n
        assert_all_close(w, np.linalg.eigvalsh(T), rtol=1e-10, atol=1e-12)


def test_lstsq_urv_method_matches_svd():
    rng = TestRNG("lstsq_urv")
    a, r = rng.rankdef(25, 18, rank=11)
    y = rng.matrix(25, 2)
    x_svd = np.asarray(la.lstsq(a, y))
    x_urv = np.asarray(la.lstsq(a, y, method="urv"))
    assert_all_close(x_urv, x_svd, rtol=1e-8, atol=1e-10)


def test_svd_dc_small_singular_values():
    """Direct (TGK, unsquared) bidiagonal D&C keeps relative accuracy
    for singular values far below √eps·‖A‖ — the BᵀB route lost these
    (ref: svd_dc.js:169-658 solves the bidiagonal problem directly)."""
    rng = TestRNG("svd_dc_small")
    sv_true = np.asarray([3.0, 1.0, 1e-5, 1e-9, 1e-12])
    n = sv_true.size
    q1 = np.linalg.qr(np.asarray(rng.matrix(n, n), np.float64))[0]
    q2 = np.linalg.qr(np.asarray(rng.matrix(n, n), np.float64))[0]
    a = jnp.asarray(q1 @ np.diag(sv_true) @ q2)
    u, sv, v = la.svd_dc(a)
    sv = np.asarray(sv)
    # relative accuracy on every σ, including 1e-12 (≪ √eps·‖A‖ ≈ 5e-8)
    assert np.all(np.abs(sv - sv_true) <= 1e-3 * sv_true + 1e-15), sv
    rec = np.asarray(u, np.float64) @ np.diag(sv) @ np.asarray(v, np.float64)
    assert np.abs(rec - np.asarray(a)).max() < 1e-13
