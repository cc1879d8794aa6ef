"""Generic behavioural contracts instantiated across every implementation
— the reference's signature test architecture (SURVEY.md §4:
`_generic_test_*.js` suites reused per decomposition, e.g.
src/la/_generic_test_svd_decomp.js:35-54 composing generic_test_lstsq /
generic_test_rank / generic_test_solve).

One contract, many implementations: every square-solve path must solve,
every least-squares path must satisfy the normal equations, every
minimum-norm path must match the pseudo-inverse, every decomposition
must reconstruct. Randomized shape sweeps with seeded generators."""
import numpy as np
import jax.numpy as jnp
import pytest

from nd4js_tpu import la
from tests.utils import assert_all_close, TestRNG, eps, trials


# -------------------------------------------------------------- solvers

def _solve_lu(a, y):
    lu, p = la.lu_decomp(a)
    return la.lu_solve(lu, p, y)


def _solve_chol(a, y):
    return la.cholesky_solve(la.cholesky_decomp(a), y)


def _solve_ldl(a, y):
    l, d = la.ldl_decomp(a)
    return la.ldl_solve(l, d, y)


def _solve_pldlp(a, y):
    ld, p, blk = la.pldlp_decomp(a)
    return la.pldlp_solve(ld, p, blk, y)


def _solve_qr(a, y):
    q, r = la.qr_decomp(a)
    return la.qr_lstsq(q, r, y)


def _solve_rrqr(a, y):
    q, r, p = la.rrqr_decomp(a)
    return la.rrqr_solve(q, r, p, y)


def _solve_svd(a, y):
    u, sv, v = la.svd_decomp(a)
    return la.svd_solve(u, sv, v, y)


def _solve_facade(a, y):
    return la.solve(a, y)


_SPD_ONLY = {_solve_chol}
_SYM_ONLY = {_solve_ldl, _solve_pldlp}

_SOLVERS = [_solve_lu, _solve_chol, _solve_ldl, _solve_pldlp,
            _solve_qr, _solve_rrqr, _solve_svd, _solve_facade]


@pytest.mark.parametrize("solver", _SOLVERS,
                         ids=lambda f: f.__name__.lstrip("_"))
def test_generic_solve_contract(solver):
    """Port of generic_test_solve: A·x = y for well-conditioned square
    systems, random shape sweep."""
    rng = TestRNG(f"generic_solve-{solver.__name__}")
    for trial in range(trials(6)):
        n = rng.int(1, 28)
        if solver in _SPD_ONLY:
            a = rng.spd(n, n)
        elif solver in _SYM_ONLY:
            a = rng.matrix(n, n)
            a = (a + a.T) / 2
            a[np.arange(n), np.arange(n)] = np.abs(a).sum(1) + 1
        else:
            a = rng.matrix(n, n)
            a[np.arange(n), np.arange(n)] += np.sign(
                a[np.arange(n), np.arange(n)] + 0.5) * n
        y = rng.matrix(n, rng.int(1, 4))
        x = np.asarray(solver(jnp.asarray(a), jnp.asarray(y)))
        assert_all_close(a @ x, y, rtol=1e-7,
                         atol=1e-8 * max(1, np.abs(a).max()) * n,
                         err_msg=f"{solver.__name__} n={n} trial={trial}")


# ---------------------------------------------------------------- lstsq

def _lstsq_qr(a, y):
    q, r = la.qr_decomp(a)
    return la.qr_lstsq(q, r, y)


def _lstsq_rrqr(a, y):
    q, r, p = la.rrqr_decomp(a)
    return la.rrqr_lstsq(q, r, p, y)


def _lstsq_svd(a, y):
    return la.lstsq(a, y)


def _lstsq_urv(a, y):
    return la.lstsq(a, y, method="urv")


_LSTSQ = [_lstsq_qr, _lstsq_rrqr, _lstsq_svd, _lstsq_urv]


@pytest.mark.parametrize("solver", _LSTSQ,
                         ids=lambda f: f.__name__.lstrip("_"))
def test_generic_lstsq_contract(solver):
    """Port of generic_test_lstsq: full-rank overdetermined systems must
    satisfy the normal equations Aᵀ(A·x − y) = 0."""
    rng = TestRNG(f"generic_lstsq-{solver.__name__}")
    for trial in range(trials(5)):
        n = rng.int(1, 16)
        m = n + rng.int(1, 16)
        a = rng.matrix(m, n)
        y = rng.matrix(m, 2)
        x = np.asarray(solver(jnp.asarray(a), jnp.asarray(y)))
        grad = a.T @ (a @ x - y)
        assert np.abs(grad).max() <= 1e-8 * max(1, np.abs(a).max()) \
            * max(1, np.abs(y).max()) * m * n, \
            f"{solver.__name__} {m}x{n} trial={trial}"


_MINNORM = [_lstsq_svd, _lstsq_urv]


@pytest.mark.parametrize("solver", _MINNORM,
                         ids=lambda f: f.__name__.lstrip("_"))
def test_generic_minnorm_contract(solver):
    """Rank-deficient systems: the minimum-norm paths must match the
    pseudo-inverse solution exactly (not just any least-squares x)."""
    rng = TestRNG(f"generic_minnorm-{solver.__name__}")
    for trial in range(trials(4)):
        m = rng.int(3, 20)
        n = rng.int(3, 20)
        k = min(m, n)
        a, rank = rng.rankdef(m, n, rank=rng.int(0, k + 1))
        y = rng.matrix(m, 1)
        x = np.asarray(solver(jnp.asarray(a), jnp.asarray(y)))
        x_pinv = np.linalg.pinv(a) @ y
        assert_all_close(x, x_pinv, rtol=1e-6, atol=1e-8,
                         err_msg=f"{solver.__name__} {m}x{n} rank={rank}")


# -------------------------------------------------------- decompositions

def _recon_lu(a):
    lu, p = la.lu_decomp(a)
    n = a.shape[-1]
    L = np.tril(np.asarray(lu), -1) + np.eye(a.shape[0], n)[:, :n]
    U = np.triu(np.asarray(lu))
    k = min(a.shape)
    return L[:, :k] @ U[:k], a[np.asarray(p)]


def _recon_qr(a):
    q, r = la.qr_decomp(a)
    return np.asarray(q) @ np.asarray(r), a


def _recon_svd(a):
    u, sv, v = la.svd_decomp(a)
    return (np.asarray(u) * np.asarray(sv)) @ np.asarray(v), a


def _recon_svd_dc(a):
    u, sv, v = la.svd_dc(a)
    return (np.asarray(u) * np.asarray(sv)) @ np.asarray(v), a


def _recon_bidiag(a):
    u, b, v = la.bidiag_decomp(a)
    return np.asarray(u) @ np.asarray(b) @ np.asarray(v), a


def _recon_urv(a):
    u, r, v, rank = la.urv_decomp_full(a)
    return np.asarray(u) @ np.asarray(r) @ np.asarray(v), a


_RECONS = [_recon_lu, _recon_qr, _recon_svd, _recon_svd_dc,
           _recon_bidiag, _recon_urv]


@pytest.mark.parametrize("recon", _RECONS,
                         ids=lambda f: f.__name__.lstrip("_recon_"))
def test_generic_degenerate_inputs(recon):
    """Zero-row / zero-column matrices (the reference's _rand_rows0 /
    _rand_cols0 adversarial generators, src/_test_data_generators.js:
    83,118) must still decompose and reconstruct."""
    rng = TestRNG(f"generic-degenerate-{recon.__name__}")
    for trial in range(trials(4)):
        m = rng.int(2, 20)
        n = rng.int(2, 20)
        a = rng.rows0(m, n) if trial % 2 == 0 else rng.cols0(m, n)
        got, want = recon(a)
        tol = eps(a.dtype) * 64 * max(m, n) * max(1.0, np.abs(a).max())
        assert np.abs(got - want).max() <= tol, \
            f"{recon.__name__} {m}x{n} trial={trial}"


@pytest.mark.parametrize("recon", _RECONS,
                         ids=lambda f: f.__name__.lstrip("_recon_"))
def test_generic_reconstruction_contract(recon):
    """Every decomposition reconstructs its input within the reference
    residual bound eps·16·max(M,N)·‖A‖ (bench_la_decomps.html:73-74)."""
    rng = TestRNG(f"generic_recon-{recon.__name__}")
    for trial in range(trials(5)):
        m = rng.int(1, 24)
        n = rng.int(1, 24)
        a = rng.matrix(m, n, zeros_frac=0.05)
        got, want = recon(a)
        tol = eps(a.dtype) * 64 * max(m, n) * max(1.0, np.abs(a).max())
        assert np.abs(got - want).max() <= tol, \
            f"{recon.__name__} {m}x{n} trial={trial}"
