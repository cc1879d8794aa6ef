"""Contract tests for the in-VMEM small-Schur kernel (ops/schur_small.py).

The kernel runs the whole Francis iteration for one small Hessenberg
block inside a single launch; it backs the AED window Schur of
la/schur.py (ref seam /root/reference/src/la/schur.js:415-660). Tests
run interpret mode on CPU; compiled-vs-interpret equivalence on real
hardware lives in tests/test_tpu_hw.py.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nd4js_tpu.ops.schur_small import schur_small
from tests.utils import trials


def _contracts(a, t, q, tol_scale=1.0):
    n = a.shape[-1]
    eps = float(jnp.finfo(a.dtype).eps)
    nrm = max(1.0, float(jnp.abs(a).max()))
    orth = float(jnp.abs(jnp.matmul(q.T, q, precision="highest")
                         - jnp.eye(n, dtype=a.dtype)).max())
    sim = float(jnp.abs(jnp.matmul(jnp.matmul(q, t, precision="highest"),
                                   q.T, precision="highest") - a).max())
    junk = float(jnp.abs(jnp.tril(t, -2)).max())
    assert orth <= 64 * eps * n * tol_scale
    assert sim <= 64 * eps * n * nrm * tol_scale
    assert junk <= 64 * eps * n * nrm * tol_scale
    # eigenvalues of the cleaned quasi-triangular T match numpy's
    ev = np.sort_complex(np.linalg.eigvals(np.asarray(a)))
    evk = np.sort_complex(np.linalg.eigvals(np.triu(np.asarray(t), -1)))
    gap = np.abs(ev - evk).max()
    assert gap <= 1e3 * eps * n * nrm * tol_scale, gap


@pytest.mark.parametrize("n", [4, 8, 16, 24, 32, 48])
def test_schur_small_random_hessenberg(n):
    for trial in range(trials(3)):
        a = jnp.triu(jax.random.normal(
            jax.random.PRNGKey(n * 10 + trial), (n, n), jnp.float64), -1)
        t, q, lk = schur_small(a, interpret=True)
        _contracts(a, t, q)


def test_schur_small_symmetric_tridiagonal_all_real():
    n = 24
    d = jnp.arange(1.0, n + 1, dtype=jnp.float64)
    e = jnp.ones((n - 1,), jnp.float64)
    a = jnp.diag(d) + jnp.diag(e, 1) + jnp.diag(e, -1)
    t, q, lk = schur_small(a, interpret=True)
    _contracts(a, t, q)
    # all eigenvalues real → fully triangular, nothing locked
    assert float(jnp.abs(jnp.tril(t, -1)).max()) <= 1e-12
    assert int(np.asarray(lk).sum()) == 0


def test_schur_small_rotation_blocks_lock_complex_pairs():
    """Block-diagonal rotation blocks: all eigenvalues complex — the
    kernel must converge by LOCKING the 2×2 pairs, not spinning."""
    n = 16
    blocks = []
    for i in range(n // 2):
        th = 0.3 + 0.35 * i
        blocks.append(np.array([[np.cos(th), -np.sin(th)],
                                [np.sin(th), np.cos(th)]]) * (1.0 + i))
    a0 = np.zeros((n, n))
    for i, b in enumerate(blocks):
        a0[2 * i:2 * i + 2, 2 * i:2 * i + 2] = b
    # similarity by a fixed orthogonal Q to make it dense Hessenberg
    rng = np.random.default_rng(3)
    qr, _ = np.linalg.qr(rng.standard_normal((n, n)))
    a = qr @ a0 @ qr.T
    # reduce to Hessenberg with numpy-side Householder via scipy-free
    # route: use the library itself
    from nd4js_tpu.la.hessenberg import _hessenberg_core
    h, u = _hessenberg_core(jnp.asarray(a))
    t, q, lk = schur_small(h, interpret=True)
    _contracts(h, t, q)
    assert int(np.asarray(lk).sum()) == n // 2


def test_schur_small_defective_jordan():
    """A Jordan block (maximally defective) must still converge to a
    valid quasi-triangular form within the iteration cap."""
    n = 12
    a = jnp.eye(n, dtype=jnp.float64) * 2.0 \
        + jnp.diag(jnp.ones((n - 1,), jnp.float64), 1)
    t, q, lk = schur_small(a, interpret=True)
    _contracts(a, t, q, tol_scale=16.0)   # defective: O(eps^{1/n}) ev err
    # eigenvalue check above is too strict for a Jordan block — redo
    # loosely: all eigenvalues within the classic eps^(1/n) disc
    ev = np.linalg.eigvals(np.triu(np.asarray(t), -1))
    assert np.abs(ev - 2.0).max() <= 0.2


def test_schur_small_trivial_inputs():
    n = 8
    z = jnp.zeros((n, n), jnp.float64)
    t, q, _ = schur_small(z, interpret=True)
    assert float(jnp.abs(t).max()) == 0.0
    assert float(jnp.abs(q - jnp.eye(n)).max()) == 0.0
    e = jnp.eye(n, dtype=jnp.float64) * 3.0
    t, q, _ = schur_small(e, interpret=True)
    assert float(jnp.abs(t - e).max()) == 0.0


def test_schur_small_matches_xla_core_contracts(monkeypatch):
    """The kernel and the nested `_schur_core` fallback must both
    deliver the same contracts on the same windows (they need not agree
    bitwise — different but equally valid orthogonal choices)."""
    from nd4js_tpu.la.schur import _schur_core
    n = 24
    a = jnp.triu(jax.random.normal(jax.random.PRNGKey(77), (n, n),
                                   jnp.float64), -1)
    tk, qk, _ = schur_small(a, interpret=True)
    # force the XLA while_loop fallback (otherwise _schur_core itself
    # routes n ≤ 128 through the kernel and this compares it to itself)
    monkeypatch.setenv("ND4JS_TPU_SCHUR_KERNEL", "0")
    tx, qx, _, _ = _schur_core(a, _debug_raw=True)
    _contracts(a, tk, qk)
    _contracts(a, tx, qx)
    evk = np.sort_complex(np.linalg.eigvals(np.triu(np.asarray(tk), -1)))
    evx = np.sort_complex(np.linalg.eigvals(np.triu(np.asarray(tx), -1)))
    assert np.abs(evk - evx).max() <= 1e-10
