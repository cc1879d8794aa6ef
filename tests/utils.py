"""Test infrastructure: seeded generators and structural matchers.

Port of the reference's contract layer (SURVEY.md §4):
  * ``TestRNG`` — seeded generator with ``rankdef`` (random matrices of
    known random rank, ref: /root/reference/src/_test_rng.js:30-63) and
    ``ortho`` (random orthogonal, ref: src/rand/alea_rng.js:170-228).
  * broadcasting-aware ``assert_all_close`` with the reference's default
    tolerances rtol=1e-5, atol=1e-8 (ref: src/jasmine_utils.js:142).
  * band/triangularity matchers built on ``assert_band``
    (ref: src/jasmine_utils.js:33,220-227).

Scaling rule for float32: tolerances multiply by eps(f32)/eps(f64) is far
too strict; instead contracts use eps(dtype)-proportional bounds like the
reference's orthogonality bound eps·max(M,N)·4.
"""
from __future__ import annotations

import hashlib
import os

import numpy as np

__all__ = ["TestRNG", "assert_all_close", "assert_band", "assert_tril",
           "assert_triu", "assert_diagonal", "assert_bidiagonal",
           "assert_tridiagonal", "assert_hessenberg", "eps", "trials"]


def eps(dtype) -> float:
    return float(np.finfo(np.dtype(dtype)).eps)


_DEEP = int(os.environ.get("ND4JS_TPU_DEEP", "1"))


def trials(n: int) -> int:
    """Trial count for property sweeps. The reference drives each spec
    over 100s of generated inputs (forEachItemIn, SURVEY.md §4); the CI
    default keeps the suite ~10 min on a 1-CPU host. Set
    ``ND4JS_TPU_DEEP=K`` to multiply every sweep's trials by K for a
    reference-scale run (K=20 ≈ the reference's ~50-minute depth)."""
    return n * _DEEP


class TestRNG:
    """Seeded RNG for reproducible property tests.

    The seed is any string/int — test ids make failures reproducible,
    mirroring the reference's description-seeded AleaRNG
    (/root/reference/src/jasmine_utils.js:276-277).
    """

    __test__ = False  # not a pytest class

    def __init__(self, seed):
        if isinstance(seed, str):
            seed = int(hashlib.sha256(seed.encode()).hexdigest()[:16], 16)
        self.np = np.random.default_rng(seed)

    # ---- scalars / simple arrays ------------------------------------
    def int(self, lo, hi):
        return int(self.np.integers(lo, hi))

    def uniform(self, lo, hi, *shape):
        return self.np.uniform(lo, hi, size=shape)

    def normal(self, *shape):
        return self.np.standard_normal(size=shape)

    def bool(self):
        return bool(self.np.integers(0, 2))

    def shuffle(self, x):
        self.np.shuffle(x)
        return x

    # ---- structured matrices ----------------------------------------
    def ortho(self, *shape, dtype=np.float64):
        """Random orthogonal matrices, Haar-ish via QR with sign fix
        (ref: src/rand/alea_rng.js:170-228)."""
        *batch, m, n = shape if len(shape) >= 2 else (shape[0], shape[0])
        k = min(m, n)
        g = self.np.standard_normal(size=(*batch, m, k) if m >= n
                                    else (*batch, n, k))
        q, r = np.linalg.qr(g)
        q = q * np.sign(np.where(np.diagonal(r, axis1=-2, axis2=-1) == 0, 1,
                                 np.diagonal(r, axis1=-2, axis2=-1)))[..., None, :]
        if m < n:
            q = np.swapaxes(q, -1, -2)
        return q.astype(dtype)

    def rankdef(self, *shape, rank=None, dtype=np.float64):
        """Random matrices with known (random) rank, built as U·S·Vᵀ with
        zeroed trailing singular values (ref: src/_test_rng.js:30-63).

        Returns (A, rank) where rank is an int (or int array for batches).
        """
        *batch, m, n = shape
        k = min(m, n)
        if rank is None:
            rank = self.int(0, k + 1)
        u = self.ortho(*batch, m, k)
        v = self.ortho(*batch, n, k)
        sv = self.np.uniform(0.5, 2.0, size=(*batch, k))
        mask = np.arange(k) < rank
        sv = sv * mask
        a = (u * sv[..., None, :]) @ np.swapaxes(v, -1, -2)
        return a.astype(dtype), rank

    def spd(self, *shape, dtype=np.float64):
        """Random symmetric positive-definite matrices."""
        *batch, n, n2 = shape
        assert n == n2
        q = self.ortho(*batch, n, n)
        d = self.np.uniform(0.5, 2.0, size=(*batch, n))
        return ((q * d[..., None, :]) @ np.swapaxes(q, -1, -2)).astype(dtype)

    def matrix(self, *shape, lo=-2.0, hi=2.0, dtype=np.float64,
               zeros_frac=0.0):
        """Dense random matrix; optional injected exact zeros like the
        reference shape sweeps (ref: src/la/qr_test.js:70-71)."""
        a = self.np.uniform(lo, hi, size=shape)
        if zeros_frac > 0:
            a = np.where(self.np.uniform(size=shape) < zeros_frac, 0.0, a)
        return a.astype(dtype)

    def rows0(self, m, n, dtype=np.float64):
        """Random matrix with a random subset of rows exactly zero
        (ref: src/_test_data_generators.js:83 `_rand_rows0`)."""
        a = self.np.uniform(-2.0, 2.0, size=(m, n))
        kill = self.np.uniform(size=(m,)) < self.np.uniform(0.1, 0.6)
        return np.where(kill[:, None], 0.0, a).astype(dtype)

    def cols0(self, m, n, dtype=np.float64):
        """Random matrix with a random subset of columns exactly zero
        (ref: src/_test_data_generators.js:118 `_rand_cols0`)."""
        return self.rows0(n, m, dtype=dtype).T.copy()

    def shapes(self, n_iter=32, ndim_max=4, dim_max=12, core_min=1):
        """Yield random shapes (batch sweep) like the reference's
        randomized shape sweeps (ref: qr_test.js:72-83)."""
        for _ in range(n_iter):
            ndim = self.int(2, ndim_max + 1)
            yield tuple(self.int(core_min, dim_max + 1) for _ in range(ndim))


# ---------------------------------------------------------------- matchers

def assert_all_close(actual, desired, rtol=1e-5, atol=1e-8, err_msg=""):
    """Broadcasting-aware allclose with reference default tolerances
    (ref: src/jasmine_utils.js:142)."""
    actual = np.asarray(actual)
    desired = np.asarray(desired)
    np.testing.assert_allclose(actual, np.broadcast_to(desired,
                               np.broadcast_shapes(actual.shape,
                                                   desired.shape)),
                               rtol=rtol, atol=atol, err_msg=err_msg)


def assert_band(a, lower: int, upper: int, atol=0.0):
    """All entries outside band [-lower, +upper] are (near) zero
    (ref: src/jasmine_utils.js:33)."""
    a = np.asarray(a)
    m, n = a.shape[-2:]
    i = np.arange(m)[:, None]
    j = np.arange(n)[None, :]
    outside = (j - i > upper) | (i - j > lower)
    bad = np.abs(np.where(outside, a, 0.0))
    assert bad.max(initial=0.0) <= atol, \
        f"entries outside band exceed atol={atol}: max={bad.max()}"


def assert_tril(a, atol=0.0):
    assert_band(a, np.iinfo(np.int32).max, 0, atol)


def assert_triu(a, atol=0.0):
    assert_band(a, 0, np.iinfo(np.int32).max, atol)


def assert_diagonal(a, atol=0.0):
    assert_band(a, 0, 0, atol)


def assert_bidiagonal(a, atol=0.0):
    assert_band(a, 0, 1, atol)


def assert_tridiagonal(a, atol=0.0):
    assert_band(a, 1, 1, atol)


def assert_hessenberg(a, atol=0.0):
    assert_band(a, 1, np.iinfo(np.int32).max, atol)
