"""Seeded random number generation.

Parity with /root/reference/src/rand/alea_rng.js (`AleaRNG` :62-228 with
`int`, `uniform`, `normal`, `bool`, `shuffle`, and batched random
orthogonal `ortho`) and the deprecated global `rand_normal`
(/root/reference/src/rand_normal.js:31) / `rand_ortho`
(/root/reference/src/la/rand_ortho.js:28).

TPU-first: the Alea PRNG is a scalar JS generator; here the stream is
JAX's counter-based threefry — every draw splits the key, so the class
is reproducible from its seed, jit-friendly per call, and batch-sized
draws are single fused kernels. ``ortho`` produces Haar-distributed
orthogonal matrices via QR of Gaussians with the sign fix (equivalent
to the reference's Householder-product construction), and ``rankdef``
reproduces the test-data generator of /root/reference/src/_test_rng.js:30.
"""
from __future__ import annotations

import warnings

import jax
import jax.numpy as jnp

from ..config import default_float
from ..core.mm import mm, mt

__all__ = ["RNG", "rand_normal", "rand_ortho"]


class RNG:
    """Seeded RNG with the reference's AleaRNG surface."""

    def __init__(self, seed=0):
        if isinstance(seed, str):
            seed = abs(hash(seed)) % (2 ** 31)
        self._key = jax.random.PRNGKey(int(seed))

    def _next(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    # ---- scalar / array draws (ref: alea_rng.js:100-168) ------------
    def int(self, lo, hi, *shape):
        out = jax.random.randint(self._next(), shape, int(lo), int(hi))
        return int(out) if shape == () else out

    def uniform(self, lo, hi, *shape, dtype=None):
        return jax.random.uniform(self._next(), shape,
                                  dtype or default_float, lo, hi)

    def normal(self, *shape, dtype=None):
        return jax.random.normal(self._next(), shape,
                                 dtype or default_float)

    def bool(self, *shape):
        out = jax.random.bernoulli(self._next(), 0.5, shape)
        return bool(out) if shape == () else out

    def shuffle(self, x, axis: int = 0):
        return jax.random.permutation(self._next(), jnp.asarray(x),
                                      axis=axis)

    # ---- structured matrices (ref: alea_rng.js:170-228) -------------
    def ortho(self, *shape, dtype=None):
        """Haar-ish random orthogonal matrices (..., M, N)."""
        dtype = dtype or default_float
        if len(shape) == 1:
            shape = (shape[0], shape[0])
        *batch, m, n = shape
        k = min(m, n)
        from ..la.qr import qr_decomp
        g = jax.random.normal(self._next(),
                              (*batch, max(m, n), k), dtype)
        q, r = qr_decomp(g)
        d = jnp.diagonal(r, axis1=-2, axis2=-1)
        q = q * jnp.where(d < 0, -1.0, 1.0)[..., None, :]
        if m < n:
            q = mt(q)
        return q

    def rankdef(self, *shape, rank=None, dtype=None):
        """Random matrices of known rank as U·diag(sv)·Vᵀ with zeroed
        trailing singular values (ref: _test_rng.js:30-63).
        Returns (A, rank)."""
        dtype = dtype or default_float
        *batch, m, n = shape
        k = min(m, n)
        if rank is None:
            rank = self.int(0, k + 1)
        u = self.ortho(*batch, m, k, dtype=dtype)
        v = self.ortho(*batch, n, k, dtype=dtype)
        sv = self.uniform(0.5, 2.0, *batch, k, dtype=dtype)
        sv = sv * (jnp.arange(k) < rank)
        return mm(u * sv[..., None, :], mt(v)), rank


def rand_normal(*shape):
    """Deprecated global sampler (ref: rand_normal.js:31-44)."""
    warnings.warn("rand_normal is deprecated; use RNG(seed).normal",
                  DeprecationWarning)
    return RNG(0xDECAF).normal(*shape)


def rand_ortho(*shape, dtype=None):
    """Deprecated random orthogonal (ref: la/rand_ortho.js:28-35)."""
    warnings.warn("rand_ortho is deprecated; use RNG(seed).ortho",
                  DeprecationWarning)
    return RNG(0xDECAF).ortho(*shape, dtype=dtype)
