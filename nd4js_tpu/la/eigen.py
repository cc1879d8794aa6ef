"""General (non-symmetric) eigendecomposition.

Parity with /root/reference/src/la/eigen.js: `eigen_balance_pre`
diagonal balancing (:91, James/Langou/Lowery p-norm variant), `eigen` =
balance → Schur → eigenvectors → unbalance + normalise (:33-80),
`eigenvals` (:83).

TPU-first deviations: the balancing loop runs a fixed number of
simultaneous sweeps (all diagonal scale factors updated at once — the
sequential cyclic update of the reference converges to the same fixed
point); scale factors are snapped to powers of two so balancing is
exact (no rounding perturbation), as in the reference.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.batch import batched
from ..core.mm import mt
from ..config import default_float_for
from .schur import schur_decomp, schur_eigenvals, schur_eigen

__all__ = ["eigen", "eigenvals", "eigen_balance_pre"]


def _balance_core(a, p: int = 2, sweeps: int = 8):
    n = a.shape[-1]
    d = jnp.ones((n,), a.dtype)
    eye_mask = jnp.eye(n, dtype=bool)

    def body(_, carry):
        a, d = carry
        offdiag = jnp.where(eye_mask, 0.0, jnp.abs(a))
        if p == 2:
            r = jnp.sqrt(jnp.sum(offdiag ** 2, axis=1))
            c = jnp.sqrt(jnp.sum(offdiag ** 2, axis=0))
        else:
            r = jnp.sum(offdiag, axis=1)
            c = jnp.sum(offdiag, axis=0)
        safe_r = jnp.where(r == 0, 1.0, r)
        safe_c = jnp.where(c == 0, 1.0, c)
        # scale factor snapped to powers of two (exact in fp)
        f = jnp.sqrt(safe_r / safe_c)
        f = jnp.exp2(jnp.round(jnp.log2(f)))
        f = jnp.where((r == 0) | (c == 0), 1.0, f)
        # damped simultaneous update (full Jacobi update can oscillate)
        a = a * f[None, :] / f[:, None]
        d = d * f
        return a, d

    a, d = jax.lax.fori_loop(0, sweeps, body, (a, d))
    return d, a


@batched((2,))
def eigen_balance_pre(a, p: int = 2):
    """[D, B] with B = D⁻¹·A·D balanced (row/col norms equalised)
    (ref: eigen.js:91). Batched."""
    a = jnp.asarray(a)
    a = a.astype(default_float_for(a.dtype))
    return _balance_core(a, p=p)


def eigenvals(a, split: bool = False):
    """Complex eigenvalues (ref: eigen.js:83). Batched.

    ``split=True`` returns a (re, im) pair (TPU-compatible)."""
    a = jnp.asarray(a)
    d, b = eigen_balance_pre(a)
    _, t = schur_decomp(b)
    return schur_eigenvals(t, split=split)


def eigen(a, split: bool = False):
    """[Λ, V] with A·V = V·diag(Λ), columns normalised
    (ref: eigen.js:33-80). Batched over leading dims.

    ``split=True`` returns ((Λre, Λim), (Vre, Vim)) real pairs — the
    TPU-native form (TPU backends have no complex dtype); ``split=False``
    combines into complex arrays (CPU backends)."""
    from ..core import cpx
    a = jnp.asarray(a)
    d, b = eigen_balance_pre(a)
    q, t = schur_decomp(b)
    lam, v = schur_eigen(q, t, split=True)
    # unbalance: columns scale by D, then renormalise
    dcol = jnp.asarray(d)[..., :, None]
    v = (v[0] * dcol, v[1] * dcol)
    nrm = jnp.sqrt(jnp.sum(cpx.abs2(v), axis=-2, keepdims=True))
    inv = 1 / jnp.where(nrm == 0, 1.0, nrm)
    v = cpx.scale(v, inv)
    if split:
        return lam, v
    return cpx.to_complex(lam), cpx.to_complex(v)
