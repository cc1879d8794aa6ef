"""Derivative-free Nelder-Mead simplex minimisation.

Parity with /root/reference/src/opt/nelder_mead.js:42
(`min_nelder_mead_gen`): reflection/expansion/contraction/shrink on a
regular initial simplex (geom/simplex.js). One jit-safe step function;
generator + in-graph driver like the other solvers.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils.geom import regular_simplex

__all__ = ["min_nelder_mead_gen", "min_nelder_mead"]


class _NMState(NamedTuple):
    xs: jax.Array       # (n+1, n) simplex vertices
    fs: jax.Array       # (n+1,)
    it: jax.Array


def _nm_step(f, s: _NMState) -> _NMState:
    n = s.xs.shape[1]
    order = jnp.argsort(s.fs)
    xs = s.xs[order]
    fs = s.fs[order]
    best, worst = fs[0], fs[n]
    centroid = jnp.mean(xs[:n], axis=0)
    xr = centroid + (centroid - xs[n])          # reflection
    fr = f(xr)

    xe = centroid + 2 * (centroid - xs[n])      # expansion
    fe = f(xe)
    xc = centroid + 0.5 * (xs[n] - centroid)    # contraction
    fc = f(xc)

    use_expand = (fr < best) & (fe < fr)
    use_reflect = (fr < fs[n - 1]) & ~use_expand | ((fr < best) & (fe >= fr))
    use_contract = (~use_expand) & (~use_reflect) & (fc < jnp.minimum(fr, worst))

    new_x = jnp.where(use_expand, xe,
                      jnp.where(use_reflect, xr,
                                jnp.where(use_contract, xc, xs[n])))
    new_f = jnp.where(use_expand, fe,
                      jnp.where(use_reflect, fr,
                                jnp.where(use_contract, fc, worst)))
    replaced = xs.at[n].set(new_x)
    replaced_f = fs.at[n].set(new_f)

    # shrink toward the best vertex when nothing else helped
    def shrink(_):
        sx = xs[0] + 0.5 * (xs - xs[0])
        sf = jax.vmap(f)(sx)
        return sx, sf

    def keep(_):
        return replaced, replaced_f

    did_improve = use_expand | use_reflect | use_contract
    xs2, fs2 = jax.lax.cond(did_improve, keep, shrink, None)
    return _NMState(xs=xs2, fs=fs2, it=s.it + 1)


def _nm_init(f, x0, scale) -> _NMState:
    x0 = jnp.asarray(x0)
    n = x0.size
    xs = x0[None, :] + scale * regular_simplex(n, x0.dtype)
    fs = jax.vmap(f)(xs)
    return _NMState(xs=xs, fs=fs, it=jnp.zeros((), jnp.int32))


def min_nelder_mead_gen(f, x0, scale: float = 1.0):
    """Generator yielding (x_best, f_best) per iteration
    (ref: nelder_mead.js:42)."""
    s = _nm_init(f, x0, scale)
    step = jax.jit(functools.partial(_nm_step, f))
    while True:
        i = jnp.argmin(s.fs)
        yield s.xs[i], s.fs[i]
        s = step(s)


def min_nelder_mead(f, x0, scale: float = 1.0, ftol: float = 1e-12,
                    max_iter: int = 2000):
    """In-graph Nelder-Mead. Returns (x, f, n_iter)."""
    s0 = _nm_init(f, x0, scale)

    def cond(s):
        spread = jnp.max(s.fs) - jnp.min(s.fs)
        return (s.it < max_iter) & (spread > ftol * (1 + jnp.abs(jnp.min(s.fs))))

    s = jax.lax.while_loop(cond, functools.partial(_nm_step, f), s0)
    i = jnp.argmin(s.fs)
    return s.xs[i], s.fs[i], s.it
