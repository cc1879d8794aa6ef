"""Compact L-BFGS two-loop recursion on a pytree ring buffer.

Parity with /root/reference/src/opt/_lbfgs_solver.js (:22-112):
``compute_Hv`` (split in the reference as phase1/phase2 so the scaling
hook can interpose — here the scaling is a parameter), ``update`` with
the curvature guard (:38), and ``forget(k)`` half-history reset (:?) —
all expressed as masked vectorised ops over an (m, n) ring buffer so the
whole solver state is a flat pytree that lives in a ``lax.while_loop``.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["LBFGSState", "lbfgs_init", "lbfgs_update", "lbfgs_forget",
           "lbfgs_hv"]


class LBFGSState(NamedTuple):
    s: jax.Array          # (m, n) steps dx
    y: jax.Array          # (m, n) gradient changes dg
    rho: jax.Array        # (m,)   1/(s·y)
    head: jax.Array       # () int32 — next insert slot
    count: jax.Array      # () int32 — number of valid entries
    gamma: jax.Array      # () — initial Hessian scale s·y/y·y


def lbfgs_init(m: int, n: int, dtype=jnp.float32) -> LBFGSState:
    return LBFGSState(
        s=jnp.zeros((m, n), dtype), y=jnp.zeros((m, n), dtype),
        rho=jnp.zeros((m,), dtype), head=jnp.zeros((), jnp.int32),
        count=jnp.zeros((), jnp.int32), gamma=jnp.ones((), dtype))


def lbfgs_update(st: LBFGSState, dx, dg) -> LBFGSState:
    """Append (dx, dg) if the curvature condition holds
    (ref: _lbfgs_solver.js:38-73)."""
    dxdg = jnp.vdot(dx, dg)
    dgdg = jnp.vdot(dg, dg)
    eps = jnp.finfo(st.s.dtype).eps
    ok = dxdg > eps * jnp.sqrt(jnp.vdot(dx, dx) * dgdg)

    def do(st):
        m = st.s.shape[0]
        s = st.s.at[st.head].set(dx)
        y = st.y.at[st.head].set(dg)
        rho = st.rho.at[st.head].set(1.0 / dxdg)
        return LBFGSState(
            s=s, y=y, rho=rho,
            head=(st.head + 1) % m,
            count=jnp.minimum(st.count + 1, m),
            gamma=dxdg / jnp.where(dgdg == 0, 1.0, dgdg))

    return jax.lax.cond(ok, do, lambda st: st, st)


def lbfgs_forget(st: LBFGSState, k) -> LBFGSState:
    """Drop the k oldest pairs (ref: lbfgs.js:208-214 recovery)."""
    return st._replace(count=jnp.maximum(st.count - k, 0))


def lbfgs_hv(st: LBFGSState, g):
    """H·g via the two-loop recursion, masked over the ring buffer
    (ref: _lbfgs_solver.js:75-112). Returns the ascent direction H·g."""
    m = st.s.shape[0]

    def bwd(i, carry):
        q, alphas = carry
        idx = (st.head - 1 - i) % m            # newest -> oldest
        valid = (i < st.count).astype(q.dtype)
        alpha = st.rho[idx] * jnp.vdot(st.s[idx], q) * valid
        q = q - alpha * st.y[idx]
        return q, alphas.at[idx].set(alpha)

    q, alphas = jax.lax.fori_loop(
        0, m, bwd, (jnp.asarray(g), jnp.zeros((m,), st.s.dtype)))
    q = q * st.gamma

    def fwd(i, q):
        idx = (st.head - st.count + i) % m     # oldest -> newest
        valid = (i < st.count).astype(q.dtype)
        beta = st.rho[idx] * jnp.vdot(st.y[idx], q)
        return q + st.s[idx] * ((alphas[idx] - beta) * valid)

    return jax.lax.fori_loop(0, m, fwd, q)
