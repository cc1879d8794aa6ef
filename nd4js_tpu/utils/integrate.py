"""ODE integration: classic fixed-step RK4.

Parity with /root/reference/src/integrate/odeint_rk4.js:23 — one RK4
step and a trajectory integrator, as a ``lax.scan`` (jit/vmap/grad-
compatible; differentiable through the solution).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["rk4_step", "odeint_rk4"]


def rk4_step(f, t, y, dt):
    """One classic Runge-Kutta-4 step."""
    k1 = f(t, y)
    k2 = f(t + dt / 2, y + dt / 2 * k1)
    k3 = f(t + dt / 2, y + dt / 2 * k2)
    k4 = f(t + dt, y + dt * k3)
    return y + dt / 6 * (k1 + 2 * k2 + 2 * k3 + k4)


def odeint_rk4(f, y0, ts):
    """Integrate dy/dt = f(t, y) over time points ``ts``.

    Returns the trajectory (len(ts), *y0.shape) including y0.
    """
    y0 = jnp.asarray(y0)
    ts = jnp.asarray(ts)

    def body(y, t_pair):
        t0, t1 = t_pair
        y1 = rk4_step(f, t0, y, t1 - t0)
        return y1, y1

    _, ys = jax.lax.scan(body, y0, (ts[:-1], ts[1:]))
    return jnp.concatenate([y0[None], ys], axis=0)
