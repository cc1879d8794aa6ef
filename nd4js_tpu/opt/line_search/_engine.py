"""Strong-Wolfe line-search engine with polynomial trial selection.

One jit-safe state machine implementing the full mechanism family of the
reference's line searches (/root/reference/src/opt/line_search/):

  * bracketing phase with secant-extrapolated growth clipped to
    [α·growMin, α·growMax] (more_thuente_{abc,u123}.js) or a fixed
    growth factor (albaali_fletcher.js:152),
  * zoom phase with the Moré-Thuente trial-value selection: cubic
    (two-point Hermite), quadratic, and secant interpolation chosen by
    the (fLo, fHi, pLo, pHi) case analysis
    (more_thuente_abc.js:210-252), safeguarded by the ``shrinkLeast``
    interval-reduction floor (αLst/αMst clamps), falling back to
    bisection on degenerate data — NaN-safe by construction: a NaN trial
    fails the clamp comparisons and lands on the safeguard, exactly
    mirroring the reference's ``!(αLst <= α)`` NaN handling,
  * an αMax bound with BoundReached semantics (more_thuente_u123.js —
    the bounded variant L-BFGS-B requires),
  * the interpolator trio itself mirrors _line_search_utils.js:22-75:
    secant zero of the derivative, quadratic from (f₁,f₂,g₁), cubic
    minimiser from (f₁,f₂,g₁,g₂) — the cubic in the numerically-stable
    Hermite form.

Status codes replace the reference's LineSearchError hierarchy inside
jit (0 = ok, 1 = no progress, 2 = bisection collapse, 3 = bound
reached, 4 = max_iter); the factory wrappers in ``__init__`` raise the
matching exceptions when running eagerly.

Variant-specific predicates (the three searches differ in their Armijo
forms) are compile-time parameters, so each search traces to its own
specialised loop.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["wolfe_line_search", "line_search_engine",
           "OK", "NO_PROGRESS", "BISECTION", "BOUND_REACHED", "MAX_ITER"]

_BRACKET, _ZOOM, _DONE = 0, 1, 2
OK, NO_PROGRESS, BISECTION, BOUND_REACHED, MAX_ITER = 0, 1, 2, 3, 4


def _interp_gg(x1, x2, g1, g2):
    """Secant zero of the derivative (ref: _line_search_utils.js:22)."""
    dg = g2 - g1
    safe = jnp.where(dg == 0, 1.0, dg)
    out = x1 - (x2 - x1) / safe * g1
    return jnp.where(dg == 0, jnp.nan, out)


def _interp_ffg(x1, x2, f1, f2, g1):
    """Quadratic-model minimiser from (f1, f2, g1)
    (ref: _line_search_utils.js:41)."""
    dx = x2 - x1
    safe_dx = jnp.where(dx == 0, 1.0, dx)
    dfdx = (f2 - f1) / safe_dx
    den = g1 - dfdx
    safe = jnp.where(den == 0, 1.0, den)
    out = x1 + 0.5 * dx * g1 / safe
    return jnp.where((dx == 0) | (den == 0), jnp.nan, out)


def _interp_ffgg(x1, x2, f1, f2, g1, g2):
    """Cubic (two-point Hermite) minimiser from (f1, f2, g1, g2)
    (ref: _line_search_utils.js:75), in the numerically-stable form.
    Returns NaN when the cubic has no interior minimiser."""
    dx = x2 - x1
    safe_dx = jnp.where(dx == 0, 1.0, dx)
    d1 = g1 + g2 - 3 * (f1 - f2) / (x1 - x2 + jnp.where(dx == 0, 1.0, 0.0))
    rad = d1 * d1 - g1 * g2
    ok = rad >= 0
    d2 = jnp.sign(dx) * jnp.sqrt(jnp.where(ok, rad, 0.0))
    den = g2 - g1 + 2 * d2
    safe_den = jnp.where(den == 0, 1.0, den)
    out = x2 - dx * (g2 + d2 - d1) / safe_den
    return jnp.where(ok & (den != 0) & (dx != 0), out, jnp.nan)


def _zoom_trial_mt(a_lo, f_lo, p_lo, a_hi, f_hi, p_hi, shrink):
    """Moré-Thuente trial-value selection with αLst/αMst safeguards
    (ref: more_thuente_abc.js:210-252)."""
    a_lil = jnp.minimum(a_lo, a_hi)
    a_big = jnp.maximum(a_lo, a_hi)
    a_lst = jnp.maximum(jnp.nextafter(a_lil, jnp.inf),
                        shrink * a_big + (1 - shrink) * a_lil)
    a_mst = jnp.minimum(jnp.nextafter(a_big, -jnp.inf),
                        shrink * a_lil + (1 - shrink) * a_big)
    mid = a_lo + (a_hi - a_lo) / 2

    ac = _interp_ffgg(a_lo, a_hi, f_lo, f_hi, p_lo, p_hi)
    aq = _interp_ffg(a_lo, a_hi, f_lo, f_hi, p_lo)
    as_ = _interp_gg(a_lo, a_hi, p_lo, p_hi)

    case1 = f_lo < f_hi
    case2 = jnp.sign(p_lo) * p_hi < 0
    a1 = jnp.where(jnp.abs(ac - a_lo) < jnp.abs(aq - a_lo),
                   ac, (ac + aq) / 2)
    a2 = jnp.where(jnp.abs(as_ - a_hi) <= jnp.abs(ac - a_hi), ac, as_)
    a = jnp.where(case1, a1, jnp.where(case2, a2, aq))
    # NaN-safe clamping (a NaN trial fails both comparisons -> a_lst)
    a = jnp.where(a_lst <= a, a, a_lst)
    a = jnp.where(a_mst >= a, a, a_mst)
    degenerate = ~(a_lst < a_mst) | ~jnp.isfinite(f_hi) \
        | ~jnp.isfinite(p_hi)
    return jnp.where(degenerate, mid, a)


def _zoom_trial_quad(a_lo, f_lo, p_lo, a_hi, f_hi, p_hi, shrink):
    """Albaali-Fletcher zoom trial: quadratic only
    (ref: albaali_fletcher.js:171-196)."""
    a_lil = jnp.minimum(a_lo, a_hi)
    a_big = jnp.maximum(a_lo, a_hi)
    a_lst = jnp.maximum(jnp.nextafter(a_lil, jnp.inf),
                        shrink * a_big + (1 - shrink) * a_lil)
    a_mst = jnp.minimum(jnp.nextafter(a_big, -jnp.inf),
                        shrink * a_lil + (1 - shrink) * a_big)
    mid = a_lo + (a_hi - a_lo) / 2
    a = _interp_ffg(a_lo, a_hi, f_lo, f_hi, p_lo)
    a = jnp.where(a_lst <= a, a, a_lst)
    a = jnp.where(a_mst >= a, a, a_mst)
    degenerate = ~(a_lst < a_mst) | ~jnp.isfinite(f_hi) \
        | ~jnp.isfinite(p_hi)
    return jnp.where(degenerate, mid, a)


def line_search_engine(fg, x0, f0, g0, neg_dir, *,
                       fRed, gRed, growMin, growMax, shrinkLeast,
                       variant: str = "abc",
                       alpha0=None, alpha_max=jnp.inf, max_iter: int = 30):
    """Strong-Wolfe search along −neg_dir. Returns (x, f, g, α, status).

    variant: 'abc' | 'u123' | 'af' — selects the Armijo forms and trial
    rules of the corresponding reference search (compile-time)."""
    x0 = jnp.asarray(x0)
    g0 = jnp.asarray(g0)
    f0 = jnp.asarray(f0)
    d = -jnp.asarray(neg_dir)
    dt = f0.dtype
    p0 = jnp.vdot(g0, d).astype(dt)
    a_max = jnp.asarray(alpha_max, dt)
    if alpha0 is None:
        a0 = jnp.minimum(jnp.asarray(1.0, dt), a_max / 2)
    else:
        a0 = jnp.asarray(alpha0, dt)

    def phi(a):
        x = x0 + a * d
        f, g = fg(x)
        return x, f.astype(dt), jnp.vdot(g, d).astype(dt), g

    zoom_trial = _zoom_trial_quad if variant == "af" else _zoom_trial_mt

    def bracket_armijo(a, f, st):
        if variant == "u123":
            return f - st["f_lo"] > fRed * (a - st["a_lo"]) * p0
        if variant == "af":
            return (f - f0 > fRed * a * p0) \
                | ((st["a_lo"] > 0) & (f >= st["f_lo"]))
        return f > st["f_lo"]                      # abc

    def zoom_armijo(a, f, st):
        if variant == "u123":
            return f - st["f_lo"] > fRed * (a - st["a_lo"]) * p0
        if variant == "af":
            return (f - f0 > fRed * a * p0) | (f >= st["f_lo"])
        return f > st["f_lo"]                      # abc

    def cond(st):
        return (st["phase"] < _DONE) & (st["it"] < max_iter)

    def body(st):
        a = st["a"]
        x, f, p, g = phi(a)
        nev = st["nev"] + 1
        conv = (f - f0 <= fRed * a * p0) & (jnp.abs(p) <= -gRed * p0)

        is_b = st["phase"] == _BRACKET

        # ---- bracket phase ------------------------------------------
        b_fail = bracket_armijo(a, f, st)          # -> zoom(lo, a)
        b_pos = p >= 0                             # -> zoom(a, lo)
        at_bound = a >= a_max
        # secant-extrapolated growth, clipped (abc/u123); af fixes
        # growMin == growMax so the clip gives exactly α·grow
        a_sec = _interp_gg(st["a_lo"], a, st["p_lo"], p)
        use_sec = (variant != "af") & (st["p_lo"] < p)
        a_try = jnp.where(use_sec, a_sec, a * growMin)
        a_try = jnp.minimum(a_try, a * growMax)
        a_try = jnp.maximum(a_try, a * growMin)
        a_try = jnp.where(a_try > a, a_try, jnp.nextafter(a, jnp.inf))
        a_try = jnp.where(a_max >= a_try, a_try, a_max)

        b_to_zoom = b_fail | b_pos
        # bracket interval on transition
        b_a_lo = jnp.where(b_fail, st["a_lo"], a)
        b_f_lo = jnp.where(b_fail, st["f_lo"], f)
        b_p_lo = jnp.where(b_fail, st["p_lo"], p)
        b_a_hi = jnp.where(b_fail, a, st["a_lo"])
        b_f_hi = jnp.where(b_fail, f, st["f_lo"])
        b_p_hi = jnp.where(b_fail, p, st["p_lo"])
        # continue bracketing: lo <- a
        b_a_lo = jnp.where(b_to_zoom, b_a_lo, a)
        b_f_lo = jnp.where(b_to_zoom, b_f_lo, f)
        b_p_lo = jnp.where(b_to_zoom, b_p_lo, p)

        b_phase = jnp.where(
            conv, _DONE,
            jnp.where(b_to_zoom, _ZOOM,
                      jnp.where(at_bound, _DONE, _BRACKET)))
        b_status = jnp.where(
            conv, OK,
            jnp.where(b_to_zoom, st["status"],
                      jnp.where(at_bound, BOUND_REACHED, st["status"])))
        b_next_a = jnp.where(b_to_zoom & ~conv,
                             zoom_trial(b_a_lo, b_f_lo, b_p_lo,
                                        b_a_hi, b_f_hi, b_p_hi,
                                        shrinkLeast),
                             a_try)

        # ---- zoom phase ---------------------------------------------
        z_fail = zoom_armijo(a, f, st)
        z_stuck_hi = z_fail & (a == st["a_hi"])
        flip = jnp.sign(st["a_hi"] - st["a_lo"]) * p >= 0
        z_a_lo = jnp.where(z_fail, st["a_lo"], a)
        z_f_lo = jnp.where(z_fail, st["f_lo"], f)
        z_p_lo = jnp.where(z_fail, st["p_lo"], p)
        z_a_hi = jnp.where(z_fail, a,
                           jnp.where(flip, st["a_lo"], st["a_hi"]))
        z_f_hi = jnp.where(z_fail, f,
                           jnp.where(flip, st["f_lo"], st["f_hi"]))
        z_p_hi = jnp.where(z_fail, p,
                           jnp.where(flip, st["p_lo"], st["p_hi"]))
        z_stuck_lo = (~z_fail) & (a == st["a_lo"])
        z_stuck = z_stuck_hi | z_stuck_lo
        z_phase = jnp.where(conv | z_stuck, _DONE, _ZOOM)
        z_status = jnp.where(
            conv, OK,
            jnp.where(z_stuck,
                      jnp.where(st["a_lo"] == 0, NO_PROGRESS, BISECTION),
                      st["status"]))
        z_next_a = zoom_trial(z_a_lo, z_f_lo, z_p_lo,
                              z_a_hi, z_f_hi, z_p_hi, shrinkLeast)

        # ---- merge ---------------------------------------------------
        new = {
            "phase": jnp.where(is_b, b_phase, z_phase).astype(jnp.int32),
            "status": jnp.where(is_b, b_status, z_status)
            .astype(jnp.int32),
            "a": jnp.where(is_b, b_next_a, z_next_a),
            "a_lo": jnp.where(is_b, b_a_lo, z_a_lo),
            "f_lo": jnp.where(is_b, b_f_lo, z_f_lo),
            "p_lo": jnp.where(is_b, b_p_lo, z_p_lo),
            "a_hi": jnp.where(is_b, b_a_hi, z_a_hi),
            "f_hi": jnp.where(is_b, b_f_hi, z_f_hi),
            "p_hi": jnp.where(is_b, b_p_hi, z_p_hi),
            "it": st["it"] + 1,
            "nev": nev,
        }
        done_now = new["phase"] == _DONE
        accept = done_now & ((new["status"] == OK)
                             | (new["status"] == BOUND_REACHED))
        better = f < st["best_f"]
        keep = accept | (better & ~st["has_acc"])
        new["best_a"] = jnp.where(keep, a, st["best_a"])
        new["best_f"] = jnp.where(keep, f, st["best_f"])
        new["best_x"] = jnp.where(keep, x, st["best_x"])
        new["best_g"] = jnp.where(keep, g, st["best_g"])
        new["has_acc"] = st["has_acc"] | accept
        return new

    st0 = {
        "phase": jnp.asarray(_BRACKET, jnp.int32),
        "status": jnp.asarray(MAX_ITER, jnp.int32),
        "a": a0,
        "a_lo": jnp.zeros((), dt), "f_lo": f0, "p_lo": p0,
        "a_hi": jnp.asarray(jnp.inf, dt),
        "f_hi": jnp.asarray(jnp.nan, dt),
        "p_hi": jnp.asarray(jnp.nan, dt),
        "it": jnp.zeros((), jnp.int32),
        "nev": jnp.zeros((), jnp.int32),
        "best_a": jnp.zeros((), dt), "best_f": f0,
        "best_x": x0, "best_g": g0,
        "has_acc": jnp.asarray(False),
    }
    st = jax.lax.while_loop(cond, body, st0)
    # degenerate input: p0 >= 0 means no descent direction
    bad_dir = p0 >= 0
    status = jnp.where(bad_dir, NO_PROGRESS, st["status"])
    x = jnp.where(bad_dir, x0, st["best_x"])
    f = jnp.where(bad_dir, f0, st["best_f"])
    g = jnp.where(bad_dir, g0, st["best_g"])
    a = jnp.where(bad_dir, 0.0, st["best_a"])
    return x, f, g, a, status, st["nev"]


def wolfe_line_search(fg, x0, f0, g0, neg_dir, c1=1e-4, c2=0.9,
                      alpha0=1.0, grow=2.0, max_iter=40,
                      alpha_max=jnp.inf, variant: str = "abc"):
    """Back-compatible wrapper: (x, f, g, alpha, ok)."""
    x, f, g, a, status, _ = line_search_engine(
        fg, x0, f0, g0, neg_dir, fRed=c1, gRed=c2,
        growMin=grow, growMax=max(grow, 2.71828 - 1.5),
        shrinkLeast=0.1, variant=variant,
        alpha0=alpha0, alpha_max=alpha_max, max_iter=max_iter)
    return x, f, g, a, status == OK
