"""L-BFGS-B machinery: compact-representation B·v, generalized Cauchy
point, and subspace minimisation.

Parity with /root/reference/src/opt/_lbfgsb_solver.js:72-784, rebuilt on
the Byrd-Lu-Nocedal-Zhu compact form with TPU-shaped control flow:

  * B = θI − W·M·Wᵀ with W = [Y, θS] (n × 2m) and
    M⁻¹ = K = [[−D, Lᵀ], [L, θSᵀS]] — all built by masked gathers from
    the ring buffer of (s, y) pairs, so the whole state is fixed-shape.
  * The generalized Cauchy point's breakpoint walk (the reference's
    data-dependent loop) becomes a fixed-length ``lax.scan`` over the
    *sorted* breakpoints: each step advances one segment of the
    piecewise-quadratic path, carrying (f′, f″, c = Wᵀz, p = Wᵀd) and a
    ``done`` flag — segments after the minimiser are masked no-ops.
  * Subspace minimisation on the free set via the Sherman-Morrison-
    Woodbury direct primal method:
      B_F⁻¹ = (1/θ)I + (1/θ²)·W_F·(I − (1/θ)M·W_FᵀW_F)⁻¹·M·W_Fᵀ
    with the 2m×2m solves done by a small in-graph Gauss elimination
    (partial pivoting) — no host round-trips.

All solves are masked so empty memory (count = 0) degrades exactly to
the θI model (projected gradient).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ._lbfgs_solver import LBFGSState

__all__ = ["compact_wk", "cauchy_point", "subspace_step", "bv"]


def _small_solve(k, rhs):
    """Gauss elimination with partial pivoting for a small (q, q)
    system; rhs (q, r). In-graph, fori_loop over q steps."""
    q = k.shape[0]
    aug = jnp.concatenate([k, rhs], axis=1)          # (q, q+r)
    rows = jnp.arange(q)

    def body(j, aug):
        col = aug[:, j]
        cand = jnp.where(rows >= j, jnp.abs(col), -1.0)
        p = jnp.argmax(cand)
        rowj, rowp = aug[j], aug[p]
        aug = aug.at[j].set(rowp).at[p].set(rowj)
        piv = aug[j, j]
        safe = jnp.where(piv == 0, 1.0, piv)
        fac = jnp.where(rows == j, 0.0, aug[:, j] / safe)
        return aug - fac[:, None] * aug[j][None, :]

    aug = jax.lax.fori_loop(0, q, body, aug)
    d = jnp.diagonal(aug[:, :q])
    safe = jnp.where(d == 0, 1.0, d)
    x = aug[:, q:] / safe[:, None]

    def back(i, x):
        j = q - 1 - i
        upd = x - (aug[:, j] / safe)[:, None] * x[j][None, :]
        return jnp.where((rows < j)[:, None], upd, x)

    return jax.lax.fori_loop(0, q, back, x)


class CompactWK(NamedTuple):
    w: jax.Array        # (n, 2m) = [Y_chron, θ·S_chron]ᵀ columns
    k: jax.Array        # (2m, 2m) = M⁻¹ with masked slots = identity
    theta: jax.Array    # () B₀ = θI scale
    valid: jax.Array    # (2m,) column validity mask


def compact_wk(mem: LBFGSState) -> CompactWK:
    """Build the compact representation from the ring buffer
    (ref: _lbfgsb_solver.js:72-240, the B·v machinery)."""
    m, n = mem.s.shape
    theta = 1.0 / jnp.where(mem.gamma == 0, 1.0, mem.gamma)
    kk = jnp.arange(m)
    idx = (mem.head - mem.count + kk) % m            # chronological
    val = kk < mem.count
    s = jnp.where(val[:, None], mem.s[idx], 0.0)     # (m, n)
    y = jnp.where(val[:, None], mem.y[idx], 0.0)
    sy = jnp.einsum("in,jn->ij", s, y,
                    precision="highest")             # (m, m) SᵀY
    ss = jnp.einsum("in,jn->ij", s, s, precision="highest")
    d = jnp.diagonal(sy)
    l = jnp.tril(sy, -1)                             # strict lower
    k11 = -jnp.diag(d)
    k = jnp.block([[k11, l.T], [l, theta * ss]])
    # dead slots -> identity rows/cols (keeps K invertible, W cols are 0)
    val2 = jnp.concatenate([val, val])
    eye = jnp.eye(2 * m, dtype=k.dtype)
    mask2 = val2[:, None] & val2[None, :]
    k = jnp.where(mask2, k, eye)
    w = jnp.concatenate([y, theta * s], axis=0).T    # (n, 2m)
    return CompactWK(w=w, k=k, theta=theta, valid=val2)


def bv(wk: CompactWK, v):
    """B·v = θ·v − W·K⁻¹·Wᵀ·v (ref: _lbfgsb_solver.js compute_bv)."""
    wtv = jnp.matmul(wk.w.T, v, precision="highest")
    u = _small_solve(wk.k, wtv[:, None])[:, 0]
    return wk.theta * v - jnp.matmul(wk.w, u, precision="highest")


def cauchy_point(wk: CompactWK, x, g, lo, hi):
    """Generalized Cauchy point along the projected steepest-descent
    path (ref: _lbfgsb_solver.js's GCP; Byrd-Lu-Nocedal-Zhu alg. CP).

    Returns (x_cp, c = Wᵀ(x_cp − x), free) where ``free`` marks the
    variables not driven to a bound at the Cauchy point."""
    n = x.shape[0]
    dt = x.dtype
    eps = jnp.finfo(dt).eps
    inf = jnp.asarray(jnp.inf, dt)

    gpos = g > 0
    gneg = g < 0
    safe_g = jnp.where(g == 0, 1.0, g)
    t_break = jnp.where(gneg, (x - hi) / safe_g,
                        jnp.where(gpos, (x - lo) / safe_g, inf))
    t_break = jnp.maximum(t_break, 0.0)
    d = jnp.where(t_break > 0, -g, 0.0)

    order = jnp.argsort(t_break)
    ts = t_break[order]
    ds = d[order]
    # variables not on the path (d = 0: already optimal at a bound, or
    # zero gradient) must not contribute breakpoint commits — every
    # commit term below is proportional to g_j, so zero it for them
    gs = jnp.where(ds == 0, 0.0, g[order])
    w_ord = wk.w[order]                               # (n, 2m)

    p0 = wk.w.T @ d                                   # (2m,)
    f1_0 = -jnp.vdot(d, d)
    mp0 = _small_solve(wk.k, p0[:, None])[:, 0]
    f2_0 = -wk.theta * f1_0 - jnp.vdot(p0, mp0)
    f2_min = eps * jnp.maximum(-f1_0, 1.0)

    class_ = {
        "t_old": jnp.zeros((), dt), "f1": f1_0, "f2": f2_0,
        "c": jnp.zeros_like(p0), "p": p0,
        "t_cp": jnp.zeros((), dt), "done": f1_0 >= 0,
    }

    def seg(st, inp):
        tj, dj, gj, wj = inp
        dt_seg = tj - st["t_old"]
        finite = jnp.isfinite(tj)
        f2s = jnp.maximum(st["f2"], f2_min)
        dt_star = -st["f1"] / f2s
        inside = (dt_star < dt_seg) | ~finite
        t_cp_new = st["t_old"] + jnp.clip(dt_star, 0.0, None)
        # commit this breakpoint: variable j hits its bound at tj
        c_new = st["c"] + dt_seg * st["p"]
        zb = tj * dj                                   # total move of j
        mc = _small_solve(wk.k, jnp.stack(
            [c_new, st["p"], wj], axis=1))             # (2m, 3)
        wmc, wmp, wmw = (jnp.vdot(wj, mc[:, 0]),
                         jnp.vdot(wj, mc[:, 1]),
                         jnp.vdot(wj, mc[:, 2]))
        f1_new = st["f1"] + dt_seg * st["f2"] + gj * gj \
            + wk.theta * gj * zb - gj * wmc
        f2_new = st["f2"] - wk.theta * gj * gj \
            - 2.0 * gj * wmp - gj * gj * wmw
        p_new = st["p"] + gj * wj
        step_done = st["done"] | inside
        take = ~st["done"]
        upd = lambda new, old: jnp.where(take & ~inside, new, old)
        return {
            "t_old": upd(tj, st["t_old"]),
            "f1": upd(f1_new, st["f1"]),
            "f2": upd(f2_new, st["f2"]),
            "c": upd(c_new, st["c"]),
            "p": upd(p_new, st["p"]),
            "t_cp": jnp.where(take & inside, t_cp_new,
                              jnp.where(take, tj, st["t_cp"])),
            "done": step_done,
        }, None

    st, _ = jax.lax.scan(seg, class_, (ts, ds, gs, w_ord))
    t_cp = st["t_cp"]
    # x_cp: each coordinate moves min(t_cp, t_break_i) along d
    tmove = jnp.minimum(t_cp, t_break)
    move = jnp.where(d == 0, 0.0, tmove * d)           # avoid inf·0
    x_cp = jnp.clip(x + move, lo, hi)
    c = jnp.matmul(wk.w.T, x_cp - x, precision="highest")
    free = t_cp < t_break                              # strictly interior
    return x_cp, c, free


def subspace_step(wk: CompactWK, x, g, x_cp, c, free, lo, hi):
    """Minimise the quadratic model over the free variables starting
    from the Cauchy point (direct primal method, ref:
    _lbfgsb_solver.js subspace Hv; BLNZ §5.1). Returns the subspace
    minimiser clipped to the box."""
    m2 = wk.w.shape[1]
    dt = x.dtype
    # reduced gradient of the model at x_cp
    z = x_cp - x
    mc = _small_solve(wk.k, c[:, None])[:, 0]
    r = g + wk.theta * z - jnp.matmul(wk.w, mc, precision="highest")
    r = jnp.where(free, r, 0.0)

    wf = jnp.where(free[:, None], wk.w, 0.0)           # rows masked
    wtr = jnp.matmul(wf.T, r, precision="highest")
    mwtr = _small_solve(wk.k, wtr[:, None])[:, 0]
    wtw = jnp.matmul(wf.T, wf, precision="highest")
    nmat = jnp.eye(m2, dtype=dt) - _small_solve(wk.k, wtw) / wk.theta
    v = _small_solve(nmat, mwtr[:, None])[:, 0]
    d = -(r + jnp.matmul(wf, v, precision="highest") / wk.theta) / wk.theta
    d = jnp.where(free, d, 0.0)
    # longest feasible step along d from x_cp
    safe_d = jnp.where(d == 0, 1.0, d)
    to_hi = jnp.where(d > 0, (hi - x_cp) / safe_d, jnp.inf)
    to_lo = jnp.where(d < 0, (lo - x_cp) / safe_d, jnp.inf)
    amax = jnp.minimum(jnp.min(jnp.minimum(to_hi, to_lo)), 1.0)
    amax = jnp.maximum(amax, 0.0)
    return jnp.clip(x_cp + amax * d, lo, hi)
