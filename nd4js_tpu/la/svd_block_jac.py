"""Blocked one-sided Jacobi SVD — the MXU throughput path.

The TPU descendant of the reference's cache-blocked Jacobi
(/root/reference/src/la/svd_jac_2sided_blocked.js:33-63 argues 4×4 tiles
from cache-line geometry; on TPU the analogous tile is a column *block*
sized for the MXU):

  * columns are grouped into nb blocks of width b; block pairs follow a
    host-precomputed round-robin schedule, so every between-round
    reshuffle is a static gather,
  * per pair: the 2b×2b Gram matrix (one batched MXU GEMM over all
    pairs), ONE parallel-Jacobi sweep on the Gram (vectorised two-sided
    rotations — approximate inner solves are standard for block Jacobi
    and keep the outer iteration quadratically convergent once nearly
    orthogonal), and the block rotation applied to W and V as batched
    GEMMs,
  * after the sweeps: singular values = column norms, sort, normalise,
    cond-guarded orthonormal completion for rank deficiency (shared
    with svd_jac.py).

Used by ``svd_decomp(..., method='blocked')`` and the benchmark; the
element-level svd_jac_1sided remains the high-accuracy default.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .. import config as _config
from ..core.batch import batched
from ..core.mm import mm, mt
from ..config import default_float_for
from .qr import _qr_batched
from .svd_jac import _complete_u

__all__ = ["svd_jac_blocked"]


def _round_robin_schedule(nb: int):
    """Classic tournament: nb teams (nb even), nb−1 rounds of nb/2
    disjoint pairs. Returns a list of rounds; each round is the flat
    block order [i0, j0, i1, j1, ...]."""
    teams = list(range(nb))
    rounds = []
    for _ in range(nb - 1):
        pairs = [(teams[i], teams[nb - 1 - i]) for i in range(nb // 2)]
        rounds.append([ix for p in pairs for ix in p])
        teams = [teams[0]] + [teams[-1]] + teams[1:-1]
    return rounds


def _inner_rotation_sweep(g, sweeps: int = 1):
    """A few parallel-Jacobi sweeps on symmetric (..., n, n) Gram
    matrices, returning only the accumulated rotation Φ (orthogonal by
    construction). Brent-Luk ordering, vectorised over pairs+batch."""
    n = g.shape[-1]
    h = n // 2
    v = jnp.broadcast_to(jnp.eye(n, dtype=g.dtype), g.shape)

    def shuffle(xt, xb):
        if h == 1:
            return xt, xb
        nt = jnp.concatenate([xt[..., :1], xb[..., :1], xt[..., 1:h - 1]],
                             -1)
        nb_ = jnp.concatenate([xb[..., 1:], xt[..., h - 1:]], -1)
        return nt, nb_

    def round_body(_, carry):
        a, v = carry
        att, abb = a[..., :h, :h], a[..., h:, h:]
        atb = a[..., :h, h:]
        app = jnp.diagonal(att, axis1=-2, axis2=-1)
        aqq = jnp.diagonal(abb, axis1=-2, axis2=-1)
        apq = jnp.diagonal(atb, axis1=-2, axis2=-1)
        tiny = jnp.finfo(a.dtype).tiny
        small = jnp.abs(apq) <= tiny
        safe = jnp.where(small, 1.0, apq)
        tau = (aqq - app) / (2 * safe)
        t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1 + tau * tau))
        t = jnp.where(tau == 0, jnp.ones_like(t), t)
        t = jnp.where(small, jnp.zeros_like(t), t)
        c = jax.lax.rsqrt(1 + t * t)
        s = t * c
        # rows then cols of A, cols of V
        at, ab = a[..., :h, :], a[..., h:, :]
        nat = c[..., :, None] * at - s[..., :, None] * ab
        nab = s[..., :, None] * at + c[..., :, None] * ab
        a = jnp.concatenate([nat, nab], axis=-2)
        al, ar = a[..., :, :h], a[..., :, h:]
        nal = c[..., None, :] * al - s[..., None, :] * ar
        nar = s[..., None, :] * al + c[..., None, :] * ar
        vl, vr = v[..., :, :h], v[..., :, h:]
        nvl = c[..., None, :] * vl - s[..., None, :] * vr
        nvr = s[..., None, :] * vl + c[..., None, :] * vr
        # consistent Brent-Luk shuffles (cols of A, rows of A, cols of V)
        nal, nar = shuffle(nal, nar)
        a = jnp.concatenate([nal, nar], axis=-1)
        at2, ab2 = shuffle(jnp.swapaxes(a[..., :h, :], -1, -2),
                           jnp.swapaxes(a[..., h:, :], -1, -2))
        a = jnp.concatenate([jnp.swapaxes(at2, -1, -2),
                             jnp.swapaxes(ab2, -1, -2)], axis=-2)
        nvl, nvr = shuffle(nvl, nvr)
        v = jnp.concatenate([nvl, nvr], axis=-1)
        return a, v

    a, v = jax.lax.fori_loop(0, sweeps * (n - 1), round_body, (g, v))
    return v


def _svd_blocked_core(a3, block: int = 64, outer_sweeps: int = 10,
                      inner_sweeps: int = 1):
    """a3: (Bn, N, N) square (pre-reduced). Returns (U, sv, Vt)."""
    Bn, N, _ = a3.shape
    b = min(block, N)
    pad = (-N) % (2 * b)
    n_work = N + pad
    w = jnp.concatenate(
        [a3, jnp.zeros((Bn, N, pad), a3.dtype)], axis=2) if pad else a3
    nb = n_work // b
    v = jnp.broadcast_to(jnp.eye(n_work, dtype=a3.dtype),
                         (Bn, n_work, n_work))
    if nb == 1:
        phi = _inner_rotation_sweep(mm(mt(w), w), sweeps=outer_sweeps * 4)
        w = mm(w, phi)
        v = mm(v, phi)
    else:
        schedule = _round_robin_schedule(nb)
        npair = nb // 2
        for sweep in range(outer_sweeps):
            for rnd in schedule:
                order = np.asarray(rnd)
                # gather blocks into pair-adjacent layout
                cols = (order[:, None] * b
                        + np.arange(b)[None, :]).reshape(-1)
                wp = w[:, :, cols].reshape(Bn, N, npair, 2 * b)
                vp = v[:, :, cols].reshape(Bn, n_work, npair, 2 * b)
                wp = jnp.moveaxis(wp, 2, 1)        # (Bn, npair, N, 2b)
                vp = jnp.moveaxis(vp, 2, 1)
                g = jnp.einsum("bpmi,bpmj->bpij", wp, wp,
                               precision=_config.matmul_precision)
                phi = _inner_rotation_sweep(g, sweeps=inner_sweeps)
                wp = jnp.einsum("bpmi,bpij->bpmj", wp, phi,
                                precision=_config.matmul_precision)
                vp = jnp.einsum("bpmi,bpij->bpmj", vp, phi,
                                precision=_config.matmul_precision)
                wp = jnp.moveaxis(wp, 1, 2).reshape(Bn, N, npair * 2 * b)
                vp = jnp.moveaxis(vp, 1, 2).reshape(Bn, n_work,
                                                    npair * 2 * b)
                inv = np.argsort(cols)
                w = wp[:, :, inv]
                v = vp[:, :, inv]
    # singular values / sort / normalise (cut the padding first)
    sv = jnp.sqrt(jnp.sum(w * w, axis=1))
    order = jnp.argsort(-sv, axis=-1)[..., :N]
    sv = jnp.take_along_axis(sv, order, axis=-1)
    w = jnp.take_along_axis(w, order[:, None, :], axis=-1)
    v = jnp.take_along_axis(v, order[:, None, :], axis=-1)[:, :N, :]
    safe = jnp.where(sv > 0, sv, 1.0)
    u = w / safe[:, None, :]
    eps = jnp.finfo(a3.dtype).eps
    u = jax.vmap(lambda uu, ss: _complete_u(
        uu, ss, tol_rank=eps * N * jnp.max(ss)))(u, sv)
    return u, sv, mt(v)


def svd_jac_blocked(a, block: int = 64, outer_sweeps: int = 10):
    """Blocked one-sided Jacobi SVD (MXU path): A = U·diag(sv)·V.
    Batched over leading dims. Best for N ≥ 256 batched workloads;
    rectangular inputs are pre-reduced by QR."""
    import math as _math
    a = jnp.asarray(a)
    a = a.astype(default_float_for(a.dtype))
    lead = a.shape[:-2]
    M, N = a.shape[-2:]
    a3 = a.reshape((max(1, _math.prod(lead)), M, N))
    if M < N:
        u, sv, v = svd_jac_blocked(
            jnp.swapaxes(a3, -1, -2), block=block,
            outer_sweeps=outer_sweeps)
        u, sv, v = mt(v), sv, mt(u)
    elif M > N:
        q, r = _qr_batched(a3, economic=True)
        u, sv, v = _svd_blocked_core(r, block=block,
                                     outer_sweeps=outer_sweeps)
        u = mm(q, u)
    else:
        u, sv, v = _svd_blocked_core(a3, block=block,
                                     outer_sweeps=outer_sweeps)
    K = min(M, N)
    return (u.reshape(lead + (M, K)), sv.reshape(lead + (K,)),
            v.reshape(lead + (K, N)))
