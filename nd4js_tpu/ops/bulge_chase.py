"""Pallas kernel: Francis bulge-chase position loop for one window slide.

The Schur multishift sweep (la/schur.py `_chase_multishift`; ref seam
/root/reference/src/la/schur.js:415-660, LAPACK dlaqr5's delayed-update
train) chases NB double-shift bulges through a (W, W) diagonal block,
one position per step, SL = W − 3·NB steps per slide. As an XLA
fori_loop each step costs ~8 dispatched ops; the nested AED window
Schur runs this loop ~10⁴ times per 1024² decomposition, making
per-op dispatch the dominant wall-clock cost. This kernel runs the
whole slide's position loop in one kernel launch with the block
resident in VMEM.

Layout: the block is held TRANSPOSED (C = Bᵀ) so every per-step
extraction — the entering-bulge seed entries and the next bulge column
B[kb+1..kb+3, kb] — is a row of C: a one-hot selector matmul (MXU)
plus lane-masked sums. All bulge-train vectors live in (NB, 1) /
(NB, W) orientation and the two-sided reflector updates are
dot_generals with explicit dimension numbers, so the kernel contains
no transposes (Mosaic relayouts) at all.

Per step: build the NB disjoint 3-row reflectors as an (NB, W) masked
scatter, apply  B ← (I − VτVᵀ)·B·(I − VτVᵀ)  and accumulate
V_acc ← V_acc·(I − VτVᵀ)  as six dot_generals, then refresh the bulge
columns. Returns only (V_acc, P): the caller re-derives the diagonal
block from the full-matrix row/column GEMMs exactly as the XLA version
did (the in-loop block is a working value, never written back).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["bulge_chase_steps", "bulge_chase_steps_xla"]


def _house3_cols(p0, p1, p2):
    """Vectorized 3-element Householder (la/schur.py `_house3`) on
    (NB, 1) columns: returns (v1, v2, tau) with v0 ≡ 1."""
    sigma = p1 * p1 + p2 * p2
    nrm = jnp.sqrt(p0 * p0 + sigma)
    beta = jnp.where(p0 >= 0, -nrm, nrm)
    den = p0 - beta
    safe_den = jnp.where(den == 0, jnp.ones_like(den), den)
    v1 = jnp.where(sigma == 0, jnp.zeros_like(p1), p1 / safe_den)
    v2 = jnp.where(sigma == 0, jnp.zeros_like(p2), p2 / safe_den)
    safe_beta = jnp.where(beta == 0, jnp.ones_like(beta), beta)
    tau = jnp.where(nrm == 0, jnp.zeros_like(beta),
                    (beta - p0) / safe_beta)
    tau = jnp.where(sigma == 0, jnp.zeros_like(tau), tau)
    return v1, v2, tau


def _dot(a, b, ca, cb):
    """dot_general contracting a's dim ``ca`` with b's dim ``cb`` at
    pinned-highest precision (the kernel-side equivalent of
    core/mm.mm's precision="highest" contract — the TPU default is
    bf16 passes, which silently breaks the accuracy contracts; repo
    convention, CLAUDE.md)."""
    return jax.lax.dot_general(
        a, b, (((ca,), (cb,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=a.dtype)


def _make_kernel(W: int, NB: int, SL: int, seed: bool):
    OFF = 3 * (NB - 1)

    def kernel(scal_ref, c_ref, sh_ref, p_ref, vo_ref, po_ref, c_scr):
        dtype = c_ref.dtype
        k0 = scal_ref[0]
        lo = scal_ref[1]
        hi = scal_ref[2]
        c_scr[:] = c_ref[:]
        po_ref[:] = p_ref[:]
        rW = jax.lax.broadcasted_iota(jnp.int32, (W, W), 0)
        cW = jax.lax.broadcasted_iota(jnp.int32, (W, W), 1)
        vo_ref[:] = (rW == cW).astype(dtype)
        laneW = jax.lax.broadcasted_iota(jnp.int32, (NB, W), 1)
        i3 = 3 * jax.lax.broadcasted_iota(jnp.int32, (NB, 1), 0)
        trs = sh_ref[:, 0:1]                              # (NB, 1)
        dets = sh_ref[:, 1:2]

        def lmask(rows, idx):
            """Lane-masked sum: rows (NB, W), idx (NB, 1) → (NB, 1)."""
            return jnp.sum(jnp.where(laneW == idx, rows, 0.0),
                           axis=1, keepdims=True)

        def step(t, _):
            c = c_scr[:]
            P = po_ref[:]                                  # (NB, 3)
            k = k0 + t - i3                                # (NB, 1)
            kb = t + OFF - i3                              # (NB, 1)
            act = (k >= lo) & (k <= hi - 2)
            if seed:
                # entering bulge: first column of (B−s₁)(B−s₂)·e₁ from
                # the CURRENT block — C rows kb, kb+1 are B columns
                # kb, kb+1
                sel0 = (laneW == kb).astype(dtype)         # (NB, W)
                sel1 = (laneW == kb + 1).astype(dtype)
                r0 = _dot(sel0, c, 1, 0)                   # B[:, kb]ᵀ
                r1 = _dot(sel1, c, 1, 0)                   # B[:, kb+1]ᵀ
                b00 = lmask(r0, kb)
                b10 = lmask(r0, kb + 1)
                b01 = lmask(r1, kb)
                b11 = lmask(r1, kb + 1)
                b21 = lmask(r1, kb + 2)
                ip0 = b00 * b00 + b01 * b10 - trs * b00 + dets
                ip1 = b10 * (b00 + b11 - trs)
                ip2 = b10 * b21
                entering = k == lo
                P = jnp.where(entering,
                              jnp.concatenate([ip0, ip1, ip2], axis=1),
                              P)
            p0 = P[:, 0:1]
            p1 = P[:, 1:2]
            p2 = jnp.where(k == hi - 2, 0.0, P[:, 2:3])
            v1, v2, tau = _house3_cols(p0, p1, p2)
            tau = jnp.where(act, tau, 0.0)
            # scatter the NB disjoint 3-supports into (NB, W)
            rel = laneW - kb
            vblk = jnp.where(rel == 0, 1.0, 0.0) \
                + jnp.where(rel == 1, v1, 0.0) \
                + jnp.where(rel == 2, v2, 0.0)
            tv = tau * vblk                                # (NB, W)
            # C = Bᵀ;  B ← B − V·(τVᵀB)  ⇒  C ← C − (C·τV)·Vᵀ
            c = c - _dot(_dot(c, tv, 1, 1), vblk, 1, 0)
            # B ← B − (B·τV)·Vᵀ          ⇒  C ← C − Vᵀᵀ... = C − V'
            #   with (B·τV)ᵀ = τVᵀ·C     ⇒  C ← C − Vᵀ·(τV·C)
            c = c - _dot(vblk, _dot(tv, c, 1, 0), 0, 0)
            # V_acc ← V_acc − (V_acc·τV)·Vᵀ  (normal orientation)
            v = vo_ref[:]
            vo_ref[:] = v - _dot(_dot(v, tv, 1, 1), vblk, 1, 0)
            c_scr[:] = c
            # next bulge columns: B[kb+1+j, kb] = C[kb, kb+1+j]
            seln = (laneW == kb).astype(dtype)
            rn = _dot(seln, c, 1, 0)                       # (NB, W)
            parts = []
            for j in range(3):
                e = lmask(rn, kb + 1 + j)
                if j == 2:
                    e = jnp.where(k + 3 < hi, e, 0.0)
                parts.append(e)
            nxt = jnp.concatenate(parts, axis=1)           # (NB, 3)
            po_ref[:] = jnp.where(act, nxt, P)
            return 0

        jax.lax.fori_loop(0, SL, step, 0, unroll=False)

    return kernel


@functools.partial(jax.jit, static_argnames=("sl", "seed"))
def bulge_chase_steps_xla(b, p, shifts, k0, lo, hi, *, sl: int,
                          seed: bool):
    """Pure-XLA fallback for :func:`bulge_chase_steps` — the masked
    rank-NB update loop the library shipped before the Pallas kernel
    (an independent arithmetic path; ~8 dispatched ops per position
    step). Selected by ``ND4JS_TPU_SCHUR_KERNEL=0`` (la/schur.py) as
    insurance against a Mosaic regression; also the reference side of
    the kernel-equivalence tests (tests/test_bulge_chase.py)."""
    W = b.shape[-1]
    NB = p.shape[-2]
    OFF = 3 * (NB - 1)
    dtype = b.dtype
    ii = jnp.arange(NB)
    rowW = jnp.arange(W)
    trs = shifts[:, 0]
    dets = shifts[:, 1]
    hp = functools.partial(jnp.matmul,
                           precision=jax.lax.Precision.HIGHEST)

    def step(t, c):
        b, v, P = c
        k = k0 + t - 3 * ii
        kb = t + OFF - 3 * ii
        act = (k >= lo) & (k <= hi - 2)
        if seed:
            entering = k == lo
            flat0 = b.reshape(-1)
            kbc = jnp.clip(kb, 0, W - 3)

            def at(di, dj):
                return flat0[(kbc + di) * W + (kbc + dj)]

            b00, b01 = at(0, 0), at(0, 1)
            b10, b11 = at(1, 0), at(1, 1)
            b21 = at(2, 1)
            ip0 = b00 * b00 + b01 * b10 - trs * b00 + dets
            ip1 = b10 * (b00 + b11 - trs)
            ip2 = b10 * b21
            P = jnp.where(entering[:, None],
                          jnp.stack([ip0, ip1, ip2], axis=1), P)
        p0, p1 = P[:, 0], P[:, 1]
        p2 = jnp.where(k == hi - 2, 0.0, P[:, 2])
        sigma = p1 * p1 + p2 * p2
        nrm = jnp.sqrt(p0 * p0 + sigma)
        beta = jnp.where(p0 >= 0, -nrm, nrm)
        den = p0 - beta
        safe_den = jnp.where(den == 0, jnp.ones_like(den), den)
        v1 = jnp.where(sigma == 0, jnp.zeros_like(p1), p1 / safe_den)
        v2 = jnp.where(sigma == 0, jnp.zeros_like(p2), p2 / safe_den)
        safe_beta = jnp.where(beta == 0, jnp.ones_like(beta), beta)
        tau = jnp.where(nrm == 0, jnp.zeros_like(beta),
                        (beta - p0) / safe_beta)
        tau = jnp.where(sigma == 0, jnp.zeros_like(tau), tau)
        tau = jnp.where(act, tau, 0.0)
        vmat = jnp.stack([jnp.ones_like(v1), v1, v2], axis=1)
        rel = rowW[:, None] - kb[None, :]
        vblk = jnp.zeros((W, NB), dtype)
        for j in range(3):
            vblk = vblk + jnp.where(rel == j, vmat[None, :, j], 0.0)
        tv = tau[None, :] * vblk
        b = b - hp(vblk, hp(tv.T, b))
        b = b - hp(hp(b, tv), vblk.T)
        v = v - hp(hp(v, tv), vblk.T)
        flat = b.reshape(-1)
        idxs = (kb[:, None] + 1 + jnp.arange(3)[None, :]) * W \
            + kb[:, None]
        nxt = flat[idxs]
        nxt = jnp.where((k[:, None] + 3 < hi)
                        | (jnp.arange(3)[None, :] < 2), nxt, 0.0)
        P = jnp.where(act[:, None], nxt, P)
        return b, v, P

    _, v, P = jax.lax.fori_loop(0, sl, step,
                                (b, jnp.eye(W, dtype=dtype), p))
    return v, P


@functools.partial(jax.jit,
                   static_argnames=("sl", "seed", "interpret"))
def bulge_chase_steps(b, p, shifts, k0, lo, hi, *, sl: int, seed: bool,
                      interpret: bool = False):
    """Run ``sl`` position steps of an NB-bulge Francis train on the
    (W, W) diagonal block ``b``.

    b: (W, W) current window block (normal orientation).
    p: (NB, 3) bulge first-column carries.
    shifts: (NB, 2) — columns (tr, det) of each bulge's double-shift
        polynomial λ² − tr·λ + det.
    k0: absolute position of bulge 0 at step t = 0 (bulge i sits at
        k0 + t − 3i); lo/hi: active range — a bulge acts while
        lo ≤ k ≤ hi−2, its 3rd component is dropped at k = hi−2, and
        (with ``seed``) it is freshly seeded from the block at k = lo.

    Returns (v, p'): the (W, W) accumulated orthogonal transform
    (B' = vᵀ·B·v) and the updated carries. The block itself is not
    returned — callers re-derive it from the off-block GEMMs
    (la/schur.py slide structure).
    """
    W = b.shape[-1]
    NB = p.shape[-2]
    kern = _make_kernel(W, NB, sl, seed)
    scal = jnp.stack([jnp.asarray(k0, jnp.int32),
                      jnp.asarray(lo, jnp.int32),
                      jnp.asarray(hi, jnp.int32)])
    c = jnp.swapaxes(b, -1, -2)
    v, po = pl.pallas_call(
        kern,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((W, W), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((NB, 2), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((NB, 3), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((W, W), lambda i: (0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((NB, 3), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((W, W), b.dtype),
                   jax.ShapeDtypeStruct((NB, 3), b.dtype)),
        scratch_shapes=[pltpu.VMEM((W, W), b.dtype)],
        interpret=interpret,
    )(scal, c, shifts, p)
    return v, po
