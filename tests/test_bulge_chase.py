"""Equivalence tests for the bulge-chase Pallas kernel.

ops/bulge_chase.py runs the per-slide Francis position loop of
la/schur.py's `_chase_multishift` in one kernel. These tests pin the
kernel (interpret mode on CPU) against `bulge_chase_steps_xla` — the
masked rank-NB XLA formulation the library shipped before the kernel
existed, kept as the ND4JS_TPU_SCHUR_KERNEL=0 fallback. The two are
independent arithmetic paths (one-hot selector matmuls + lane-masked
sums in transposed layout vs flat-gather extractions in natural
layout), so agreement pins both. Covered: multishift (NB > 1) and the
classic single-bulge (NB = 1) configurations, entering/exiting bulges,
and inactive tails.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nd4js_tpu.ops.bulge_chase import (bulge_chase_steps,
                                       bulge_chase_steps_xla)


def _hess(key, w, dtype):
    a = jax.random.normal(key, (w, w), dtype)
    return jnp.triu(a, -1)


@pytest.mark.parametrize("w,nb,k0_off", [
    (32, 2, 0),       # multishift, bulges entering (seed path)
    (32, 2, 7),       # multishift mid-sweep (carried P)
    (24, 1, 0),       # classic single-bulge, entering
    (24, 1, 15),      # single bulge exiting through hi−2
])
def test_kernel_matches_xla_fallback(w, nb, k0_off):
    dtype = jnp.float64
    key = jax.random.PRNGKey(w * 100 + nb * 10 + k0_off)
    b = _hess(key, w, dtype)
    sl = w - 3 * nb
    lo = 0
    hi = w - 2              # active range ends inside the window
    k0 = lo + k0_off
    trs = jax.random.normal(jax.random.PRNGKey(1), (nb,), dtype)
    dets = jax.random.normal(jax.random.PRNGKey(2), (nb,), dtype)
    seed = k0_off == 0
    if seed:
        P = jnp.zeros((nb, 3), dtype)
    else:
        P = jax.random.normal(jax.random.PRNGKey(3), (nb, 3), dtype)

    shifts = jnp.stack([trs, dets], axis=1)
    v_ref, p_ref = bulge_chase_steps_xla(b, P, shifts, k0, lo, hi,
                                         sl=sl, seed=seed)
    v_ker, p_ker = bulge_chase_steps(b, P, shifts, k0, lo, hi,
                                     sl=sl, seed=seed, interpret=True)
    assert np.abs(np.asarray(v_ker - v_ref)).max() <= 1e-12
    assert np.abs(np.asarray(p_ker - p_ref)).max() <= \
        1e-12 * max(1.0, float(jnp.abs(p_ref).max()))


@pytest.mark.parametrize("impl", ["kernel", "xla"])
def test_transform_is_orthogonal(impl):
    """v must be orthogonal (the full similarity/Hessenberg contracts
    are covered end-to-end by the schur tests)."""
    dtype = jnp.float64
    w = 24
    b = _hess(jax.random.PRNGKey(9), w, dtype)
    trs = jnp.array([float(b[0, 0] + b[1, 1])], dtype)
    dets = jnp.array([float(b[0, 0] * b[1, 1] - b[0, 1] * b[1, 0])],
                     dtype)
    shifts = jnp.stack([trs, dets], axis=1)
    P = jnp.zeros((1, 3), dtype)
    if impl == "kernel":
        v, _ = bulge_chase_steps(b, P, shifts, 0, 0, w, sl=w - 3,
                                 seed=True, interpret=True)
    else:
        v, _ = bulge_chase_steps_xla(b, P, shifts, 0, 0, w, sl=w - 3,
                                     seed=True)
    orth = jnp.matmul(v.T, v, precision="highest") \
        - jnp.eye(w, dtype=dtype)
    assert float(jnp.abs(orth).max()) <= 1e-13


def test_schur_fallback_env_switch(monkeypatch):
    """ND4JS_TPU_SCHUR_KERNEL=0 must route the Schur chase through the
    XLA fallback and still satisfy the decomposition contract."""
    from nd4js_tpu import la
    monkeypatch.setenv("ND4JS_TPU_SCHUR_KERNEL", "0")
    # n chosen to be unused by any other schur test in the suite: the
    # env flag is read at trace time, so a cached jit from another test
    # at the same (shape, dtype) would silently bypass the switch
    n = 53                       # < 192: single-bulge multishift path
    a = jax.random.normal(jax.random.PRNGKey(21), (n, n), jnp.float64)
    q, t = la.schur_decomp(a)
    eye = jnp.eye(n, dtype=q.dtype)
    orth = jnp.abs(jnp.matmul(q.T, q, precision="highest") - eye).max()
    rec = jnp.matmul(jnp.matmul(q, t, precision="highest"), q.T,
                     precision="highest") - a
    eps = float(jnp.finfo(jnp.float64).eps)
    assert float(orth) <= 4 * eps * n * 8
    assert float(jnp.abs(rec).max()) <= 16 * eps * n * float(
        jnp.abs(a).max())
