"""Real-TPU hardware tests — compiled Pallas kernels + f32 contracts.

The CPU suite runs every Pallas kernel in interpret mode only; a Mosaic
miscompile or layout change would pass CI silently (VERDICT r2 weak
#7). This file runs the compiled kernels on the actual chip and checks
them against their interpret-mode/XLA equivalents and the library
accuracy contracts at f32.

Run (the verify skill's hardware config):

    ND4JS_TPU_HW=1 python -m pytest tests/test_tpu_hw.py -q

Skipped automatically when no TPU backend is available (the normal
CPU-mesh CI run).
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _on_tpu() -> bool:
    if os.environ.get("ND4JS_TPU_HW") != "1":
        return False
    try:
        return "tpu" in jax.devices()[0].device_kind.lower()
    except Exception:
        return False


pytestmark = pytest.mark.skipif(
    not _on_tpu(), reason="needs ND4JS_TPU_HW=1 and a real TPU backend")


def _maxabs(x):
    return float(jnp.abs(x).max())


def test_house_panel_compiled_vs_interpret():
    """The QR panel kernel compiled through Mosaic must agree with its
    interpret-mode execution (same algorithm, same arithmetic order)."""
    from nd4js_tpu.ops.house_panel import house_panel
    a = jax.random.normal(jax.random.PRNGKey(0), (2, 256, 128),
                          jnp.float32)
    rc, vc, tc = house_panel(a, interpret=False)
    ri, vi, ti = house_panel(a, interpret=True)
    assert _maxabs(rc - ri) <= 1e-5 * _maxabs(ri) + 1e-6
    assert _maxabs(vc - vi) <= 1e-5 * max(1.0, _maxabs(vi))
    assert _maxabs(tc - ti) <= 1e-5 * max(1.0, _maxabs(ti))


def test_lu_panel_compiled_vs_xla_lu():
    """Compiled LU panel → full lu_decomp must satisfy P·A = L·U on
    hardware at f32 contract tolerance."""
    from nd4js_tpu import la
    a = jax.random.normal(jax.random.PRNGKey(1), (4, 256, 256),
                          jnp.float32)
    lu, p = jax.jit(la.lu_decomp)(a)
    L = jnp.tril(lu, -1) + jnp.eye(256, dtype=lu.dtype)
    U = jnp.triu(lu)
    ap = jnp.take_along_axis(a, p[..., None], axis=-2)
    rec = jnp.matmul(L, U, precision="highest")
    assert _maxabs(rec - ap) <= 1e-5 * _maxabs(a) * 16


def test_qr_auto_f32_contract_on_hw():
    from nd4js_tpu import la
    a = jax.random.normal(jax.random.PRNGKey(2), (4, 512, 512),
                          jnp.float32)
    q, r = jax.jit(lambda x: la.qr_decomp(x, method="auto"))(a)
    eye = jnp.eye(512, dtype=q.dtype)
    orth = _maxabs(jnp.matmul(jnp.swapaxes(q, -1, -2), q,
                              precision="highest") - eye)
    rec = _maxabs(jnp.matmul(q, r, precision="highest") - a)
    eps = float(jnp.finfo(jnp.float32).eps)
    assert orth <= 4 * eps * 512 * 8
    assert rec <= 1e-5 * _maxabs(a) * 512 ** 0.5


def test_svd_default_f32_contract_on_hw():
    from nd4js_tpu import la
    a = jax.random.normal(jax.random.PRNGKey(3), (2, 256, 256),
                          jnp.float32)
    u, sv, v = jax.jit(la.svd_decomp)(a)
    rec = jnp.matmul(u * sv[..., None, :], v, precision="highest")
    assert _maxabs(rec - a) <= 1e-5 * _maxabs(a) * 256 ** 0.5
    assert bool(jnp.all(sv[..., :-1] >= sv[..., 1:]))
    assert bool(jnp.all(sv >= 0))


def test_solve_paths_f32_contract_on_hw():
    """cfg2-shaped fused solves on hardware."""
    from nd4js_tpu import la
    key = jax.random.PRNGKey(4)
    a = jax.random.normal(key, (32, 128, 128), jnp.float32)
    spd = jnp.matmul(a, jnp.swapaxes(a, -1, -2),
                     precision="highest") / 128 + 2 * jnp.eye(128)
    y = jax.random.normal(jax.random.PRNGKey(5), (32, 128, 2),
                          jnp.float32)

    def go(s):
        lu, p = la.lu_decomp(s)
        xl = la.lu_solve(lu, p, y)
        L, Li = la.cholesky_decomp(s, inv=True)
        xc = la.cholesky_solve(L, y, l_inv=Li)
        return xl, xc

    xl, xc = jax.jit(go)(spd)
    tol = 1e-4 * _maxabs(spd) * 128 ** 0.5
    assert _maxabs(jnp.matmul(spd, xl, precision="highest") - y) <= tol
    assert _maxabs(jnp.matmul(spd, xc, precision="highest") - y) <= tol


def test_bulge_chase_compiled_vs_interpret():
    """The Schur bulge-chase kernel compiled through Mosaic must agree
    with its interpret-mode execution (multishift and single-bulge
    configurations)."""
    from nd4js_tpu.ops.bulge_chase import bulge_chase_steps
    for w, nb in ((128, 8), (24, 1), (128, 1)):
        a = jax.random.normal(jax.random.PRNGKey(10 + nb), (w, w),
                              jnp.float32)
        b = jnp.triu(a, -1)
        sl = w - 3 * nb
        trs = jax.random.normal(jax.random.PRNGKey(11), (nb,),
                                jnp.float32)
        dets = jax.random.normal(jax.random.PRNGKey(12), (nb,),
                                 jnp.float32)
        shifts = jnp.stack([trs, dets], axis=1)
        P = jnp.zeros((nb, 3), jnp.float32)
        vc, pc = bulge_chase_steps(b, P, shifts, 0, 0, w, sl=sl,
                                   seed=True, interpret=False)
        vi, pi = bulge_chase_steps(b, P, shifts, 0, 0, w, sl=sl,
                                   seed=True, interpret=True)
        assert _maxabs(vc - vi) <= 1e-5 * max(1.0, _maxabs(vi)), (w, nb)
        assert _maxabs(pc - pi) <= 1e-4 * max(1.0, _maxabs(pi)), (w, nb)


def test_schur_small_kernel_compiled_vs_interpret():
    """The in-VMEM small-Schur kernel compiled through Mosaic must
    agree with interpret mode (same program — tolerance covers fp
    reassociation) and satisfy the similarity contract."""
    from nd4js_tpu.ops.schur_small import schur_small
    for w, seed in ((24, 0), (32, 1), (48, 2)):
        a = jnp.triu(jax.random.normal(jax.random.PRNGKey(seed),
                                       (w, w), jnp.float32), -1)
        tc, qc, lkc = schur_small(a, interpret=False)
        eps = float(jnp.finfo(jnp.float32).eps)
        eye = jnp.eye(w, dtype=a.dtype)
        orth = _maxabs(jnp.matmul(jnp.swapaxes(qc, -1, -2), qc,
                                  precision="highest") - eye)
        rec = _maxabs(jnp.matmul(jnp.matmul(qc, tc, precision="highest"),
                                 jnp.swapaxes(qc, -1, -2),
                                 precision="highest") - a)
        assert orth <= 64 * eps * w, (w, orth)
        assert rec <= 64 * eps * w * _maxabs(a), (w, rec)


def test_schur_f32_contract_on_hw():
    """End-to-end Schur at an MXU size on hardware (kernel-backed
    chase): similarity + orthogonality + quasi-triangular structure."""
    from nd4js_tpu import la
    n = 256
    a = jax.random.normal(jax.random.PRNGKey(13), (n, n), jnp.float32)
    q, t = jax.jit(la.schur_decomp)(a)
    eps = float(jnp.finfo(jnp.float32).eps)
    eye = jnp.eye(n, dtype=q.dtype)
    orth = _maxabs(jnp.matmul(jnp.swapaxes(q, -1, -2), q,
                              precision="highest") - eye)
    rec = _maxabs(jnp.matmul(jnp.matmul(q, t, precision="highest"),
                             jnp.swapaxes(q, -1, -2),
                             precision="highest") - a)
    assert orth <= 4 * eps * n * 8
    assert rec <= 16 * eps * n * _maxabs(a)


def test_mm_precision_guard_on_hw():
    """The library's pinned-precision matmul must NOT show the bf16
    default-pass error floor: an f32 GEMM of ill-scaled data differs
    between bf16 passes and 'highest' by ~1e-2 relative — core/mm.py
    must sit at the 'highest' end (repo convention; CLAUDE.md)."""
    from nd4js_tpu.core.mm import mm
    key = jax.random.PRNGKey(6)
    a = jax.random.normal(key, (512, 512), jnp.float32)
    b = jax.random.normal(jax.random.PRNGKey(7), (512, 512), jnp.float32)
    exact = jnp.matmul(a, b, precision="highest")
    lib = mm(a, b)
    assert _maxabs(lib - exact) <= 1e-5 * _maxabs(exact)


def test_chol_leaf_compiled_vs_interpret():
    """Compiled chol_leaf (Mosaic) vs interpret mode, plus the
    cholesky_decomp contract on hardware (the TPU path routes leaves
    through the kernel — cholesky.py::_use_leaf_kernel)."""
    from nd4js_tpu.ops.chol_leaf import chol_leaf
    from nd4js_tpu import la
    key = jax.random.PRNGKey(11)
    for n, b in ((16, 4), (64, 32), (33, 7)):
        g = jax.random.normal(key, (b, n, n), jnp.float32)
        spd = jnp.matmul(g, jnp.swapaxes(g, -1, -2),
                         precision="highest") / n + 2 * jnp.eye(n)
        lc, lic = chol_leaf(spd, True, interpret=False)
        li_, lii = chol_leaf(spd, True, interpret=True)
        assert _maxabs(lc - li_) < 1e-5
        assert _maxabs(lic - lii) < 1e-4
    # end-to-end contract at an MXU size through the public API
    g = jax.random.normal(key, (8, 256, 256), jnp.float32)
    spd = jnp.matmul(g, jnp.swapaxes(g, -1, -2),
                     precision="highest") / 256 + 2 * jnp.eye(256)
    L, Li = jax.jit(lambda s: la.cholesky_decomp(s, inv=True))(spd)
    rec = _maxabs(jnp.matmul(L, jnp.swapaxes(L, -1, -2),
                             precision="highest") - spd)
    ortho = _maxabs(jnp.matmul(Li, L, precision="highest")
                    - jnp.eye(256))
    assert rec <= 1e-5 * _maxabs(spd) * 16 and ortho <= 1e-3
