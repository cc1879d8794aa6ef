"""Global configuration for nd4js_tpu.

The reference (nd4js) has no global config — every option is a per-call
options object (see SURVEY.md §5 "Config / flag system").  We keep that
per-call style for solver knobs, and use this module only for the few
things that are inherently global on TPU: the default floating dtype and
debug-assertion toggles (the reference's /*DEBUG*/ blocks, e.g.
/root/reference/src/la/_giv_rot.js:44-53, become `debug_checks` here).
"""
from __future__ import annotations

import os

import jax.numpy as jnp

# nd4js defaults to float64 (JS numbers). A TPU-native library defaults to
# float32; float64 stays fully supported for host/CPU verification runs.
default_float = jnp.float32

# Precision for library-internal matmuls/einsums. TPU's default matmul
# precision is a single bfloat16 pass, which destroys dense-LA accuracy
# contracts (residual 0.02 vs 6e-7 on a 64x64 triangular solve; measured
# 2.3e-3 relative GEMM error at 512²). The two safe settings on this
# chip (v5e, measured 2026-08):
#   'highest' — 6-pass bf16 emulation of full f32: 1.3e-7 relative GEMM
#               error, ~30 TF.
#   'high'    — 3-pass bf16 (bf16_3x): 1.2e-5 relative GEMM error,
#               ~60 TF — 2× the GEMM throughput at ~20× margin under the
#               library's 1e-5·‖A‖·√N reconstruction contracts.
# Env-overridable (ND4JS_TPU_PREC) for A/B timing; *verification math in
# tests/probes must stay at explicit "highest"* (CLAUDE.md).
matmul_precision = os.environ.get("ND4JS_TPU_PREC", "highest")

# When True, kernels run extra invariant checks (finite-ness, shape guards)
# mirroring the reference's /*DEBUG*/ assertion density. Off by default:
# checks add host syncs / extra ops inside jit.
debug_checks: bool = bool(int(os.environ.get("ND4JS_TPU_DEBUG", "0")))


def default_float_for(dtype) -> jnp.dtype:
    """Floating dtype a given input dtype promotes to for LA routines.

    Matches the reference convention (e.g. /root/reference/src/la/qr.js:31,
    lu.js:27): integer inputs promote to float64, floats are kept.
    On accelerators without x64 enabled, float64 silently lowers to float32
    inside JAX; we honour that rather than fight it.
    """
    dtype = jnp.dtype(dtype)
    if jnp.issubdtype(dtype, jnp.integer) or jnp.issubdtype(dtype, jnp.bool_):
        return jnp.dtype(jnp.float64)
    return dtype
