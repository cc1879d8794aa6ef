"""Debug-assertion layer — the reference's /*DEBUG*/ guards, TPU-style.

The reference peppers its kernels with comment-guarded invariant
assertions (/root/reference/src/la/_giv_rot.js:44-53, qr.js:150-167,
srrqr.js throughout) and ships a bounds-checking array proxy
(/root/reference/src/arrays/_checked_array.js:48).  Inside ``jit`` we
cannot throw on traced values, so the TPU-native equivalent is a
host-callback assertion: when :data:`nd4js_tpu.config.debug_checks` is
on (``ND4JS_TPU_DEBUG=1`` or set at runtime), each instrumented kernel
folds its invariant into a ``jax.debug.callback`` that raises
``DebugCheckError`` host-side with the failing check's name.  Off (the
default) the guards are a no-op at *trace* time — zero ops in the
compiled graph.

Instrumented invariants (each behind the flag):
  * finite-ness of every decomposition output (cholesky, lu, qr, tri
    solves, schur, svd_gram) — a NaN/Inf seeded anywhere surfaces with
    the kernel's name instead of propagating silently;
  * cholesky positive-diagonal, qr orthogonality spot-check;
  * eager Python bounds asserts in utils/arrays.py (checked_array
    parity).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import config

__all__ = ["DebugCheckError", "dassert", "dcheck_finite"]


class DebugCheckError(AssertionError):
    """Raised (host-side) when a debug_checks invariant fails."""


def _raise(ok, msg: str):
    if not bool(ok):
        raise DebugCheckError(f"nd4js_tpu debug check failed: {msg}")


def dassert(cond, msg: str):
    """Assert an (possibly traced) boolean invariant when
    config.debug_checks is on; no-op (no graph ops) otherwise.

    On concrete (eager) values the failure raises synchronously; under
    tracing it raises host-side from a ``jax.debug.callback`` when the
    compiled computation executes."""
    if not config.debug_checks:
        return
    ok = jnp.all(cond)
    try:
        _raise(bool(ok), msg)          # eager: deterministic raise
    except jax.errors.TracerBoolConversionError:
        jax.debug.callback(_raise, ok, msg)


def dcheck_finite(x, msg: str):
    """Assert every leaf of ``x`` is finite when debug_checks is on."""
    if not config.debug_checks:
        return
    for leaf in jax.tree_util.tree_leaves(x):
        leaf = jnp.asarray(leaf)
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            dassert(jnp.isfinite(leaf), f"{msg}: non-finite values")
