"""Batched matrix multiplication with n-ary chain-order optimisation.

Parity with /root/reference/src/la/matmul.js: ``matmul2`` (:24-144, the
reference generates specialised scalar kernels with `new Function` — on
TPU that role is played by XLA codegen for `dot_general` on the MXU) and
n-ary ``matmul`` whose matrix-chain-order dynamic program (:150-236)
ports directly as trace-time Python: shapes are static under jit, so the
parenthesisation is decided at trace time and costs nothing at runtime.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .. import dt
from .. import config
from ..config import default_float_for

__all__ = ["matmul", "matmul2"]


def _promote(a, b):
    a, b = jnp.asarray(a), jnp.asarray(b)
    dtype = dt.super_dtype(a.dtype, b.dtype)
    dtype = default_float_for(dtype)
    return a.astype(dtype), b.astype(dtype)


def matmul2(a, b):
    """Batched GEMM with NumPy broadcasting over leading dims
    (ref: matmul.js:24-144)."""
    a, b = _promote(a, b)
    if a.ndim < 2 or b.ndim < 2:
        raise ValueError("matmul2 expects ndim >= 2 operands")
    if a.shape[-1] != b.shape[-2]:
        raise ValueError(
            f"inner dimensions mismatch: {a.shape} @ {b.shape}")
    return jnp.matmul(a, b, precision=config.matmul_precision)


def _chain_order(dims):
    """Classic matrix-chain-order DP (ref: matmul.js:184-235).

    ``dims[i], dims[i+1]`` are the (rows, cols) of matrix i. Returns the
    split table s where s[i][j] is the optimal split point of product
    i..j.
    """
    n = len(dims) - 1
    m = [[0] * n for _ in range(n)]
    s = [[0] * n for _ in range(n)]
    for length in range(2, n + 1):
        for i in range(0, n - length + 1):
            j = i + length - 1
            m[i][j] = float("inf")
            for k in range(i, j):
                cost = m[i][k] + m[k + 1][j] \
                    + dims[i] * dims[k + 1] * dims[j + 1]
                if cost < m[i][j]:
                    m[i][j] = cost
                    s[i][j] = k
    return s


def matmul(*matrices):
    """n-ary matmul, parenthesised by the chain-order DP to minimise
    FLOPs (ref: matmul.js:150-236). Leading dims broadcast."""
    if len(matrices) == 0:
        raise ValueError("matmul() requires at least one operand")
    mats = [jnp.asarray(m) for m in matrices]
    if len(mats) == 1:
        return mats[0]
    if len(mats) == 2:
        return matmul2(*mats)
    dims = [m.shape[-2] for m in mats] + [mats[-1].shape[-1]]
    for x, y in zip(mats[:-1], mats[1:]):
        if x.shape[-1] != y.shape[-2]:
            raise ValueError("inner dimensions mismatch in matmul chain")
    s = _chain_order(dims)

    def mult(i, j):
        if i == j:
            return mats[i]
        k = s[i][j]
        return matmul2(mult(i, k), mult(k + 1, j))

    return mult(0, len(mats) - 1)
