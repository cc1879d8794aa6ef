"""Leading-dimension broadcasting & batching — the vmap seam.

Every `la/` routine in the reference hand-implements a broadcast loop over
leading dimensions (e.g. /root/reference/src/la/lu.js:34-40, qr.js:43-49,
recursive walkers lu.js:132-173). SURVEY.md §2 identifies that construct —
"batched application of a 2-D kernel over leading dimensions with NumPy
broadcasting" — as the first-class component of the TPU rebuild, mapping to
``jax.vmap`` intra-chip and ``shard_map`` over a mesh inter-chip.

This module is that component. ``batched(core_ndims)`` wraps a core
function written for fixed trailing ranks (usually 2-D matrices) into one
accepting arbitrary broadcastable leading dims:

    @batched(core_ndims=(2,))
    def lu_decomp(a):            # a: (M, N)
        ...
    lu_decomp(x)                 # x: (..., M, N) — any leading dims

The wrapper broadcasts all leading shapes together, flattens them into one
batch axis, applies a single ``jax.vmap``, and restores the leading shape
on every output leaf. Zero leading dims short-circuits to the core call,
so unbatched code pays nothing.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["batched", "broadcast_leading"]


def broadcast_leading(arrays, core_ndims):
    """Broadcast the leading (batch) dims of ``arrays`` against each other.

    ``core_ndims[i]`` trailing dims of ``arrays[i]`` are the core shape and
    are left untouched. Returns (broadcast_arrays, batch_shape).
    """
    arrays = [jnp.asarray(a) for a in arrays]
    lead_shapes = []
    for a, c in zip(arrays, core_ndims):
        if a.ndim < c:
            raise ValueError(
                f"operand has ndim {a.ndim}, needs at least {c} core dims")
        lead_shapes.append(a.shape[: a.ndim - c])
    bshape = np.broadcast_shapes(*lead_shapes)
    out = [
        jnp.broadcast_to(a, bshape + a.shape[a.ndim - c:])
        for a, c in zip(arrays, core_ndims)
    ]
    return out, bshape


def batched(core_ndims, n_array_args=None):
    """Decorator: lift a fixed-rank core function to broadcast leading dims.

    Parameters
    ----------
    core_ndims : tuple[int, ...]
        Number of trailing core dims for each positional array argument.
    n_array_args : int | None
        How many leading positional args are arrays (defaults to
        ``len(core_ndims)``); the rest are passed through untouched
        (static options).
    """
    core_ndims = tuple(core_ndims)
    n_arr = len(core_ndims) if n_array_args is None else n_array_args

    def deco(f):
        @functools.wraps(f)
        def wrapper(*args, **kwargs):
            arrs, rest = list(args[:n_arr]), args[n_arr:]
            arrs, bshape = broadcast_leading(arrs, core_ndims)
            if bshape == ():
                return f(*arrs, *rest, **kwargs)
            nbatch = math.prod(bshape)
            flat = [
                a.reshape((nbatch,) + a.shape[len(bshape):]) for a in arrs
            ]
            vf = jax.vmap(lambda *xs: f(*xs, *rest, **kwargs))
            out = vf(*flat)
            return jax.tree_util.tree_map(
                lambda leaf: leaf.reshape(bshape + leaf.shape[1:]), out)

        wrapper.core = f  # expose the unbatched kernel
        return wrapper

    return deco
