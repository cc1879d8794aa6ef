"""ND-array core: creation, elementwise zip, concat/stack, slicing.

Capability parity with the reference NDArray core
(/root/reference/src/nd_array.js, tabulate.js, zip_elems.js, concat.js,
stack.js), redesigned functionally for JAX:

  * arrays are plain ``jax.Array`` — no callable NDArray class; element
    access ``a(i,j)`` becomes ``a[i, j]``.
  * ``zip_elems`` (ref: zip_elems.js:23) keeps its n-ary broadcasting-map
    semantics but applies the mapper *vectorised* instead of per element —
    the stride-rewind iteration of zip_elems.js:66-86 is XLA's job now.
  * ``tabulate`` (ref: tabulate.js:23) evaluates the index function on
    broadcasted index grids (one fused kernel) instead of a scalar loop.
  * ``slice_elems`` (ref: nd_array.js:531) supports the reference syntax:
    ints, ``[start, end, step]`` triples, ``'new'`` and ``'...'``.
  * reductions/maps (ref: nd_array.js:353,464) are thin jnp wrappers.

All creation routines accept an optional ``dtype`` (name or jnp dtype).
"""
from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .. import dt
from ..config import default_float

__all__ = [
    "array", "asarray", "tabulate", "zip_elems", "concat", "stack",
    "map_elems", "reduce_elems", "slice_elems",
]


def _resolve_dtype(dtype):
    if dtype is None:
        return None
    if isinstance(dtype, str):
        if dtype not in dt.ARRAY_TYPES:
            raise ValueError(
                f"Invalid dtype '{dtype}'. Must be one of "
                f"{sorted(dt.ARRAY_TYPES)} (ref: dt/index.js:55).")
        return dt.ARRAY_TYPES[dtype]
    return jnp.dtype(dtype)


def array(content, dtype=None):
    """Create an array from (nested) sequences / scalars / arrays.

    Mirrors ``nd.array`` (ref: nd_array.js:23-100) including dtype
    inference: python ints -> int32, floats -> float, complex -> complex.
    Python floats default to :data:`nd4js_tpu.config.default_float`
    (float32 on TPU) rather than the reference's float64.
    """
    dtype = _resolve_dtype(dtype)
    if dtype is None:
        a = np.asarray(content)
        if a.dtype == np.float64:
            dtype = default_float
        elif a.dtype in (np.int64, np.int32, np.int16, np.int8, bool):
            dtype = jnp.int32
        elif a.dtype == np.complex128:
            dtype = jnp.complex64 if default_float == jnp.float32 \
                else jnp.complex128
        else:
            dtype = a.dtype
        return jnp.asarray(a, dtype=dtype)
    return jnp.asarray(content, dtype=dtype)


def asarray(content, dtype=None):
    """Pass arrays through (converting dtype only if given), otherwise
    behave like :func:`array` (ref: nd_array.js:102-126)."""
    dtype = _resolve_dtype(dtype)
    if isinstance(content, (jax.Array, np.ndarray)):
        return jnp.asarray(content) if dtype is None \
            else jnp.asarray(content, dtype=dtype)
    return array(content, dtype=dtype)


def tabulate(shape, dtype=None, idx2val: Callable | None = None):
    """Build an array from an index function (ref: tabulate.js:23).

    ``idx2val`` receives one int32 index array per dimension, already
    broadcast to ``shape``, and must compute the values vectorised:

        tabulate((3, 4), 'float32', lambda i, j: i * 10 + j)

    The two-arg form ``tabulate(shape, idx2val)`` is also accepted.
    """
    if idx2val is None and callable(dtype):
        dtype, idx2val = None, dtype
    if idx2val is None:
        raise TypeError("tabulate() requires an index function")
    shape = tuple(int(s) for s in shape)
    dtype = _resolve_dtype(dtype)
    if len(shape) == 0:
        val = idx2val()
        return jnp.asarray(val, dtype=dtype)
    grids = [
        jax.lax.broadcasted_iota(jnp.int32, shape, d)
        for d in range(len(shape))
    ]
    out = idx2val(*grids)
    out = jnp.asarray(out)
    out = jnp.broadcast_to(out, shape)
    return out.astype(dtype) if dtype is not None else out


def zip_elems(arrays, mapper: Callable | None = None, dtype=None):
    """N-ary elementwise map with full NumPy broadcasting
    (ref: zip_elems.js:23-89).

    ``mapper`` receives the broadcasted arrays (vectorised) and returns the
    result array; defaults to tuple-less identity only when a single array
    is given. ``zip_elems([a, b], lambda x, y: x*y + 1)``.
    """
    if callable(arrays) and mapper is not None and not callable(mapper):
        arrays, mapper = mapper, arrays  # tolerate swapped order
    arrays = [asarray(a) for a in (arrays if isinstance(arrays, (list, tuple)) else [arrays])]
    dtype = _resolve_dtype(dtype)
    shape = np.broadcast_shapes(*[a.shape for a in arrays])
    bs = [jnp.broadcast_to(a, shape) for a in arrays]
    if mapper is None:
        if len(bs) != 1:
            raise TypeError("zip_elems() with multiple arrays requires a mapper")
        out = bs[0]
    else:
        out = jnp.asarray(mapper(*bs))
        out = jnp.broadcast_to(out, shape)
    return out.astype(dtype) if dtype is not None else out


def concat(arrays, axis: int = 0, dtype=None):
    """Concatenate along ``axis`` with dtype promotion
    (ref: concat.js:23)."""
    arrays = [asarray(a) for a in arrays]
    dtype = _resolve_dtype(dtype)
    if dtype is None:
        dtype = dt.super_dtype(*[a.dtype for a in arrays])
    return jnp.concatenate([a.astype(dtype) for a in arrays], axis=axis)


def stack(arrays, axis: int = 0, dtype=None):
    """Stack along a new ``axis`` (ref: stack.js:23)."""
    arrays = [asarray(a) for a in arrays]
    dtype = _resolve_dtype(dtype)
    if dtype is None:
        dtype = dt.super_dtype(*[a.dtype for a in arrays])
    return jnp.stack([a.astype(dtype) for a in arrays], axis=axis)


def map_elems(a, mapper: Callable, dtype=None):
    """Elementwise map (ref: nd_array.js:353). Vectorised mapper."""
    return zip_elems([a], mapper, dtype=dtype)


def reduce_elems(a, axes=None, reducer: Callable | None = None,
                 dtype=None, initial=None):
    """Reduce over ``axes`` with a binary reducer
    (ref: nd_array.js:464-529).

    For the common reducers pass jnp functions directly; an arbitrary
    binary ``reducer(acc, x)`` is applied via an associative-scan-free
    sequential fold (use only for small axes).
    """
    a = asarray(a, dtype=dtype)
    if reducer is None:
        raise TypeError("reduce_elems() requires a reducer")
    if axes is None:
        axes = tuple(range(a.ndim))
    elif isinstance(axes, int):
        axes = (axes,)
    axes = tuple(sorted(ax % a.ndim for ax in axes))
    # fast paths for the usual suspects
    fast = {jnp.add: jnp.sum, jnp.multiply: jnp.prod,
            jnp.maximum: jnp.max, jnp.minimum: jnp.min}
    if reducer in fast:
        return fast[reducer](a, axis=axes)
    # generic fold: move reduce axes to front, flatten, lax.reduce via scan
    perm = axes + tuple(i for i in range(a.ndim) if i not in axes)
    moved = jnp.transpose(a, perm)
    red_size = int(np.prod([a.shape[i] for i in axes], dtype=np.int64)) \
        if axes else 1
    flat = moved.reshape((red_size,) + moved.shape[len(axes):])
    if initial is None:
        acc0, rest = flat[0], flat[1:]
    else:
        acc0, rest = jnp.broadcast_to(jnp.asarray(initial, a.dtype),
                                      flat.shape[1:]), flat
    def body(acc, x):
        return reducer(acc, x), None
    acc, _ = jax.lax.scan(body, acc0, rest)
    return acc


def slice_elems(a, *slices):
    """NumPy-style slicing with the reference's syntax
    (ref: nd_array.js:531-645).

    Accepted per-axis specifiers: an int (drops the axis), a python
    ``slice``, a list/tuple ``[start, end, step]`` (entries may be None),
    ``'new'`` (inserts a length-1 axis) and ``'...'`` (Ellipsis).
    """
    a = asarray(a)
    idx = []
    for s in slices:
        if s is Ellipsis or (isinstance(s, str) and s == "..."):
            idx.append(Ellipsis)
        elif isinstance(s, str) and s == "new":
            idx.append(None)
        elif isinstance(s, (list, tuple)):
            start, end, step = (list(s) + [None, None, None])[:3]
            idx.append(slice(start, end, step))
        else:
            idx.append(s)
    return a[tuple(idx)]
