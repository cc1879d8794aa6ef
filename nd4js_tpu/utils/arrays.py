"""Plain-array helpers.

Parity with /root/reference/src/arrays/: `binary_search`/
`binary_rangesearch` (binary_search.js:20,38), `heap_sort_gen`
incremental sort (heap_sort_gen.js:20), `shuffle` (shuffle.js:22),
`is_array` (is_array.js:40), `Comparator` (comparator.js:20), and
`checked_array` (ref: _checked_array.js:48) — a bounds-checking wrapper
that turns JAX's silent out-of-bounds index *clamping* into an eager
IndexError while config.debug_checks is on (no-op pass-through off).
"""
from __future__ import annotations

import heapq
from typing import Callable, Iterable

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["binary_search", "binary_rangesearch", "heap_sort_gen",
           "shuffle", "is_array", "Comparator", "checked_array"]


class _CheckedArray:
    """Bounds-checking array view (ref: _checked_array.js:48): integer
    indices outside [-len, len) raise IndexError eagerly instead of
    being clamped (jax) or wrapped (numpy's sole negative wrap is kept,
    mirroring the reference's explicit negative-index support)."""

    __slots__ = ("_a",)

    def __init__(self, a):
        self._a = a

    def _check(self, idx):
        if isinstance(idx, tuple):
            for ax, i in enumerate(idx):
                if isinstance(i, (int, np.integer)):
                    n = self._a.shape[ax]
                    if not (-n <= i < n):
                        raise IndexError(
                            f"checked_array: index {i} out of bounds "
                            f"for axis {ax} of size {n}")
        elif isinstance(idx, (int, np.integer)):
            n = self._a.shape[0]
            if not (-n <= idx < n):
                raise IndexError(
                    f"checked_array: index {idx} out of bounds for "
                    f"axis 0 of size {n}")

    def __getitem__(self, idx):
        self._check(idx)
        return self._a[idx]

    def __len__(self):
        return len(self._a)

    def __getattr__(self, name):
        return getattr(self._a, name)

    def __repr__(self):
        return f"checked_array({self._a!r})"


def checked_array(a):
    """Wrap ``a`` in a bounds-checking view when config.debug_checks is
    on; return ``a`` unchanged otherwise (ref: _checked_array.js:48)."""
    from .. import config
    if not config.debug_checks:
        return a
    return _CheckedArray(jnp.asarray(a))


def binary_search(arr, value, compare: Callable | None = None) -> int:
    """Index of ``value`` in sorted ``arr``; ~(insertion point) when
    absent (the reference's bit-complement convention,
    binary_search.js:20)."""
    a = np.asarray(arr) if not isinstance(arr, list) else arr
    lo, hi = 0, len(a)
    cmp = compare or (lambda x, y: (x > y) - (x < y))
    while lo < hi:
        mid = (lo + hi) // 2
        c = cmp(a[mid], value)
        if c == 0:
            return mid
        if c < 0:
            lo = mid + 1
        else:
            hi = mid
    return ~lo


def binary_rangesearch(arr, value, compare: Callable | None = None):
    """(lo, hi) half-open range of entries equal to value
    (ref: binary_search.js:38)."""
    a = list(np.asarray(arr)) if not isinstance(arr, list) else arr
    cmp = compare or (lambda x, y: (x > y) - (x < y))

    def bound(upper: bool):
        lo, hi = 0, len(a)
        while lo < hi:
            mid = (lo + hi) // 2
            c = cmp(a[mid], value)
            if c < 0 or (upper and c == 0):
                lo = mid + 1
            else:
                hi = mid
        return lo

    return bound(False), bound(True)


def heap_sort_gen(items: Iterable, compare: Callable | None = None):
    """Yield items in sorted order incrementally — pay only for what
    you consume (ref: heap_sort_gen.js:20)."""
    if compare is None:
        h = list(items)
        heapq.heapify(h)
        while h:
            yield heapq.heappop(h)
    else:
        import functools
        key = functools.cmp_to_key(compare)
        h = [(key(x), x) for x in items]
        heapq.heapify(h)
        while h:
            yield heapq.heappop(h)[1]


def shuffle(arr, rng=None):
    """Fisher-Yates shuffle (ref: shuffle.js:22). Returns a new array;
    pass an ``nd4js_tpu.rand.RNG`` for reproducibility."""
    if rng is not None:
        return rng.shuffle(jnp.asarray(arr))
    import random
    a = list(np.asarray(arr)) if not isinstance(arr, list) else list(arr)
    random.shuffle(a)
    return a


def is_array(x) -> bool:
    """ref: is_array.js:40."""
    return isinstance(x, (list, tuple, np.ndarray, jax.Array))


class Comparator:
    """Chainable comparator builder (ref: comparator.js:20)."""

    def __init__(self, cmp: Callable | None = None):
        self._cmp = cmp or (lambda x, y: (x > y) - (x < y))

    def __call__(self, x, y):
        return self._cmp(x, y)

    def reversed(self) -> "Comparator":
        return Comparator(lambda x, y: self._cmp(y, x))

    def then(self, other: "Comparator") -> "Comparator":
        def cmp(x, y):
            c = self._cmp(x, y)
            return c if c != 0 else other(x, y)
        return Comparator(cmp)

    def by_key(self, key: Callable) -> "Comparator":
        return Comparator(lambda x, y: self._cmp(key(x), key(y)))
