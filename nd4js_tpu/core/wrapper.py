"""Optional NDArray wrapper — the reference's object surface.

Parity with /root/reference/src/nd_array.js's NDArray class (callable
element access :128-174, `mapElems` :353, `.T`/`.H` :362-373,
out-of-place `transpose` :375, `reshape` :438, `reduceElems` :464,
`sliceElems` :531, iteration :288-342).

The idiomatic nd4js_tpu API is functional over plain ``jax.Array``; this
wrapper exists so reference users can port code line-by-line. It is a
thin immutable view — every "mutating" method returns a new wrapper —
and interoperates with jnp via ``__jax_array__``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from . import ndarray as _nd

__all__ = ["NDArray", "wrap"]


class NDArray:
    __slots__ = ("data",)
    __array_priority__ = 100

    def __init__(self, data, dtype=None):
        self.data = _nd.asarray(data, dtype=dtype)

    # ---- interop -----------------------------------------------------
    def __jax_array__(self):
        return self.data

    def __array__(self, dtype=None):
        import numpy as np
        return np.asarray(self.data, dtype=dtype)

    # ---- reference surface -------------------------------------------
    @property
    def shape(self):
        return self.data.shape

    @property
    def ndim(self):
        return self.data.ndim

    @property
    def dtype(self):
        return self.data.dtype

    def __call__(self, *indices):
        """Element access a(i, j, ...) (ref: nd_array.js:128-174)."""
        return self.data[tuple(indices)]

    def __getitem__(self, idx):
        return NDArray(self.data[idx])

    def set(self, indices, value):
        """Out-of-place element set (ref: nd_array.js:165 — the
        reference mutates; JAX arrays are immutable)."""
        return NDArray(self.data.at[tuple(indices)].set(value))

    def modify(self, indices, fn):
        """Out-of-place element modify (ref: nd_array.js:172)."""
        idx = tuple(indices)
        return NDArray(self.data.at[idx].set(fn(self.data[idx])))

    @property
    def T(self):
        """Transpose of the trailing two axes (ref: nd_array.js:362)."""
        return NDArray(jnp.swapaxes(self.data, -1, -2)) \
            if self.ndim >= 2 else self

    @property
    def H(self):
        """Conjugate transpose (ref: nd_array.js:368)."""
        out = jnp.conjugate(self.data)
        if self.ndim >= 2:
            out = jnp.swapaxes(out, -1, -2)
        return NDArray(out)

    def transpose(self, *axes):
        """Out-of-place axis permutation (ref: nd_array.js:375)."""
        return NDArray(jnp.transpose(self.data, axes or None))

    def reshape(self, *shape):
        """(ref: nd_array.js:438)."""
        if len(shape) == 1 and isinstance(shape[0], (tuple, list)):
            shape = tuple(shape[0])
        return NDArray(self.data.reshape(shape))

    def map_elems(self, mapper, dtype=None):
        """(ref: nd_array.js:353). Vectorised mapper."""
        return NDArray(_nd.map_elems(self.data, mapper, dtype=dtype))

    mapElems = map_elems

    def reduce_elems(self, axes=None, reducer=None, dtype=None,
                     initial=None):
        """(ref: nd_array.js:464)."""
        out = _nd.reduce_elems(self.data, axes, reducer, dtype=dtype,
                               initial=initial)
        return NDArray(out) if getattr(out, "ndim", 0) else out

    reduceElems = reduce_elems

    def slice_elems(self, *slices):
        """(ref: nd_array.js:531)."""
        return NDArray(_nd.slice_elems(self.data, *slices))

    sliceElems = slice_elems

    # ---- iteration (ref: nd_array.js:288-342) ------------------------
    def __iter__(self):
        for i in range(self.shape[0]):
            sub = self.data[i]
            yield NDArray(sub) if getattr(sub, "ndim", 0) else sub

    def elems(self):
        """Yield (index-tuple, value) pairs (ref: nd_array.js:305)."""
        import numpy as np
        a = np.asarray(self.data)
        for idx in np.ndindex(*a.shape):
            yield idx, a[idx]

    def __len__(self):
        return self.shape[0]

    # ---- arithmetic passthrough ---------------------------------------
    def _lift(self, other):
        return other.data if isinstance(other, NDArray) else other

    def __add__(self, o):
        return NDArray(self.data + self._lift(o))

    def __radd__(self, o):
        return NDArray(self._lift(o) + self.data)

    def __sub__(self, o):
        return NDArray(self.data - self._lift(o))

    def __rsub__(self, o):
        return NDArray(self._lift(o) - self.data)

    def __mul__(self, o):
        return NDArray(self.data * self._lift(o))

    def __rmul__(self, o):
        return NDArray(self._lift(o) * self.data)

    def __truediv__(self, o):
        return NDArray(self.data / self._lift(o))

    def __rtruediv__(self, o):
        return NDArray(self._lift(o) / self.data)

    def __matmul__(self, o):
        from ..la.matmul import matmul2
        return NDArray(matmul2(self.data, self._lift(o)))

    def __neg__(self):
        return NDArray(-self.data)

    def __repr__(self):
        return f"NDArray({self.data!r})"

    def __str__(self):
        return str(self.data)


def wrap(x) -> NDArray:
    return x if isinstance(x, NDArray) else NDArray(x)
