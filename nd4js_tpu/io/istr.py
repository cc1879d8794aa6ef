""""istr" compact text serialization of arrays.

Parity with /root/reference/src/io/istr.js (:26 stringify, :86 parse):
a human-readable-ish one-line format ``dtype[shape]:base64(data)``.
The byte payload matches the reference's little-endian layout.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .b64 import b64_encode, b64_decode

__all__ = ["istr_stringify", "istr_parse"]


def istr_stringify(a) -> str:
    a = np.asarray(a)
    shape = ",".join(str(int(s)) for s in a.shape)
    le = a.astype(a.dtype.newbyteorder("<"))
    return f"{a.dtype.name}[{shape}]:{b64_encode(le)}"


def istr_parse(text: str):
    head, data = text.split(":", 1)
    dtype, shape_s = head.split("[", 1)
    shape_s = shape_s.rstrip("]")
    shape = tuple(int(s) for s in shape_s.split(",") if s)
    return b64_decode(data, np.dtype(dtype).newbyteorder("<"),
                      shape).astype(dtype)
