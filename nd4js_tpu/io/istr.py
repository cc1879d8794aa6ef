""""istr" compact text serialization of arrays — reference wire format.

Parity with /root/reference/src/io/istr.js: ``istr_stringify``
(istr.js:86-109) emits ``dtype[d1,d2,...]`` followed by a newline and
the base64 of the little-endian raw bytes, line-wrapped every
``linewidth`` characters (io/b64.js:86-119, default 128, '='-padded);
``istr_parse`` (istr.js:26-84) reads the dtype up to ``[``, the
comma-separated shape up to ``]`` (``[]`` means scalar), then feeds
every remaining character to the base64 decoder, which skips the
whitespace class ``\\f\\n\\r\\t\\v `` and stops at ``=``
(io/b64.js:20,55-57). Data serialized by the reference round-trips
bit-exactly; strings in this repo's older ``dtype[shape]:b64`` form
still parse (the ``:`` is tolerated like whitespace).
"""
from __future__ import annotations

import numpy as np

from .b64 import b64_encode, b64_decode

__all__ = ["istr_stringify", "istr_parse"]

# characters the reference's streaming decoder skips (io/b64.js:20)
_SKIP = set("\f\n\r\t\v :")


def istr_stringify(a, pad: bool = True, linewidth: int = 128) -> str:
    """Serialize to the reference istr text format (istr.js:86)."""
    a = np.asarray(a)
    if a.dtype == object:
        raise ValueError("dtype=object not supported")  # istr.js:99
    if not 0 < linewidth:
        raise ValueError(f"invalid linewidth: {linewidth}")
    shape = ",".join(str(int(s)) for s in a.shape)
    le = np.ascontiguousarray(a.astype(a.dtype.newbyteorder("<")))
    body = b64_encode(le)
    if not pad:
        body = body.rstrip("=")
    # reference wraps every `linewidth` b64 chars (io/b64.js:116-118)
    body = "\n".join(body[i:i + linewidth]
                     for i in range(0, len(body), linewidth))
    return f"{a.dtype.name}[{shape}]\n{body}"


def istr_parse(text: str):
    """Parse reference-format istr text back to an array (istr.js:26)."""
    lb = text.index("[")
    rb = text.index("]", lb)
    dtype = text[:lb].strip()
    if dtype == "":
        raise ValueError("dtype=object not (yet) supported")
    shape_s = text[lb + 1:rb].strip()
    shape = tuple(int(s) for s in shape_s.split(",")) if shape_s else ()
    body = "".join(c for c in text[rb + 1:] if c not in _SKIP)
    body = body.split("=", 1)[0]          # decoder stops at '='
    body += "=" * (-len(body) % 4)        # python b64 wants padding back
    return b64_decode(body, np.dtype(dtype).newbyteorder("<"), shape)
