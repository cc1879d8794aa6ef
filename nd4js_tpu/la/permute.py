"""Row/column permutation application.

Parity with /root/reference/src/la/permute.js:23,95,166,238. Permutations
are int32 index vectors ``P`` with ``out[i] = in[P[i]]`` (permute) and the
scatter inverse for unpermute — implemented as gathers, which XLA lowers
to efficient dynamic-gather on TPU.
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["permute_rows", "permute_cols", "unpermute_rows", "unpermute_cols",
           "invert_permutation"]


def invert_permutation(p):
    """Index vector q with q[p[i]] = i, batched over leading dims."""
    p = jnp.asarray(p)
    return jnp.argsort(p, axis=-1).astype(p.dtype)


def permute_rows(a, p):
    """out[..., i, :] = a[..., p[i], :] (ref: permute.js:23)."""
    a, p = jnp.asarray(a), jnp.asarray(p)
    return jnp.take_along_axis(a, p[..., :, None], axis=-2)


def permute_cols(a, p):
    """out[..., :, j] = a[..., :, p[j]] (ref: permute.js:95)."""
    a, p = jnp.asarray(a), jnp.asarray(p)
    return jnp.take_along_axis(a, p[..., None, :], axis=-1)


def unpermute_rows(a, p):
    """Inverse of :func:`permute_rows` (ref: permute.js:166)."""
    return permute_rows(a, invert_permutation(p))


def unpermute_cols(a, p):
    """Inverse of :func:`permute_cols` (ref: permute.js:238)."""
    return permute_cols(a, invert_permutation(p))
