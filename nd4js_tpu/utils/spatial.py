"""Spatial search: k-nearest-neighbours.

Parity with /root/reference/src/spatial/kd_tree.js:89 (`KDTree` with
quick-select median build + `nearest_gen` heap traversal).

TPU-first redesign: a KD-tree is a pointer-chasing structure built for
scalar CPUs; on TPU the same capability — k-NN queries over a fixed
point set — is a masked brute-force distance computation: one GEMM-
shaped pairwise-distance kernel + top_k, which beats tree traversal for
any point count that fits in HBM. The class keeps the reference's
surface (`nearest`, `nearest_gen`).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.mm import mm, mt

__all__ = ["KDTree"]


class KDTree:
    """k-NN index over an (N, D) point set."""

    def __init__(self, points):
        self.points = jnp.asarray(points)
        if self.points.ndim != 2:
            raise ValueError("KDTree expects (N, D) points")
        self._sq = jnp.sum(self.points * self.points, axis=1)

    def nearest(self, queries, k: int = 1):
        """Indices and distances of the k nearest points for each query.

        queries: (Q, D) or (D,). Returns (dist (Q, k), idx (Q, k)).
        """
        q = jnp.asarray(queries)
        single = q.ndim == 1
        if single:
            q = q[None, :]
        # ‖p−q‖² = ‖p‖² − 2·q·pᵀ + ‖q‖²
        cross = mm(q, mt(self.points))
        d2 = self._sq[None, :] - 2 * cross \
            + jnp.sum(q * q, axis=1)[:, None]
        d2 = jnp.maximum(d2, 0.0)
        neg, idx = jax.lax.top_k(-d2, k)
        dist = jnp.sqrt(-neg)
        if single:
            return dist[0], idx[0]
        return dist, idx

    def nearest_gen(self, query):
        """Yield (distance, index) pairs in increasing distance — the
        reference's lazy traversal (kd_tree.js `nearest_gen`)."""
        n = self.points.shape[0]
        dist, idx = self.nearest(jnp.asarray(query), k=n)
        for d, i in zip(dist.tolist(), idx.tolist()):
            yield d, int(i)
