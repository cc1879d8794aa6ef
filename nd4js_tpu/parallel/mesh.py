"""Device-mesh batching: the inter-chip half of the vmap seam.

The reference is single-threaded; its hand-rolled broadcast loops over
leading dims (SURVEY.md §2, e.g. /root/reference/src/la/lu.js:132-173)
map to ``jax.vmap`` intra-chip (core/batch.py) and to sharding the batch
dimension over a ``jax.sharding.Mesh`` inter-chip — this module.

Because every routine in nd4js_tpu is a pure function whose batch dim is
leading, inter-chip scaling is purely data-parallel over ICI: annotate
the batch axis with a NamedSharding and let XLA partition; no collective
beyond what XLA inserts is required (the per-matrix kernels are local).
``batch_sharded(f, mesh)`` returns f jitted with its array arguments'
leading axis sharded over the mesh's 'batch' axis.
"""
from __future__ import annotations

import functools

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_batch", "batch_sharded"]


def make_mesh(axes=None, devices=None):
    """Create a Mesh. Default: 1-D 'batch' mesh over all devices."""
    if devices is None:
        devices = jax.devices()
    if axes is None:
        axes = {"batch": len(devices)}
    names = tuple(axes.keys())
    shape = tuple(axes.values())
    dev = np.asarray(devices)[: int(np.prod(shape))].reshape(shape)
    return Mesh(dev, names)


def shard_batch(x, mesh, axis_name: str = "batch"):
    """Place ``x`` with its leading axis sharded over ``axis_name``."""
    spec = P(axis_name, *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def batch_sharded(f, mesh, axis_name: str = "batch"):
    """jit ``f`` with every array argument's leading axis sharded over
    the mesh ``axis_name`` (data parallelism over ICI)."""

    @functools.wraps(f)
    def wrapper(*args):
        args = [shard_batch(jax.numpy.asarray(a), mesh, axis_name)
                for a in args]
        return jax.jit(f)(*args)

    return wrapper
