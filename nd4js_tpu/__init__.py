"""nd4js_tpu — a TPU-native dense linear-algebra & optimization framework.

A ground-up JAX/XLA/Pallas rebuild of the capability surface of nd4js
(/root/reference, pure-JavaScript CPU library): ND-array core, the full
dense decomposition suite (LU, Cholesky, LDLᵀ, Bunch-Kaufman, QR/RRQR/
SRRQR/URV, bidiagonal, Hessenberg, Schur, eigen, SVD family), rank-aware
solve/lstsq, and nonlinear optimization (L-BFGS(-B), trust-region
Levenberg-Marquardt, dogleg, ODR), plus rand/io/iter/spatial/geom/
integrate utility subpackages.

Everything is functional, jit/vmap-compatible, batched over leading
dimensions with NumPy broadcasting, and shardable over a device mesh via
``nd4js_tpu.parallel``.
"""
from . import config, dt
from .core import (array, asarray, tabulate, zip_elems, concat, stack,
                   map_elems, reduce_elems, slice_elems)
from . import la

__version__ = "0.1.0"
