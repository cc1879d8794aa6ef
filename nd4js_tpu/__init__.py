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
from . import math
from .core import (array, asarray, tabulate, zip_elems, concat, stack,
                   map_elems, reduce_elems, slice_elems)
from . import la
from . import opt
from . import rand
from . import io
from . import utils
from . import parallel
from .utils import (linspace, cartesian_prod, KDTree, odeint_rk4,
                    regular_simplex)
from .core.wrapper import NDArray, wrap
from .help import help

# flat namespace aliases matching /root/reference/src/index.js
iter = utils.iter
spatial = utils.spatial
geom = utils.geom
integrate = utils.integrate
arrays = utils.arrays

__version__ = "0.1.0"
