"""Pallas TPU kernels — the native tier of the framework.

The reference's native tier is its hand-scheduled flat-TypedArray inner
loops (SURVEY.md §2: "the 'native tier' of the rebuild is Pallas/Mosaic
kernels"). Each kernel here keeps its working set resident in VMEM for
the whole factorisation panel, turning the reference's cache-blocking
arguments (e.g. /root/reference/src/la/qr.js:53-57) into VMEM blocking.
"""
from .lu_panel import lu_panel
from .house_panel import house_panel
from .jacobi_sweep import jacobi_sweeps
from .rrqr_kernel import rrqr_kernel
from .bulge_chase import bulge_chase_steps
from .schur_small import schur_small

__all__ = ["lu_panel", "house_panel", "jacobi_sweeps", "rrqr_kernel",
           "bulge_chase_steps", "schur_small"]
