"""Typed error carrying the best-effort solution.

Parity with /root/reference/src/la/singular_matrix_solve_error.js:22 —
the reference throws from inside kernels; here the error exists only at
the eager (non-traced) API boundary. Inside jit, rank-deficiency is a
status you query via ``rrqr_rank``/``svd_rank`` and the solvers return
the same masked best-effort solution this error carries.
"""
from __future__ import annotations

__all__ = ["SingularMatrixSolveError"]


class SingularMatrixSolveError(ArithmeticError):
    """Raised by square-solve facades when the matrix is numerically
    singular. ``.x`` carries the best-effort (rank-truncated) solution,
    like the reference."""

    def __init__(self, x, message: str = "Matrix is singular."):
        super().__init__(message)
        self.x = x
