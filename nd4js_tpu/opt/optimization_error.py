"""Typed optimisation errors.

Parity with /root/reference/src/opt/optimization_error.js:23. Raised
only at the eager (generator) boundary; in-graph drivers surface the
same condition as an early exit with the stuck counter in their state.
"""
from __future__ import annotations

__all__ = ["OptimizationNoProgressError"]


class OptimizationNoProgressError(RuntimeError):
    def __init__(self, message: str = "Optimization makes no progress.",
                 x=None):
        super().__init__(message)
        self.x = x
