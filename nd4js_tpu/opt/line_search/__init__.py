"""Line searches — factory API matching the reference.

Parity with /root/reference/src/opt/line_search/: each search is a
factory ``opt => fg => (x0, f0, g0, negDir) => (x, f, g)`` (the
reference's exact calling convention, albaali_fletcher.js:44). All
searches share the strong-Wolfe engine in ``_wolfe.py``; they differ in
their default (fRed, gRed, grow) options, mirroring the reference's
defaults. ``strong_wolfe`` is the deprecated alias
(ref: strong_wolfe.js:21).
"""
from __future__ import annotations

import warnings

import jax.numpy as jnp

from ._wolfe import wolfe_line_search

__all__ = ["albaali_fletcher", "more_thuente_abc", "more_thuente_u123",
           "strong_wolfe", "LineSearchError", "LineSearchNoProgressError",
           "LineSearchBisectionError", "LineSearchBoundReachedError"]


class LineSearchError(RuntimeError):
    """ref: line_search_error.js:19 — carries the best point found."""

    def __init__(self, message="line search failed", x=None, f=None, g=None):
        super().__init__(message)
        self.x, self.f, self.g = x, f, g


class LineSearchNoProgressError(LineSearchError):
    pass


class LineSearchBisectionError(LineSearchError):
    pass


class LineSearchBoundReachedError(LineSearchError):
    pass


def _make(fRed, gRed, grow):
    def factory(opt=None):
        opt = dict(opt or {})
        c1 = opt.pop("fRed", fRed)
        c2 = opt.pop("gRed", gRed)
        gr = opt.pop("grow", grow)
        maxit = opt.pop("max_iter", 40)
        if opt:
            warnings.warn(f"line search: unknown options {sorted(opt)}")

        def with_fg(fg):
            def search(x0, f0, g0, neg_dir):
                x, f, g, alpha, ok = wolfe_line_search(
                    fg, x0, jnp.asarray(f0), g0, neg_dir,
                    c1=c1, c2=c2, grow=gr, max_iter=maxit)
                return x, f, g
            return search

        return with_fg

    return factory


# reference defaults: albaali_fletcher.js:44 {fRed: 0.4, gRed: 0.8},
# more_thuente_*  {fRed: 1e-4, gRed: 0.9}
albaali_fletcher = _make(0.4, 0.8, 2.0)
more_thuente_abc = _make(1e-4, 0.9, 2.0)
more_thuente_u123 = _make(1e-4, 0.9, 2.0)


def strong_wolfe(opt=None):
    """Deprecated alias (ref: strong_wolfe.js:21-34)."""
    warnings.warn("strong_wolfe is deprecated; use albaali_fletcher",
                  DeprecationWarning)
    return albaali_fletcher(opt)
