"""Back-compat shim: the strong-Wolfe engine moved to ``_engine.py``,
which adds polynomial (secant/quadratic/cubic) trial selection and the
bounded (αMax) search. ``wolfe_line_search`` keeps its old signature."""
from ._engine import wolfe_line_search, line_search_engine  # noqa: F401

__all__ = ["wolfe_line_search", "line_search_engine"]
