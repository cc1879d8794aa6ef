"""Utility subpackages: geometry, iteration, spatial, integration,
plain-array helpers — parity with the reference's auxiliary domains
(/root/reference/src/geom, iter, spatial, integrate, arrays)."""
from .geom import regular_simplex
from .iter import (linspace, irange, cartesian_prod, repeat,
                   argmin, argmax, imin, imax)
from .spatial import KDTree
from .integrate import rk4_step, odeint_rk4
from .arrays import (binary_search, binary_rangesearch, heap_sort_gen,
                     shuffle, is_array, Comparator, checked_array)
