"""Optimizer basin-convergence property sweeps.

The reference drives every minimizer over the shared test-function
suite from sweeps of start points (ref: /root/reference/src/opt/
lbfgs_test.js, _dogleg_test_fn.js style forEachItemIn sweeps). These
sweeps start inside each function's convergence basin (a ball around
the known minimum) — the badly-scaled functions are excluded where a
generic start is outside any reasonable basin. Scale trials with
ND4JS_TPU_DEEP (tests/utils.trials).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nd4js_tpu import opt
from tests.utils import TestRNG, trials

_FNS = [opt.test_fn.rosenbrock, opt.test_fn.beale,
        opt.test_fn.helical_valley, opt.test_fn.freudenstein_roth]


def _starts(fn, rng, k, radius=0.35):
    x_min = np.asarray(fn.minima[0], np.float64)
    scale = radius * (1.0 + np.abs(x_min))
    return [x_min + rng.uniform(-1.0, 1.0, x_min.size) * scale
            for _ in range(k)]


@pytest.mark.parametrize("fn", _FNS, ids=lambda f: f.name)
def test_lbfgs_basin_sweep(fn):
    rng = TestRNG(f"lbfgs-basin-{fn.name}")
    vg = jax.value_and_grad(fn)
    for x0 in _starts(fn, rng, trials(3)):
        x, f, g, it = opt.lbfgs_minimize(vg, jnp.asarray(x0),
                                         max_iter=500)
        scale = max(1.0, float(jnp.abs(f)))
        assert float(jnp.abs(g).max()) <= 1e-5 * scale, \
            (fn.name, x0, float(jnp.abs(g).max()))


@pytest.mark.parametrize("fn", _FNS, ids=lambda f: f.name)
def test_dogleg_basin_sweep(fn):
    rng = TestRNG(f"dogleg-basin-{fn.name}")
    for x0 in _starts(fn, rng, trials(2)):
        x, f, g, it = opt.min_dogleg(fn, jnp.asarray(x0), max_iter=500)
        scale = max(1.0, float(jnp.abs(f)))
        assert float(jnp.abs(g).max()) <= 1e-4 * scale, \
            (fn.name, x0, float(jnp.abs(g).max()))


@pytest.mark.parametrize("fn", _FNS, ids=lambda f: f.name)
def test_lbfgsb_unbounded_matches_lbfgs(fn):
    """L-BFGS-B with infinite bounds is plain L-BFGS: same basin sweep
    must converge (exercises the GCP/subspace machinery end-to-end)."""
    rng = TestRNG(f"lbfgsb-basin-{fn.name}")
    vg = jax.value_and_grad(fn)
    n = len(fn.minima[0])
    lo = jnp.full((n,), -jnp.inf)
    hi = jnp.full((n,), jnp.inf)
    for x0 in _starts(fn, rng, trials(2)):
        x, f, g, it = opt.lbfgsb_minimize(vg, jnp.asarray(x0),
                                          (lo, hi), max_iter=500)
        scale = max(1.0, float(jnp.abs(f)))
        assert float(jnp.abs(g).max()) <= 1e-4 * scale, \
            (fn.name, x0, float(jnp.abs(g).max()))
