"""ODR + L-BFGS-B contracts (ref: src/opt/_generic_test_odr.js,
lbfgsb_test.js, _generic_test_min_bounded.js)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nd4js_tpu import opt
from tests.utils import assert_all_close, TestRNG


def test_odr_line_fit():
    """Classic ODR sanity: fit a line to data with noise in x AND y —
    ODR must recover the true slope better than plain LSQ when x-noise
    dominates."""
    rng = TestRNG("odr_line")
    p_true = np.array([2.0, -1.0])
    n = 40
    x_clean = np.linspace(0, 4, n)
    x_noisy = x_clean + 0.2 * rng.normal(n)
    y = p_true[0] * x_clean + p_true[1]
    model = lambda p, x: p[0] * x + p[1]
    (p, dx), mse, g, it = opt.odr_lm(
        jnp.asarray(x_noisy), jnp.asarray(y), model,
        jnp.asarray([1.0, 0.0]), max_iter=100)
    assert dx.shape == (n,)
    # the ODR objective at the ODR solution must beat the LSQ solution
    # (with dx = 0), and the solution must be near-stationary
    def odr_obj(pp, dxx):
        return (np.sum(np.asarray(dxx) ** 2)
                + np.sum((np.asarray(model(jnp.asarray(pp),
                                           jnp.asarray(x_noisy + np.asarray(dxx))))
                          - y) ** 2))
    A = np.stack([x_noisy, np.ones(n)], 1)
    p_lsq = np.linalg.lstsq(A, y, rcond=None)[0]
    assert odr_obj(p, dx) < odr_obj(p_lsq, np.zeros(n))
    assert float(jnp.abs(g).max()) < 1e-6


def test_odr_exact_recovery():
    # no noise: ODR must drive both dx and residuals to ~0
    p_true = jnp.asarray([1.5, 0.5])
    xs = jnp.linspace(0.1, 2, 20)
    model = lambda p, x: p[0] * jnp.exp(p[1] * x)
    ys = model(p_true, xs)
    (p, dx), mse, g, it = opt.odr_lm(xs, ys, model,
                                     jnp.asarray([1.0, 0.0]),
                                     max_iter=100)
    assert_all_close(p, p_true, atol=1e-6)
    assert float(jnp.abs(dx).max()) < 1e-6
    assert float(mse) < 1e-12


def test_odr_gen_and_dogleg():
    p_true = jnp.asarray([0.7, 1.2])
    xs = jnp.linspace(0, 1, 15)
    model = lambda p, x: p[0] * x ** 2 + p[1] * x
    ys = model(p_true, xs)
    gen = opt.odr_dogleg_gen(xs, ys, model, jnp.asarray([0.0, 0.0]))
    for i, ((p, dx), mse, g) in enumerate(gen):
        if float(mse) < 1e-16 or i > 100:
            break
    assert_all_close(p, p_true, atol=1e-4)


def test_odr_multidim_x():
    # NX = 2 input dimensions
    rng = TestRNG("odr_2d")
    p_true = jnp.asarray([1.0, -2.0, 0.5])
    X = jnp.asarray(rng.uniform(-1, 1, 25, 2))
    model = lambda p, x: p[0] * x[..., 0] + p[1] * x[..., 1] + p[2]
    y = model(p_true, X)
    (p, dx), mse, g, it = opt.odr_lm(X, y, model, jnp.zeros(3),
                                     max_iter=80)
    assert_all_close(p, p_true, atol=1e-5)
    assert dx.shape == (25, 2)


def test_lbfgsb_bounds_active():
    # unconstrained min at (2, 2); box forces x0 <= 1
    def f(x):
        return jnp.sum((x - 2.0) ** 2)
    x, fv, g, it = opt.lbfgsb_minimize(
        f, jnp.zeros(2), bounds=(jnp.asarray([-5.0, -5.0]),
                                 jnp.asarray([1.0, 5.0])))
    assert_all_close(x, [1.0, 2.0], atol=1e-6)


def test_lbfgsb_interior():
    # bounds inactive: must match unconstrained L-BFGS
    def f(x):
        return jnp.sum(100 * (x[1:] - x[:-1] ** 2) ** 2
                       + (1 - x[:-1]) ** 2)
    x, fv, g, it = opt.lbfgsb_minimize(
        f, jnp.asarray([-1.2, 1.0]), bounds=(-10.0, 10.0),
        max_iter=800)
    assert_all_close(x, 1.0, atol=1e-4)


def test_lbfgsb_gen():
    def f(x):
        return jnp.sum(x ** 2 - x)
    gen = opt.min_lbfgsb_gen(f, jnp.zeros(3), bounds=(0.2, 1.0))
    try:
        for i, (x, fv, g) in enumerate(gen):
            kkt = float(jnp.max(jnp.abs(jnp.clip(x - g, 0.2, 1.0) - x)))
            if kkt < 1e-8 or i > 60:
                break
    except opt.OptimizationNoProgressError:
        pass  # converged: no further progress is possible
    # min of x²-x at 0.5 per coordinate; bound 0.2 inactive
    assert_all_close(x, 0.5, atol=1e-6)


def test_lbfgsb_start_outside_box():
    def f(x):
        return jnp.sum(x ** 2)
    x, fv, g, it = opt.lbfgsb_minimize(
        f, jnp.full(3, 9.0), bounds=(1.0, 5.0))
    assert_all_close(x, 1.0, atol=1e-8)
