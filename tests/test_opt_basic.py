"""Basic optimisation: root finders, gss, num_grad, line search, L-BFGS
(ref: src/opt/root1d_*_test.js, gss_test.js, num_grad_test.js,
_generic_test_line_search.js, _generic_test_min.js)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nd4js_tpu import opt
from tests.utils import assert_all_close, TestRNG


def test_root1d_all():
    f = lambda x: x ** 3 - 2 * x - 5      # root ≈ 2.0945514815423265
    for finder in [opt.root1d_bisect, opt.root1d_brent,
                   opt.root1d_illinois]:
        r = float(finder(f, 2.0, 3.0))
        assert abs(f(r)) < 1e-10, finder.__name__
    # bracket check raises eagerly
    with pytest.raises(ValueError):
        opt.root1d_bisect(f, 3.0, 4.0)


def test_root1d_under_jit():
    f = lambda x: jnp.cos(x) - x
    r = jax.jit(lambda a, b: opt.root1d_brent(f, a, b))(0.0, 1.0)
    assert abs(float(f(r))) < 1e-12


def test_gss():
    f = lambda x: (x - 1.234) ** 2 + 0.5
    x = float(opt.min1d_gss(f, -10.0, 10.0))
    assert abs(x - 1.234) < 1e-7


def test_num_grad():
    f = lambda x: jnp.sum(x ** 3) + jnp.prod(x)
    x = jnp.asarray([1.0, 2.0, 3.0])
    g_num = opt.num_grad(f)(x)
    g_ad = jax.grad(f)(x)
    assert_all_close(g_num, g_ad, rtol=1e-7, atol=1e-7)
    g_fwd = opt.num_grad_forward(f)(x)
    assert_all_close(g_fwd, g_ad, rtol=1e-5, atol=1e-5)


def test_polyquad():
    r0, r1 = opt.roots1d_polyquad(6.0, -5.0, 1.0)   # x²-5x+6 -> 2, 3
    assert float(r0) == pytest.approx(2.0)
    assert float(r1) == pytest.approx(3.0)
    # numerically hard: tiny c0 (catastrophic cancellation case)
    r0, r1 = opt.roots1d_polyquad(1e-12, -1.0, 1.0)
    assert float(r0) == pytest.approx(1e-12, rel=1e-6)


def test_line_search_wolfe():
    # quadratic bowl: exact minimiser along the line
    def fg(x):
        f = jnp.sum((x - 1.0) ** 2)
        return f, 2 * (x - 1.0)
    search = opt.albaali_fletcher()(fg)
    x0 = jnp.zeros(3)
    f0, g0 = fg(x0)
    x, f, g = search(x0, f0, g0, -(-g0))   # negDir = +g0 direction
    assert float(f) < float(f0)
    # strong Wolfe curvature: |g·d| <= c2 |g0·d|
    d = -(-g0) * -1.0
    assert abs(float(jnp.vdot(g, d))) <= 0.8 * abs(float(jnp.vdot(g0, d))) + 1e-12


def test_lbfgs_rosenbrock():
    def f(x):
        return jnp.sum(100 * (x[1:] - x[:-1] ** 2) ** 2
                       + (1 - x[:-1]) ** 2)
    x0 = jnp.asarray([-1.2, 1.0, -0.5, 2.0])
    x, fv, g, it = opt.lbfgs_minimize(f, x0, max_iter=400)
    assert float(fv) < 1e-12
    assert_all_close(x, 1.0, atol=1e-5)


def test_min_lbfgs_gen_user_owns_convergence():
    def fg(x):
        f = jnp.sum((x - 2.0) ** 2) + 1.0
        return f, 2 * (x - 2.0)
    gen = opt.min_lbfgs_gen(fg, jnp.zeros(5))
    for i, (x, f, g) in enumerate(gen):
        if float(jnp.max(jnp.abs(g))) < 1e-9 or i > 100:
            break
    assert_all_close(x, 2.0, atol=1e-7)
    assert float(f) == pytest.approx(1.0)


def test_lbfgs_minimize_jittable():
    def f(x):
        return jnp.sum((x - 3.0) ** 4 + x ** 2)
    run = jax.jit(lambda x0: opt.lbfgs_minimize(f, x0, max_iter=200)[0])
    x = run(jnp.zeros(3))
    g = jax.grad(f)(x)
    assert float(jnp.max(jnp.abs(g))) < 1e-5


def test_lsq_and_fit_lbfgs():
    rng = TestRNG("fit_lbfgs")
    p_true = jnp.asarray([2.0, -0.5])
    xs = jnp.linspace(0, 3, 40)
    model = lambda p, x: p[0] * jnp.exp(p[1] * x)
    ys = model(p_true, xs)
    gen = opt.fit_lbfgs_gen(xs, ys, model, jnp.asarray([1.0, 0.0]))
    for i, (p, mse, g) in enumerate(gen):
        if float(mse) < 1e-18 or i > 300:
            break
    assert_all_close(p, p_true, atol=1e-5)
