"""LM / dogleg trust-region contracts (ref: src/opt/lm_test.js,
dogleg_test.js, _generic_test_lsq.js, _generic_test_fit.js):
monotone loss decrease, convergence on curve fits and classic test
problems."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nd4js_tpu import opt
from tests.utils import assert_all_close, TestRNG


def _exp_model(p, x):
    return p[0] * jnp.exp(p[1] * x)


def _rosenbrock_residuals(x):
    # rosenbrock as least squares: F = [10(x1-x0^2), 1-x0]
    F = jnp.stack([10 * (x[1] - x[0] ** 2), 1 - x[0]])
    J = jnp.asarray([[-20 * x[0], 10.0], [-1.0, 0.0]])
    return F, J


def test_lsq_lm_rosenbrock():
    x, mse, g, it = opt.lsq_lm(_rosenbrock_residuals,
                               jnp.asarray([-1.2, 1.0]), max_iter=100)
    assert_all_close(x, [1.0, 1.0], atol=1e-7)
    assert float(mse) < 1e-14


def test_lsq_dogleg_rosenbrock():
    x, mse, g, it = opt.lsq_dogleg(_rosenbrock_residuals,
                                   jnp.asarray([-1.2, 1.0]), max_iter=200)
    assert_all_close(x, [1.0, 1.0], atol=1e-6)


def test_fit_lm_exponential():
    rng = TestRNG("fit_lm")
    p_true = jnp.asarray([2.5, -1.3])
    xs = jnp.linspace(0, 2, 50)
    ys = _exp_model(p_true, xs)
    p, mse, g, it = opt.fit_lm(xs, ys, _exp_model,
                               jnp.asarray([1.0, 0.0]))
    assert_all_close(p, p_true, atol=1e-6)


def test_fit_lm_gen_monotone():
    rng = TestRNG("fit_lm_gen")
    p_true = jnp.asarray([1.5, -0.7])
    xs = jnp.linspace(0, 2, 30)
    ys = _exp_model(p_true, xs) + 0.01 * jnp.asarray(rng.normal(30))
    gen = opt.fit_lm_gen(xs, ys, _exp_model, jnp.asarray([1.0, 0.0]))
    prev = np.inf
    try:
        for i, (p, mse, g) in enumerate(gen):
            assert float(mse) <= prev + 1e-12, "loss must decrease monotonely"
            prev = float(mse)
            if i > 40:
                break
    except opt.OptimizationNoProgressError:
        pass  # converged to the noise floor — reference throws here too
    assert_all_close(p, p_true, atol=0.05)


def test_fit_dogleg_gen():
    p_true = jnp.asarray([0.8, -2.0])
    xs = jnp.linspace(0, 1, 25)
    ys = _exp_model(p_true, xs)
    gen = opt.fit_dogleg_gen(xs, ys, _exp_model, jnp.asarray([1.0, -1.0]))
    for i, (p, mse, g) in enumerate(gen):
        if float(mse) < 1e-20 or i > 80:
            break
    assert_all_close(p, p_true, atol=1e-5)


def test_min_dogleg_rosenbrock():
    def f(x):
        return jnp.sum(100 * (x[1:] - x[:-1] ** 2) ** 2
                       + (1 - x[:-1]) ** 2)
    x, fv, g, it = opt.min_dogleg(f, jnp.asarray([-1.2, 1.0]),
                                  max_iter=600)
    assert_all_close(x, 1.0, atol=1e-4)


def test_lm_rank_deficient_jacobian():
    # jacobian has a dead column (parameter 2 unused)
    def fJ(x):
        F = jnp.stack([x[0] - 1, x[1] - 2, x[0] + x[1] - 3])
        J = jnp.asarray([[1.0, 0, 0], [0, 1, 0], [1, 1, 0]])
        return F, J
    x, mse, g, it = opt.lsq_lm(fJ, jnp.zeros(3), max_iter=60)
    assert float(mse) < 1e-12
    assert abs(float(x[2])) < 1e-6  # unused parameter untouched


def test_lsq_lm_jittable_and_vmappable():
    def fJ(x):
        F = jnp.stack([x[0] ** 2 - 2, x[1] - x[0]])
        J = jnp.asarray([[2 * x[0], 0.0], [-1.0, 1.0]])
        return F, J
    run = jax.jit(lambda x0: opt.lsq_lm(fJ, x0, max_iter=60)[0])
    x = run(jnp.asarray([1.0, 0.0]))
    assert_all_close(x, [np.sqrt(2), np.sqrt(2)], atol=1e-6)
    xs = jax.vmap(lambda x0: opt.lsq_lm(fJ, x0, max_iter=60)[0])(
        jnp.asarray([[1.0, 0.0], [2.0, 1.0]]))
    assert xs.shape == (2, 2)


def test_newton_step_minimum_norm_rank_deficient():
    """Rank-deficient J: the Gauss-Newton step must be the minimum-
    ‖D·dx‖ solution (ref: _trust_region_solver_lsq.js:337-377, URV
    branch), not an arbitrary bounded one."""
    from nd4js_tpu.opt._trust_region import lsq_state, newton_step
    rng = TestRNG("tr-minnorm")
    for m, n, r in [(8, 5, 3), (12, 6, 2), (5, 5, 4), (4, 7, 3)]:
        a, _ = rng.rankdef(m, n, rank=r, dtype=jnp.float64)
        j = np.asarray(a, np.float64)
        f = np.asarray(rng.matrix(m, 1), np.float64)[:, 0]
        st = lsq_state(jnp.zeros(n, jnp.float64), jnp.asarray(f),
                       jnp.asarray(j))
        dx, dnorm, dr = jax.jit(newton_step)(st)
        dx = np.asarray(dx)
        d = np.asarray(st.d)
        # residual-optimal: matches numpy's min-norm lstsq residual
        x_np = np.linalg.lstsq(j, -f, rcond=1e-10)[0]
        assert np.linalg.norm(j @ dx + f) <= \
            np.linalg.norm(j @ x_np + f) + 1e-8
        # minimum D-norm among residual minimisers: project onto the
        # nullspace of J — min-norm solution has no D^-2-weighted
        # nullspace component
        _, sv, vt = np.linalg.svd(j)
        null = vt[r:]                       # (n-r, n) nullspace basis
        # dx minimises ||D dx|| <=> D^2 dx ⟂ null(J)
        assert np.abs(null @ (d * d * dx)).max() < 1e-8 * max(
            1.0, np.abs(d * d * dx).max())
        assert np.isclose(float(dnorm), np.linalg.norm(d * dx), atol=1e-10)
        assert float(dr) <= 0.0
