"""nelder_mead / newton / fit_lin / test_fn contracts
(ref: src/opt/nelder_mead_test.js, newton_test.js, fit_lin_test.js,
_generic_test_test_fn.js)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nd4js_tpu import opt
from nd4js_tpu.utils import regular_simplex
from tests.utils import assert_all_close, TestRNG


def test_regular_simplex():
    for n in [1, 2, 3, 7]:
        v = np.asarray(regular_simplex(n, jnp.float64))
        assert v.shape == (n + 1, n)
        # pairwise equidistant
        d = np.linalg.norm(v[:, None] - v[None, :], axis=-1)
        off = d[~np.eye(n + 1, dtype=bool)]
        assert np.allclose(off, off[0], rtol=1e-12)
        # centred
        assert np.abs(v.mean(axis=0)).max() < 1e-12


def test_nelder_mead_beale():
    x, f, it = opt.min_nelder_mead(opt.test_fn.beale,
                                   jnp.asarray([1.0, 1.0]), scale=0.5)
    assert_all_close(x, [3.0, 0.5], atol=1e-4)


def test_nelder_mead_gen():
    f = lambda x: jnp.sum((x - 1.5) ** 2)
    gen = opt.min_nelder_mead_gen(f, jnp.zeros(3))
    for i, (x, fv) in enumerate(gen):
        if float(fv) < 1e-14 or i > 400:
            break
    assert_all_close(x, 1.5, atol=1e-6)


def test_root_newton():
    def fJ(x):
        F = jnp.stack([x[0] ** 2 + x[1] ** 2 - 4, x[0] - x[1]])
        J = jnp.asarray([[2 * x[0], 2 * x[1]], [1.0, -1.0]])
        return F, J
    x, it = opt.root_newton(fJ, jnp.asarray([1.0, 2.0]))
    assert_all_close(x, [np.sqrt(2), np.sqrt(2)], atol=1e-10)
    # generator form
    gen = opt.root_newton_gen(fJ, jnp.asarray([1.0, 2.0]))
    for i, x in enumerate(gen):
        if i >= 20:
            break
    assert_all_close(x, [np.sqrt(2), np.sqrt(2)], atol=1e-10)


def test_fit_lin_polynomial():
    rng = TestRNG("fit_lin")
    xs = jnp.linspace(-1, 1, 50)
    p_true = [0.5, -2.0, 3.0]
    ys = p_true[0] + p_true[1] * xs + p_true[2] * xs ** 2
    p = opt.fit_lin(xs, ys, [lambda x: jnp.ones_like(x),
                             lambda x: x,
                             lambda x: x ** 2])
    assert_all_close(p, p_true, atol=1e-8)


def test_fit_lin_regularized():
    xs = jnp.linspace(0, 1, 20)
    ys = 2 * xs
    # redundant basis (x appears twice): ridge picks the min-norm split
    p = opt.fit_lin(xs, ys, [lambda x: x, lambda x: x],
                    regularization=1e-6)
    assert_all_close(p, [1.0, 1.0], atol=1e-4)


def test_test_fns_self_verify():
    """Port of _generic_test_test_fn.js: gradients must match num_grad,
    minima must be stationary."""
    rng = TestRNG("test_fns")
    for fn in opt.test_fn.TEST_FNS:
        for x_min in fn.minima:
            x_min = jnp.asarray(x_min, jnp.float64)
            g = np.asarray(fn.grad(x_min))
            scale = max(1.0, float(jnp.abs(fn(x_min))),
                        float(np.abs(np.asarray(x_min)).max()))
            assert np.abs(g).max() < 1e-3 * scale, \
                f"{fn.name}: gradient at minimum not ~0"
        # AD gradient vs numerical gradient at a random point
        n = fn.ndim or 2
        x = jnp.asarray(rng.uniform(0.1, 1.0, n))
        g_ad = np.asarray(fn.grad(x))
        g_num = np.asarray(opt.num_grad(fn)(x))
        assert_all_close(g_ad, g_num, rtol=1e-5,
                         atol=1e-5 * max(1, np.abs(g_ad).max()))
