"""solve/det facades (ref: src/la/solve.js, det.js, lstsq.js, rank.js)."""
import numpy as np
import pytest

from nd4js_tpu import la
from tests.utils import assert_all_close, TestRNG


def test_solve():
    rng = TestRNG("solve")
    n = 20
    a = rng.matrix(n, n) + 4 * np.eye(n)
    y = rng.matrix(n, 3)
    x = la.solve(a, y)
    assert_all_close(a @ np.asarray(x), y, rtol=1e-8, atol=1e-8)
    a_sing, _ = rng.rankdef(n, n, rank=10)
    with pytest.raises(la.SingularMatrixSolveError):
        la.solve(a_sing, y)


def test_det():
    rng = TestRNG("det")
    for n in [1, 2, 3, 8, 20]:
        a = rng.matrix(n, n)
        assert_all_close(float(la.det(a)), np.linalg.det(a),
                         rtol=1e-9, atol=1e-12)
    batch = rng.matrix(5, 6, 6)
    assert_all_close(la.det(batch), np.linalg.det(batch),
                     rtol=1e-9, atol=1e-12)


def test_slogdet():
    rng = TestRNG("slogdet")
    a = rng.matrix(15, 15)
    sign, logd = la.slogdet(a)
    s_np, l_np = np.linalg.slogdet(a)
    assert float(sign) == pytest.approx(s_np)
    assert float(logd) == pytest.approx(l_np, rel=1e-9)


def test_det_tri():
    rng = TestRNG("det_tri")
    L = np.tril(rng.matrix(7, 7)) + 3 * np.eye(7)
    assert_all_close(float(la.det_tri(L)), np.prod(np.diag(L)), rtol=1e-12)
    sign, logd = la.slogdet_tri(L)
    assert float(sign) == np.prod(np.sign(np.diag(L)))
    assert_all_close(float(logd), np.log(np.abs(np.diag(L))).sum(),
                     rtol=1e-12)
