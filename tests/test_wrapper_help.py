"""NDArray wrapper + help layer (ref: src/nd_array.js methods,
src/help.js)."""
import io
import contextlib

import numpy as np
import jax.numpy as jnp

import nd4js_tpu as nd
from tests.utils import assert_all_close


def test_ndarray_wrapper_surface():
    a = nd.NDArray([[1.0, 2.0], [3.0, 4.0]])
    assert a.shape == (2, 2) and a.ndim == 2
    assert float(a(1, 0)) == 3.0                      # callable access
    assert_all_close(np.asarray(a.T), [[1, 3], [2, 4.0]])
    b = a.set((0, 0), 9.0)
    assert float(b(0, 0)) == 9.0 and float(a(0, 0)) == 1.0  # immutable
    c = a.modify((0, 1), lambda v: v * 10)
    assert float(c(0, 1)) == 20.0
    d = (a @ a).map_elems(lambda x: x + 1)
    assert_all_close(np.asarray(d), np.array([[1, 2], [3, 4.]]) @
                     np.array([[1, 2], [3, 4.]]) + 1)
    assert float(a.reduce_elems(None, jnp.add)) == 10.0
    s = a.slice_elems([None, 1], "...")
    assert s.shape == (1, 2)
    rows = list(a)
    assert len(rows) == 2 and float(rows[1](0)) == 3.0
    pairs = dict(a.elems())
    assert pairs[(1, 1)] == 4.0
    # interop with jnp
    assert_all_close(np.asarray(jnp.sum(a.data) + a(0, 0)), 11.0)
    assert_all_close(np.asarray(a.transpose(1, 0)), np.asarray(a.T))
    assert_all_close(np.asarray(a.reshape(4)), [1, 2, 3, 4.0])
    h = nd.NDArray([[1 + 2j]]).H
    assert complex(np.asarray(h)[0, 0]) == 1 - 2j


def test_help():
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        nd.help()
        nd.help(nd.la.svd_decomp)
        nd.help(nd.opt.fit_lm_gen)
    out = buf.getvalue()
    assert "Subpackages" in out
    assert "svd.js:25" in out
    assert "lm.js" in out
