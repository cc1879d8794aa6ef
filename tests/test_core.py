"""Core ND-array + dtype tests (contracts from /root/reference/src/
nd_array_test.js, zip_elems_test.js, tabulate_test.js, dt/*_test.js)."""
import numpy as np
import jax.numpy as jnp
import pytest

import nd4js_tpu as nd
from nd4js_tpu import dt
from tests.utils import assert_all_close


def test_array_dtype_inference():
    assert nd.array([1, 2, 3]).dtype == jnp.int32
    assert nd.array([1.0, 2.0]).dtype == nd.config.default_float
    assert nd.array([1, 2], dtype="float64").dtype == jnp.float64
    assert nd.asarray(np.arange(3.0)).dtype == jnp.float64


def test_super_dtype_lattice():
    assert dt.super_dtype("int32", "float32") == jnp.float32
    assert dt.super_dtype("float32", "float64") == jnp.float64
    assert dt.super_dtype("float64", "complex128") == jnp.complex128
    assert dt.super_dtype("int32", "int32") == jnp.int32
    assert dt.is_subdtype("int32", "float32")
    assert not dt.is_subdtype("float64", "float32")


def test_dtypeof():
    assert dt.dtypeof(3) == "int32"
    assert dt.dtypeof(2 ** 40) == "float64"
    assert dt.dtypeof(1.5) == "float64"
    assert dt.dtypeof(1 + 2j) == "complex128"


def test_eps_and_float_utils():
    assert dt.eps("float64") == np.finfo(np.float64).eps
    assert dt.eps("float32") == pytest.approx(1.1920928955078125e-7)
    x = jnp.float64(1.0)
    assert dt.next_up(x) > 1.0
    assert dt.next_down(x) < 1.0
    assert float(dt.midl(2.0, 4.0)) == 3.0
    assert np.isfinite(float(dt.midl(1e308, 1.5e308)))


def test_bit_count():
    vals = np.array([0, 1, 2, 3, 255, 2**31 - 1], dtype=np.int64)
    got = np.asarray(dt.bit_count(vals.astype(np.uint32)))
    want = np.array([bin(v).count("1") for v in vals])
    np.testing.assert_array_equal(got, want)


def test_tabulate(rng):
    a = nd.tabulate((3, 4), "float64", lambda i, j: i * 10 + j)
    want = np.arange(3)[:, None] * 10 + np.arange(4)
    assert_all_close(a, want)
    # two-arg form
    b = nd.tabulate((5,), lambda i: i * i)
    assert_all_close(b, np.arange(5) ** 2)


def test_zip_elems_broadcasting(rng):
    a = rng.matrix(3, 1, 4)
    b = rng.matrix(2, 4)
    out = nd.zip_elems([a, b], lambda x, y: x * y + 1)
    assert out.shape == (3, 2, 4)
    assert_all_close(out, a * b + 1)


def test_concat_stack_promotion():
    a = nd.array([1, 2], dtype="int32")
    b = nd.array([1.5, 2.5], dtype="float64")
    c = nd.concat([a, b])
    assert c.dtype == jnp.float64
    assert c.shape == (4,)
    s = nd.stack([a, a], axis=0)
    assert s.shape == (2, 2)


def test_slice_elems(rng):
    a = jnp.asarray(rng.matrix(6, 8))
    an = np.asarray(a)
    assert_all_close(nd.slice_elems(a, [1, 5, 2], [None, None, 3]),
                     an[1:5:2, ::3])
    assert_all_close(nd.slice_elems(a, 2, "..."), an[2, ...])
    out = nd.slice_elems(a, "new", [None, 3])
    assert out.shape == (1, 3, 8)
    assert_all_close(out, an[None, :3])


def test_reduce_elems(rng):
    a = jnp.asarray(rng.matrix(4, 5))
    got = nd.reduce_elems(a, 1, jnp.add)
    assert_all_close(got, np.asarray(a).sum(axis=1))
    got2 = nd.reduce_elems(a, None, lambda x, y: jnp.maximum(x, y) + 0)
    assert_all_close(got2, np.asarray(a).max())


def test_kahan_sum():
    from nd4js_tpu.core import kahan_sum
    x = jnp.asarray(np.array([1e16, 1.0, -1e16, 1.0]))
    assert float(kahan_sum(x)) == 2.0
