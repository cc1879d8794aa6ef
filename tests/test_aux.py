"""Auxiliary subsystems: rand, io, iter, spatial, geom, integrate,
arrays (ref: src/rand/alea_rng_test.js, io/npy_test.js, io/istr_test.js,
iter/*_test.js, spatial/kd_tree_test.js, integrate/odeint_rk4_test.js,
arrays/*_test.js)."""
import io as _pyio

import numpy as np
import jax.numpy as jnp
import pytest

import nd4js_tpu as nd
from nd4js_tpu.utils import (binary_search, binary_rangesearch,
                             heap_sort_gen, Comparator, is_array)
from tests.utils import assert_all_close, TestRNG


def test_rng_reproducible():
    a = nd.rand.RNG(7).normal(5)
    b = nd.rand.RNG(7).normal(5)
    assert np.array_equal(np.asarray(a), np.asarray(b))
    c = nd.rand.RNG(8).normal(5)
    assert not np.array_equal(np.asarray(a), np.asarray(c))


def test_rng_ortho_and_rankdef():
    rng = nd.rand.RNG(3)
    q = rng.ortho(4, 6, 6, dtype=jnp.float64)
    err = np.abs(np.einsum("bij,bik->bjk", np.asarray(q), np.asarray(q))
                 - np.eye(6)).max()
    assert err < 1e-12
    a, r = rng.rankdef(8, 5, rank=3, dtype=jnp.float64)
    assert np.linalg.matrix_rank(np.asarray(a), tol=1e-8) == 3


def test_rng_uniform_int_shuffle():
    rng = nd.rand.RNG(1)
    u = np.asarray(rng.uniform(-1, 2, 1000))
    assert u.min() >= -1 and u.max() <= 2
    i = rng.int(0, 10)
    assert 0 <= i < 10
    s = np.asarray(rng.shuffle(jnp.arange(10)))
    assert sorted(s.tolist()) == list(range(10))


def test_deprecated_rand_helpers():
    with pytest.warns(DeprecationWarning):
        q = nd.la.rand_ortho(4, 4)
    assert np.abs(np.asarray(q).T @ np.asarray(q) - np.eye(4)).max() < 1e-5
    with pytest.warns(DeprecationWarning):
        nd.rand.rand_normal(3)


def test_npy_roundtrip_and_numpy_compat():
    rng = TestRNG("npy")
    for dtype in ["float32", "float64", "int32", "complex128"]:
        a = rng.matrix(3, 4).astype(dtype)
        data = nd.io.npy_serialize(a)
        b = np.asarray(nd.io.npy_deserialize(data))
        assert np.array_equal(a, b), dtype
        # numpy can read ours
        assert np.array_equal(np.load(_pyio.BytesIO(data)), a)
        # we can read numpy's
        buf = _pyio.BytesIO()
        np.save(buf, a)
        assert np.array_equal(
            np.asarray(nd.io.npy_deserialize(buf.getvalue())), a)


def test_npy_file_io(tmp_path):
    a = np.arange(12.0).reshape(3, 4)
    path = tmp_path / "a.npy"
    nd.io.save_npy(path, a)
    assert np.array_equal(np.asarray(nd.io.load_npy(path)), a)
    assert np.array_equal(np.load(path), a)


def test_istr_and_b64():
    rng = TestRNG("istr")
    a = rng.matrix(4, 5).astype(np.float32)
    s = nd.io.istr_stringify(a)
    assert isinstance(s, str) and s.startswith("float32[4,5]\n")
    assert np.array_equal(np.asarray(nd.io.istr_parse(s)), a)
    b = nd.io.b64_decode(nd.io.b64_encode(a), np.float32, (4, 5))
    assert np.array_equal(np.asarray(b), a)


def test_istr_reference_wire_format():
    """Exact compatibility with the reference format (io/istr.js:26,86):
    header 'dtype[d1,d2]' + newline + base64 of little-endian bytes,
    wrapped every 128 chars, whitespace skipped on parse."""
    import base64
    rng = TestRNG("istr-wire")
    for dtype in ["float64", "float32", "int32"]:
        a = (rng.matrix(11, 13) * 100).astype(dtype)
        raw = base64.b64encode(
            np.ascontiguousarray(a.astype(a.dtype.newbyteorder("<")))
            .tobytes()).decode("ascii")
        # as the reference emits it: wrapped lines
        wrapped = "\n".join(raw[i:i + 128] for i in range(0, len(raw), 128))
        ref_text = f"{dtype}[11,13]\n{wrapped}"
        assert np.array_equal(np.asarray(nd.io.istr_parse(ref_text)), a)
        # and ours matches byte-for-byte
        assert nd.io.istr_stringify(a) == ref_text
    # scalar: empty shape '[]' (istr.js:48 's.length===0' break)
    sc = np.float64(3.5)
    raw = base64.b64encode(np.asarray(sc).tobytes()).decode("ascii")
    out = nd.io.istr_parse(f"float64[]\n{raw}")
    assert np.asarray(out).shape == () and float(out) == 3.5
    # unpadded base64 (decoder stops at '=' / end: io/b64.js:46-48)
    v = np.arange(3, dtype=np.int32)
    raw = base64.b64encode(v.tobytes()).decode("ascii").rstrip("=")
    assert np.array_equal(np.asarray(nd.io.istr_parse(f"int32[3]\n{raw}")), v)
    # legacy 'dtype[shape]:b64' strings from this repo still parse
    legacy = "int32[3]:" + base64.b64encode(v.tobytes()).decode("ascii")
    assert np.array_equal(np.asarray(nd.io.istr_parse(legacy)), v)


def test_pyon():
    out = nd.io.pyon_parse("{'descr': '<f8', 'shape': (3, 4), 'x': True}")
    assert out == {"descr": "<f8", "shape": (3, 4), "x": True}


def test_kdtree_vs_bruteforce():
    rng = TestRNG("kdtree")
    pts = rng.matrix(200, 3)
    tree = nd.KDTree(pts)
    q = rng.matrix(7, 3)
    dist, idx = tree.nearest(q, k=5)
    dist, idx = np.asarray(dist), np.asarray(idx)
    d_all = np.linalg.norm(q[:, None] - pts[None], axis=-1)
    idx_np = np.argsort(d_all, axis=1)[:, :5]
    assert np.array_equal(np.sort(idx, 1), np.sort(idx_np, 1))
    assert_all_close(dist, np.sort(d_all, 1)[:, :5], rtol=1e-6)


def test_kdtree_nearest_gen():
    pts = np.asarray([[0.0], [1.0], [3.0]])
    gen = nd.KDTree(pts).nearest_gen(np.asarray([0.9]))
    order = [i for _, i in gen]
    assert order == [1, 0, 2]


def test_odeint_rk4():
    # dy/dt = -y -> y = e^{-t}; 4th-order accuracy
    ts = np.linspace(0, 1, 51)
    traj = nd.odeint_rk4(lambda t, y: -y, jnp.asarray(1.0), ts)
    assert abs(float(traj[-1]) - np.exp(-1)) < 1e-8
    # vector state: harmonic oscillator preserves energy
    def f(t, y):
        return jnp.asarray([y[1], -y[0]])
    traj = nd.odeint_rk4(f, jnp.asarray([1.0, 0.0]), np.linspace(0, 6.28, 200))
    e = np.sum(np.asarray(traj) ** 2, axis=1)
    assert np.abs(e - 1).max() < 1e-6


def test_arrays_helpers():
    assert binary_search([1, 3, 5, 7], 5) == 2
    assert binary_search([1, 3, 5, 7], 4) == ~2
    assert binary_rangesearch([1, 3, 3, 3, 7], 3) == (1, 4)
    assert list(heap_sort_gen([5, 1, 4, 2])) == [1, 2, 4, 5]
    cmp = Comparator().reversed()
    assert cmp(1, 2) > 0
    bykey = Comparator().by_key(lambda t: t[1])
    assert bykey((0, 5), (1, 3)) > 0
    assert is_array([1, 2]) and is_array(jnp.zeros(3)) \
        and not is_array("nope")


def test_iter_utils():
    from nd4js_tpu.utils import linspace, cartesian_prod, argmin, imax
    assert_all_close(linspace(0, 1, 5), [0, 0.25, 0.5, 0.75, 1.0])
    assert list(cartesian_prod([1, 2], "ab")) == [
        (1, "a"), (1, "b"), (2, "a"), (2, "b")]
    assert argmin([3, 1, 2]) == 1
    assert imax([3, 1, 2]) == 3


def test_transpose_inplace():
    a = np.arange(6.0).reshape(2, 3)
    assert np.array_equal(np.asarray(nd.la.transpose_inplace(a)), a.T)
