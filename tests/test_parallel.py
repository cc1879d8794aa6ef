"""Device-mesh batching over the 8-device virtual CPU mesh — the
inter-chip half of the broadcast-batch seam (SURVEY.md §2/§5: DP over
the batch dim is the complete parallelism story for this library)."""
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from nd4js_tpu import la, parallel
from tests.utils import assert_all_close, TestRNG


def test_mesh_and_shard_batch():
    mesh = parallel.make_mesh()
    assert mesh.devices.size == 8
    x = jnp.zeros((16, 4, 4))
    xs = parallel.shard_batch(x, mesh)
    assert xs.sharding.spec == P("batch", None, None)


def test_batched_qr_sharded_over_mesh():
    rng = TestRNG("parallel_qr")
    mesh = parallel.make_mesh()
    a = jnp.asarray(rng.matrix(16, 24, 24, dtype=np.float32))
    f = parallel.batch_sharded(la.qr_decomp, mesh)
    q, r = f(a)
    # results live on the mesh (XLA may choose the output layout)
    assert len(q.devices()) == 8 or q.sharding.is_fully_replicated
    for i in range(0, 16, 5):
        assert_all_close(np.asarray(q[i]) @ np.asarray(r[i]), a[i],
                         rtol=0, atol=1e-4)


def test_sharded_lstsq_pipeline():
    rng = TestRNG("parallel_lstsq")
    mesh = parallel.make_mesh()
    a = jnp.asarray(rng.matrix(8, 20, 10, dtype=np.float32))
    y = jnp.asarray(rng.matrix(8, 20, 2, dtype=np.float32))
    sh = NamedSharding(mesh, P("batch"))

    def step(a, y):
        q, r = la.qr_decomp(a)
        return la.qr_lstsq(q, r, y)

    f = jax.jit(step, in_shardings=(sh, sh), out_shardings=sh)
    x = f(jax.device_put(a, sh), jax.device_put(y, sh))
    grad = np.einsum("bji,bjk->bik", np.asarray(a),
                     np.asarray(a) @ np.asarray(x) - np.asarray(y))
    assert np.abs(grad).max() < 1e-2
