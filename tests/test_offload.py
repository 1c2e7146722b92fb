"""HostStash: phase-based HBM budgeting (parallel/offload.py).

The AR2 mine phase stashes the reranker TrainState to host while the index
occupies HBM (run.py mine_offloaded; AR2CoTrainer offload_refresh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from simxns_tpu.parallel import create_mesh
from simxns_tpu.parallel.offload import HostStash


def test_hoststash_roundtrip_preserves_values_and_shardings():
    mesh = create_mesh()
    sharded = jax.device_put(
        jnp.arange(64.0).reshape(8, 8),
        NamedSharding(mesh, P("data", None)))
    replicated = jax.device_put(jnp.ones((3,)), NamedSharding(mesh, P()))
    tree = {"w": sharded, "b": replicated, "step": 7, "none": None}
    want_w = np.asarray(sharded)
    stash = HostStash(tree)
    assert stash.nbytes == 64 * 4 + 3 * 4
    # the device buffers are actually gone
    assert sharded.is_deleted()
    back = stash.restore()
    np.testing.assert_array_equal(np.asarray(back["w"]), want_w)
    assert back["w"].sharding == NamedSharding(mesh, P("data", None))
    assert back["step"] == 7 and back["none"] is None


def test_hoststash_restore_twice_raises():
    stash = HostStash({"x": jnp.zeros((4,))})
    stash.restore()
    with pytest.raises(RuntimeError):
        stash.restore()


def test_hoststash_train_state_through_a_step():
    """Stash/restore a real TrainState mid-run: the restored state must
    drive further (donating) steps exactly as the original would."""
    import optax

    from simxns_tpu.train import TrainState

    def loss_fn(params, x):
        return jnp.sum((x @ params["w"]) ** 2)

    tx = optax.sgd(0.1)
    params = {"w": jnp.ones((4, 2))}
    state = TrainState.create(params, tx)

    @jax.jit
    def step(s, x):
        g = jax.grad(loss_fn)(s.params, x)
        return s.apply_gradients(g, tx)

    x = jnp.arange(8.0).reshape(2, 4)
    s_ref = step(step(state, x), x)

    s2 = TrainState.create({"w": jnp.ones((4, 2))}, tx)
    s2 = step(s2, x)
    s2 = HostStash(s2).restore()       # mine-phase round trip
    s2 = step(s2, x)
    np.testing.assert_allclose(np.asarray(s_ref.params["w"]),
                               np.asarray(s2.params["w"]), rtol=1e-6)
